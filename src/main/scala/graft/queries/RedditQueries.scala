package graft.queries

import graft.api.ParamSpec
import graft.operators.RedditOps
import graft.sources.RedditView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity operator family (SURVEY.md §2 rows F1-F7, P1, U1, O1,
  * A1, E1, R1, R2), each as a batch query over the envelope view with a
  * DuckDB oracle. These are the semantics-equivalent batch twins of the
  * streaming filters (SURVEY.md §5.3).
  */
object RedditQueries {

  /** DuckDB mirror of [[graft.sources.RedditView]] — keep the two in exact
    * lockstep; every oracle below runs against this CTE.
    */
  val redditCte: String =
    """WITH reddit AS (SELECT
      | event_id AS id,
      | CASE WHEN event_id % 3 = 0 THEN 'rs' ELSE 'rc' END AS event,
      | CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS created_utc,
      | 'user_' || CAST(user_id AS VARCHAR) AS author,
      | event_type AS subreddit,
      | CASE WHEN event_id % 3 = 0 AND user_id % 7 <> 0
      |      THEN (CASE WHEN user_id % 2 = 0 THEN 'Site' ELSE 'site' END)
      |           || CAST(user_id % 5 AS VARCHAR) || '.com' END AS domain,
      | CASE WHEN event_id % 3 = 0
      |      THEN CASE WHEN user_id % 2 = 0 THEN 'True' ELSE 'false' END END AS over_18,
      | CASE WHEN event_id % 3 = 0
      |      THEN CASE WHEN user_id % 3 = 0 THEN 'true' ELSE 'False' END END AS is_self,
      | props AS json
      |FROM events)""".stripMargin.replace("\n", " ")

  private val envelopeCols = Seq("id", "event", "created_utc", "author", "subreddit")
  private val envelopeSql = envelopeCols.mkString(", ")

  private def base(spec: ParamSpec)(spark: SparkSession, dir: String): DataFrame =
    RedditView(spark, dir)
      .filter(RedditOps.pred(spec))
      .select(envelopeCols.map(col): _*)
      .orderBy(col("id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — type gate
    "r01_type_filter" -> base(ParamSpec(types = Set("rc"))),

    // F2 — author whitelist (exact, case-sensitive membership)
    "r02_author_whitelist" -> base(ParamSpec(
      authors = Seq("user_1", "user_5", "user_11"))),

    // F3 — subreddit whitelist
    "r03_subreddit_whitelist" -> base(ParamSpec(
      subreddits = Seq("click", "purchase"))),

    // F4 — domain whitelist: lowercased both sides, NULL-safe (missing
    // domain never matches); with no author/subreddit this reproduces the
    // reference's "?domain=x drops all comments" behavior.
    "r04_domain_whitelist" -> base(ParamSpec(
      domains = Seq("SITE1.COM", "site3.com").map(_.toLowerCase))),

    // F5 — OR-combinator across the three whitelists
    "r05_whitelist_or" -> base(ParamSpec(
      authors = Seq("user_2"), subreddits = Seq("error"), domains = Seq("site0.com"))),

    // F6 — over_18 equality (submissions only, case-insensitive, AND)
    "r06_over18_filter" -> base(ParamSpec(
      types = Set("rs"), over18 = Some("TRUE"))),

    // F7 — is_self equality AND-composed with a whitelist
    "r07_is_self_filter" -> base(ParamSpec(
      types = Set("rs"), isSelf = Some("false"),
      subreddits = Seq("view", "signup"))),

    // P1 (scalar form) — lazy payload parse: JSON only touched for the
    // projection, envelope filters never parse it (SURVEY.md §4).
    "r08_json_extract" -> ((spark: SparkSession, dir: String) =>
      RedditView(spark, dir)
        .filter(RedditOps.pred(ParamSpec(types = Set("rc"))))
        .select(col("id"), get_json_object(col("json"), "$.k").as("json_k"))
        .orderBy(col("id"))),

    // U1 + O1 — merge two differently-filtered streams, emit-order sort
    "r09_union_merge_sort" -> ((spark: SparkSession, dir: String) => {
      val v = RedditView(spark, dir)
      val comments = v.filter(RedditOps.pred(
        ParamSpec(types = Set("rc"), authors = Seq("user_3", "user_4"))))
      val submissions = v.filter(RedditOps.pred(
        ParamSpec(types = Set("rs"), subreddits = Seq("purchase"))))
      comments.unionByName(submissions)
        .select(envelopeCols.map(col): _*)
        .orderBy(RedditOps.emitOrder: _*)
    }),

    // R1 — backfill: last N ids per type below the high-watermark (S1).
    // The watermark is joined in as a broadcast scalar, not collected.
    "r10_backfill" -> ((spark: SparkSession, dir: String) => {
      val v = RedditView(spark, dir)
      val spec = ParamSpec(commentBackfill = Some(200L), submissionBackfill = Some(100L))
      val maxes = v.groupBy().agg(
        max(when(col("event") === "rc", col("id"))).as("rc_max"),
        max(when(col("event") === "rs", col("id"))).as("rs_max"))
      v.crossJoin(broadcast(maxes))
        .filter(RedditOps.resumePred(spec, col("rc_max"), col("rs_max")))
        .select(envelopeCols.map(col): _*)
        .orderBy(col("id"))
    }),

    // R2 — exact start ids per type
    "r11_start_id" -> ((spark: SparkSession, dir: String) => {
      val v = RedditView(spark, dir)
      val spec = ParamSpec(commentStartId = Some(500L), submissionStartId = Some(800L))
      v.filter(RedditOps.resumePred(spec, lit(null), lit(null)))
        .select(envelopeCols.map(col): _*)
        .orderBy(col("id"))
    }),

    // A1 — the per-connection counters as a batch aggregate: tcs/tss count
    // whitelist-passed events; tbs counts emitted frame bytes.
    "r12_counters" -> ((spark: SparkSession, dir: String) => {
      val spec = ParamSpec(subreddits = Seq("click", "error", "view"))
      RedditView(spark, dir)
        .filter(RedditOps.whitelistPred(spec) && RedditOps.attrPred(spec))
        .agg(
          count(when(col("event") === "rc", lit(1))).as("tcs"),
          count(when(col("event") === "rs", lit(1))).as("tss"),
          sum(length(RedditOps.sseFrame(col("id"), col("event"), col("json"))))
            .as("tbs"))
    }),

    // P1 (full form) — the JsonKeySubset custom expression itself:
    // type-preserving key-subset re-serialization, oracle-checked.
    "r14_projection_full" -> ((spark: SparkSession, dir: String) =>
      RedditView(spark, dir)
        .select(col("id"),
          graft.functions.JsonKeySubset(col("json"), Seq("k")).as("projected"))
        .orderBy(col("id"))),

    // SQL surface: the same engine queried through spark.sql over a
    // registered view of the envelope.
    "r15_sql_surface" -> ((spark: SparkSession, dir: String) => {
      RedditView(spark, dir).createOrReplaceTempView("reddit_events")
      spark.sql(
        """SELECT subreddit, event, count(*) AS n, min(id) AS first_id
          |FROM reddit_events
          |GROUP BY subreddit, event
          |ORDER BY subreddit, event""".stripMargin)
    }),

    // E1 — SSE frame encode as a codegen'd concat
    "r13_sse_encode" -> ((spark: SparkSession, dir: String) =>
      RedditView(spark, dir)
        .filter(RedditOps.pred(ParamSpec(authors = Seq("user_7"))))
        .select(col("id"),
          RedditOps.sseFrame(col("id"), col("event"), col("json")).as("frame"))
        .orderBy(col("id"))),

    // TIME-TRAVEL batch read of the segment log (r16): the repo's
    // oldest id-monotone append-only store gains the d153 snapshot
    // device — history segments written (= watermark W), an increment
    // appended AND the log compacted (membership below W must survive
    // both, the compaction-preserves-rows contract), then the Spark
    // batch scan pinned AT W: segment-name metadata pruning + one
    // pushed id cut (RedditLog.batchRead doc; stability across
    // compact+append spec-pinned in Round13OpsSpec). The fixture log is
    // built by collecting an id%5 slice — the log's WRITER is the
    // single-threaded ingest actor by design (the SSE server's role);
    // the registered operator is the snapshot READ.
    "r16_log_snapshot" -> ((spark: SparkSession, dir: String) => {
      import graft.sources.RedditLog
      val v = RedditView(spark, dir)
      val slice = v.filter(col("id") % 5 === 0)
      val cut = v.agg(max(col("id"))).head().getLong(0) * 3 / 4
      val logDir = {
        val f = new java.io.File("target/graft-indexes/r16-log")
        // reset the slot: segments append, so a rerun must not duplicate
        if (f.exists()) f.listFiles().filter(_.isFile).foreach(_.delete())
        else f.mkdirs()
        f.getAbsolutePath
      }
      val fields = RedditLog.schema.fieldNames.toSeq
      def toRows(df: DataFrame): Seq[Map[String, Any]] =
        df.orderBy(col("id")).collect().map { r =>
          fields.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap
        }.toSeq
      toRows(slice.filter(col("id") <= cut).select(fields.map(col): _*))
        .grouped(500).foreach(g => RedditLog.writeSegment(logDir, g))
      val wm = RedditLog.maxId(logDir)
      toRows(slice.filter(col("id") > cut).select(fields.map(col): _*))
        .grouped(500).foreach(g => RedditLog.writeSegment(logDir, g))
      RedditLog.compact(logDir, 2000L)
      RedditLog.batchRead(spark, logDir, Some(wm))
        .select(envelopeCols.map(col): _*)
        .orderBy(col("id"))
    })
  )

  private def frameSql =
    "'id: ' || CAST(id AS VARCHAR) || chr(10) || 'event: ' || event || chr(10) || 'data: ' || json || chr(10) || chr(10)"

  def oracles: Map[String, String] = Map(
    "r01_type_filter" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE event = 'rc' ORDER BY id",
    "r02_author_whitelist" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE author IN ('user_1','user_5','user_11') ORDER BY id",
    "r03_subreddit_whitelist" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE subreddit IN ('click','purchase') ORDER BY id",
    "r04_domain_whitelist" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE lower(domain) IN ('site1.com','site3.com') ORDER BY id",
    "r05_whitelist_or" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE coalesce(author = 'user_2' OR subreddit = 'error' OR lower(domain) = 'site0.com', false) ORDER BY id",
    "r06_over18_filter" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE event = 'rs' AND lower(over_18) = 'true' ORDER BY id",
    "r07_is_self_filter" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE event = 'rs' AND lower(is_self) = 'false' AND subreddit IN ('view','signup') ORDER BY id",
    "r08_json_extract" ->
      s"$redditCte SELECT id, json_extract_string(json, '$$.k') AS json_k FROM reddit WHERE event = 'rc' ORDER BY id",
    "r09_union_merge_sort" ->
      s"""$redditCte SELECT $envelopeSql FROM (
         | SELECT * FROM reddit WHERE event = 'rc' AND author IN ('user_3','user_4')
         | UNION ALL
         | SELECT * FROM reddit WHERE event = 'rs' AND subreddit IN ('purchase')
         |) ORDER BY created_utc, event, id""".stripMargin.replace("\n", " "),
    "r10_backfill" ->
      s"""$redditCte SELECT $envelopeSql FROM reddit WHERE
         | (event = 'rc' AND id >= (SELECT max(id) FROM reddit WHERE event = 'rc') - 200 + 1)
         | OR (event = 'rs' AND id >= (SELECT max(id) FROM reddit WHERE event = 'rs') - 100 + 1)
         |ORDER BY id""".stripMargin.replace("\n", " "),
    "r11_start_id" ->
      s"$redditCte SELECT $envelopeSql FROM reddit WHERE (event = 'rc' AND id >= 500) OR (event = 'rs' AND id >= 800) ORDER BY id",
    "r12_counters" ->
      s"""$redditCte SELECT
         | count(CASE WHEN event = 'rc' THEN 1 END) AS tcs,
         | count(CASE WHEN event = 'rs' THEN 1 END) AS tss,
         | CAST(sum(length($frameSql)) AS BIGINT) AS tbs
         |FROM reddit WHERE subreddit IN ('click','error','view')""".stripMargin.replace("\n", " "),
    "r13_sse_encode" ->
      s"$redditCte SELECT id, $frameSql AS frame FROM reddit WHERE author = 'user_7' ORDER BY id",
    "r14_projection_full" ->
      s"""$redditCte SELECT id,
         | CASE WHEN json_extract(json, '$$.k') IS NOT NULL
         |      THEN '{"k":' || json_extract(json, '$$.k') || '}'
         |      ELSE '{}' END AS projected
         |FROM reddit ORDER BY id""".stripMargin.replace("\n", " "),
    "r15_sql_surface" ->
      s"""$redditCte SELECT subreddit, event, count(*) AS n, min(id) AS first_id
         |FROM reddit GROUP BY subreddit, event
         |ORDER BY subreddit, event""".stripMargin.replace("\n", " "),
    // mirror of the r16 snapshot read: the id%5 fixture slice cut at
    // the history watermark (= the 3/4 cut — every history id sits at
    // or below it, every appended id above)
    "r16_log_snapshot" ->
      s"""$redditCte SELECT $envelopeSql FROM reddit
         | WHERE id % 5 = 0 AND id <= (SELECT max(id) * 3 // 4 FROM reddit)
         |ORDER BY id""".stripMargin.replace("\n", " ")
  )
}
