package graft.streaming

import graft.SparkTestSession
import graft.sources.RedditLog
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked event-time windows + keyed-state sessionization over the
  * streaming source (SURVEY.md §2.1 extension categories).
  *
  * Append-mode results only emit in a batch AFTER the watermark passes,
  * so each fixture ends with far-future "watermark pusher" events and
  * runs with max_per_trigger so the drain spans several micro-batches.
  */
class EventTimeOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: Long, utc: Long, author: String, sub: String): Map[String, Any] = Map(
    "id" -> id, "event" -> (if (id % 2 == 0) "rc" else "rs"),
    "created_utc" -> utc, "author" -> author, "subreddit" -> sub,
    "domain" -> null, "over_18" -> null, "is_self" -> null, "json" -> "{}")

  test("dedupStream: duplicate ids across overlapping segments emit once, state watermark-bounded") {
    val dir = Files.createTempDirectory("ddlog").toString
    // id 4 exists in BOTH segments (overlapping ranges) — the source's
    // at-least-once shape on a retried write — so the raw stream carries
    // it twice; the dedup emits it once
    RedditLog.writeSegment(dir, Seq(ev(2, 600, "a", "news"), ev(4, 630, "b", "news")))
    RedditLog.writeSegment(dir, Seq(ev(4, 630, "b", "news"), ev(6, 645, "c", "news")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "3").load()
    val name = s"dd${System.nanoTime()}"
    val q = EventTimeOps.dedupStream(src)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table(name).select($"id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(2L, 4L, 6L), ids.toString)
  }

  test("bloomDedupIngest: per-batch dedup decisions; broadcasts destroyed every micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val history = Seq((100L, "h1"), (101L, "h2")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String, Long)]
    val stream = input.toDF().toDF("doc_id", "text", "created_utc")
    val decisions = new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Boolean, String)]]
    val (writer, handle) = EventTimeOps.bloomDedupIngest(stream, history)(
      (out, id) => decisions.put(id,
        out.collect().toSeq.map(r =>
          (r.getLong(0), r.getBoolean(1), if (r.isNullAt(2)) null else r.getString(2)))))
    val q = writer.start()
    try {
      // batch 1: one history dup, one clean doc
      input.addData((1L, "h1", 600L), (2L, "n1", 601L))
      q.processAllAvailable()
      // batch 2: watermark pusher (far future) so batch 1's exact-dedup
      // state expires and later repeats must rely on the accepted sketch
      input.addData((5L, "zzz", 100000L))
      q.processAllAvailable()
      // batch 3: repeat of batch 1's ACCEPTED doc, beyond the exact
      // horizon → sketch-believed 'ingested' dup; plus a clean doc
      input.addData((6L, "n1", 99990L), (7L, "n2", 99991L))
      q.processAllAvailable()

      val all = decisions.values().asScala.flatten.toSeq
      val byDoc = all.map(t => t._1 -> ((t._2, t._3))).toMap
      assert(byDoc(1L) == ((true, "history")), s"doc 1: ${byDoc.get(1L)}")
      assert(byDoc(2L) == ((false, null)), s"doc 2: ${byDoc.get(2L)}")
      assert(byDoc(6L) == ((true, "ingested")),
        s"doc 6 must be sketch-believed dup of accepted doc 2: ${byDoc.get(6L)}")
      assert(byDoc(7L) == ((false, null)), s"doc 7: ${byDoc.get(7L)}")
      // ≥ 2 real micro-batches processed, decisions recorded per batch
      assert(handle.batchesProcessed >= 2, s"batches=${handle.batchesProcessed}")
      assert(decisions.size() >= 2)
      // broadcast cleanup: two sketches per batch, all destroyed —
      // dereferencing any of them must now fail
      assert(handle.destroyedBroadcasts.size == 2 * handle.batchesProcessed)
      handle.destroyedBroadcasts.foreach { bc =>
        intercept[org.apache.spark.SparkException](bc.value)
      }
    } finally q.stop()
  }

  test("windowed counts: tumbling event-time windows with watermark") {
    val dir = Files.createTempDirectory("wlog").toString
    // two 1-minute windows for 'news' (600..659, 660..719), one for 'aww'
    RedditLog.writeSegment(dir, Seq(
      ev(2, 600, "a", "news"), ev(4, 630, "b", "news"), ev(5, 661, "c", "news"),
      ev(6, 645, "d", "aww"), ev(8, 100000, "z", "zzz"), ev(10, 100001, "z", "zzz")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"win${System.nanoTime()}"
    val q = EventTimeOps.windowedCounts(src)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name)
      .select($"subreddit", $"n", $"n_comments").as[(String, Long, Long)]
      .collect().toSet
    assert(rows.contains(("news", 2L, 2L)))  // 600+630 window: two comments
    assert(rows.contains(("news", 1L, 0L)))  // 661 window: one submission
    assert(rows.contains(("aww", 1L, 1L)))
  }

  test("windowed distinct authors: KMV sketch state merges across micro-batches, exact below k") {
    val dir = Files.createTempDirectory("kmvlog").toString
    // window 600..659: authors a, b, a, c → 3 distinct over 4 events;
    // window 660..719: author a → 1 distinct. max_per_trigger=2 forces
    // the window-600 sketch to MERGE partial buffers across batches.
    RedditLog.writeSegment(dir, Seq(
      ev(2, 600, "a", "news"), ev(4, 615, "b", "news"),
      ev(6, 630, "a", "news"), ev(8, 645, "c", "news"),
      ev(10, 661, "a", "news"),
      ev(12, 100000, "z", "zzz"), ev(14, 100001, "z", "zzz")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"kmv${System.nanoTime()}"
    val q = EventTimeOps.windowedDistinctAuthors(src)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name)
      .select($"n_events", $"distinct_authors").as[(Long, Double)]
      .collect().toSet
    // below k = 64 distinct values KMV returns the exact count
    assert(rows.contains((4L, 3.0)), rows.toString)
    assert(rows.contains((1L, 1.0)), rows.toString)
  }

  test("windowedPayloadQuantiles: summary merges across micro-batches, exact below accuracy") {
    val dir = Files.createTempDirectory("pqlog").toString
    def evk(id: Long, utc: Long, k: Long): Map[String, Any] =
      ev(id, utc, s"a$id", "news") + ("json" -> s"""{"k":$k}""")
    // window 600..659: k = 10,20,30,40 (p50 = 20 or 30 by summary
    // convention, p95 = 40); window 660..719: k = 7 alone; one event
    // with NO k field contributes to n_events but not the quantiles.
    RedditLog.writeSegment(dir, Seq(
      evk(2, 600, 10), evk(4, 615, 20), evk(6, 630, 30), evk(8, 645, 40),
      ev(9, 650, "x", "news"),
      evk(10, 661, 7),
      ev(12, 100000, "z", "zzz"), ev(14, 100001, "z", "zzz")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"pq${System.nanoTime()}"
    val q = EventTimeOps.windowedPayloadQuantiles(src)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name)
      .select($"n_events", $"n_scored", $"p50", $"p95")
      .as[(Long, Long, Double, Double)].collect().toSet
    // batch twin: the same aggregate over the same rows must agree
    // exactly (below accuracy the summary holds every value)
    val batch = Seq(10L, 20L, 30L, 40L).map(_.toDouble).toDF("v")
      .agg(org.apache.spark.sql.functions.expr("percentile_approx(v, 0.5, 1000)"),
        org.apache.spark.sql.functions.expr("percentile_approx(v, 0.95, 1000)"))
      .as[(Double, Double)].head()
    assert(rows.contains((5L, 4L, batch._1, batch._2)), rows.toString)
    assert(rows.contains((1L, 1L, 7.0, 7.0)), rows.toString)
  }

  test("windowedTopAuthors: exact below capacity, state merges across micro-batches") {
    val dir = Files.createTempDirectory("mglog").toString
    // window 600..659: a×3, b×2, c×1 (6 events, 3 distinct ≤ capacity →
    // Misra-Gries is the exact count map whatever the arrival order);
    // max_per_trigger=2 forces the summary to fold across ≥3 batches
    RedditLog.writeSegment(dir, Seq(
      ev(2, 600, "a", "news"), ev(4, 605, "b", "news"),
      ev(6, 610, "a", "news"), ev(8, 615, "c", "news"),
      ev(10, 620, "a", "news"), ev(12, 625, "b", "news"),
      ev(14, 100000, "z", "zzz"), ev(16, 100001, "z", "zzz")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"mg${System.nanoTime()}"
    val q = EventTimeOps.windowedTopAuthors(spark, src, capacity = 8, k = 3)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name)
      .select($"window_start", $"rk", $"author", $"est_count", $"window_events")
      .as[(Long, Int, String, Long, Long)].collect().toSeq
    val w600 = rows.filter(_._1 == 600L).sortBy(_._2)
    assert(w600.map(t => (t._2, t._3, t._4, t._5)) ==
      Seq((1, "a", 3L, 6L), (2, "b", 2L, 6L), (3, "c", 1L, 6L)), rows.toString)
  }

  test("windowedSubredditCms: streamed window estimates equal the d99 batch kernel exactly") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    // window 600..659: news×4, pics×2, meta×1; window 660..: news×2.
    // max_per_trigger=3 forces state folds across micro-batches.
    val dir = Files.createTempDirectory("cmslog").toString
    val evs = Seq(
      ev(2, 600, "a", "news"), ev(4, 605, "b", "pics"),
      ev(6, 610, "c", "news"), ev(8, 615, "d", "meta"),
      ev(10, 620, "e", "news"), ev(12, 625, "f", "pics"),
      ev(14, 630, "g", "news"),
      ev(16, 660, "h", "news"), ev(18, 665, "i", "news"))
    RedditLog.writeSegment(dir, evs ++ Seq(
      ev(100, 100000, "z", "zzz"), ev(102, 100001, "z", "zzz")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "200")
      .option("max_per_trigger", "3").load()
    val keys = Seq("news", "pics", "meta", "absent")
    val name = s"cms${System.nanoTime()}"
    val q = EventTimeOps.windowedSubredditCms(spark, src, keys,
        depth = 4, width = 64)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name)
      .select($"window_start", $"term", $"est", $"window_events")
      .as[(Long, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap

    // batch twin: the d99 kernel over the window's slice, one term per
    // "document" — identical counters by the shared hash
    def twin(subs: Seq[String]): Map[String, Long] =
      TextAnalysis.countMinEstimate(
        subs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("doc_id", "text"), keys, 4, 64)
        .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("est")).toMap
    val w600 = twin(Seq("news", "pics", "news", "meta", "news", "pics", "news"))
    val w660 = twin(Seq("news", "news"))
    keys.foreach { k =>
      assert(rows((600L, k)) == (w600(k), 7L), s"w600 $k: ${rows.get((600L, k))}")
      assert(rows((660L, k)) == (w660(k), 2L), s"w660 $k: ${rows.get((660L, k))}")
    }
    // one-sidedness on the real counts
    assert(rows((600L, "news"))._1 >= 4L && rows((600L, "meta"))._1 >= 1L)
  }

  test("windowedAuthorCardinality: streamed sketch equals an SQL-built batch twin exactly; hash60Jvm matches the Column hash") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.{col, expr, max => smax, sum => ssum}
    // the JVM hash used by the state fold is the SQL hash, bit for bit
    val names = (0 until 10).map(i => s"a$i") ++ Seq("mod", "ünïcode")
    val hashed = names.toDF("s")
      .select(col("s"), Dedup.hash60(col("s")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    names.foreach(s => assert(hashed(s) == Dedup.hash60Jvm(s), s))

    // two windows: 600.. has 10 distinct authors over 20 events (dups
    // free by construction), 660.. has 3; pusher rows advance the
    // watermark past both so the timeout fires
    val dir = Files.createTempDirectory("hlllog").toString
    val evs = (0 until 20).map(i =>
      ev(2L * i + 2, 600L + i, s"a${i % 10}", "news")) ++
      (0 until 3).map(i => ev(60L + 2 * i, 660L + i, s"a$i", "news"))
    RedditLog.writeSegment(dir, evs ++ Seq(
      ev(100, 100000, "z", "zzz"), ev(102, 100001, "z", "zzz")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "200")
      .option("max_per_trigger", "7").load()
    val name = s"hll${System.nanoTime()}"
    val q = EventTimeOps.windowedAuthorCardinality(spark, src)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name)
      .select($"window_start", $"n_events", $"hll_est")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // batch twin built from SQL columns (the d81 register arithmetic —
    // an independent path from the JVM state fold)
    def twin(authors: Seq[String]): Double = {
      val alphaNum = Dedup.hllAlphaNum(8).toDouble
      val regs = authors.toDF("s")
        .select(Dedup.hash60(col("s")).as("h"))
        .select((col("h") % 256).as("j"), expr("h div 256").as("w"))
        .select(col("j"), expr(
          "CASE WHEN w = 0 THEN 53 ELSE CAST(53 - length(bin(w)) AS INT) END").as("rho"))
        .groupBy(col("j")).agg(smax(col("rho")).as("mj")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val s = (0 until 256).map(j => 1L << (53 - regs.getOrElse(j.toLong, 0))).sum
      alphaNum / s.toDouble
    }
    assert(rows(600L)._1 == 20L && rows(660L)._1 == 3L, rows.toString)
    assert(rows(600L)._2 == twin((0 until 20).map(i => s"a${i % 10}")),
      "window 600 estimate must equal the batch twin bit-for-bit")
    assert(rows(660L)._2 == twin((0 until 3).map(i => s"a$i")))
  }

  test("windowedTopAuthors: overflow regime keeps the Misra-Gries guarantee") {
    val dir = Files.createTempDirectory("mgovlog").toString
    // window 600..659: capacity=2 counters for 4 distinct authors over
    // 12 events — a (6 of 12) exceeds n/(capacity+1) = 4, so it MUST
    // survive with est ∈ [true − 4, true]; rarer authors may vanish.
    val evs = Seq("a", "b", "a", "c", "a", "d", "a", "b", "a", "c", "a", "d")
      .zipWithIndex.map { case (au, i) => ev(2L * i + 2, 600L + i, au, "news") }
    // pusher ids stay adjacent to the data ids: backfill=100 counts IDS
    // from the max id back, so a distant pusher id would push the whole
    // window-600 fixture out of the backfill range
    RedditLog.writeSegment(dir, evs ++ Seq(
      ev(26, 100000, "z", "zzz"), ev(28, 100001, "z", "zzz")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "5").load()
    val name = s"mgov${System.nanoTime()}"
    val q = EventTimeOps.windowedTopAuthors(spark, src, capacity = 2, k = 2)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val w600 = spark.table(name)
      .select($"window_start", $"rk", $"author", $"est_count", $"window_events")
      .as[(Long, Int, String, Long, Long)].collect().toSeq
      .filter(_._1 == 600L)
    assert(w600.nonEmpty)
    assert(w600.forall(_._5 == 12L), w600.toString)
    val a = w600.find(_._3 == "a")
    assert(a.isDefined, s"heavy hitter 'a' (6 > 12/3) must survive: $w600")
    assert(a.get._4 >= 2L && a.get._4 <= 6L,
      s"estimate must be within n/(capacity+1)=4 below true count 6: $w600")
    // the summary can never report more than `capacity` authors
    assert(w600.size <= 2, w600.toString)
  }

  test("stream-stream join: comments match submissions in-subreddit within the time bound") {
    val rcDir = Files.createTempDirectory("ssj-rc").toString
    val rsDir = Files.createTempDirectory("ssj-rs").toString
    // rc 2@t=1000 news, rc 4@t=2000 news, rc 6@t=1000 aww
    RedditLog.writeSegment(rcDir, Seq(
      ev(2, 1000, "a", "news"), ev(4, 2000, "b", "news"), ev(6, 1000, "c", "aww"),
      ev(8, 100000, "z", "zz1"), ev(10, 100001, "z", "zz1")))
    // rs 3@t=1100 news (matches rc2 within 300s, not rc4), rs 5@t=900 aww
    RedditLog.writeSegment(rsDir, Seq(
      ev(3, 1100, "x", "news"), ev(5, 900, "y", "aww"),
      ev(7, 100000, "z", "zz2"), ev(9, 100001, "z", "zz2")))
    def src(p: String) = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", p).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"ssj${System.nanoTime()}"
    val q = EventTimeOps.commentSubmissionJoin(src(rcDir), src(rsDir))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val pairs = spark.table(name).select($"c_id", $"s_id", $"subreddit")
      .as[(Long, Long, String)].collect().toSet
      .filterNot(_._3.startsWith("zz"))
    assert(pairs == Set((2L, 3L, "news"), (6L, 5L, "aww")))
  }

  test("sessionize: gap-based author sessions close via gap and event-time timeout") {
    val dir = Files.createTempDirectory("slog").toString
    // alice: 100,200,250 → one session (gap 300); 1000 → new session that
    // only the event-time timeout can close
    RedditLog.writeSegment(dir, Seq(
      ev(2, 100, "alice", "x"), ev(4, 200, "alice", "x"), ev(6, 250, "alice", "x"),
      ev(8, 1000, "alice", "x"),
      ev(10, 100000, "bob", "x"), ev(12, 100001, "bob", "x")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"sess${System.nanoTime()}"
    val q = EventTimeOps.sessionize(spark, src, gapSeconds = 300L)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sessions = spark.table(name)
      .as[AuthorSession].collect()
      .filter(_.author == "alice").map(s => (s.start_utc, s.end_utc, s.n_events)).toSet
    assert(sessions.contains((100L, 250L, 3L)))   // closed by the gap
    assert(sessions.contains((1000L, 1000L, 1L))) // closed by the timeout
  }

  test("sessionize: out-of-order (non-late) event extends a session backward") {
    val dir = Files.createTempDirectory("slog2").toString
    // carol's t=900 arrives a batch AFTER t=1000 (ids force the order);
    // within lateness, so it must merge and pull start_utc back to 900
    RedditLog.writeSegment(dir, Seq(
      ev(2, 1000, "carol", "x"), ev(4, 900, "carol", "x"),
      ev(10, 100000, "bob", "x"), ev(12, 100001, "bob", "x")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"sessb${System.nanoTime()}"
    val q = EventTimeOps.sessionize(spark, src, gapSeconds = 300L)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sessions = spark.table(name).as[AuthorSession].collect()
      .filter(_.author == "carol").map(s => (s.start_utc, s.end_utc, s.n_events)).toSet
    assert(sessions == Set((900L, 1000L, 2L)))
  }

  test("sessionize: out-of-order event MORE than a gap before the session start splits, not merges") {
    val dir = Files.createTempDirectory("slog3").toString
    // dave's t=100 arrives a batch after t=1000: 900s before the open
    // session's start, far beyond gap=300 — it must close as its own
    // session instead of stretching [1000,1000] back to 100
    // (generous lateness keeps the watermark from dropping it)
    RedditLog.writeSegment(dir, Seq(
      ev(2, 1000, "dave", "x"), ev(4, 100, "dave", "x"),
      ev(10, 100000, "bob", "x"), ev(12, 100001, "bob", "x")))
    val src = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .option("max_per_trigger", "2").load()
    val name = s"sesss${System.nanoTime()}"
    val q = EventTimeOps.sessionize(spark, src, gapSeconds = 300L, lateness = "2 hours")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sessions = spark.table(name).as[AuthorSession].collect()
      .filter(_.author == "dave").map(s => (s.start_utc, s.end_utc, s.n_events)).toSet
    assert(sessions.contains((100L, 100L, 1L)), sessions.toString)
    assert(!sessions.exists(s => s._1 == 100L && s._2 == 1000L), sessions.toString)
  }

  test("lmQualityGateIngest: per-batch decisions equal the batch scorer's; short docs kept") {
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en")
    val path = Files.createTempDirectory("graft-lmgate-").toString
    TextAnalysis.saveBigramLm(ref, path)
    // three reference texts (model-like), two OOV-gibberish docs (high
    // nll), one single-token doc (no bigrams → null score → kept)
    val refTexts = ref.select(col("text")).limit(3)
      .collect().map(_.getString(0))
    val docs: Seq[(Long, String)] =
      refTexts.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }.toSeq ++
        Seq((10L, "zzqa zzqb zzqc zzqd zzqe"), (11L, "zzqf zzqg zzqh"),
          (12L, "solo"))
    val static = docs.toDF("doc_id", "text")
    val expected = static
      .join(TextAnalysis.bigramLmScoreIndexed(static, path)
        .select(col("doc_id"), col("avg_nll")), Seq("doc_id"), "left_outer")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // threshold between the reference texts and the gibberish — the
    // model must separate them for a midpoint to exist at all
    val refMax = Seq(1L, 2L, 3L).map(expected(_).get).max
    val gibMin = Seq(10L, 11L).map(expected(_).get).min
    assert(refMax < gibMin, s"model fails to separate: $refMax vs $gibMin")
    val thr = (refMax + gibMin) / 2
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val got = new java.util.concurrent.ConcurrentHashMap[Long, (Option[Double], Boolean)]
    val q = EventTimeOps.lmQualityGateIngest(stream, path, thr)((out, _) =>
      out.collect().foreach(r => got.put(r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2))))).start()
    try {
      input.addData(docs.take(4): _*)
      q.processAllAvailable()
      input.addData(docs.drop(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.size == docs.size)
    docs.foreach { case (id, _) =>
      val (score, keep) = got.get(id)
      assert(score == expected(id), s"doc $id score")
      assert(keep == score.forall(_ <= thr), s"doc $id keep")
    }
    // the gate discriminates: reference docs kept, gibberish dropped,
    // the short doc kept with no score
    assert(Seq(1L, 2L, 3L).forall(got.get(_)._2))
    assert(Seq(10L, 11L).forall(!got.get(_)._2))
    assert(got.get(12L) == ((None, true)))
  }

  test("rulesGateIngest: per-batch verdicts equal the batch kernel's across batch boundaries") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ok = ("the that have " * 20).trim
    val docs: Seq[(Long, String)] = Seq(
      (1L, ok),                      // passes every rule
      (2L, "the that"),              // too short
      (3L, ("the blah bluh " * 20).trim), // one stopword hit
      (4L, ok.replace("have", "12345")))  // alpha fraction fails
    val expected = TextAnalysis.gopherRules(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(expected == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    val input = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]
    val q = EventTimeOps.rulesGateIngest(input.toDF().toDF("doc_id", "text"))(
      (out, _) => out.select(col("doc_id"), col("keep")).collect()
        .foreach(r => got.put(r.getLong(0), r.getBoolean(1)))).start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.size == docs.size)
    docs.foreach { case (id, _) =>
      assert(got.get(id) == expected(id), s"doc $id") }
  }

  test("classifierGateIngest: per-batch margins equal the persisted artifact's batch scorer across batch boundaries") {
    import graft.operators.Classifier
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // train on a separable reference corpus, persist the artifact
    val ref = Seq(
      (1L, "good clean prose text", "en"), (2L, "good clean text", "en"),
      (3L, "spam junk noise blob", "xx"), (4L, "spam junk blob", "xx"))
      .toDF("doc_id", "text", "lang")
    val path = java.nio.file.Files
      .createTempDirectory("graft-clsgate-").toString
    Classifier.saveClassifier(ref, col("lang") === "en", path, 64, 3)
    // the stream carries NEW docs (mixed vocabulary, no labels)
    val docs: Seq[(Long, String)] = Seq(
      (10L, "good clean prose"), (11L, "spam junk junk"),
      (12L, "good spam"), (13L, "entirely novel words"))
    val expected = Classifier.classifyIndexed(docs.toDF("doc_id", "text"), path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Boolean)]
    val q = EventTimeOps.classifierGateIngest(
      input.toDF().toDF("doc_id", "text"), path)(
      (out, _) => out.collect().foreach(r =>
        got.put(r.getLong(0), (r.getLong(1), r.getBoolean(2))))).start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.size == docs.size)
    docs.foreach { case (id, _) =>
      val (m, keep) = got.get(id)
      assert(m == expected(id) && keep == (m > 0), s"doc $id")
    }
    // the trained direction separates the stream's in-vocabulary docs
    assert(got.get(10L)._2 && !got.get(11L)._2)
  }

  test("stratumBudgetGateIngest: decisions equal the budget-cut realization on the concatenated prefix; filled strata close; unbudgeted strata fail loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val alloc = Map("en" -> 10L, "de" -> 6L)
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // (doc_id, text, stratum); token counts chosen so: en fills at doc 3
    // (start 8 < 10, the boundary doc RIDES), de fills at doc 5
    val b1: Seq[(Long, String, String)] = Seq(
      (1L, words(4, "a"), "en"), (2L, words(4, "b"), "en"),
      (3L, words(4, "c"), "en"), (4L, words(5, "d"), "de"),
      (5L, words(2, "e"), "de"))
    val b2: Seq[(Long, String, String)] = Seq(
      (6L, words(3, "f"), "en"), (7L, words(1, "g"), "de"))
    // the batch realization on the same prefix: concatenated stream in
    // arrival order (doc_id inside a batch), per-stratum running start,
    // selected = start < alloc
    val expected = {
      var pos = Map.empty[String, Long].withDefaultValue(0L)
      (b1.sortBy(_._1) ++ b2.sortBy(_._1)).map { case (id, t, s) =>
        val n = t.split(" ").length.toLong
        val st = pos(s); pos = pos.updated(s, st + n)
        id -> ((s, n, st, st < alloc(s)))
      }.toMap
    }
    val input = MemoryStream[(Long, String, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long, Long, Boolean)]
    val (writer, handle) = EventTimeOps.stratumBudgetGateIngest(
      input.toDF().toDF("doc_id", "text", "stratum"), alloc)((out, _) =>
      out.collect().foreach(r => got.put(r.getLong(0),
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))))
    val q = writer.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      assert(got.size == 7)
      expected.foreach { case (id, exp) =>
        assert(got.get(id) == exp, s"doc $id: got ${got.get(id)}, expected $exp")
      }
      // the boundary docs ride (3: start 8 < 10; 5: start 5 < 6), the
      // strata then CLOSE (6 and 7 unselected)
      assert(got.get(3L)._4 && got.get(5L)._4)
      assert(!got.get(6L)._4 && !got.get(7L)._4)
      assert(handle.tokensSeen == Map("en" -> 15L, "de" -> 8L))
      assert(handle.batchesProcessed == 2)
      // an unbudgeted stratum is a mixture-control bypass — loud error
      input.addData((8L, words(2, "h"), "fr"))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chainMsg(t: Throwable): String =
        if (t == null) "" else t.toString + "|" + chainMsg(t.getCause)
      assert(chainMsg(e).contains("stratum without allocation"), chainMsg(e).take(800))
    } finally q.stop()
  }

  test("bucketBatchIngest: arrival-order batch assembly matches the sequential cursor rule; batches fill across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (bS, wS) = (4, 16)
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // bucket 0 (len < 16): docs 1,2,3 in mb1 + 5,6 in mb2 — batch 0
    // must fill ACROSS the micro-batch boundary (doc 5 takes slot 3);
    // bucket 1: docs 4, 7
    val b1: Seq[(Long, String)] = Seq(
      (1L, words(3)), (2L, words(5)), (3L, words(8)), (4L, words(20)))
    val b2: Seq[(Long, String)] = Seq(
      (5L, words(2)), (6L, words(9)), (7L, words(31)))
    // sequential twin: per bucket, arrival order (micro-batch order,
    // doc_id inside one micro-batch), cursor chopped into B-sized bins
    val expected = {
      var cur = Map.empty[Long, Long].withDefaultValue(0L)
      (b1.sortBy(_._1) ++ b2.sortBy(_._1)).map { case (id, t) =>
        val n = t.split(" ").length.toLong
        val bkt = n / wS
        val pos = cur(bkt); cur = cur.updated(bkt, pos + 1)
        id -> ((n, bkt, pos / bS, pos % bS))
      }.toMap
    }
    val input = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, Long, Long)]
    val (writer, handle) = EventTimeOps.bucketBatchIngest(
      input.toDF().toDF("doc_id", "text"), bS, wS)((out, _) =>
      out.collect().foreach(r => got.put(r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))))
    val q = writer.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.size == 7)
    expected.foreach { case (id, exp) =>
      assert(got.get(id) == exp, s"doc $id: got ${got.get(id)}, expected $exp")
    }
    // doc 5 landed in bucket 0's batch 0 slot 3 — the cross-micro-batch
    // fill — and doc 6 opened batch 1
    assert(got.get(5L) == ((2L, 0L, 0L, 3L)))
    assert(got.get(6L) == ((9L, 0L, 1L, 0L)))
    assert(handle.docsSeen == Map(0L -> 5L, 1L -> 2L))
    assert(handle.batchesProcessed == 2)
  }

  test("cardIngest: the streamed card is bit-equal to the persisted store's card on the same prefix") {
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val (writer, handle) = EventTimeOps.cardIngest(
      input.toDF().toDF("doc_id", "text"))
    val q = writer.start()
    try {
      input.addData(docs.take(20): _*); q.processAllAvailable()
      input.addData(docs.drop(20): _*); q.processAllAvailable()
    } finally q.stop()
    assert(handle.batchesProcessed == 2)
    val path = Files.createTempDirectory("graft-card-stream-").toString
    TextAnalysis.saveCardStore(
      Tables.documents(spark, "/root/testdata/sf0.001"), path)
    val want = TextAnalysis.cardFromStore(spark, path).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(handle.card.toMap == want)
  }

  test("chainedGateIngest: per-batch verdicts equal the sequentially applied batch kernels; bits past the dropping gate stay NULL") {
    import graft.operators.{Classifier, Dedup, TextAnalysis}
    import graft.sources.Tables
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, sha2}
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Tables.documents(spark, "/root/testdata/sf0.001")
    // artifacts: LM on the en slice (the d49 shape), a deliberately
    // non-separable classifier (doc_id parity) so margins split the
    // stream both ways, LSH + bloom history = two reference docs
    val lmPath = Files.createTempDirectory("graft-chain-lm-").toString
    TextAnalysis.saveBigramLm(ref.filter(col("lang") === "en"), lmPath)
    val clsPath = Files.createTempDirectory("graft-chain-cls-").toString
    Classifier.saveClassifier(ref, col("doc_id") % 2 === 0, clsPath)
    // the corpus marker vocabulary as stop list (the d56 registered
    // choice — the published English list is degenerate on this
    // synthetic vocab), so the rules gate genuinely splits the stream
    val stops = TextAnalysis.markers.head._2
    // texts that PASS the rules gate, so later stages are reachable:
    // the first two become bloom+LSH history, the next ten the stream
    val rulesOk = TextAnalysis.gopherRules(ref, stops).filter(col("keep"))
      .select(col("doc_id")).orderBy(col("doc_id"))
      .limit(12).collect().map(_.getLong(0))
    val okTexts = ref.filter(col("doc_id").isin(rulesOk: _*))
      .orderBy(col("doc_id")).select(col("text")).collect().map(_.getString(0))
    val histTexts = okTexts.take(2)
    val history = Seq((9000L, histTexts(0)), (9001L, histTexts(1)))
      .toDF("doc_id", "text")
    val lshPath = Files.createTempDirectory("graft-chain-lsh-").toString
    Dedup.saveLshIndex(history, lshPath, 64, 16)
    val thr = 99.0 // generous LM ceiling: perplexity judges, rarely drops
    // stream: corpus-like docs (unique within the stream), one rule
    // violator, one exact history twin
    val passTexts = okTexts.drop(2)
    val docs: Seq[(Long, String, Long)] =
      passTexts.zipWithIndex.map { case (t, i) => (i.toLong + 1, t, 600L + i) }.toSeq ++
        Seq((50L, "far too short", 660L), (51L, histTexts(0), 661L))
    // the sequentially-applied batch kernels — the chain's contract
    def expect(batch: Seq[(Long, String, Long)]): Map[Long, Seq[Option[Boolean]]] = {
      val b = batch.map(t => (t._1, t._2)).toDF("doc_id", "text")
      val rules = TextAnalysis.gopherRules(b, stops)
        .select(col("doc_id"), col("keep"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val s1 = batch.filter(t => rules(t._1))
      val histSet = history.select(sha2(col("text"), 256)).collect()
        .map(_.getString(0)).toSet
      val exact =
        if (s1.isEmpty) Map.empty[Long, Boolean]
        else s1.map(t => (t._1, t._2)).toDF("doc_id", "text")
          .select(col("doc_id"), sha2(col("text"), 256).as("d")).collect()
          .map(r => r.getLong(0) -> !histSet.contains(r.getString(1))).toMap
      val s2 = s1.filter(t => exact(t._1))
      def kernel(rows: Seq[(Long, String, Long)], f: DataFrame => DataFrame): Map[Long, Boolean] =
        if (rows.isEmpty) Map.empty
        else f(rows.map(t => (t._1, t._2)).toDF("doc_id", "text"))
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val cls = kernel(s2, d => Classifier.classifyIndexed(d, clsPath)
        .select(col("doc_id"), col("predicted")))
      val s3 = s2.filter(t => cls(t._1))
      val lm = kernel(s3, d => d.select(col("doc_id"))
        .join(TextAnalysis.bigramLmScoreIndexed(d, lmPath)
          .select(col("doc_id"), col("avg_nll")), Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          (col("avg_nll").isNull || col("avg_nll") <= thr).as("k")))
      val s4 = s3.filter(t => lm(t._1))
      val fz = kernel(s4, d => d.select(col("doc_id"))
        .join(Dedup.lshDedupIndexed(d, lshPath)
          .select(col("doc_id"), col("is_dup")), Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          (!org.apache.spark.sql.functions.coalesce(col("is_dup"),
            org.apache.spark.sql.functions.lit(false))).as("k")))
      batch.map { case (id, _, _) => id -> Seq(
        rules.get(id), exact.get(id),
        cls.get(id), lm.get(id), fz.get(id)) }.toMap
    }
    val input = MemoryStream[(Long, String, Long)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Option[Boolean]]]
    val keeps = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]
    val (writer, handle) = EventTimeOps.chainedGateIngest(
      input.toDF().toDF("doc_id", "text", "created_utc"), history,
      clsPath, lmPath, lshPath, thr, stopWords = stops)((out, _) =>
      out.collect().foreach { r =>
        got.put(r.getLong(0), (1 to 5).map(i =>
          if (r.isNullAt(i)) None else Some(r.getBoolean(i))))
        keeps.put(r.getLong(0), r.getBoolean(6))
      })
    val q = writer.start()
    val (b1, b2) = docs.splitAt(6)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.size == docs.size)
    (expect(b1) ++ expect(b2)).foreach { case (id, exp) =>
      assert(got.get(id) == exp, s"doc $id: got ${got.get(id)}, expected $exp")
      assert(keeps.get(id) == exp.last.getOrElse(false), s"doc $id keep")
    }
    // the fixture exercises every arm: a rules drop with ALL later bits
    // null, an exact-dup drop with cls/lm/fuzzy null, and at least one
    // doc that reached the fuzzy stage
    assert(got.get(50L) == Seq(Some(false), None, None, None, None))
    assert(got.get(51L).take(2) == Seq(Some(true), Some(false)) &&
      got.get(51L).drop(2).forall(_.isEmpty))
    assert(got.values().asScala.exists(_.last.isDefined),
      "no doc reached the fuzzy stage — fixture too lossy")
    assert(handle.batchesProcessed == 2 &&
      handle.destroyedBroadcasts.size == 4)
  }

  test("chain → curated store: gate survivors append into a shard store per batch; the store equals the sequential two-stage placement over exactly the kept docs") {
    import graft.operators.{Classifier, Dedup, Packing, TextAnalysis}
    import graft.sources.{IndexManifest, Tables}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Tables.documents(spark, "/root/testdata/sf0.001")
    val stops = TextAnalysis.markers.head._2
    val lmPath = Files.createTempDirectory("graft-csl-lm-").toString
    TextAnalysis.saveBigramLm(ref.filter(col("lang") === "en"), lmPath)
    val clsPath = Files.createTempDirectory("graft-csl-cls-").toString
    Classifier.saveClassifier(ref, col("doc_id") % 2 === 0, clsPath)
    val history = ref.orderBy(col("doc_id")).limit(2)
      .select(col("doc_id"), col("text"))
    val lshPath = Files.createTempDirectory("graft-csl-lsh-").toString
    Dedup.saveLshIndex(history, lshPath, 64, 16)
    // stream: rules-passing corpus texts (unique) + rule violators,
    // ids ascending across batches (the store's id-monotone contract)
    val okTexts = ref.filter(col("doc_id") >= 10)
      .join(TextAnalysis.gopherRules(ref, stops).filter(col("keep"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      .orderBy(col("doc_id")).limit(8).select(col("text"))
      .collect().map(_.getString(0))
    val docs: Seq[(Long, String, Long)] = okTexts.zipWithIndex.map {
      case (t, i) => (100L + i, t, 600L + i)
    }.toSeq ++ Seq((200L, "too short", 700L), (201L, "also short", 701L))
    val docById = docs.map(t => t._1 -> t._2).toMap
    // the composition under test: the chain's sink appends each batch's
    // KEPT docs into a curated shard store (initialized empty) — no new
    // machinery, the parts compose
    val storePath = Files.createTempDirectory("graft-csl-store-").toString
    Packing.saveTokenShards(ref.limit(0), storePath, 4096L)
    val keptOrder = scala.collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[(Long, String, Long)]
    val (w2, _) = EventTimeOps.chainedGateIngest(
      mem.toDF().toDF("doc_id", "text", "created_utc"), history,
      clsPath, lmPath, lshPath, 99.0, stopWords = stops) { (out, _) =>
      val ids = out.filter(col("keep")).select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      if (ids.nonEmpty) {
        keptOrder ++= ids
        import spark.implicits._
        Packing.appendTokenShards(
          ids.map(id => (id, docById(id))).toSeq.toDF("doc_id", "text"),
          storePath)
      }
    }
    val q = w2.start()
    val (b1, b2) = docs.splitAt(5)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(keptOrder.nonEmpty, "no doc survived the chain — fixture too lossy")
    // the store holds EXACTLY the chain's keeps, placed by the
    // documented sequential two-stage semantics (each batch's increment
    // prefix-summed among itself, offset by the frozen total)
    val store = spark.read.parquet(s"$storePath/shards")
      .select(col("doc_id"), col("n_tokens"), col("start_token"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(store.map(_._1).toSet == keptOrder.toSet)
    IndexManifest.require(storePath, "shards")
    // spans tile: sorted by start, contiguous from 0
    store.map(t => (t._3, t._2)).sortBy(_._1)
      .foldLeft(0L) { case (expect, (st, n)) =>
        assert(st == expect, s"gap/overlap at $st"); st + n }
    // replaying the same appends batch-by-batch in BATCH code yields the
    // identical placement (the streaming path adds nothing)
    val twinPath = Files.createTempDirectory("graft-csl-twin-").toString
    Packing.saveTokenShards(ref.limit(0), twinPath, 4096L)
    val batches = Seq(b1, b2).map(b => b.map(_._1).filter(keptOrder.contains).sorted)
    import spark.implicits._
    batches.filter(_.nonEmpty).foreach { ids =>
      Packing.appendTokenShards(
        ids.map(id => (id, docById(id))).toSeq.toDF("doc_id", "text"), twinPath)
    }
    val twin = spark.read.parquet(s"$twinPath/shards")
      .select(col("doc_id"), col("n_tokens"), col("start_token"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(store.toSet == twin)
  }

  test("fuzzyDedupGateIngest: per-batch verdicts equal the persisted index's batch probe; history twins dropped, fresh and short docs kept") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val common = (1 to 30).map(i => s"w$i").mkString(" ")
    val history = Seq(
      (1L, common), (2L, (1 to 30).map(i => s"a$i").mkString(" ")))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-lshgate-").toString
    Dedup.saveLshIndex(history, path, 64, 16)
    // stream: a twin of history doc 1, fresh content, and a short doc
    val docs: Seq[(Long, String)] = Seq(
      (10L, common), (11L, (1 to 30).map(i => s"z$i").mkString(" ")),
      (12L, "too short"), (13L, common + " tail tweak"))
    val expected = Dedup.lshDedupIndexed(docs.toDF("doc_id", "text"), path)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val input = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, (Boolean, Boolean)]
    val q = EventTimeOps.fuzzyDedupGateIngest(
      input.toDF().toDF("doc_id", "text"), path)(
      (out, _) => out.collect().foreach(r =>
        got.put(r.getLong(0),
          (!r.isNullAt(4) && r.getBoolean(4), r.getBoolean(5))))).start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // every stream doc gets a decision; shingled ones match the batch
    // kernel across batch boundaries, the short doc rides the null-keep
    assert(got.size == docs.size)
    expected.foreach { case (id, dup) =>
      val (gDup, gKeep) = got.get(id)
      assert(gDup == dup && gKeep == !dup, s"doc $id")
    }
    assert(got.get(10L) == ((true, false)), "history twin must be dropped")
    assert(got.get(11L) == ((false, true)), "fresh content must pass")
    assert(got.get(12L) == ((false, true)), "short docs are kept (null verdict)")
  }

  test("weightedReservoirIngest: reservoir equals the d70 kernel on the concatenated prefix after EVERY batch; replay merges idempotently") {
    import graft.operators.Sampling
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val k = 3
    val b1: Seq[(Long, Double)] = Seq((1L, 2.0), (2L, 7.0), (3L, 1.0))
    val b2: Seq[(Long, Double)] = Seq((4L, 9.0), (5L, 0.5))
    val b3: Seq[(Long, Double)] = Seq((6L, 4.0), (7L, 3.0), (8L, 6.0))
    def batchTwin(prefix: Seq[(Long, Double)]) =
      Sampling.weightedSample(prefix.toDF("doc_id", "w"), col("w"), k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toSeq
    val input = MemoryStream[(Long, Double)]
    val (writer, handle) = EventTimeOps.weightedReservoirIngest(
      input.toDF().toDF("doc_id", "w"), col("w"), k)
    val q = writer.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(handle.sample == batchTwin(b1), "after batch 1")
      input.addData(b2: _*); q.processAllAvailable()
      assert(handle.sample == batchTwin(b1 ++ b2), "after batch 2")
      input.addData(b3: _*); q.processAllAvailable()
      assert(handle.sample == batchTwin(b1 ++ b2 ++ b3), "after batch 3")
      assert(handle.batchesProcessed == 3)
      // at-least-once replay: the same rows re-offered change NOTHING
      // (priorities are pure functions of doc_id, dedup by id)
      input.addData(b2: _*); q.processAllAvailable()
      assert(handle.sample == batchTwin(b1 ++ b2 ++ b3), "after replay")
    } finally q.stop()
  }

  test("windowedTokenDrift: streamed window drift equals the d119 batch operator exactly") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val refTexts = Seq("spark table query", "query table table")
    val refCounts = Map("spark" -> 1L, "table" -> 3L, "query" -> 2L)
    val w600 = Seq("spark spark novel", "table query")
    val w660 = Seq("table table")
    val input = MemoryStream[(Long, String)]
    val name = s"drift${System.nanoTime()}"
    val q = EventTimeOps.windowedTokenDrift(spark,
        input.toDF().toDF("created_utc", "text"), refCounts)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      input.addData((600L, w600(0)), (620L, w600(1)), (660L, w660(0)))
      q.processAllAvailable()
      input.addData((100000L, "zzz")); q.processAllAvailable()
      input.addData((100100L, "zzz")); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .as[WindowDrift].collect().map(r => r.window_start -> r).toMap
    // batch twin: d119 over (ref slice = even ids, window slice = odd)
    def twin(winTexts: Seq[String]) = {
      val frame = (refTexts.zipWithIndex.map { case (t, i) => (i * 2L, t) } ++
        winTexts.zipWithIndex.map { case (t, i) => (i * 2L + 1L, t) })
        .toDF("doc_id", "text")
      TextAnalysis.tokenDrift(frame, col("doc_id") % 2 === 0).collect().head
    }
    for ((ws, texts) <- Seq(600L -> w600, 660L -> w660)) {
      val got = rows(ws)
      val want = twin(texts)
      assert(got.n_tokens == texts.map(_.split(" ").length).sum)
      assert(got.js_div == want.getAs[Double]("js_div"), s"w$ws js")
      assert(got.oov_mass_new == want.getAs[Double]("oov_mass_new"), s"w$ws oovN")
      assert(got.oov_mass_ref == want.getAs[Double]("oov_mass_ref"), s"w$ws oovR")
    }
    // the novel word must register as incoming-OOV mass in w600
    assert(rows(600L).oov_mass_new > 0.0)
  }

  test("stratifiedReservoirIngest: each stratum's reservoir equals the d70 kernel on that stratum's prefix slice") {
    import graft.operators.Sampling
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val k = 2
    val b1: Seq[(Long, Double, String)] = Seq((1L, 2.0, "en"), (2L, 7.0, "de"),
      (3L, 1.0, "en"), (4L, 3.0, "de"))
    val b2: Seq[(Long, Double, String)] = Seq((5L, 9.0, "en"), (6L, 0.5, "de"),
      (7L, 4.0, "en"))
    def twin(prefix: Seq[(Long, Double, String)], s: String) =
      Sampling.weightedSample(
        prefix.filter(_._3 == s).map(t => (t._1, t._2)).toDF("doc_id", "w"),
        col("w"), k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toSeq
    val input = MemoryStream[(Long, Double, String)]
    val (writer, handle) = EventTimeOps.stratifiedReservoirIngest(
      input.toDF().toDF("doc_id", "w", "stratum"), "stratum", col("w"), k)
    val q = writer.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(handle.sample == Map("en" -> twin(b1, "en"), "de" -> twin(b1, "de")))
      input.addData(b2: _*); q.processAllAvailable()
      val all = b1 ++ b2
      assert(handle.sample == Map("en" -> twin(all, "en"), "de" -> twin(all, "de")))
      // replay idempotence per stratum
      input.addData(b1: _*); q.processAllAvailable()
      assert(handle.sample == Map("en" -> twin(all, "en"), "de" -> twin(all, "de")))
      assert(handle.batchesProcessed == 3)
    } finally q.stop()
  }

  test("shardStoreIngest: batches land as snapshot versions == the batch appender's store; replays skip; pinned v1 stable") {
    import graft.operators.Packing
    import graft.sources.{IndexManifest, Tables}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, max}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val third = maxId / 3
    val init = docs.filter(col("doc_id") <= third)
    val b1 = docs.filter(col("doc_id") > third && col("doc_id") <= 2 * third)
    val b2 = docs.filter(col("doc_id") > 2 * third)
    def tuples(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    val path = Files.createTempDirectory("graft-shingest-").toString
    Packing.saveTokenShards(init, path, 4096L)
    // the batch-appender twin: same increments, same order
    val twin = Files.createTempDirectory("graft-shtwin-").toString
    Packing.saveTokenShards(init, twin, 4096L)
    Packing.appendTokenShards(b1, twin)
    Packing.appendTokenShards(b2, twin)
    val cols = Seq("doc_id", "n_tokens", "start_token", "text", "shard_id")
    def rows(p: String) = spark.read.parquet(s"$p/shards")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val v1Before = Packing.readShardStoreAt(spark, path, 1)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val summaries = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Boolean)]
    val input = MemoryStream[(Long, String)]
    val q = EventTimeOps.shardStoreIngest(
      input.toDF().toDF("doc_id", "text"), path) { (out, _) =>
      val r = out.collect()(0)
      summaries.add((r.getLong(0), r.getLong(1), r.getBoolean(3))); ()
    }.start()
    try {
      input.addData(tuples(b1): _*)
      q.processAllAvailable()
      input.addData(tuples(b2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // every batch became a snapshot version; the store equals the
    // batch-appender twin row for row
    assert(IndexManifest.versions(path) == Seq(1, 2, 3))
    assert(rows(path) == rows(twin))
    // the pinned v1 read is untouched by live ingest — the
    // dataloader-immutability contract while the store grows
    assert(Packing.readShardStoreAt(spark, path, 1)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet == v1Before)
    // summaries: versions advanced 2 -> 3, nothing replayed
    import scala.jdk.CollectionConverters._
    val s = summaries.iterator().asScala.toSeq.sortBy(_._1)
    assert(s.map(_._1) == Seq(2L, 3L) && s.forall(!_._3), s.toString)
    // an at-least-once REPLAY of the last epoch is detected via the
    // manifest-riding batchId and skipped — store byte-stable
    val before = rows(path)
    val replay = EventTimeOps.shardIngestBatch(
      b2.select(col("doc_id"), col("text")), path, 1L)
    assert(replay.collect()(0).getBoolean(3), "replay must be flagged")
    assert(rows(path) == before)
    assert(IndexManifest.versions(path) == Seq(1, 2, 3))
  }
}
