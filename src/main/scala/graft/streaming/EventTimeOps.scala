package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed per-author activity session (top-level for Encoder codegen). */
case class AuthorSession(author: String, start_utc: Long, end_utc: Long,
    n_events: Long)

/** Keyed session state (top-level for Encoder codegen). */
case class SessionState(start: Long, end: Long, n: Long)

/** Event-time streaming operators over the envelope stream — the
  * categories the reference lacks entirely (SURVEY.md §2.1: watermarks,
  * event-time windows, late data, keyed state). The reference is
  * arrival-order only with a per-batch sort; these give the engine real
  * event-time semantics on the same source.
  */
object EventTimeOps {

  /** Tumbling event-time window counts per subreddit with a watermark:
    * late events beyond `lateness` are dropped, final rows emit once the
    * watermark passes window end (append mode).
    */
  def windowedCounts(envelope: DataFrame, windowLen: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame =
    envelope
      .withColumn("event_time", timestamp_seconds(col("created_utc")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLen), col("subreddit"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event") === "rc", lit(1))).as("n_comments"))
      .select(col("window.start").as("window_start"), col("subreddit"),
        col("n"), col("n_comments"))

  /** Windowed DISTINCT-AUTHOR estimates with O(k) state per window —
    * the sketch-in-streaming-state composition: an exact windowed
    * `countDistinct` is unsupported in streaming precisely because its
    * state is unbounded (every distinct value per open window); the KMV
    * sketch ([[graft.functions.KmvSketch]]) is associative/commutative
    * with a bounded buffer, so it rides the normal watermarked
    * aggregation — partial-merged across micro-batches, state freed
    * when the watermark closes the window. Below k distinct authors the
    * buffer IS the distinct set, so small windows report exactly.
    * Author hashing uses the engine-portable 60-bit md5 family.
    */
  def windowedDistinctAuthors(envelope: DataFrame,
      windowLen: String = "1 minute", lateness: String = "2 minutes",
      k: Int = 64): DataFrame = {
    val kmv = udaf(new graft.functions.KmvSketch(k))
    envelope
      .withColumn("event_time", timestamp_seconds(col("created_utc")))
      .withWatermark("event_time", lateness)
      .withColumn("ah",
        conv(substring(md5(col("author")), 1, 15), 16, 10).cast("long"))
      .groupBy(window(col("event_time"), windowLen))
      .agg(count(lit(1)).as("n_events"), kmv(col("ah")).as("distinct_authors"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("distinct_authors"))
  }

  /** Stream-stream inner join: comments matched to submissions in the
    * same subreddit within ±`withinSeconds` of event time. Watermarks on
    * BOTH sides bound the join state — Spark can drop buffered rows once
    * the other side's watermark passes the time window, which is what
    * makes an unbounded two-stream join feasible at all.
    */
  def commentSubmissionJoin(comments: DataFrame, submissions: DataFrame,
      withinSeconds: Long = 300L, lateness: String = "2 minutes"): DataFrame = {
    val c = comments
      .withColumn("c_time", timestamp_seconds(col("created_utc")))
      .withWatermark("c_time", lateness)
      .select(col("id").as("c_id"), col("author").as("c_author"),
        col("subreddit").as("c_subreddit"), col("c_time"))
    val s = submissions
      .withColumn("s_time", timestamp_seconds(col("created_utc")))
      .withWatermark("s_time", lateness)
      .select(col("id").as("s_id"), col("subreddit").as("s_subreddit"),
        col("s_time"))
    c.join(s,
      col("c_subreddit") === col("s_subreddit") &&
        col("c_time") >= col("s_time") - expr(s"interval $withinSeconds seconds") &&
        col("c_time") <= col("s_time") + expr(s"interval $withinSeconds seconds"))
      .select(col("c_id"), col("s_id"), col("c_subreddit").as("subreddit"),
        col("c_author"))
  }

  /** Streaming deduplication with bounded state: drops repeated ids
    * (at-least-once upstream protection — e.g. a producer retrying a
    * segment write) while the watermark bounds how long each id is
    * remembered. `dropDuplicates` alone would grow state forever; the
    * within-watermark form frees an id's state once the event-time
    * watermark passes it — the only dedup shape that survives an
    * unbounded stream.
    */
  def dedupStream(envelope: DataFrame, lateness: String = "2 minutes"): DataFrame =
    envelope
      .withColumn("event_time", timestamp_seconds(col("created_utc")))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("id", "event")

  /** Gap-based sessionization per author via flatMapGroupsWithState:
    * a session closes when no event arrives within `gapSeconds` of
    * event time (tracked with an event-time timeout against the
    * watermark). Emits one row per closed session.
    */
  def sessionize(spark: SparkSession, envelope: DataFrame,
      gapSeconds: Long = 300L, lateness: String = "2 minutes"): Dataset[AuthorSession] = {
    import spark.implicits._
    envelope
      .withColumn("event_time", timestamp_seconds(col("created_utc")))
      .withWatermark("event_time", lateness)
      // the watermark column must flow into the stateful operator
      .select(col("author"), col("created_utc"), col("event_time"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, AuthorSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (author: String, events: Iterator[(String, Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(AuthorSession(author, s.start, s.end, s.n))
          } else {
            // Gap-merge the batch's events WITH the open session as one
            // interval timeline: sorting by start means an out-of-order
            // (non-late) event merges into the open session only when it
            // is within gapSeconds of the session's nearest edge — an
            // event more than a gap before the session start forms its
            // own (earlier) session instead of extending backward
            // unboundedly. All but the newest merged session are closed;
            // the newest stays open awaiting the watermark timeout.
            val items = (events.map(t => SessionState(t._2, t._2, 1)).toSeq ++
              state.getOption).sortBy(s => (s.start, s.end))
            val merged = items.foldLeft(List.empty[SessionState]) { (acc, x) =>
              acc match {
                case h :: rest if x.start - h.end <= gapSeconds =>
                  SessionState(h.start, math.max(h.end, x.end), h.n + x.n) :: rest
                case _ => x :: acc
              }
            }.reverse
            val open = merged.last
            state.update(open)
            state.setTimeoutTimestamp((open.end + gapSeconds) * 1000L)
            merged.init.map(s => AuthorSession(author, s.start, s.end, s.n)).iterator
          }
      }
  }
}
