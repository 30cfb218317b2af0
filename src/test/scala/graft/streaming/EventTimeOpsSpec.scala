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
}
