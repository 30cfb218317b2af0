package graft.sources

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming tests for the DSv2 log source (SURVEY.md §5.4):
  * offsets, backfill/start_id resumption, gap-skip, admission control.
  */
class RedditLogSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def row(id: Long, event: String = "rc"): Map[String, Any] = Map(
    "id" -> id, "event" -> event, "created_utc" -> (1000L + id),
    "author" -> s"u$id", "subreddit" -> "r", "domain" -> null,
    "over_18" -> null, "is_self" -> null, "json" -> s"""{"id":$id}""")

  private def tempLog(): String =
    Files.createTempDirectory("redditlog").toString

  /** Run the stream to completion over the current log contents. */
  private def drain(dir: String, extraOpts: Map[String, String] = Map.empty,
      queryName: String = s"q${System.nanoTime()}"): DataFrame = {
    val reader = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir)
    val q = extraOpts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName)
  }

  test("backfill replays the last N ids; gaps inside segments are skipped") {
    val dir = tempLog()
    // ids 1..5 and 8..10 — 6,7 missing (S3 gap)
    RedditLog.writeSegment(dir, (1L to 5L).map(row(_)))
    RedditLog.writeSegment(dir, (8L to 10L).map(row(_)))
    val got = drain(dir, Map("backfill" -> "100"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L, 10L))
  }

  test("start_id: first emitted id is exactly start_id") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, (1L to 10L).map(row(_)))
    val got = drain(dir, Map("start_id" -> "7"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(7L, 8L, 9L, 10L))
  }

  test("no options → live tail only (nothing historical emitted)") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, (1L to 10L).map(row(_)))
    assert(drain(dir).isEmpty)
  }

  test("backfill and start_id together are rejected (V1)") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, Seq(row(1)))
    val e = intercept[Exception] {
      drain(dir, Map("backfill" -> "5", "start_id" -> "3"))
    }
    assert(e.getMessage.contains("mutually exclusive")
      || e.getCause != null && e.getCause.getMessage.contains("mutually exclusive"))
  }

  test("non-integer option is rejected (V2)") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, Seq(row(1)))
    val e = intercept[Exception] { drain(dir, Map("backfill" -> "xyz")) }
    assert(e.getMessage.contains("must be an integer")
      || e.getCause != null && e.getCause.getMessage.contains("must be an integer"))
  }

  test("admission control: max_per_trigger splits the replay into micro-batches") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, (1L to 30L).map(row(_)))
    val name = "adm_test"
    val q = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100").option("max_per_trigger", "10")
      .load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).count() == 30)
    // initial offset -1, 10-id admission windows: (-1,9],(9,19],(19,29],(29,30]
    assert(q.recentProgress.count(_.numInputRows > 0) == 4)
  }

  test("stream picks up newly appended segments across triggers") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, (1L to 3L).map(row(_)))
    val name = "append_test"
    val q = spark.readStream.format("graft.sources.RedditLogSource")
      .option("path", dir).option("backfill", "100")
      .load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      spark.streams.get(q.id)
      eventually(spark.table(name).count() == 3, "initial segment")
      RedditLog.writeSegment(dir, (4L to 6L).map(row(_)))
      eventually(spark.table(name).count() == 6, "appended segment")
    } finally q.stop()
  }

  test("checkpoint recovery: restart resumes from committed offsets, no dupes, no gaps") {
    val dir = tempLog()
    val ckpt = Files.createTempDirectory("ckpt").toString
    val out = Files.createTempDirectory("ckpt-out").toString
    RedditLog.writeSegment(dir, (1L to 5L).map(row(_)))
    def drainWithCkpt(): Unit = {
      // memory sink can't recover from a checkpoint; the file sink can
      val q = spark.readStream.format("graft.sources.RedditLogSource")
        .option("path", dir).option("backfill", "100").load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainWithCkpt()
    assert(spark.read.parquet(out).count() == 5)
    // restart against the same checkpoint after new data arrives: the
    // second run must deserialize the committed offset and deliver ONLY
    // ids 6..8 (no replay of 1..5, no gap)
    RedditLog.writeSegment(dir, (6L to 8L).map(row(_)))
    drainWithCkpt()
    val all = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(all.toSeq == (1L to 8L))
  }

  test("batch read path sees the whole log") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, (1L to 4L).map(row(_)))
    RedditLog.writeSegment(dir, (5L to 9L).map(row(_, "rs")))
    val df = spark.read.format("graft.sources.RedditLogSource")
      .option("path", dir).load()
    assert(df.count() == 9)
    assert(df.schema == RedditLog.schema)
  }

  test("batch id filters push down to segment pruning (incl. OR of ranges)") {
    val dir = tempLog()
    RedditLog.writeSegment(dir, (1L to 100L).map(row(_)))
    RedditLog.writeSegment(dir, (101L to 200L).map(row(_)))
    RedditLog.writeSegment(dir, (201L to 300L).map(row(_)))
    def scan = spark.read.format("graft.sources.RedditLogSource")
      .option("path", dir).load()
    def nParts(df: org.apache.spark.sql.DataFrame): Int =
      df.rdd.getNumPartitions

    val high = scan.filter($"id" > 250L)
    assert(high.count() == 50)
    assert(nParts(high) == 1, "only the last segment should be planned")

    // the catch-up shape: OR of two per-type ranges → pruned to the union
    val disjunct = scan.filter(
      ($"event" === "rc" && $"id" >= 290L) || ($"event" === "rs" && $"id" >= 295L))
    assert(disjunct.count() == 11)
    assert(nParts(disjunct) == 1)

    // an un-analyzable predicate must not prune anything
    val residual = scan.filter(org.apache.spark.sql.functions.length($"author") > 0)
    assert(residual.count() == 300)
    assert(nParts(residual) == 3)
  }

  private def eventually(cond: => Boolean, hint: String, timeoutMs: Long = 20000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      if (System.currentTimeMillis() > deadline) fail(s"timeout waiting for: $hint")
      Thread.sleep(100)
    }
  }
}
