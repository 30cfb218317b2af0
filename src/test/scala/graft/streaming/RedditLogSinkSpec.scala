package graft.streaming

import graft.SparkTestSession
import graft.sources.RedditLog
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ingest daemon: micro-batches → RedditLog.append with
  * watermark-based idempotence (RedditLogSink doc).
  */
class RedditLogSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def row(i: Long) = IngestRow(
    id = i, event = "rc", created_utc = 1000L + i, author = s"u$i",
    subreddit = "news", domain = null, over_18 = null, is_self = null,
    json = s"""{"n":$i}""")

  private def ids(dir: String): Seq[Long] = {
    import spark.implicits._
    spark.read.format("graft.sources.RedditLogSource").option("path", dir)
      .load().select("id").as[Long].collect().toSeq.sorted
  }

  test("appendBatch: watermark filter makes batch replay idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rsink-idem").toString
    val b1 = (1L to 10L).map(row).toDS().toDF()
    assert(RedditLogSink.appendBatch(b1, dir, 100L, 16, 60000L) == 10L)
    // exact replay (crash between append and checkpoint commit): the
    // log's watermark already covers every id — nothing appends
    assert(RedditLogSink.appendBatch(b1, dir, 100L, 16, 60000L) == 0L)
    // partial overlap: only the genuinely-new tail lands
    val b2 = (5L to 15L).map(row).toDS().toDF()
    assert(RedditLogSink.appendBatch(b2, dir, 100L, 16, 60000L) == 5L)
    assert(ids(dir) == (1L to 15L))
    assert(RedditLog.maxId(dir) == 15L)
  }

  test("appendBatch: a batch far above targetRows lands as bounded chunks, intact across compaction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rsink-chunk").toString
    // 97 rows, chunk bound 10 → 10 append calls (9 full + 1 tail), each
    // a monotone segment: driver buffering never exceeds targetRows.
    // maxSmall high so the chunk structure is observable pre-compaction.
    val big = (1L to 97L).map(row).toDS().toDF()
    assert(RedditLogSink.appendBatch(big, dir, 10L, 1000, 60000L) == 97L)
    val segs = RedditLog.listSegments(dir)
    assert(segs.size == 10, s"expected 10 chunked appends, got ${segs.size}")
    assert(segs.map(s => s.lastId - s.firstId + 1).max <= 10L)
    assert(ids(dir) == (1L to 97L))
    // replay the same oversized batch: watermark covers it, zero appends
    assert(RedditLogSink.appendBatch(big, dir, 10L, 1000, 60000L) == 0L)
    // maintenance over the chunked segments keeps the data intact
    RedditLog.compact(dir, targetRows = 50L)
    assert(RedditLog.listSegments(dir).size < 10)
    assert(ids(dir) == (1L to 97L))
    assert(RedditLog.maxId(dir) == 97L)
  }

  test("appendStream: a live feed lands in the log with maintenance firing on the writer path") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("rsink-live").toString
    val ckpt = Files.createTempDirectory("rsink-ckpt").toString
    val mem = MemoryStream[IngestRow]
    // aggressive policy so this tiny feed exercises compaction too:
    // every 10-row append is a small segment, merge at 3
    val q = RedditLogSink.appendStream(mem.toDF(), dir, ckpt,
      triggerMillis = 50L, targetRows = 50L, maxSmall = 3)
    try {
      (0 until 6).foreach { k =>
        mem.addData(((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row))
        q.processAllAvailable()
      }
      assert(ids(dir) == (1L to 60L))
      assert(RedditLog.maxId(dir) == 60L)
      // the size-tiered policy merged: fewer live segments than appends
      assert(RedditLog.listSegments(dir).size < 6,
        s"no compaction fired: ${RedditLog.listSegments(dir).size} segments after 6 appends")
    } finally q.stop()
  }

  test("appendStreamGated: only LM-kept events reach the log; decisions equal the batch kernel's") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en")
    val lmPath = Files.createTempDirectory("rsink-lm").toString
    TextAnalysis.saveBigramLm(ref, lmPath)
    val refTexts = ref.select(col("text")).limit(3).collect().map(_.getString(0))
    // 3 model-like bodies (kept), 2 gibberish (dropped), 1 bigram-less
    // body and 1 row with no body field at all (null score → kept)
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val bodies: Seq[(Long, Option[String])] =
      refTexts.zipWithIndex.map { case (t, i) => (i + 1L, Some(t)) }.toSeq ++
        Seq((4L, Some("zzqa zzqb zzqc zzqd zzqe")), (5L, Some("zzqf zzqg zzqh")),
          (6L, Some("solo")), (7L, None))
    def env(id: Long, body: Option[String]) = IngestRow(
      id = id, event = "rc", created_utc = 1000L + id, author = s"u$id",
      subreddit = "news", domain = null, over_18 = null, is_self = null,
      json = body.map(b => s"""{"body":"${esc(b)}"}""").getOrElse("{}"))
    // the gate's contract: keep iff the BATCH KERNEL scores <= thr or null
    val consts = spark.read.parquet(s"$lmPath/consts").head().getDecimal(1)
    val scores = TextAnalysis.scoreWithBigramModel(
      bodies.map { case (id, b) => (id, b.getOrElse("")) }.toDF("doc_id", "text"),
      spark.read.parquet(s"$lmPath/model"), spark.read.parquet(s"$lmPath/ctx"), consts)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val scored = Seq(1L, 2L, 3L, 4L, 5L).map(scores)
    val thr = (Seq(1L, 2L, 3L).map(scores).max + Seq(4L, 5L).map(scores).min) / 2
    assert(Seq(1L, 2L, 3L).map(scores).max < Seq(4L, 5L).map(scores).min,
      s"model fails to separate: $scored")
    val dir = Files.createTempDirectory("rsink-gated").toString
    val ckpt = Files.createTempDirectory("rsink-gck").toString
    val mem = MemoryStream[IngestRow]
    val q = RedditLogSink.appendStreamGated(mem.toDF(), dir, ckpt,
      lmPath, thr, triggerMillis = 50L, targetRows = 50L)
    try {
      mem.addData(bodies.take(4).map { case (id, b) => env(id, b) })
      q.processAllAvailable()
      mem.addData(bodies.drop(4).map { case (id, b) => env(id, b) })
      q.processAllAvailable()
    } finally q.stop()
    // gibberish ids 4 and 5 never reached disk; short/absent bodies kept
    assert(ids(dir) == Seq(1L, 2L, 3L, 6L, 7L))
    // the log's id monotonicity survives the gaps the gate leaves
    assert(RedditLog.maxId(dir) == 7L)
  }
}

/** Envelope row for the MemoryStream encoder (RedditLog.schema shape). */
case class IngestRow(id: Long, event: String, created_utc: Long,
    author: String, subreddit: String, domain: String, over_18: String,
    is_self: String, json: String)
