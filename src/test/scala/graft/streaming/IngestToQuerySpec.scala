package graft.streaming

import graft.SparkTestSession
import graft.sources.RedditLog
import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** The full produce/compact/consume triangle in ONE test: a live feed
  * ingested through [[RedditLogSink]] (with the size-tiered compaction
  * policy firing and a ZERO GC grace, so only the reader leases protect
  * in-flight scans), served back by [[SseServer]] — catch-up over the
  * churning segment log, then the live hand-off, each event exactly
  * once, in order.
  */
class IngestToQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def row(i: Long) = IngestRow(
    id = i, event = "rc", created_utc = 1000L + i, author = s"u$i",
    subreddit = "news", domain = null, over_18 = null, is_self = null,
    json = s"""{"n":$i}""")

  private def readFrames(port: Int, path: String, n: Int,
      timeoutMs: Long = 60000): Seq[String] = {
    val conn = new URL(s"http://localhost:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setReadTimeout(timeoutMs.toInt)
    val frames = ArrayBuffer[String]()
    val r = new BufferedReader(
      new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
    try {
      val cur = new StringBuilder
      val deadline = System.currentTimeMillis() + timeoutMs
      while (frames.size < n && System.currentTimeMillis() < deadline) {
        val line = r.readLine()
        if (line == null) return frames.toSeq
        if (line.isEmpty) {
          if (cur.nonEmpty && !cur.startsWith(":")) frames += cur.toString
          cur.clear()
        } else cur.append(line).append('\n')
      }
      frames.toSeq
    } finally { r.close(); conn.disconnect() }
  }

  test("the sink is event-agnostic: an rr feed ingests and serves via type=rr") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rcDir = Files.createTempDirectory("tri-rr-rc").toString
    val rsDir = Files.createTempDirectory("tri-rr-rs").toString
    val rrDir = Files.createTempDirectory("tri-rr-rr").toString
    val ckpt = Files.createTempDirectory("tri-rr-ckpt").toString
    val mem = MemoryStream[IngestRow]
    val ingest = RedditLogSink.appendStream(
      mem.toDF().withColumn("event", org.apache.spark.sql.functions.lit("rr")),
      rrDir, ckpt, triggerMillis = 50L)
    var server: SseServer = null
    try {
      mem.addData((1L to 5L).map(row))
      ingest.processAllAvailable()
      server = new SseServer(spark, rcDir, rsDir, rrPath = rrDir,
        keepAliveMillis = 60000L, triggerMillis = 100L).start()
      val frames = readFrames(server.boundPort,
        "/?type=rr&subreddit_backfill=100", 5)
      val ids = frames.filter(_.contains("event: rr"))
        .map(_.linesIterator.next().stripPrefix("id: ").toLong)
      assert(ids == (1L to 5L), frames.mkString("|"))
    } finally {
      if (server != null) server.stop()
      ingest.stop()
    }
  }

  test("ingest -> compact -> serve: catch-up over a churning log, then live hand-off") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rcDir = Files.createTempDirectory("triangle-rc").toString
    val rsDir = Files.createTempDirectory("triangle-rs").toString
    val ckpt = Files.createTempDirectory("triangle-ckpt").toString
    val mem = MemoryStream[IngestRow]
    // zero grace: replaced segments are GC-eligible the moment the
    // manifest flips — in-flight readers survive on leases alone
    val ingest = RedditLogSink.appendStream(mem.toDF(), rcDir, ckpt,
      triggerMillis = 50L, targetRows = 40L, maxSmall = 2, graceMillis = 0L)
    var server: SseServer = null
    try {
      // produce 50 events in 5 appends; the policy fires mid-feed
      (0 until 5).foreach { k =>
        mem.addData(((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row))
        ingest.processAllAvailable()
      }
      assert(RedditLog.maxId(rcDir) == 50L)
      assert(RedditLog.listSegments(rcDir).size < 5,
        "compaction never fired — the triangle isn't exercising churn")

      server = new SseServer(spark, rcDir, rsDir,
        keepAliveMillis = 60000L, triggerMillis = 100L).start()
      val t = new Thread(() => {
        val deadline = System.currentTimeMillis() + 30000
        while (server.readyConnections < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        // live tail lands WHILE the client is connected; another
        // compaction pass runs over the grown log as it streams
        mem.addData((51L to 60L).map(row))
        ingest.processAllAvailable()
      })
      t.start()
      val frames = readFrames(server.boundPort,
        "/?type=comments&comment_backfill=1000", 60)
      t.join()
      val ids = frames.filter(_.contains("event: rc"))
        .map(_.linesIterator.next().stripPrefix("id: ").toLong)
      // exactly once, in order, across catch-up (over compacted
      // segments), the hand-off boundary, and the live tail
      assert(ids == (1L to 60L), s"got ${ids.size} ids: ${ids.take(70)}")
    } finally {
      if (server != null) server.stop()
      ingest.stop()
    }
  }
}
