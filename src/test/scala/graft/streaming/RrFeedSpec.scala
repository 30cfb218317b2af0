package graft.streaming

import graft.SparkTestSession
import graft.sources.RedditLog
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Wire tests for the rr (subreddit-creation) third log — the event type
  * the reference documents but never implemented
  * (/root/reference/README.md:42-46); here a standalone mask with fully
  * symmetric resume params (SseServer "rr" scaladoc).
  */
class RrFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rrRow(i: Long, sub: String = "newsub"): Map[String, Any] = Map(
    "id" -> i, "event" -> "rr", "created_utc" -> (1000L + i),
    "author" -> "creator", "subreddit" -> sub, "domain" -> null,
    "over_18" -> null, "is_self" -> null, "json" -> s"""{"name":"$sub","n":$i}""")

  /** Raw-HTTP SSE frame reader (same shape as SseServerEdgeSpec's). */
  private def readFrames(port: Int, path: String, n: Int,
      timeoutMs: Long = 60000,
      headers: Map[String, String] = Map.empty): Seq[String] = {
    val conn = new URL(s"http://localhost:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setReadTimeout(timeoutMs.toInt)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    val in = conn.getInputStream
    val frames = ArrayBuffer[String]()
    try {
      val buf = new Array[Byte](8192)
      val acc = new StringBuilder
      val deadline = System.currentTimeMillis() + timeoutMs
      while (frames.size < n && System.currentTimeMillis() < deadline) {
        val r = in.read(buf)
        if (r < 0) return frames.toSeq
        acc.append(new String(buf, 0, r, StandardCharsets.UTF_8))
        var idx = acc.indexOf("\n\n")
        while (idx >= 0 && frames.size < n) {
          val f = acc.substring(0, idx + 1)
          if (!f.startsWith(":")) frames += f
          acc.delete(0, idx + 2)
          idx = acc.indexOf("\n\n")
        }
      }
      frames.toSeq
    } catch {
      case _: java.net.SocketTimeoutException => frames.toSeq
    } finally { in.close(); conn.disconnect() }
  }

  test("rr live feed: type=subreddits streams only the third log, rc/rs never listed") {
    val rcDir = Files.createTempDirectory("rr-rc").toString
    val rsDir = Files.createTempDirectory("rr-rs").toString
    val rrDir = Files.createTempDirectory("rr-rr").toString
    RedditLog.writeSegment(rrDir, Seq(rrRow(1)))
    val beforeRc = RedditLog.metadataReads(rcDir)
    val beforeRs = RedditLog.metadataReads(rsDir)
    val server = new SseServer(spark, rcDir, rsDir, rrPath = rrDir,
      keepAliveMillis = 60000L, triggerMillis = 100L).start()
    try {
      val t = new Thread(() => {
        val deadline = System.currentTimeMillis() + 30000
        while (server.readyConnections < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        // one matches the whitelist, one does not — F2/F3 apply to rr
        RedditLog.writeSegment(rrDir, Seq(rrRow(2, "cool"), rrRow(3, "other")))
      })
      t.start()
      val frames = readFrames(server.boundPort, "/?type=subreddits&subreddit=cool", 1)
      t.join()
      assert(frames.exists(_.startsWith("id: 2\nevent: rr")), frames.mkString("|"))
      // id 1 predates connect (live-only: no catch-up); id 3 fails the
      // whitelist — neither may ever arrive
      assert(!frames.exists(_.startsWith("id: 1\n")))
      assert(!frames.exists(_.startsWith("id: 3\n")))
      // the rr fleet runs exactly one shared query and touches neither
      // default log
      assert(server.activeQueries.map(_.name.takeWhile(_ != '.')) ==
        Seq("graft-sse-feed-rr"))
      assert(RedditLog.metadataReads(rcDir) == beforeRc, "rc log listed by an rr fleet")
      assert(RedditLog.metadataReads(rsDir) == beforeRs, "rs log listed by an rr fleet")
    } finally server.stop()
  }

  test("rr events bump neither tcs nor tss; keepalive payload stays reference-exact") {
    val rcDir = Files.createTempDirectory("rrk-rc").toString
    val rsDir = Files.createTempDirectory("rrk-rs").toString
    val rrDir = Files.createTempDirectory("rrk-rr").toString
    RedditLog.writeSegment(rrDir, Seq(rrRow(1)))
    val server = new SseServer(spark, rcDir, rsDir, rrPath = rrDir,
      keepAliveMillis = 400L, triggerMillis = 100L).start()
    try {
      val t = new Thread(() => {
        val deadline = System.currentTimeMillis() + 30000
        while (server.readyConnections < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        RedditLog.writeSegment(rrDir, Seq(rrRow(2), rrRow(3)))
      })
      t.start()
      // enough reads to see both rr data frames and then a keepalive
      val frames = readFrames(server.boundPort, "/?type=rr", 5, timeoutMs = 30000)
      t.join()
      assert(frames.exists(_.startsWith("id: 2\nevent: rr")), frames.mkString("|"))
      val keepalives = frames.filter(_.contains("event: keepalive"))
      assert(keepalives.nonEmpty, "no keepalive within the window")
      // the K1 payload schema is {"tcs","tss","tbs"} and rr data counts
      // toward neither event counter (A1 counters are rc/rs-only)
      val last = keepalives.last
      assert(last.contains(""""tcs": 0""") && last.contains(""""tss": 0"""), last)
      assert(last.contains(""""tbs": """), last)
    } finally server.stop()
  }

  test("counterParity: an rr connection's taps count rc AND rs (the mask reads neither)") {
    val rcDir = Files.createTempDirectory("rrp-rc").toString
    val rsDir = Files.createTempDirectory("rrp-rs").toString
    val rrDir = Files.createTempDirectory("rrp-rr").toString
    RedditLog.writeSegment(rrDir, Seq(rrRow(1)))
    val server = new SseServer(spark, rcDir, rsDir, rrPath = rrDir,
      keepAliveMillis = 1500L, triggerMillis = 100L, counterParity = true).start()
    try {
      val t = new Thread(() => {
        val deadline = System.currentTimeMillis() + 30000
        while (server.readyConnections < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        // live rc + rs events: the reference's always-scan loop counts
        // both regardless of type; the rr mask reads neither log, so
        // BOTH taps must stand in — and an rr event itself counts nowhere
        RedditLog.writeSegment(rcDir, Seq(Map(
          "id" -> 1L, "event" -> "rc", "created_utc" -> 2000L,
          "author" -> "u", "subreddit" -> "news", "domain" -> null,
          "over_18" -> null, "is_self" -> null, "json" -> "{}")))
        RedditLog.writeSegment(rsDir, Seq(Map(
          "id" -> 1L, "event" -> "rs", "created_utc" -> 2001L,
          "author" -> "u", "subreddit" -> "news", "domain" -> "ex.com",
          "over_18" -> "false", "is_self" -> "true", "json" -> "{}")))
        RedditLog.writeSegment(rrDir, Seq(rrRow(2)))
      })
      t.start()
      val frames = readFrames(server.boundPort, "/?type=subreddits", 10, timeoutMs = 30000)
      t.join()
      // rc/rs frames never leak into the rr feed...
      assert(frames.forall(f => !f.contains("event: rc") && !f.contains("event: rs")),
        frames.mkString("|"))
      // ...the rr data frame arrives...
      assert(frames.exists(_.startsWith("id: 2\nevent: rr")), frames.mkString("|"))
      // ...and a keepalive reports the tapped rc + rs counts, with the
      // rr event itself counted by neither
      assert(frames.exists(f => f.contains("keepalive")
        && f.contains("\"tcs\": 1") && f.contains("\"tss\": 1")),
        frames.mkString("|"))
      assert(server.activeQueries.map(_.name.takeWhile(_ != '.')).toSet ==
        Set("graft-sse-feed-rr", "graft-sse-tap-rc", "graft-sse-tap-rs"))
    } finally server.stop()
  }

  test("rr resume: subreddit_backfill serves history, then seamless live hand-off") {
    val rcDir = Files.createTempDirectory("rrb-rc").toString
    val rsDir = Files.createTempDirectory("rrb-rs").toString
    val rrDir = Files.createTempDirectory("rrb-rr").toString
    RedditLog.writeSegment(rrDir, (1L to 5L).map(i => rrRow(i)))
    val server = new SseServer(spark, rcDir, rsDir, rrPath = rrDir,
      keepAliveMillis = 60000L, triggerMillis = 100L).start()
    try {
      val t = new Thread(() => {
        val deadline = System.currentTimeMillis() + 30000
        while (server.readyConnections < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        RedditLog.writeSegment(rrDir, Seq(rrRow(6)))
      })
      t.start()
      val frames = readFrames(server.boundPort, "/?type=rr&subreddit_backfill=3", 4)
      t.join()
      val ids = frames.filter(_.contains("event: rr"))
        .map(_.linesIterator.next().stripPrefix("id: ").toLong)
      // backfill=3 → last 3 historical ids, then the live append — each
      // exactly once, in order (the two-threshold hand-off)
      assert(ids == Seq(3L, 4L, 5L, 6L), frames.mkString("|"))
    } finally server.stop()
  }

  test("rr resume: Last-Event-ID acts as subreddit_start_id on a type=rr connection") {
    val rcDir = Files.createTempDirectory("rrl-rc").toString
    val rsDir = Files.createTempDirectory("rrl-rs").toString
    val rrDir = Files.createTempDirectory("rrl-rr").toString
    RedditLog.writeSegment(rrDir, (1L to 4L).map(i => rrRow(i)))
    val server = new SseServer(spark, rcDir, rsDir, rrPath = rrDir,
      keepAliveMillis = 60000L, triggerMillis = 100L).start()
    try {
      val frames = readFrames(server.boundPort, "/?type=rr", 2,
        headers = Map("Last-Event-ID" -> "2"))
      val ids = frames.filter(_.contains("event: rr"))
        .map(_.linesIterator.next().stripPrefix("id: ").toLong)
      assert(ids == Seq(3L, 4L), frames.mkString("|"))
    } finally server.stop()
  }

  test("V1: subreddit_backfill with subreddit_start_id → HTTP 400") {
    val rcDir = Files.createTempDirectory("rrv-rc").toString
    val rsDir = Files.createTempDirectory("rrv-rs").toString
    val server = new SseServer(spark, rcDir, rsDir,
      keepAliveMillis = 60000L, triggerMillis = 100L).start()
    try {
      val conn = new URL(s"http://localhost:${server.boundPort}" +
        "/?type=rr&subreddit_backfill=5&subreddit_start_id=3")
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setReadTimeout(15000)
      assert(conn.getResponseCode == 400)
      val body = new String(conn.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(body.contains("mutually exclusive"), body)
      conn.disconnect()
    } finally server.stop()
  }

  test("type=subreddits without a configured rr log → HTTP 400") {
    val rcDir = Files.createTempDirectory("rr400-rc").toString
    val rsDir = Files.createTempDirectory("rr400-rs").toString
    val server = new SseServer(spark, rcDir, rsDir,
      keepAliveMillis = 60000L, triggerMillis = 100L).start()
    try {
      val conn = new URL(s"http://localhost:${server.boundPort}/?type=subreddits")
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setReadTimeout(15000)
      assert(conn.getResponseCode == 400)
      val body = new String(conn.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(body.contains("subreddits feed not configured"), body)
      conn.disconnect()
    } finally server.stop()
  }
}
