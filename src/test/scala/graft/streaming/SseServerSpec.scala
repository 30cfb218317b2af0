package graft.streaming

import graft.SparkTestSession
import graft.sources.RedditLog
import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Wire-level SSE tests (SURVEY.md §5.5): raw HTTP asserting frame bytes,
  * catch-up/live hand-off, keepalive cadence + counters, 400 validation.
  */
class SseServerSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark

  private var rcDir: String = _
  private var rsDir: String = _
  private var server: SseServer = _

  override def beforeAll(): Unit = {
    rcDir = Files.createTempDirectory("sse-rc").toString
    rsDir = Files.createTempDirectory("sse-rs").toString
    RedditLog.writeSegment(rcDir, (1L to 5L).map(i => Map(
      "id" -> i, "event" -> "rc", "created_utc" -> (1000L + i),
      "author" -> s"u$i", "subreddit" -> (if (i % 2 == 0) "news" else "funny"),
      "domain" -> null, "over_18" -> null, "is_self" -> null,
      "json" -> s"""{"author":"u$i","body":"b$i"}""")))
    RedditLog.writeSegment(rsDir, (1L to 3L).map(i => Map(
      "id" -> i, "event" -> "rs", "created_utc" -> (2000L + i),
      "author" -> s"u$i", "subreddit" -> "news", "domain" -> "ex.com",
      "over_18" -> "False", "is_self" -> "true",
      "json" -> s"""{"title":"t$i"}""")))
    server = new SseServer(spark, rcDir, rsDir,
      keepAliveMillis = 1500L, triggerMillis = 100L).start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  /** Read SSE frames (blocks of lines up to a blank line) until `n` frames
    * or timeout; returns raw frame texts.
    */
  private def readFrames(path: String, n: Int, timeoutMs: Long = 30000): Seq[String] = {
    val url = new URL(s"http://localhost:${server.boundPort}$path")
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setReadTimeout(timeoutMs.toInt)
    val frames = ArrayBuffer[String]()
    val r = new BufferedReader(new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
    try {
      val cur = new StringBuilder
      val deadline = System.currentTimeMillis() + timeoutMs
      while (frames.size < n && System.currentTimeMillis() < deadline) {
        val line = r.readLine()
        if (line == null) return frames.toSeq
        if (line.isEmpty) {
          // liveness-probe comment frames (":"-prefixed) are
          // protocol-invisible — skip them like a real SSE client
          if (cur.nonEmpty && !cur.startsWith(":")) frames += cur.toString
          cur.clear()
        } else cur.append(line).append('\n')
      }
      frames.toSeq
    } finally { r.close(); conn.disconnect() }
  }

  test("backfill catch-up: exact SSE frame bytes in emit order") {
    val frames = readFrames("/?comment_backfill=100&type=comments", 5)
    assert(frames.size == 5)
    assert(frames.head ==
      "id: 1\nevent: rc\ndata: {\"author\":\"u1\",\"body\":\"b1\"}\n")
    assert(frames.map(_.linesIterator.next()) ==
      Seq("id: 1", "id: 2", "id: 3", "id: 4", "id: 5"))
  }

  test("merged feed ordered by created_utc with rc before rs") {
    val frames = readFrames("/?comment_backfill=100&submission_backfill=100", 8)
    val events = frames.map(_.linesIterator.drop(1).next())
    assert(events == Seq.fill(5)("event: rc") ++ Seq.fill(3)("event: rs"))
  }

  test("projection: filter param rewrites the payload") {
    val frames = readFrames("/?comment_backfill=100&type=comments&filter=body", 1)
    assert(frames.head.endsWith("data: {\"body\":\"b1\"}\n"))
  }

  test("whitelist + start_id") {
    val frames = readFrames("/?comment_start_id=4&type=comments&subreddit=news", 1)
    assert(frames.head.startsWith("id: 4\nevent: rc"))
  }

  test("keepalive: own id sequence, counters payload (A1 quirk: counts pre-type-gate)") {
    // type=submissions but the author whitelist passes comments too → tcs
    // counts them even though no rc frame is emitted
    val frames = readFrames("/?comment_backfill=100&submission_backfill=100&type=submissions", 5)
    val (data, keeps) = frames.partition(_.contains("event: rs"))
    assert(data.size == 3)
    // keepalive ids are an independent sequence from 1, PREFIXED with
    // "k" so a Last-Event-ID reconnect can never mistake one for a data
    // id (ADVICE r2: the unprefixed form replayed the whole log)
    val k = keeps.head
    assert(k.startsWith("id: k1\nevent: keepalive\ndata: "))
    assert(k.contains("\"tcs\": 5") && k.contains("\"tss\": 3"))
    assert("\"tbs\": (\\d+)".r.findFirstMatchIn(k).exists(_.group(1).toLong > 0))
  }

  test("invalid params → HTTP 400 with JSON error") {
    val url = new URL(s"http://localhost:${server.boundPort}/?comment_backfill=5&comment_start_id=3")
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    assert(conn.getResponseCode == 400)
    val body = new String(conn.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(body.contains("error"))
    conn.disconnect()
  }

  /** Appender gates. A fixed pre-append sleep flakes under load: an
    * append landing before the connection's boundary read is
    * legitimately "before connect" and skipped for live-only clients.
    * The server is shared across tests, so the MAIN thread first drains
    * the previous test's connections (their writer loops notice the
    * disconnect within one keepalive write) BEFORE opening a new one —
    * then `readyConnections >= 1` unambiguously means this test's
    * connection is attached with thresholds fixed.
    */
  private def drainConnections(): Unit = {
    val deadline = System.currentTimeMillis() + 15000
    while (server.readyConnections > 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
  }
  private def awaitReady(): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (server.readyConnections < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
  }

  test("live feed: appended segments stream to a connected client past its catch-up") {
    drainConnections()
    val t = new Thread(() => {
      awaitReady()
      RedditLog.writeSegment(rcDir, Seq(Map(
        "id" -> 6L, "event" -> "rc", "created_utc" -> 1006L,
        "author" -> "u6", "subreddit" -> "news", "domain" -> null,
        "over_18" -> null, "is_self" -> null, "json" -> """{"body":"live"}""")))
    })
    t.start()
    // keepalives may interleave with the live frame — read a few extra
    // frames and look for the appended id
    val frames = readFrames("/?comment_backfill=100&type=comments", 7, timeoutMs = 45000)
    t.join()
    assert(frames.exists(_.startsWith("id: 6\nevent: rc\ndata: {\"body\":\"live\"}")),
      frames.mkString("<<", ">>|<<", ">>"))
  }

  test("two concurrent clients with different specs each get exactly their stream") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val ready = new CountDownLatch(2)
    @volatile var framesA: Seq[String] = Nil
    @volatile var framesB: Seq[String] = Nil
    // A: only u2's comments; B: submissions only, projected to title
    val ta = new Thread(() => {
      ready.countDown()
      framesA = readFrames("/?comment_backfill=100&type=comments&author=u2", 1)
    })
    val tb = new Thread(() => {
      ready.countDown()
      framesB = readFrames("/?submission_backfill=100&type=submissions&filter=title", 3)
    })
    ta.start(); tb.start()
    assert(ready.await(5, TimeUnit.SECONDS))
    ta.join(30000); tb.join(30000)
    assert(framesA.size == 1 && framesA.head.startsWith("id: 2\nevent: rc"))
    assert(framesA.head.contains("\"author\":\"u2\""))
    assert(framesB.size == 3)
    assert(framesB.forall(_.contains("event: rs")))
    assert(framesB.forall(f => f.contains("{\"title\":") && !f.contains("author")))
  }

  test("live events whose id order disagrees with event-time order all arrive") {
    // ids 30,31 appended together; 31 has the EARLIER created_utc, so the
    // O1 emit sort delivers 31 first — a per-row id watermark would then
    // silently drop 30 (regression: review finding on handleBatch marks)
    drainConnections()
    val t = new Thread(() => {
      awaitReady()
      RedditLog.writeSegment(rcDir, Seq(
        Map("id" -> 30L, "event" -> "rc", "created_utc" -> 9000L,
          "author" -> "ooo", "subreddit" -> "news", "domain" -> null,
          "over_18" -> null, "is_self" -> null, "json" -> """{"n":30}"""),
        Map("id" -> 31L, "event" -> "rc", "created_utc" -> 8000L,
          "author" -> "ooo", "subreddit" -> "news", "domain" -> null,
          "over_18" -> null, "is_self" -> null, "json" -> """{"n":31}""")))
    })
    t.start()
    // keepalives (1.5s cadence) interleave before the data lands — read
    // enough frames to see both rc events through the noise
    val frames = readFrames("/?author=ooo", 8, timeoutMs = 45000)
    t.join()
    val ids = frames.filter(_.contains("event: rc")).map(_.linesIterator.next())
    assert(ids.toSet == Set("id: 30", "id: 31"), frames.mkString("|"))
    // and the emit order within the batch is event-time order
    assert(ids == Seq("id: 31", "id: 30"))
  }

  test("future start_id: live feed skips up to the requested id") {
    drainConnections()
    val t = new Thread(() => {
      awaitReady()
      RedditLog.writeSegment(rcDir, (40L to 44L).map(i => Map(
        "id" -> i, "event" -> "rc", "created_utc" -> (10000L + i),
        "author" -> "fut", "subreddit" -> "news", "domain" -> null,
        "over_18" -> null, "is_self" -> null, "json" -> s"""{"n":$i}""")))
    })
    t.start()
    // start_id=43 is beyond the current log head: only 43,44 may arrive
    val frames = readFrames("/?comment_start_id=43&author=fut", 8, timeoutMs = 45000)
    t.join()
    val ids = frames.filter(_.contains("event: rc")).map(_.linesIterator.next())
    assert(ids == Seq("id: 43", "id: 44"), frames.mkString("|"))
  }

  test("/test demo page served") {
    val url = new URL(s"http://localhost:${server.boundPort}/test")
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    assert(conn.getResponseCode == 200)
    val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(body.contains("EventSource"))
    conn.disconnect()
  }
}
