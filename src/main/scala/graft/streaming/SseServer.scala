package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.api.{ApiError, ParamSpec}
import graft.operators.RedditOps
import graft.sources.RedditLog
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import scala.jdk.CollectionConverters._

/** The SSE delivery layer (SURVEY.md §2 rows E2, K1, A1; §7.3):
  * one **shared** Structured Streaming query over the rc+rs logs,
  * multiplexed to N client connections — not one poll loop per client
  * like the reference (/root/reference/sse.py:80-83), which cannot scale
  * past a handful of consumers.
  *
  * Fan-out is a **single pass** per micro-batch regardless of connection
  * count: every connection's compiled predicate becomes one tag column,
  * rows explode to (connection, frame) pairs inside Spark, and the
  * driver only routes already-formatted frames to per-connection queues.
  * Per-connection work never re-scans the batch.
  *
  * Reference semantics kept:
  *  - per-batch emit order = created_utc, rc-before-rs, id (O1);
  *  - keepalive every `keepAliveMillis` on its own id sequence from 1,
  *    payload {"tcs","tss","tbs"} (K1 — sse.py:112-119, 137-143);
  *  - tcs/tss count whitelist-passed events *before* the type gate
  *    (the documented A1 quirk, sse.py:179-180, 222-223); tbs counts
  *    bytes actually written, keepalives included (sse.py:141, 240);
  *  - backfill / start_id catch-up served from the log's batch path,
  *    then a seamless hand-off to the live feed with per-type watermark
  *    dedup (R1/R2);
  *  - 400 {"error": ...} on invalid params (V1/V2);
  *  - `GET /test` demo page (X1).
  */
class SseServer(spark: SparkSession, rcPath: String, rsPath: String,
    port: Int = 0, keepAliveMillis: Long = 30000L,
    triggerMillis: Long = 200L) {

  // ---------------- connection registry ----------------

  /** Documented deviation from the reference: the reference's
    * one-generator-per-connection design gets per-client TCP
    * backpressure for free; a shared query must not let one slow client
    * stall the fan-out (head-of-line blocking), so each connection gets
    * a bounded queue and a client that falls 65 536 frames behind loses
    * the newest frames (counted in `dropped`). The client can always
    * re-sync via `*_start_id` — ids are the resume tokens (R2).
    *
    * `rcBoundary`/`rsBoundary` are IMMUTABLE per-type id boundaries fixed
    * at connect time: the catch-up read serves ids ≤ boundary, the live
    * fan-out (and its counters) only considers ids > boundary — evaluated
    * inside the Spark pass, so catch-up and live are disjoint by
    * construction regardless of emit order or query lag. A start_id in
    * the future raises the boundary so the live feed also skips up to it.
    */
  private final class Connection(val id: String, val spec: ParamSpec,
      val rcBoundary: Long, val rsBoundary: Long) {
    val queue = new LinkedBlockingQueue[String](65536)
    val dropped = new AtomicLong(0)
    val tcs = new AtomicLong(0)
    val tss = new AtomicLong(0)
    val tbs = new AtomicLong(0)
    @volatile var closed = false
  }

  private val conns = new ConcurrentHashMap[String, Connection]()
  private val connSeq = new AtomicLong(0)
  private val queryRef = new AtomicReference[StreamingQuery]()
  private var http: HttpServer = _

  def boundPort: Int = http.getAddress.getPort

  // ---------------- shared streaming query ----------------

  private def liveStream(): DataFrame = {
    def side(p: String) = spark.readStream
      .format("graft.sources.RedditLogSource").option("path", p).load()
    side(rcPath).unionByName(side(rsPath))
  }

  /** One micro-batch → all connections, single pass (plus one small
    * aggregate for the counters).
    */
  private def handleBatch(batch: DataFrame, batchId: Long): Unit = {
    val snapshot = conns.values.asScala.filterNot(_.closed).toSeq
    if (snapshot.isEmpty || batch.isEmpty) return
    batch.persist()
    try {
      // catch-up/live disjointness, inside the plan: only ids above the
      // connection's per-type boundary exist for this connection at all
      def boundaryPred(c: Connection): Column =
        (col("event") === "rc" && col("id") > lit(c.rcBoundary)) ||
          (col("event") === "rs" && col("id") > lit(c.rsBoundary))

      def tags(predOf: Connection => Column): Column = filter(
        array(snapshot.map(c =>
          when(boundaryPred(c) && predOf(c), lit(c.id)).otherwise(lit(null))): _*),
        t => t.isNotNull)

      // A1 counters: whitelist ∧ attr, deliberately before the type gate
      val counted = batch
        .select(col("event"), explode(tags(c =>
          RedditOps.whitelistPred(c.spec) && RedditOps.attrPred(c.spec))).as("cid"))
        .groupBy(col("cid"), col("event")).count()
        .collect()
      counted.foreach { r =>
        Option(conns.get(r.getString(0))).foreach { c =>
          val n = r.getLong(2)
          if (r.getString(1) == "rc") c.tcs.addAndGet(n) else c.tss.addAndGet(n)
        }
      }

      // emit pass: full predicate, per-connection payload projection,
      // O1 sort, frames formatted inside Spark
      val dataCol = snapshot.foldLeft(col("json")) { (acc, c) =>
        if (c.spec.filterKeys.isEmpty) acc
        else when(col("cid") === c.id,
          RedditOps.projectPayload(c.spec, col("json"))).otherwise(acc)
      }
      val rows = batch
        .select(col("id"), col("event"), col("created_utc"), col("json"),
          explode(tags(c => RedditOps.pred(c.spec))).as("cid"))
        .withColumn("frame", RedditOps.sseFrame(col("id"), col("event"), dataCol))
        .orderBy(RedditOps.emitOrder: _*)
        .select(col("cid"), col("frame"))
        .collect()

      rows.foreach { r =>
        Option(conns.get(r.getString(0))).foreach { c =>
          if (!c.queue.offer(r.getString(1))) c.dropped.incrementAndGet()
        }
      }
    } finally batch.unpersist()
  }

  // ---------------- HTTP layer ----------------

  private def parseQuery(raw: String): Map[String, Seq[String]] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split('&').toSeq.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val k = if (i < 0) kv else kv.substring(0, i)
      val v = if (i < 0) "" else kv.substring(i + 1)
      URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  private def respondJson(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Serve the historical range for backfill/start_id from the log's
    * batch read path. The scan is bounded ABOVE by the per-type maxima
    * captured at connect time (`rcMax`/`rsMax`) — ids beyond them belong
    * to the live feed (whose boundary predicate starts exactly there),
    * so catch-up and live partition the id space exactly once each.
    */
  private def catchUp(c: Connection, rcMax: Long, rsMax: Long,
      write: String => Unit): Unit = {
    val spec = c.spec
    if (spec.commentBackfill.isEmpty && spec.submissionBackfill.isEmpty
      && spec.commentStartId.isEmpty && spec.submissionStartId.isEmpty) {
      return // live-only connection: no historical scan at all
    }
    def side(p: String) = spark.read
      .format("graft.sources.RedditLogSource").option("path", p).load()
    // NOTE: both logs are always scanned here even when `type` suppresses
    // one — the A1 counters observably count type-suppressed events
    // (sse.py:179-180; SseServerSpec "keepalive" asserts it). The segment
    // pruning comes from the source's id-range filter pushdown instead:
    // a type with no backfill/start_id resolves to `id > max`, which
    // prunes to zero segments.
    val hist = side(rcPath).unionByName(side(rsPath))
      .filter(RedditOps.resumePred(spec, lit(rcMax), lit(rsMax)))
      .filter((col("event") === "rc" && col("id") <= lit(rcMax)) ||
        (col("event") === "rs" && col("id") <= lit(rsMax)))
    // counters (A1 quirk: before the type gate)
    hist.filter(RedditOps.whitelistPred(spec) && RedditOps.attrPred(spec))
      .groupBy(col("event")).count().collect().foreach { r =>
        if (r.getString(0) == "rc") c.tcs.addAndGet(r.getLong(1))
        else c.tss.addAndGet(r.getLong(1))
      }
    val frames = hist.filter(RedditOps.pred(spec))
      .withColumn("json", RedditOps.projectPayload(spec, col("json")))
      .orderBy(RedditOps.emitOrder: _*)
      .select(RedditOps.sseFrame(col("id"), col("event"), col("json")))
      .collect().map(_.getString(0))
    frames.foreach(write)
  }

  private def handleStream(ex: HttpExchange): Unit = {
    ParamSpec.parse(parseQuery(ex.getRequestURI.getRawQuery)) match {
      case Left(ApiError(status, msg)) =>
        respondJson(ex, status, s"""{"error": "$msg"}""")
      case Right(spec) =>
        // boundaries fixed at connect time; a future start_id pushes the
        // live boundary up so the feed skips ids the client asked to skip
        val rcMax = RedditLog.maxId(rcPath)
        val rsMax = RedditLog.maxId(rsPath)
        val c = new Connection(s"c${connSeq.incrementAndGet()}", spec,
          rcBoundary = math.max(rcMax, spec.commentStartId.map(_ - 1).getOrElse(Long.MinValue)),
          rsBoundary = math.max(rsMax, spec.submissionStartId.map(_ - 1).getOrElse(Long.MinValue)))
        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.getResponseHeaders.set("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0)
        val out = ex.getResponseBody
        def write(frame: String): Unit = {
          val bytes = frame.getBytes(StandardCharsets.UTF_8)
          out.write(bytes); out.flush()
          c.tbs.addAndGet(bytes.length)
        }
        var keepAliveId = 0L
        var lastKeepAlive = System.currentTimeMillis()
        try {
          // register BEFORE the catch-up read: live frames for ids above
          // the boundary buffer in the queue while history streams out,
          // so nothing falls between catch-up and live
          conns.put(c.id, c)
          catchUp(c, rcMax, rsMax, write)
          while (!c.closed) {
            val frame = c.queue.poll(100, TimeUnit.MILLISECONDS)
            if (frame != null) write(frame)
            if (System.currentTimeMillis() - lastKeepAlive >= keepAliveMillis) {
              keepAliveId += 1
              lastKeepAlive = System.currentTimeMillis()
              write(s"id: $keepAliveId\nevent: keepalive\ndata: " +
                s"""{"tcs": ${c.tcs.get()}, "tss": ${c.tss.get()}, "tbs": ${c.tbs.get()}}\n\n""")
            }
          }
        } catch {
          case _: java.io.IOException => // client went away
        } finally {
          c.closed = true
          conns.remove(c.id)
          ex.close()
        }
    }
  }

  private val testPage =
    """<html><body><script>
      |var es = new EventSource('/');
      |es.onmessage = function(e) { document.body.append(e.data + '\n'); };
      |</script>streaming…</body></html>""".stripMargin

  // ---------------- lifecycle ----------------

  def start(): SseServer = {
    val q = liveStream().writeStream
      .queryName("graft-sse-feed")
      .foreachBatch((b: DataFrame, id: Long) => handleBatch(b, id))
      .trigger(Trigger.ProcessingTime(s"$triggerMillis milliseconds"))
      .start()
    queryRef.set(q)
    http = HttpServer.create(new InetSocketAddress(port), 0)
    http.setExecutor(Executors.newCachedThreadPool())
    http.createContext("/test", (ex: HttpExchange) => {
      val bytes = testPage.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/html")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    http.createContext("/", (ex: HttpExchange) => handleStream(ex))
    http.start()
    this
  }

  def stop(): Unit = {
    conns.values.asScala.foreach(_.closed = true)
    Option(queryRef.get()).foreach(_.stop())
    if (http != null) http.stop(0)
  }
}
