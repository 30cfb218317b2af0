package graft.streaming

import graft.sources.RedditLog
import java.io.InputStream
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** SSE delivery throughput measurement (BENCH_NOTES.md):
  * catch-up events/s, sustained live events/s, fan-out scaling
  * (1 vs 8 concurrent clients with distinct predicates), and the FULL
  * TRIANGLE — events arriving through the streaming ingest sink
  * (chunked appends + size-tiered compaction firing on the writer
  * path) while clients consume over SSE, with the rr third log
  * ingesting concurrently (round-9 measurement: the produce→compact→
  * consume loop had only ever been spec'd, never benched).
  */
object SseBenchMain {

  /** Envelope row for the MemoryStream encoder (RedditLog.schema shape). */
  case class Env(id: Long, event: String, created_utc: Long,
      author: String, subreddit: String, domain: String, over_18: String,
      is_self: String, json: String)
  private def row(i: Long, author: String): Map[String, Any] = Map(
    "id" -> i, "event" -> "rc", "created_utc" -> (1000L + i),
    "author" -> author, "subreddit" -> "news", "domain" -> null,
    "over_18" -> null, "is_self" -> null,
    "json" -> s"""{"author":"$author","body":"b$i"}""")

  private def countFrames(port: Int, path: String, n: Int, timeoutMs: Int): (Int, Double) = {
    val conn = new URL(s"http://localhost:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setReadTimeout(timeoutMs)
    val in: InputStream = conn.getInputStream
    val t0 = System.nanoTime()
    var tFirst = 0L
    var frames = 0
    val buf = new Array[Byte](65536)
    val acc = new StringBuilder
    def elapsed: Double =
      if (tFirst == 0L) (System.nanoTime() - t0) / 1e9
      else (System.nanoTime() - tFirst) / 1e9 // first→last frame delta
    try {
      while (frames < n) {
        val r = in.read(buf)
        if (r < 0) return (frames, elapsed)
        if (tFirst == 0L) tFirst = System.nanoTime()
        acc.append(new String(buf, 0, r, StandardCharsets.UTF_8))
        var idx = acc.indexOf("\n\n")
        while (idx >= 0 && frames < n) {
          val f = acc.substring(0, idx)
          if (!f.contains("keepalive") && !f.startsWith(":")) frames += 1
          acc.delete(0, idx + 2)
          idx = acc.indexOf("\n\n")
        }
      }
      (frames, elapsed)
    } finally { in.close(); conn.disconnect() }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rcDir = Files.createTempDirectory("sbench-rc").toString
    val rsDir = Files.createTempDirectory("sbench-rs").toString
    val rrDir = Files.createTempDirectory("sbench-rr").toString
    // 20k-event rc history (20 segments × 1000), authors a0..a7
    (0 until 20).foreach { k =>
      RedditLog.writeSegment(rcDir, ((k * 1000 + 1).toLong to (k * 1000 + 1000).toLong)
        .map(i => row(i, s"a${i % 8}")))
    }
    // short keepalive: a finished phase's dangling connection is only
    // reaped on a failed write, and the next phase's readiness wait
    // must not count it
    val server = new SseServer(spark, rcDir, rsDir, rrPath = rrDir,
      keepAliveMillis = 1000L, triggerMillis = 200L).start()
    try {
      // catch-up throughput (full 20k backfill, clamp is 100k)
      val (n1, t1) = countFrames(server.boundPort,
        "/?comment_backfill=100000&type=comments", 20000, 120000)
      println(f"SSEBENCH catchup frames=$n1 time=$t1%.2f s rate=${n1 / t1}%.0f ev/s")

      // live throughput: N clients, append 10k
      def liveRun(clients: Int, total: Int, base: Long): (Double, Seq[Int], Seq[Double]) = {
        // let the previous phase's dangling connection hit its keepalive
        // write(s) and reap (a closed socket may absorb one write before
        // RST), so the readiness count below sees ONLY this phase's
        // clients
        val reapDeadline = System.currentTimeMillis() + 15000
        while (server.readyConnections > 0 && System.currentTimeMillis() < reapDeadline)
          Thread.sleep(100)
        require(server.readyConnections == 0,
          s"stale connections still attached: ${server.readyConnections}")
        val counts = new Array[Int](clients)
        val times = new Array[Double](clients)
        val threads = (0 until clients).map { c =>
          val th = new Thread(() => {
            val want = total / 8 // each author slice
            val (n, t) = countFrames(server.boundPort,
              s"/?type=comments&author=a$c", want, 120000)
            counts(c) = n; times(c) = t
          })
          th.start(); th
        }
        val deadline = System.currentTimeMillis() + 30000
        while (server.readyConnections < clients && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        require(server.readyConnections == clients, "clients failed to attach")
        val t0 = System.nanoTime()
        (0 until total / 1000).foreach { k =>
          RedditLog.writeSegment(rcDir,
            ((base + k * 1000).toLong until (base + k * 1000 + 1000).toLong)
              .map(i => row(i, s"a${i % 8}")))
        }
        threads.foreach(_.join(120000))
        val wall = (System.nanoTime() - t0) / 1e9
        // a short count means a timeout/EOF — fail loudly rather than
        // publish a silently-invalid rate
        require(counts.forall(_ == total / 8),
          s"INVALID RUN: counts=${counts.mkString(",")} (want ${total / 8} each)")
        (wall, counts.toSeq, times.toSeq)
      }
      val (w1, c1, t1c) = liveRun(1, 10000, 30001L)
      println(f"SSEBENCH live-1 client got=${c1.head} of 1250 wall=$w1%.2f s " +
        f"first→last=${t1c.head}%.2f s (10000 appended; " +
        f"batch throughput=${10000 / w1}%.0f ev/s)")
      val (w8, c8, t8c) = liveRun(8, 10000, 60001L)
      println(f"SSEBENCH live-8 clients each=${c8.mkString(",")} wall=$w8%.2f s " +
        f"first→last min=${t8c.min}%.2f max=${t8c.max}%.2f s " +
        f"(fan-out: 8 distinct predicates, ${10000 / w8}%.0f ev/s through the shared pass)")

      // FULL TRIANGLE: the same 8-client live fan-out, but events reach
      // the log through the streaming INGEST SINK (micro-batched,
      // chunked appends) with an aggressive maintenance policy so
      // size-tiered compaction provably fires mid-run, and the rr third
      // log ingesting + serving a 9th client concurrently. This is the
      // production loop end to end: producer → RedditLogSink →
      // compact/GC → SSE fan-out, all live at once.
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def env(i: Long, ev: String, author: String, sub: String) = Env(
        id = i, event = ev, created_utc = 1000L + i, author = author,
        subreddit = sub, domain = null, over_18 = null, is_self = null,
        json = s"""{"author":"$author","subreddit":"$sub","body":"b$i"}""")
      val rcMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Env]
      val rrMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Env]
      val ingest = RedditLogSink.appendStream(rcMem.toDF(), rcDir,
        Files.createTempDirectory("sbench-ck1").toString,
        triggerMillis = 100L, targetRows = 2000L, maxSmall = 4)
      val rrIngest = RedditLogSink.appendStream(rrMem.toDF(), rrDir,
        Files.createTempDirectory("sbench-ck2").toString,
        triggerMillis = 100L, targetRows = 2000L, maxSmall = 4)
      try {
        val reapDeadline = System.currentTimeMillis() + 15000
        while (server.readyConnections > 0 && System.currentTimeMillis() < reapDeadline)
          Thread.sleep(100)
        require(server.readyConnections == 0,
          s"stale connections still attached: ${server.readyConnections}")
        val total = 10000
        val rrTotal = 1000
        val counts = new Array[Int](9)
        val threads = (0 until 8).map { c =>
          val th = new Thread(() => {
            val (n, _) = countFrames(server.boundPort,
              s"/?type=comments&author=a$c", total / 8, 120000)
            counts(c) = n
          })
          th.start(); th
        } :+ {
          val th = new Thread(() => {
            val (n, _) = countFrames(server.boundPort,
              "/?type=subreddits", rrTotal, 120000)
            counts(8) = n
          })
          th.start(); th
        }
        val attachDeadline = System.currentTimeMillis() + 30000
        while (server.readyConnections < 9 && System.currentTimeMillis() < attachDeadline)
          Thread.sleep(50)
        require(server.readyConnections == 9, "triangle clients failed to attach")
        val segsBefore = RedditLog.listSegments(rcDir).size
        val base = 90001L
        val t0 = System.nanoTime()
        (0 until total / 1000).foreach { k =>
          rcMem.addData((base + k * 1000 until base + k * 1000 + 1000)
            .map(i => env(i, "rc", s"a${i % 8}", "news")))
          if (k < rrTotal / 100)
            rrMem.addData((1L + k * 100 until 1L + k * 100 + 100)
              .map(i => env(i, "rr", "mod", s"sub$i")))
        }
        threads.foreach(_.join(120000))
        val wall = (System.nanoTime() - t0) / 1e9
        require(counts.take(8).forall(_ == total / 8) && counts(8) == rrTotal,
          s"INVALID RUN: counts=${counts.mkString(",")}")
        val segsAfter = RedditLog.listSegments(rcDir).size
        // the maintenance proof: 10k rows arrived in ≥5 sink appends
        // (2k-row chunks), yet the live segment count stayed at-or-below
        // maxSmall growth — compaction ran on the writer path mid-serve
        println(f"SSEBENCH triangle-9 rc=${counts.take(8).mkString(",")} rr=${counts(8)} " +
          f"wall=$wall%.2f s (${(total + rrTotal) / wall}%.0f ev/s delivered through " +
          f"ingest-sink appends; rc segments $segsBefore→$segsAfter, compaction " +
          s"${if (segsAfter < segsBefore + 5) "FIRED" else "DID NOT FIRE"})")
      } finally { ingest.stop(); rrIngest.stop() }

      // LM QUALITY GATE (round 10): the CCNet perplexity filter at
      // ingest (EventTimeOps.lmQualityGateIngest) measured against an
      // identical pass-through stream — the gate's cost is model joins
      // over each micro-batch's gram stream, so the with/without pair
      // prices the filter in ev/s, not folklore. Docs cycle the real
      // sf0.001 corpus texts (realistic token counts); same feed
      // rhythm both runs (10 × 2k-doc chunks, processed per chunk).
      {
        import graft.operators.TextAnalysis
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val lmPath = Files.createTempDirectory("sbench-lm").toString
        TextAnalysis.saveBigramLm(refDocs.filter($"lang" === "en"), lmPath)
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs = (0 until total).map(i => (i.toLong, texts(i % texts.length)))
        // midpoint threshold from the batch scorer so the gate actually
        // splits the stream (an all-keep run would under-price the gate)
        val thr = {
          val s = TextAnalysis.bigramLmScoreIndexed(
            docs.take(chunk).toDF("doc_id", "text"), lmPath)
            .agg(org.apache.spark.sql.functions.expr("percentile(avg_nll, 0.5)"))
            .head().getDouble(0)
          s
        }
        def gateRun(withGate: Boolean): (Double, Long, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val kept = new java.util.concurrent.atomic.AtomicLong
          val writer =
            if (withGate) EventTimeOps.lmQualityGateIngest(stream, lmPath, thr) {
              (out, _) =>
                val rows = out.select($"keep").collect()
                seen.addAndGet(rows.length)
                kept.addAndGet(rows.count(_.getBoolean(0)))
            }
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          require(seen.get() == total, s"INVALID RUN: saw ${seen.get()} of $total")
          ((System.nanoTime() - t0) / 1e9, seen.get(), kept.get())
        }
        gateRun(withGate = false) // warm-up: stream machinery + JIT out of both timings
        val (wBase, _, _) = gateRun(withGate = false)
        val (wGate, _, nKept) = gateRun(withGate = true)
        println(f"SSEBENCH lm-gate total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"gated=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost, " +
          f"kept=$nKept of $total at thr=$thr%.3f)")
      }

      // QUALITY-RULES GATE (round-10 tail): the d56 Gopher filter on
      // the stream path against the same pass-through twin and feed
      // rhythm — the gate is pure scan-side expression work (no model,
      // no joins), so its overhead should sit far below the LM gate's;
      // the with/without pair proves it with a number. Stop list = the
      // corpus's marker vocabulary (d56's registered choice, so the
      // gate genuinely splits the stream).
      {
        import graft.operators.TextAnalysis
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs = (0 until total).map(i => (i.toLong, texts(i % texts.length)))
        def rulesRun(withGate: Boolean): (Double, Long, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val kept = new java.util.concurrent.atomic.AtomicLong
          val writer =
            if (withGate)
              EventTimeOps.rulesGateIngest(stream, TextAnalysis.markers.head._2) {
                (out, _) =>
                  val rows = out.select($"keep").collect()
                  seen.addAndGet(rows.length)
                  kept.addAndGet(rows.count(_.getBoolean(0)))
              }
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          require(seen.get() == total, s"INVALID RUN: saw ${seen.get()} of $total")
          ((System.nanoTime() - t0) / 1e9, seen.get(), kept.get())
        }
        rulesRun(withGate = false) // warm-up
        val (wBase, _, _) = rulesRun(withGate = false)
        val (wGate, _, nKept) = rulesRun(withGate = true)
        println(f"SSEBENCH rules-gate total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"gated=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost, kept=$nKept of $total)")
      }

      // CLASSIFIER GATE (round-10 continuation): the persisted d68
      // perceptron on the stream path against the same pass-through
      // twin and feed rhythm. Expected to price BETWEEN the rules gate
      // (pure projection) and the LM gate (vocabulary-scale joins):
      // there is a model, but it's a B+1-row broadcast, so the
      // per-batch cost is one hashed-feature explode + one margin
      // aggregation. Measured keeps are 0 of 20000 (the non-separable
      // corpus trains a negative-leaning final weight vector) — an
      // all-drop run prices the same per-batch compute as a split
      // (keep is one boolean projection after the margin aggregation),
      // so the cost figure stands.
      {
        import graft.operators.Classifier
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val clsPath = Files.createTempDirectory("sbench-cls").toString
        Classifier.saveClassifier(refDocs, $"lang" === "en", clsPath)
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs = (0 until total).map(i => (i.toLong, texts(i % texts.length)))
        def clsRun(withGate: Boolean): (Double, Long, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val kept = new java.util.concurrent.atomic.AtomicLong
          val writer =
            if (withGate)
              EventTimeOps.classifierGateIngest(stream, clsPath) {
                (out, _) =>
                  val rows = out.select($"keep").collect()
                  seen.addAndGet(rows.length)
                  kept.addAndGet(rows.count(_.getBoolean(0)))
              }
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          require(seen.get() == total, s"INVALID RUN: saw ${seen.get()} of $total")
          ((System.nanoTime() - t0) / 1e9, seen.get(), kept.get())
        }
        clsRun(withGate = false) // warm-up
        val (wBase, _, _) = clsRun(withGate = false)
        val (wGate, _, nKept) = clsRun(withGate = true)
        println(f"SSEBENCH cls-gate total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"gated=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost, kept=$nKept of $total)")
      }

      // FUZZY-DEDUP GATE (round-10 tail): the persisted d77 LSH index
      // on the stream path against the same pass-through twin and feed
      // rhythm. The heaviest gate by construction — per batch it builds
      // a k=64 MinHash signature over the batch's shingles and
      // band-joins the history index — so the number here prices
      // content-based dedup-at-ingest against the cheaper gates
      // honestly. The stream is half history twins, half per-doc-unique
      // synthetic text, so the gate genuinely divides it.
      {
        import graft.operators.Dedup
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val lshPath = Files.createTempDirectory("sbench-lsh").toString
        Dedup.saveLshIndex(refDocs, lshPath, 64, 16)
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs = (0 until total).map { i =>
          if (i % 2 == 0) (i.toLong, texts((i / 2) % texts.length))
          else (i.toLong, (1 to 30).map(w => s"fresh${i}w$w").mkString(" "))
        }
        def lshRun(withGate: Boolean): (Double, Long, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val kept = new java.util.concurrent.atomic.AtomicLong
          val writer =
            if (withGate)
              EventTimeOps.fuzzyDedupGateIngest(stream, lshPath) {
                (out, _) =>
                  val rows = out.select($"keep").collect()
                  seen.addAndGet(rows.length)
                  kept.addAndGet(rows.count(_.getBoolean(0)))
              }
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          require(seen.get() == total, s"INVALID RUN: saw ${seen.get()} of $total")
          ((System.nanoTime() - t0) / 1e9, seen.get(), kept.get())
        }
        lshRun(withGate = false) // warm-up
        val (wBase, _, _) = lshRun(withGate = false)
        val (wGate, _, nKept) = lshRun(withGate = true)
        println(f"SSEBENCH lsh-gate total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"gated=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost, kept=$nKept of $total)")
      }

      // CHAINED GATE (round 11, phase 9): all five gates composed
      // cheap-first in ONE foreachBatch (EventTimeOps.chainedGateIngest)
      // on a DROP-HEAVY stream — 80% unique rule violators, 20%
      // corpus-like docs — priced against (a) the pass-through twin and
      // (b) the most expensive member (the LSH fuzzy-dedup gate) ALONE
      // on the SAME stream. The short-circuit means the expensive
      // kernels see only rule survivors (~20%), so the whole five-gate
      // chain should cost at or below the one-gate LSH run, which pays
      // its signature build for every document.
      {
        import graft.operators.{Classifier, Dedup, TextAnalysis}
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val stops = TextAnalysis.markers.head._2
        val clsPath = Files.createTempDirectory("sbench-chain-cls").toString
        // parity-trained (non-separable) classifier: margins split the
        // stream both ways, so docs genuinely flow through ALL five
        // stages — the en-trained model is measured all-negative on
        // this corpus (cls-gate phase) and would zero stages 4-5
        Classifier.saveClassifier(refDocs, $"doc_id" % 2 === 0, clsPath)
        val lmPath = Files.createTempDirectory("sbench-chain-lm").toString
        TextAnalysis.saveBigramLm(refDocs.filter($"lang" === "en"), lmPath)
        val thr = TextAnalysis.bigramLmScoreIndexed(refDocs, lmPath)
          .agg(org.apache.spark.sql.functions.expr("percentile(avg_nll, 0.5)"))
          .head().getDouble(0)
        val lshPath = Files.createTempDirectory("sbench-chain-lsh").toString
        Dedup.saveLshIndex(refDocs, lshPath, 64, 16)
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        // 10k-row batches: the regime where per-ROW kernel cost
        // dominates per-batch fixed cost — which is the regime the
        // short-circuit exists for (at 2k-row batches the five gates'
        // fixed plan/join costs dominate and narrowing survivors buys
        // nothing; measured x0.65 "savings" in the second cut). A real
        // ingest pipeline's micro-batches are this shape or larger.
        val chunk = 10000
        // every text unique in-stream (the watermark dedup must not
        // swallow rows — seen==total is the validity check)
        val docs: Seq[(Long, String, Long)] = (0 until total).map { i =>
          val t = if (i % 5 < 4) s"junk doc $i"
                  else texts(i % texts.length) + s" u$i"
          (i.toLong, t, 600L + i)
        }
        def chainRun(mode: String): (Double, Long, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
          val stream = mem.toDF().toDF("doc_id", "text", "created_utc")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val kept = new java.util.concurrent.atomic.AtomicLong
          val writer = mode match {
            case "chain" | "nosc" =>
              EventTimeOps.chainedGateIngest(stream, refDocs, clsPath,
                lmPath, lshPath, thr, stopWords = stops,
                shortCircuit = mode == "chain") { (out, _) =>
                val rows = out.select($"keep").collect()
                seen.addAndGet(rows.length)
                kept.addAndGet(rows.count(_.getBoolean(0)))
              }._1
            case "lsh" =>
              EventTimeOps.fuzzyDedupGateIngest(
                stream.select($"doc_id", $"text"), lshPath) { (out, _) =>
                val rows = out.select($"keep").collect()
                seen.addAndGet(rows.length)
                kept.addAndGet(rows.count(_.getBoolean(0)))
              }
            case _ => stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }
          }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          require(seen.get() == total, s"INVALID RUN: saw ${seen.get()} of $total")
          ((System.nanoTime() - t0) / 1e9, seen.get(), kept.get())
        }
        chainRun("base") // warm-up
        val (wBase, _, _) = chainRun("base")
        val (wLsh, _, _) = chainRun("lsh")
        val (wNosc, _, nKeptN) = chainRun("nosc")
        val (wChain, _, nKept) = chainRun("chain")
        require(nKept == nKeptN,
          s"INVALID RUN: short-circuit changed decisions ($nKept vs $nKeptN)")
        println(f"SSEBENCH chain-gate total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"lsh-alone=${total / wLsh}%.0f ev/s no-shortcircuit=${total / wNosc}%.0f ev/s " +
          f"chain=${total / wChain}%.0f ev/s " +
          f"(chain x${wChain / wBase}%.1f, nosc x${wNosc / wBase}%.1f, " +
          f"lsh-alone x${wLsh / wBase}%.1f; shortcircuit saves x${wNosc / wChain}%.2f, " +
          f"kept=$nKept of $total)")
      }

      // STRATUM-BUDGET GATE (round 11, phase 10): the UniMax
      // realization's streaming twin priced against the pass-through
      // twin — the LIGHTEST gate by construction (one bounded
      // per-batch window + a #strata-row literal CASE; no model, no
      // index, no sketch), so its cost should sit below even the rules
      // gate's. Budgets sized so two of four strata CLOSE mid-stream
      // (kept lands strictly between 50% and 100% — the gate provably
      // gates).
      {
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs: Seq[(Long, String, String)] = (0 until total).map { i =>
          (i.toLong, texts(i % texts.length), s"s${i % 4}")
        }
        val tokensPerStratum = docs.groupBy(_._3).view
          .mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
        // s0/s1 capped at half their stream, s2/s3 open-ended
        val alloc = Map(
          "s0" -> tokensPerStratum("s0") / 2, "s1" -> tokensPerStratum("s1") / 2,
          "s2" -> Long.MaxValue / 4, "s3" -> Long.MaxValue / 4)
        def budgetRun(withGate: Boolean): (Double, Long, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
          val stream = mem.toDF().toDF("doc_id", "text", "stratum")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val kept = new java.util.concurrent.atomic.AtomicLong
          val writer =
            if (withGate) EventTimeOps.stratumBudgetGateIngest(stream, alloc) {
              (out, _) =>
                val rows = out.select($"selected").collect()
                seen.addAndGet(rows.length)
                kept.addAndGet(rows.count(_.getBoolean(0)))
            }._1
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          require(seen.get() == total, s"INVALID RUN: saw ${seen.get()} of $total")
          ((System.nanoTime() - t0) / 1e9, seen.get(), kept.get())
        }
        budgetRun(withGate = false) // warm-up
        val (wBase, _, _) = budgetRun(withGate = false)
        val (wGate, _, nKept) = budgetRun(withGate = true)
        require(nKept > total / 2 && nKept < total,
          s"INVALID RUN: budgets did not bite ($nKept of $total)")
        println(f"SSEBENCH budget-gate total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"gated=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost, kept=$nKept of $total)")
      }

      // STRATIFIED RESERVOIR (round 11, phase 11): the streaming A-ES
      // sampler priced against the pass-through twin — k-row-per-
      // stratum driver state, per-batch cost = one bounded window over
      // the micro-batch + a ≤ #strata·k-row collect; should price at
      // the budget-gate tier (no model, no index).
      {
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs: Seq[(Long, String, String)] = (0 until total).map { i =>
          (i.toLong, texts(i % texts.length), s"s${i % 4}")
        }
        def resRun(withGate: Boolean): (Double, Long, Int) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
          val stream = mem.toDF().toDF("doc_id", "text", "stratum")
            .withColumn("w", org.apache.spark.sql.functions
              .size(org.apache.spark.sql.functions.split($"text", " "))
              .cast("double"))
          val seen = new java.util.concurrent.atomic.AtomicLong
          val (writer, handleOpt) =
            if (withGate) {
              val (w, h) = EventTimeOps.stratifiedReservoirIngest(
                stream, "stratum", $"w", 16)
              (w, Some(h))
            } else (stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }, None)
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          val nRes = handleOpt.map(_.sample.values.map(_.size).sum).getOrElse(0)
          ((System.nanoTime() - t0) / 1e9, seen.get(), nRes)
        }
        resRun(withGate = false) // warm-up
        val (wBase, _, _) = resRun(withGate = false)
        val (wGate, _, nRes) = resRun(withGate = true)
        require(nRes == 4 * 16, s"INVALID RUN: reservoirs hold $nRes of ${4 * 16}")
        println(f"SSEBENCH reservoir total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"sampled=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost, reservoirs=$nRes rows)")
      }

      // BUCKET-BATCH ASSEMBLY (round 11, phase 12): the online
      // dynamic-batching stage priced against the pass-through twin —
      // one cursor per length bucket driver-side, per-batch cost = one
      // bounded window + a ≤ #buckets-row broadcast join and collect;
      // should price at the budget-gate tier (no model, no index, no
      // sketch).
      {
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs: Seq[(Long, String)] = (0 until total).map { i =>
          (i.toLong, texts(i % texts.length))
        }
        def bbRun(withGate: Boolean): (Double, Long, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val (writer, handleOpt) =
            if (withGate) {
              val (w, h) = EventTimeOps.bucketBatchIngest(stream, 16, 16) {
                (out, _) => seen.addAndGet(out.count()); ()
              }
              (w, Some(h))
            } else (stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }, None)
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          require(seen.get() == total, s"INVALID RUN: saw ${seen.get()} of $total")
          val nAssigned = handleOpt.map(_.docsSeen.values.sum).getOrElse(0L)
          ((System.nanoTime() - t0) / 1e9, seen.get(), nAssigned)
        }
        bbRun(withGate = false) // warm-up
        val (wBase, _, _) = bbRun(withGate = false)
        val (wGate, _, nAssigned) = bbRun(withGate = true)
        require(nAssigned == total, s"INVALID RUN: cursors saw $nAssigned of $total")
        println(f"SSEBENCH bucket-batch total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"batched=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost)")
      }

      // STREAMING CARD (round 11, phase 13): the live dataset card
      // priced against the pass-through twin — per batch it runs the
      // d132 increment kernel (a full langId + token + HLL pass over
      // the micro-batch) and collects two bounded frames, so it should
      // price in the rules-gate tier: real per-doc expression work but
      // no model join, no index probe.
      {
        val refDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        val texts = refDocs.select($"text").limit(500).collect().map(_.getString(0))
        val total = 20000
        val chunk = 2000
        val docs: Seq[(Long, String)] = (0 until total).map { i =>
          (i.toLong, texts(i % texts.length))
        }
        def cardRun(withGate: Boolean): (Double, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val seen = new java.util.concurrent.atomic.AtomicLong
          val (writer, handleOpt) =
            if (withGate) {
              val (w, h) = EventTimeOps.cardIngest(stream)
              (w, Some(h))
            } else (stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                seen.addAndGet(b.count()); ()
            }, None)
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g =>
              mem.addData(g: _*); q.processAllAvailable()
            }
          } finally q.stop()
          val nDocs = handleOpt
            .map(_.card.toMap.apply("n_docs").toLong).getOrElse(seen.get())
          ((System.nanoTime() - t0) / 1e9, nDocs)
        }
        cardRun(withGate = false) // warm-up
        val (wBase, _) = cardRun(withGate = false)
        val (wGate, nDocs) = cardRun(withGate = true)
        require(nDocs == total, s"INVALID RUN: card counted $nDocs of $total")
        println(f"SSEBENCH card total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"carded=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost)")
      }

      // KS DRIFT MONITOR (round 11, phase 14): the live two-sample KS
      // against a fixed reference sample, priced against pass-through —
      // per batch it pays one merged distinct-value aggregate plus two
      // bounded windows over the value grid (no model join, no index
      // probe), so it should price at-or-below the rules tier.
      {
        val ref = graft.sources.Tables
          .documents(spark, "/root/testdata/sf0.001")
          .select($"n_chars".cast("double").as("value"))
        val total = 20000
        val chunk = 2000
        val vals: Seq[(Long, Double)] =
          (0 until total).map(i => (i.toLong, (50 + i % 400).toDouble))
        def ksRun(withGate: Boolean): (Double, Long) = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
          val stream = mem.toDF().toDF("doc_id", "value")
          val batches = new java.util.concurrent.atomic.AtomicLong
          val lastD = new java.util.concurrent.atomic.AtomicReference[java.lang.Double](0.0)
          val writer =
            if (withGate) EventTimeOps.ksDriftIngest(stream, ref) { (out, _) =>
              lastD.set(out.head().getDouble(2)); batches.incrementAndGet(); ()
            }
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                b.count(); batches.incrementAndGet(); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            vals.grouped(chunk).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
          } finally q.stop()
          require(batches.get() == total / chunk,
            s"INVALID RUN: ${batches.get()} batches of ${total / chunk}")
          ((System.nanoTime() - t0) / 1e9, batches.get())
        }
        ksRun(withGate = false) // warm-up
        val (wBase, _) = ksRun(withGate = false)
        val (wGate, _) = ksRun(withGate = true)
        println(f"SSEBENCH ksdrift total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"monitored=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost)")
      }

      // TOKEN-DRIFT MONITOR (round 12, phase 15): the d119 JS/OOV text
      // drift against a fixed reference vocabulary, priced against
      // pass-through — per batch one token-stream groupBy over the
      // batch + a vocabulary-scale outer join (the reference is
      // tokenized ONCE at stream build), so it should price near the
      // LM-gate tier (vocabulary joins) rather than the rules tier.
      {
        val ref = graft.sources.Tables
          .documents(spark, "/root/testdata/sf0.001")
          .select($"doc_id", $"text")
        val total = 20000
        val chunk = 2000
        val words = Array("the", "spark", "hash", "join", "table", "scan",
          "query", "stream", "vector", "batch")
        val docs: Seq[(Long, String)] = (0 until total).map { i =>
          (i.toLong, (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
            .mkString(" "))
        }
        def tdRun(withGate: Boolean): Double = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val batches = new java.util.concurrent.atomic.AtomicLong
          val lastJs = new java.util.concurrent.atomic.AtomicReference[java.lang.Double](0.0)
          val writer =
            if (withGate) EventTimeOps.tokenDriftIngest(stream, ref) { (out, _) =>
              lastJs.set(out.head().getDouble(2)); batches.incrementAndGet(); ()
            }
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                b.count(); batches.incrementAndGet(); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
          } finally q.stop()
          require(batches.get() == total / chunk,
            s"INVALID RUN: ${batches.get()} batches of ${total / chunk}")
          (System.nanoTime() - t0) / 1e9
        }
        tdRun(withGate = false) // warm-up
        val wBase = tdRun(withGate = false)
        val wGate = tdRun(withGate = true)
        println(f"SSEBENCH tokendrift total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"monitored=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost)")
      }

      // EMBEDDING-DRIFT MONITOR (round 12, phase 16): the e51 moment
      // fold against a fixed reference slice, priced against
      // pass-through — the reference reduces ONCE to a dims-row stat
      // table, so per batch the gate pays one exploded groupBy over the
      // batch's vectors plus a 64-row join.
      {
        val ref = graft.sources.Tables
          .embeddings(spark, "/root/testdata/sf0.001")
          .select($"vec_id", $"embedding")
        val total = 20000
        val chunk = 2000
        val vecs: Seq[(Long, Seq[Double])] = (0 until total).map { i =>
          (i.toLong, (0 until 64).map(j =>
            ((i * 31 + j * 17) % 97).toDouble / 97.0 - 0.5))
        }
        def edRun(withGate: Boolean): Double = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
          val stream = mem.toDF().toDF("vec_id", "embedding")
          val batches = new java.util.concurrent.atomic.AtomicLong
          val lastD = new java.util.concurrent.atomic.AtomicReference[java.lang.Double](0.0)
          val writer =
            if (withGate) EventTimeOps.embedDriftIngest(stream, ref) { (out, _) =>
              lastD.set(out.head().getDouble(2)); batches.incrementAndGet(); ()
            }
            else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                b.count(); batches.incrementAndGet(); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            vecs.grouped(chunk).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
          } finally q.stop()
          require(batches.get() == total / chunk,
            s"INVALID RUN: ${batches.get()} batches of ${total / chunk}")
          (System.nanoTime() - t0) / 1e9
        }
        edRun(withGate = false) // warm-up
        val wBase = edRun(withGate = false)
        val wGate = edRun(withGate = true)
        println(f"SSEBENCH embeddrift total=$total vecs passthrough=${total / wBase}%.0f ev/s " +
          f"monitored=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost)")
      }

      // TRAINING-SHARD STORE ingest (round 13, phase 17): the ingest
      // family's STORE-WRITER member — each batch runs the batch
      // appender VERBATIM (deterministic prefix sum over the batch,
      // placement after the frozen token stream, a parquet append, and
      // one snapshot version per batch), priced against pass-through.
      // Heavier than any filter gate by design: it pays durable writes
      // plus the per-batch placement window chain, the cost of a store
      // whose every batch is a reproducible training snapshot.
      {
        val total = 20000
        val chunk = 2000
        val words = Array("the", "spark", "hash", "join", "table", "scan",
          "query", "stream", "vector", "batch")
        val docs: Seq[(Long, String)] = (1 to total).map { i =>
          (i.toLong, (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
            .mkString(" "))
        }
        def siRun(withGate: Boolean): Double = {
          val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val stream = mem.toDF().toDF("doc_id", "text")
          val batches = new java.util.concurrent.atomic.AtomicLong
          val writer =
            if (withGate) {
              // a fresh store per run: appends must sit above the
              // watermark, so a reused store would reject the rerun
              val path = java.nio.file.Files
                .createTempDirectory("ssebench-shards-").toString
              graft.operators.Packing.saveTokenShards(
                Seq((0L, "seed")).toDF("doc_id", "text"), path, 65536L)
              EventTimeOps.shardStoreIngest(stream, path) { (out, _) =>
                out.count(); batches.incrementAndGet(); ()
              }
            } else stream.writeStream.foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                b.count(); batches.incrementAndGet(); ()
            }
          val q = writer.start()
          val t0 = System.nanoTime()
          try {
            docs.grouped(chunk).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
          } finally q.stop()
          require(batches.get() == total / chunk,
            s"INVALID RUN: ${batches.get()} batches of ${total / chunk}")
          (System.nanoTime() - t0) / 1e9
        }
        siRun(withGate = false) // warm-up
        val wBase = siRun(withGate = false)
        val wGate = siRun(withGate = true)
        println(f"SSEBENCH shardingest total=$total docs passthrough=${total / wBase}%.0f ev/s " +
          f"landed=${total / wGate}%.0f ev/s (x${wGate / wBase}%.1f cost)")
      }
    } finally { server.stop(); spark.stop() }
  }
}
