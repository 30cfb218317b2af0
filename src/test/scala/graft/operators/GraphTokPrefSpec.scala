package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 fifth-session specs: the graph-ANN family (e54/e55), the
  * Kneser-Ney LM (d136), the WordPiece greedy tokenizer (d137/d138),
  * containment pairs (d139), and preference pairs (d140).
  */
class GraphTokPrefSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---- e54/e55: navigation graph + beam search ----

  test("navGraph: every node has an out-edge, no self-loops, edges distinct") {
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val g = Similarity.navGraph(emb, 3, 6).cache()
    try {
      assert(g.filter(col("src") === col("dst")).count() == 0)
      assert(g.count() == g.distinct().count())
      // the mod-7919 long edge guarantees out-degree >= 1 for every
      // node whose shortcut does not self-loop (v·7918 ≢ 0 mod n);
      // only self-loopers may be sourceless (and then only if their
      // probe buckets were empty too)
      val srcs = g.select(col("src")).distinct()
        .collect().map(_.getLong(0)).toSet
      val missing = (0L until n).filterNot(srcs.contains)
      assert(missing.forall(v => (v * 7919L) % n == v),
        s"non-self-loop nodes without out-edges: $missing")
    } finally g.unpersist()
  }

  test("graphBeamSearch: ranks contiguous, self excluded, scores exact") {
    val emb = Tables.embeddings(spark, dir)
    val res = Similarity.graphBeamSearch(emb, col("vec_id") % 50 === 0,
      k = 5, beam = 8, rounds = 3, knnK = 3).cache()
    try {
      assert(res.filter(col("neighbor_id") === col("query_id")).count() == 0)
      // per query: rk is 1..n without gaps and cosine non-increasing
      val byQ = res.orderBy(col("query_id"), col("rk"))
        .select(col("query_id"), col("rk"), col("cosine"))
        .collect().groupBy(_.getLong(0))
      byQ.values.foreach { rows =>
        assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
        val cs = rows.map(_.getDouble(2)).toSeq
        assert(cs == cs.sorted(Ordering.Double.TotalOrdering.reverse))
      }
      // every emitted cosine equals the exact recomputation
      val n = emb.selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) AS e")
        .withColumn("nrm", sqrt(graft.functions.ArrayDotProduct(col("e"), col("e"))))
      val q = n.select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn"))
      val c = n.select(col("vec_id").as("neighbor_id"), col("e").as("ce"),
        col("nrm").as("cn"))
      val bad = res.join(q, "query_id").join(c, "neighbor_id")
        .filter(col("cosine") =!=
          graft.functions.ArrayDotProduct(col("qe"), col("ce")) /
            (col("qn") * col("cn")))
        .count()
      assert(bad == 0)
    } finally res.unpersist()
  }

  test("graphBeamRecall: in [0,1]; more rounds never lose exact-top-k hits") {
    val emb = Tables.embeddings(spark, dir)
    def recall(rounds: Int): (Long, Double) = {
      val r = Similarity.graphBeamRecall(emb, col("vec_id") % 50 === 0,
        k = 5, beam = 8, rounds = rounds, knnK = 3).head()
      (r.getLong(1), r.getDouble(2))
    }
    val (h1, r1) = recall(1)
    val (h3, r3) = recall(3)
    assert(r1 >= 0.0 && r1 <= 1.0 && r3 >= 0.0 && r3 <= 1.0)
    // the beam improves pointwise per round, and a displacing higher-
    // cosine item is itself in the exact top-k, so hits are monotone
    assert(h3 >= h1, s"hits dropped: rounds1=$h1 rounds3=$h3")
  }

  test("graphBeamRecallCurve: one row per round, hits monotone, last row = e55") {
    val emb = Tables.embeddings(spark, dir)
    val curve = Similarity.graphBeamRecallCurve(emb, col("vec_id") % 50 === 0,
      k = 5, beam = 8, rounds = 3, knnK = 3)
      .orderBy(col("rounds")).collect()
    assert(curve.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val hits = curve.map(_.getLong(2)).toSeq
    assert(hits == hits.sorted, s"non-monotone hits: $hits")
    val last = Similarity.graphBeamRecall(emb, col("vec_id") % 50 === 0,
      k = 5, beam = 8, rounds = 3, knnK = 3).head()
    assert(curve.last.getLong(2) == last.getLong(1) &&
      curve.last.getDouble(3) == last.getDouble(2))
  }

  test("persisted nav graph: indexed walk answers bit-identically; manifest gates") {
    val emb = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-nav-").toString
    Similarity.saveNavGraph(emb, path, 3, 6)
    val mem = Similarity.graphBeamSearch(emb, col("vec_id") % 50 === 0,
      5, 8, 3, 3).collect().map(_.toSeq).toSet
    val idx = Similarity.graphBeamSearchIndexed(spark, path, emb,
      col("vec_id") % 50 === 0, 5, 8, 3).collect().map(_.toSeq).toSet
    assert(mem == idx)
    intercept[Exception] {
      Similarity.graphBeamSearchIndexed(spark, path + "-missing", emb,
        col("vec_id") % 50 === 0, 5, 8, 3)
    }
  }

  // ---- d141: PMI collocations ----

  test("pmiCollocations: min-count respected, ranks total-ordered, score sane") {
    val docs = Tables.documents(spark, dir)
    val top = TextAnalysis.pmiCollocations(docs, 20, 5L, 5L)
      .orderBy(col("rank")).collect()
    assert(top.nonEmpty && top.forall(_.getLong(3) >= 5L))
    val pmis = top.map(_.getDouble(4)).toSeq
    assert(pmis == pmis.sorted(Ordering.Double.TotalOrdering.reverse))
    assert(top.forall(_.getDouble(5) >= 0.0)) // c2 >= delta
    // a pair repeated verbatim in every doc dominates an incidental one
    val fix = Seq(
      (1L, "alpha beta x1 y1 alpha beta"),
      (2L, "alpha beta x2 y2 alpha beta"),
      (3L, "alpha beta x3 y3 alpha beta"))
      .toDF("doc_id", "text")
    // minCount 2 drops the hapax middles (whose PMI is maximal by
    // definition — exactly what the published rare-pair guard is for)
    val t = TextAnalysis.pmiCollocations(fix, 5, 2L, 1L).collect()
    assert(t.head.getString(1) == "alpha" && t.head.getString(2) == "beta")
  }

  // ---- d142: char entropy ----

  test("charEntropy: 0 for single-char docs, ln(k) for uniform docs") {
    val fix = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aab"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.charEntropy(fix).orderBy(col("doc_id")).collect()
    assert(rows(0).getDouble(3) == 0.0)
    assert(math.abs(rows(1).getDouble(3) - math.log(4.0)) < 1e-7)
    // H(2/3, 1/3) = ln(3) - (2 ln 2)/3
    assert(math.abs(rows(2).getDouble(3) -
      (math.log(3.0) - 2.0 * math.log(2.0) / 3.0)) < 1e-7)
    assert(rows(1).getLong(1) == 4L && rows(1).getLong(2) == 4L)
    // corpus-wide: entropy is defined and non-negative everywhere
    val docs = Tables.documents(spark, dir)
    val h = TextAnalysis.charEntropy(docs)
    assert(h.count() == docs.count())
    assert(h.filter(col("entropy") < -1e-9).count() == 0)
  }

  // ---- e60/e61: JL projection ----

  test("jlProject: matches a JVM replay of the sign-matrix dot products") {
    val emb = Tables.embeddings(spark, dir)
    val signs = Similarity.jlSigns(8, 64)
    val raw = emb.selectExpr("vec_id",
      "transform(embedding, x -> cast(x as double)) AS ed").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rows = Similarity.jlProject(emb, 8, 64).collect()
    assert(rows.length == raw.size)
    rows.foreach { r =>
      val ed = raw(r.getLong(0))
      (0 until 8).foreach { i =>
        // the exact left-fold ArrayDotProduct replays as a sequential sum
        var acc = 0.0
        var k = 0
        while (k < 64) { acc += ed(k) * signs(i)(k); k += 1 }
        assert(r.getDouble(1 + i) == acc)
      }
    }
  }

  test("jlRecall: well-formed; the sign matrix is hash-derived, not constant") {
    val signs = Similarity.jlSigns(8, 64)
    val flat = signs.flatten
    assert(flat.forall(v => v == 1.0 || v == -1.0))
    assert(flat.count(_ > 0) > 100 && flat.count(_ < 0) > 100) // mixed
    val emb = Tables.embeddings(spark, dir)
    val r = Similarity.jlRecall(emb, col("vec_id") % 50 === 0, 5, 8, 64).head()
    assert(r.getLong(1) <= 5L * r.getLong(0))
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("jlRerank: scores are exact full-space cosines; rerank never loses hits") {
    val emb = Tables.embeddings(spark, dir)
    val rer = Similarity.jlRerankTopK(emb, col("vec_id") % 50 === 0, 3, 12, 8, 64)
    // reranked cosines equal the exact recomputation
    val n = emb.selectExpr("vec_id",
      "transform(embedding, x -> cast(x as double)) AS e")
      .withColumn("nrm", sqrt(graft.functions.ArrayDotProduct(col("e"), col("e"))))
    val q = n.select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val c = n.select(col("vec_id").as("neighbor_id"), col("e").as("ce"), col("nrm").as("cn"))
    assert(rer.join(q, "query_id").join(c, "neighbor_id")
      .filter(col("cosine") =!=
        graft.functions.ArrayDotProduct(col("qe"), col("ce")) /
          (col("qn") * col("cn")))
      .count() == 0)
    // rerank hits >= direct JL-top-k hits per query (any exact-top-k
    // member the JL order surfaced is in the shortlist, and rerank
    // cannot rank a non-member above it without that non-member being
    // exact-top-k itself)
    val rr = Similarity.jlRecallReranked(emb, col("vec_id") % 50 === 0, 3, 12, 8, 64)
      .select(col("query_id"), col("n_hit").as("h_rerank"))
    val reduced = Similarity.jlProject(emb, 8, 64)
      .select(col("vec_id"),
        array((0 until 8).map(i => col(s"r$i")): _*).as("embedding"))
    val direct = Similarity.cosineTopK(reduced, col("vec_id") % 50 === 0, 3)
      .select(col("query_id"), col("neighbor_id"))
    val exact = Similarity.cosineTopK(emb, col("vec_id") % 50 === 0, 3)
      .select(col("query_id"), col("neighbor_id"))
    val hDirect = exact.join(direct, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("h_direct"))
    assert(rr.join(hDirect, Seq("query_id"), "left_outer")
      .filter(coalesce(col("h_direct"), lit(0L)) > col("h_rerank"))
      .count() == 0)
  }

  // ---- stream-stream attribution join ----

  test("attributionJoin: stream result equals the batch kernel; bounds inclusive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val clicksIn = MemoryStream[(Long, Long, Long)]
    val purchIn = MemoryStream[(Long, Long, Long, Double)]
    val clicks = clicksIn.toDF().toDF("event_id", "user_id", "sec")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val purchases = purchIn.toDF().toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val out = graft.streaming.EventTimeOps
      .attributionJoin(clicks, purchases, maxDelaySec = 600)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // user 1: click at 100; purchases at 100 (boundary), 700
      // (boundary), 701 (outside); user 2's purchase must not match
      clicksIn.addData((1L, 1L, 100L))
      purchIn.addData((10L, 1L, 100L, 5.0), (11L, 1L, 700L, 7.0),
        (12L, 1L, 701L, 9.0), (13L, 2L, 200L, 11.0))
      out.processAllAvailable()
      val got = spark.table("attr_out")
        .select(col("click_id"), col("purchase_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (1L, 11L)), got.toString)
      // the batch kernel on the same static frames agrees row-for-row
      val bc = Seq((1L, 1L, ts(100))).toDF("event_id", "user_id", "ts")
      val bp = Seq((10L, 1L, ts(100), 5.0), (11L, 1L, ts(700), 7.0),
        (12L, 1L, ts(701), 9.0), (13L, 2L, ts(200), 11.0))
        .toDF("event_id", "user_id", "ts", "value")
      val batch = graft.streaming.EventTimeOps.attributionJoin(bc, bp, 600)
        .select(col("click_id"), col("purchase_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == got)
    } finally out.stop()
  }

  // ---- e64/e65: PCA power iteration ----

  test("pca: rank-1 fixture recovers the planted direction; variance explained = 1") {
    // all rows lie on the line t·(1, 0.1, 0, 0): covariance is rank 1,
    // one power step lands exactly on the direction, and the leading
    // eigenvalue carries ALL the variance
    val fix = (1 to 10).map(t =>
      (t.toLong, Array(t.toFloat, 0.1f * t, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val pc = Similarity.pcaTopComponent(fix, 4, 3)
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    assert(math.abs(pc(0) - 1.0) < 1e-6 && math.abs(pc(1) - 0.1) < 1e-6)
    assert(math.abs(pc(2)) < 1e-9 && math.abs(pc(3)) < 1e-9)
    val ve = Similarity.pcaVarianceExplained(fix, 4, 3).head()
    assert(math.abs(ve.getDouble(2) - 1.0) < 1e-9,
      s"var_explained=${ve.getDouble(2)}")
    // corpus: the diagnostic is well-formed and the isotropic control
    // sits far below 1
    val emb = Tables.embeddings(spark, dir)
    val r = Similarity.pcaVarianceExplained(emb, 64, 3).head()
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 0.5)
  }

  test("pcaSecondComponent: rank-2 fixture recovers the second axis, orthogonal") {
    // two independent zero-mean axes with var(dim0) >> var(dim1):
    // pc1 = e0 (the top seed converges immediately on a diagonal
    // covariance), deflation zeroes dim0, pc2 = e1 exactly
    val fix = Seq(
      (1L, Array(2.0f, 0.2f, 0.0f, 0.0f)), (2L, Array(-2.0f, 0.2f, 0.0f, 0.0f)),
      (3L, Array(2.0f, -0.2f, 0.0f, 0.0f)), (4L, Array(-2.0f, -0.2f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pc2 = Similarity.pcaSecondComponent(fix, 4, 3)
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    assert(math.abs(math.abs(pc2(1)) - 1.0) < 1e-6, pc2.mkString(","))
    assert(math.abs(pc2(0)) < 1e-6 && math.abs(pc2(2)) < 1e-9 &&
      math.abs(pc2(3)) < 1e-9, pc2.mkString(","))
    // corpus: pc2 is near-orthogonal to pc1 (both converged iterates)
    val emb = Tables.embeddings(spark, dir)
    val p1 = Similarity.pcaTopComponent(emb, 64, 3)
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    val p2 = Similarity.pcaSecondComponent(emb, 64, 3)
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    val dot = p1.zip(p2).map { case (a, b) => a * b }.sum
    val n1 = math.sqrt(p1.map(x => x * x).sum)
    val n2 = math.sqrt(p2.map(x => x * x).sum)
    assert(math.abs(dot / (n1 * n2)) < 0.2,
      s"pc1/pc2 far from orthogonal: ${dot / (n1 * n2)}")
  }

  test("pcaSpectrum: rank-2 fixture recovers both variances; shares sum to 1") {
    // two independent zero-mean axes: var(dim0) = 4, var(dim1) = 0.04,
    // nothing else — the two components carry ALL the variance, so
    // lambda1 ~ 4, lambda2 ~ 0.04, share1 + share2 ~ 1
    val fix = Seq(
      (1L, Array(2.0f, 0.2f, 0.0f, 0.0f)), (2L, Array(-2.0f, 0.2f, 0.0f, 0.0f)),
      (3L, Array(2.0f, -0.2f, 0.0f, 0.0f)), (4L, Array(-2.0f, -0.2f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.trainSpectral(fix, 4, 3)
    val rows = Similarity.pcaSpectrum(m).orderBy(col("component")).collect()
    assert(rows.length == 2)
    val (l1, s1) = (rows(0).getDouble(1), rows(0).getDouble(3))
    val (l2, s2) = (rows(1).getDouble(1), rows(1).getDouble(3))
    assert(math.abs(l1 - 4.0) < 1e-6 && math.abs(l2 - 0.04) < 1e-6,
      s"l1=$l1 l2=$l2")
    // 1e-8: lambda2's iterate rides the lesson-36 decimal quanta, so
    // the share sum misses exact 1 by ~1e-9 on this fixture
    assert(math.abs(s1 + s2 - 1.0) < 1e-8, s"s1=$s1 s2=$s2")
    // corpus: both shares well-formed, decay ordered, isotropic control
    val emb = Tables.embeddings(spark, dir)
    val cr = Similarity.pcaSpectrum(Similarity.trainSpectral(emb, 64, 3))
      .orderBy(col("component")).collect()
    assert(cr(0).getDouble(3) > 0 && cr(0).getDouble(3) < 0.5 &&
      cr(1).getDouble(3) > 0 && cr(1).getDouble(3) <= cr(0).getDouble(3) * 1.5)
  }

  test("spectral artifact: load serves bit-identically; sync policy fresh/rebuild; guards fire") {
    import graft.sources.{IndexManifest, IndexManifestException}
    val emb = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-spec-").toString
    // bit-identity: persisted model → identical published component
    Similarity.saveSpectralIndex(emb, path, 64, 3)
    val direct = Similarity.pcaTopComponent(emb, 64, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val loaded = Similarity.pcaTopComponentOf(
      Similarity.loadSpectralIndex(spark, path))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(loaded == direct && direct.size == 64)
    // ...and the dims²-only consumers match their in-memory twins too
    val veD = Similarity.pcaVarianceExplained(emb, 64, 3).head()
    val veL = Similarity.pcaVarianceExplainedOf(
      Similarity.loadSpectralIndex(spark, path)).head()
    assert(veD.getDouble(0) == veL.getDouble(0) &&
      veD.getDouble(1) == veL.getDouble(1) &&
      veD.getDouble(2) == veL.getDouble(2))
    // sync policy: same corpus+params = fresh no-op; monotone growth =
    // APPEND (e76: the sufficient statistics merge exactly — one
    // increment-sized pass, zero corpus rescans); missing = rebuild
    assert(Similarity.spectralIndexSync(emb, path, 64, 3) == "fresh")
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    val p2 = java.nio.file.Files.createTempDirectory("graft-spec2-").toString
    Similarity.saveSpectralIndex(emb.filter(col("vec_id") <= cut), p2, 64, 3)
    assert(Similarity.spectralIndexSync(emb, p2, 64, 3) == "append")
    assert(Similarity.spectralIndexSync(emb, p2, 64, 3) == "fresh")
    // the MERGED model is BIT-IDENTICAL to the one-pass full-corpus
    // chain (the e42 standard — exact decimal sums merge associatively,
    // everything downstream is the shared deterministic derivation)
    val synced = Similarity.pcaTopComponentOf(
      Similarity.loadSpectralIndex(spark, p2))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(synced == direct)
    // ...covariance and iterate tables included, entry for entry
    val covA = spark.read.parquet(s"$p2/cov")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val covB = spark.read.parquet(s"$path/cov")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(covA == covB && covA.size == 64 * 64)
    val itA = spark.read.parquet(s"$p2/iter")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val itB = spark.read.parquet(s"$path/iter")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(itA == itB)
    // a non-monotone change (shrink) still rebuilds
    assert(Similarity.spectralIndexSync(
      emb.filter(col("vec_id") <= cut), p2, 64, 3) == "rebuild")
    // param drift rebuilds rather than serving a mismatched geometry
    assert(Similarity.spectralIndexSync(emb, p2, 64, 2) == "rebuild")
    assert(IndexManifest.read(p2).params("iters") == 2L)
    // unmanifested directory is untrusted by definition
    val p3 = java.nio.file.Files.createTempDirectory("graft-spec3-").toString
    intercept[IndexManifestException] { Similarity.loadSpectralIndex(spark, p3) }
  }

  test("pcaDebias: rank-1 fixture collapses to ~0; corpus output orthogonal to the top direction") {
    // all rows on one line: removing the mean and the top component
    // must leave (numerically) nothing
    val fix = (1 to 10).map(t =>
      (t.toLong, Array(t.toFloat, 0.1f * t, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val mFix = Similarity.trainSpectral(fix, 4, 3)
    val residual = Similarity.pcaDebias(fix, mFix)
      .select(explode(col("embedding")).as("x"))
      .agg(max(abs(col("x")))).head().getDouble(0)
    assert(residual < 1e-6, s"rank-1 residual $residual")
    // corpus: every re-encoded vector is orthogonal to v̂₁ up to the
    // projection coefficient's decimal quanta (the removal REMOVED)
    val emb = Tables.embeddings(spark, dir)
    val m = Similarity.trainSpectral(emb, 64, 3)
    val deb = Similarity.pcaDebias(emb, m)
    // u via the artifact-free route: iterate / ||iterate||
    val it = m.iter.orderBy(col("j")).collect().map(_.getDouble(1))
    val nrm = math.sqrt(it.map(v => BigDecimal(v * v)
      .setScale(24, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    val u = it.map(_ / nrm)
    val maxDot = deb.select(col("embedding")).collect().map { r =>
      math.abs(r.getSeq[Double](0).zip(u).map { case (a, b) => a * b }.sum)
    }.max
    assert(maxDot < 1e-9, s"max |<x', u>| = $maxDot")
    // shape: one row per vector, dims preserved
    assert(deb.count() == emb.count())
    assert(deb.select(size(col("embedding"))).distinct().head().getInt(0) == 64)
  }

  test("ivfTopKTrained: k rows per query; probes clamp to surviving cells") {
    val emb = Tables.embeddings(spark, dir)
    val r = Similarity.ivfTopKTrained(emb, col("vec_id") % 50 === 0, 3, 8, 2, 4)
    val perQ = r.groupBy(col("query_id")).count().select(col("count")).collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(0) <= 3L))
    // probes beyond the trained cell count clamp instead of erroring
    // (a dead centroid shrinking the table must not kill the query);
    // probing ALL cells = the exact scan restricted to the top-k
    val all = Similarity.ivfTopKTrained(emb, col("vec_id") % 50 === 0, 3, 8, 2, 99)
      .select(col("query_id"), col("neighbor_id")).collect().map(_.toSeq).toSet
    val exact = Similarity.cosineTopK(emb, col("vec_id") % 50 === 0, 3)
      .select(col("query_id"), col("neighbor_id")).collect().map(_.toSeq).toSet
    assert(all == exact, "probing every trained cell must equal the exact top-k")
  }

  // ---- d147: AMS F2 ----

  test("amsF2: exact F2 matches a direct count; estimate well-formed") {
    val docs = Tables.documents(spark, dir)
    val row = TextAnalysis.amsF2(docs, 8).head()
    val direct = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    assert(row.getLong(0) == direct)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(2) >= 0.0)
    // unbiasedness sanity on a constructed stream: a single word with
    // count c has X = ±c for EVERY estimator, so the estimate is exact
    val one = Seq((1L, "w w w w w")).toDF("doc_id", "text")
    val r1 = TextAnalysis.amsF2(one, 4).head()
    assert(r1.getLong(0) == 25L && r1.getDouble(1) == 25.0 &&
      r1.getDouble(2) == 0.0)
  }

  // ---- d152: source overlap ----

  test("sourceOverlap: planted mirror scores 1.0 one way; disjoint sources absent") {
    val words = (1 to 30).map(i => s"m$i")
    val fix = Seq(
      (1L, words.mkString(" "), "orig"),           // the full corpus
      (2L, words.take(12).mkString(" "), "mirror"), // subset mirror
      (3L, "totally different words here now", "other"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.sourceOverlap(fix, 0.5).collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(3))).toSet
    // all of mirror's shingles are in orig -> C(mirror->orig) = 1.0;
    // the reverse direction is 10/28 < 0.5; 'other' shares nothing
    assert(r == Set(("mirror", "orig", 1.0)), r.toString)
  }

  // ---- d151: Good-Turing ----

  test("countOfCounts: identities hold (Σ n_c = vocab, Σ mass = 1, c* bridges)") {
    val docs = Tables.documents(spark, dir)
    val cc = TextAnalysis.countOfCounts(docs).orderBy(col("c")).collect()
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    assert(cc.map(_.getLong(1)).sum == vocab)
    assert(math.abs(cc.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(cc.last.isNullAt(3)) // top frequency has no n_{c+1}
    // fixture: 'a' ×3, 'b' ×1, 'c' ×1 → n_1=2, n_3=1; c*(1) = 2·n_2/n_1
    // with n_2 absent → NULL; mass(1) = 2/5
    val fix = Seq((1L, "a a a b c")).toDF("doc_id", "text")
    val f = TextAnalysis.countOfCounts(fix).orderBy(col("c")).collect()
    assert(f(0).getLong(0) == 1L && f(0).getLong(1) == 2L &&
      f(0).getDouble(2) == 0.4 && f(0).isNullAt(3))
    assert(f(1).getLong(0) == 3L && f(1).getLong(1) == 1L)
  }

  // ---- d150: source boilerplate ----

  test("sourceBoilerplate: planted template counts, distinct-source scores 0") {
    val fix = Seq(
      (1L, "a b c u1 u2 u3", "s1"), (2L, "a b c v1 v2 v3", "s1"),
      (3L, "a b c w1 w2 w3", "s1"), (4L, "x y z q1 q2 q3", "s1"),
      (5L, "p q r one", "s2"), (6L, "s t u two", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.sourceBoilerplate(fix).orderBy(col("source")).collect()
    // s1: 'a b c' and 'b c u?'-style grams — only grams in >= 2 of 4
    // docs qualify; 'a b c' appears in 3/4 docs (>= half) -> boiler
    val s1 = r(0)
    assert(s1.getString(0) == "s1" && s1.getLong(1) == 4L)
    assert(s1.getLong(3) == 1L, s"n_boiler=${s1.getLong(3)}") // just 'a b c'
    val s2 = r(1)
    assert(s2.getString(0) == "s2" && s2.getLong(3) == 0L &&
      s2.getDouble(4) == 0.0)
  }

  // ---- d149: KS test ----

  test("ksTwoSample: 0 on identical samples, 1 on disjoint, exact on a shift") {
    def ks(a: Seq[Double], b: Seq[Double]): Double = {
      val df = (a.map((_, true)) ++ b.map((_, false)))
        .zipWithIndex.map { case ((v, s), i) => (i.toLong, v, s) }
        .toDF("id", "value", "isA")
      Sampling.ksTwoSample(df, col("isA"), col("value")).head().getDouble(2)
    }
    assert(ks(Seq(1, 2, 3), Seq(1, 2, 3)) == 0.0)
    assert(ks(Seq(1, 2), Seq(10, 20)) == 1.0)
    // A = {1,2,3,4}, B = {3,4,5,6}: sup gap at x = 2 is 2/4 - 0 = 0.5
    assert(ks(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6)) == 0.5)
    // one-sided input (a misconfigured monitor) fails LOUDLY instead of
    // streaming NaN "no drift" forever
    val oneSided = intercept[Exception] { ks(Seq(1, 2, 3), Seq.empty) }
    assert(oneSided.getMessage.contains("one-sided") ||
      Option(oneSided.getCause).exists(_.getMessage.contains("one-sided")),
      oneSided.getMessage)
  }

  test("ksDriftIngest: per-batch statistic equals the batch kernel verbatim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Seq(1.0, 2.0, 3.0, 4.0).map(Tuple1(_)).toDF("value")
    val in = MemoryStream[Double]
    val stream = in.toDF().toDF("value")
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, Double)]
    val q = graft.streaming.EventTimeOps.ksDriftIngest(stream, ref)(
      (out, id) => { val r = out.head(); seen.put(id, (r.getLong(0), r.getLong(1), r.getDouble(2))) })
      .start()
    try {
      in.addData(1.0, 2.0, 3.0, 4.0) // same distribution -> D = 0
      q.processAllAvailable()
      in.addData(10.0, 20.0) // disjoint above -> D = 1
      q.processAllAvailable()
      val vals = seen.values()
      assert(vals.size() == 2, seen.toString)
      import scala.jdk.CollectionConverters._
      val ds = vals.asScala.map(_._3).toSet
      assert(ds == Set(0.0, 1.0), seen.toString)
      // kernel-verbatim: recompute one batch with the registered op
      val merged = ref.withColumn("isA", lit(true))
        .unionByName(Seq(10.0, 20.0).map(Tuple1(_)).toDF("value")
          .withColumn("isA", lit(false)))
      val k = Sampling.ksTwoSample(merged, col("isA"), col("value")).head()
      assert(k.getDouble(2) == 1.0 && k.getLong(0) == 4L && k.getLong(1) == 2L)
    } finally q.stop()
  }

  test("tokenDriftIngest: per-batch statistic equals the d119 batch kernel verbatim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val refDocs = Seq((1L, "a b c a b"), (2L, "b c d")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Any]]
    val q = graft.streaming.EventTimeOps.tokenDriftIngest(stream, refDocs)(
      (out, id) => { val r = out.head(); seen.put(id, r.toSeq) }).start()
    try {
      in.addData((10L, "a b c"), (11L, "b c d a"))   // shared vocabulary
      q.processAllAvailable()
      in.addData((12L, "x y z z"))                   // fully OOV
      q.processAllAvailable()
      assert(seen.size() == 2, seen.toString)
      // kernel-verbatim: each batch recomputed with the registered op
      def batchRun(docs: Seq[(Long, String)]): Seq[Any] =
        TextAnalysis.tokenDrift(
          refDocs.withColumn("isRef", lit(true)).unionByName(
            docs.toDF("doc_id", "text").withColumn("isRef", lit(false))),
          col("isRef")).head().toSeq
      val b0 = batchRun(Seq((10L, "a b c"), (11L, "b c d a")))
      val b1 = batchRun(Seq((12L, "x y z z")))
      import scala.jdk.CollectionConverters._
      val got = seen.asScala.toSeq.sortBy(_._1).map(_._2)
      assert(got == Seq(b0, b1), s"got=$got expected=${Seq(b0, b1)}")
      // the fully-OOV batch reads as total drift: oov_mass_new = 1
      assert(b1(3) == 1.0 && b1(0) == 8L && b1(1) == 4L, b1.toString)
    } finally q.stop()
  }

  test("embedDriftIngest: per-batch statistic equals the e51 batch kernel verbatim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // every dim varies in every slice (a zero-variance dim makes the
    // e51 variance RATIO 0/0 by the kernel's own definition)
    val refDocs = Seq((1L, Seq(1.0, 5.0, 3.0)), (2L, Seq(3.0, 2.0, 1.0)),
      (3L, Seq(2.0, 3.0, 2.0))).toDF("vec_id", "embedding")
    val in = MemoryStream[(Long, Seq[Double])]
    val stream = in.toDF().toDF("vec_id", "embedding")
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Any]]
    val q = graft.streaming.EventTimeOps.embedDriftIngest(stream, refDocs)(
      (out, id) => { val r = out.head(); seen.put(id, r.toSeq) }).start()
    try {
      in.addData((10L, Seq(1.0, 4.0, 3.0)), (11L, Seq(3.0, 2.0, 1.0)))
      q.processAllAvailable()
      in.addData((12L, Seq(10.0, 20.0, 30.0)), (13L, Seq(30.0, 24.0, 10.0)))
      q.processAllAvailable()
      assert(seen.size() == 2, seen.toString)
      def batchRun(vecs: Seq[(Long, Seq[Double])]): Seq[Any] =
        Similarity.embedDrift(
          refDocs.withColumn("isRef", lit(true)).unionByName(
            vecs.toDF("vec_id", "embedding").withColumn("isRef", lit(false))),
          col("isRef")).head().toSeq
      val b0 = batchRun(Seq((10L, Seq(1.0, 4.0, 3.0)), (11L, Seq(3.0, 2.0, 1.0))))
      val b1 = batchRun(Seq((12L, Seq(10.0, 20.0, 30.0)), (13L, Seq(30.0, 24.0, 10.0))))
      import scala.jdk.CollectionConverters._
      val got = seen.asScala.toSeq.sortBy(_._1).map(_._2)
      assert(got == Seq(b0, b1), s"got=$got expected=${Seq(b0, b1)}")
      // the shifted batch reads a large mean displacement, the matched
      // batch a small one
      assert(b1(2).asInstanceOf[Double] > 100.0 * b0(2).asInstanceOf[Double],
        s"b0=$b0 b1=$b1")
    } finally q.stop()
  }

  // ---- d148: chi-square ----

  test("chiSquareFeatures: perfect association scores N, independence scores 0") {
    val fix = Seq(
      (1L, "only_en mixed pad1", "en"), (2L, "only_en pad2", "en"),
      (3L, "mixed pad3", "es"), (4L, "pad4", "es"))
      .toDF("doc_id", "text", "lang")
    val top = TextAnalysis.chiSquareFeatures(fix, col("lang") === "en", 20)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(top("only_en") == 4.0, s"got ${top.get("only_en")}") // = N
    assert(top("mixed") == 0.0)
    // corpus: ranked output is total-ordered and the statistic bounded
    val docs = Tables.documents(spark, dir)
    val t = TextAnalysis.chiSquareFeatures(docs, col("lang") === "en", 20)
      .orderBy(col("rank")).collect()
    val n = docs.count().toDouble
    assert(t.nonEmpty && t.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= n))
    val cs = t.map(_.getDouble(4)).toSeq
    assert(cs == cs.sorted(Ordering.Double.TotalOrdering.reverse))
  }

  // ---- e58/e59: filtered ANN ----

  test("annTopKFiltered: every result carries the required label; recall well-formed") {
    val emb = Tables.embeddings(spark, dir)
    val res = Similarity.annTopKFiltered(emb, col("vec_id") % 50 === 0,
      col("label") === 3, 3, 6)
    val labeled = res.join(
      emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
    assert(labeled.filter(col("label") =!= 3).count() == 0)
    assert(res.filter(col("neighbor_id") === col("query_id")).count() == 0)
    val r = Similarity.filteredAnnRecall(emb, col("vec_id") % 50 === 0,
      col("label") === 3, 3, 6).head()
    val (nExact, nHits, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nHits <= nExact && recall >= 0.0 && recall <= 1.0)
    // the exact filtered baseline also honors the label cut
    val exBad = Similarity.cosineTopK(emb, col("vec_id") % 50 === 0, 3,
        col("label") === 3)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
        "neighbor_id")
      .filter(col("label") =!= 3).count()
    assert(exBad == 0)
  }

  // ---- d143: blocklist ----

  test("blocklistFilter: token-level, case-insensitive, no substring hits") {
    val fix = Seq(
      (1L, "clean text here"),
      (2L, "contains BADWORD here"),
      (3L, "badwordish is innocent"), // substring must NOT hit
      (4L, "badword badword twice"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.blocklistFilter(fix, Seq("badword"))
      .orderBy(col("doc_id")).collect()
    assert(r.map(x => (x.getLong(1), x.getBoolean(2))).toSeq ==
      Seq((0L, true), (1L, false), (0L, true), (2L, false)))
  }

  // ---- d144/d145: z-order ----

  test("zKey: expression matches an independent JVM interleave") {
    def jvmZ(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(j => (((x >> j) & 1L) << (2 * j)) |
        (((y >> j) & 1L) << (2 * j + 1))).sum
    val ev = Tables.events(spark, dir)
    val rows = ZOrder.eventGrid(ev, 10)
      .select(col("ux"), col("ty"), col("zkey")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == jvmZ(r.getLong(0), r.getLong(1), 10))
    }
  }

  test("bucketsFor: point rectangle hits one bucket, full domain all 16") {
    assert(ZOrder.bucketsFor(0, 1023, 0, 1023, 10, 4).size == 16)
    assert(ZOrder.bucketsFor(5, 5, 5, 5, 10, 4).size == 1)
    // a rectangle spanning one x-cell but all y hits 4 buckets
    assert(ZOrder.bucketsFor(0, 255, 0, 1023, 10, 4).size == 4)
  }

  test("zRectQuery: pruned store answers identically to the direct filter") {
    val ev = Tables.events(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    ZOrder.saveZOrderedStore(ev, path, 10, 4)
    val g = ZOrder.eventGrid(ev, 10)
    val b = g.agg(min(col("ux")), max(col("ux")), min(col("ty")), max(col("ty"))).head()
    val (uxLo, uxHi) = (b.getLong(0), (b.getLong(0) + b.getLong(1)) / 2)
    val (tyLo, tyHi) = (b.getLong(2), (b.getLong(2) + b.getLong(3)) / 2)
    val direct = g.filter(col("ux").between(uxLo, uxHi) &&
        col("ty").between(tyLo, tyHi))
      .select(col("event_id"), col("user_id"), col("ts"), col("ux"), col("ty"))
      .collect().map(_.toSeq).toSet
    val pruned = ZOrder.zRectQuery(spark, path, uxLo, uxHi, tyLo, tyHi)
      .collect().map(_.toSeq).toSet
    assert(pruned == direct && direct.nonEmpty)
    // and the bucket set genuinely prunes for a sub-domain rectangle
    assert(ZOrder.bucketsFor(uxLo, uxHi, tyLo, tyHi, 10, 4).size < 16)
    // the reader takes its geometry from the manifest, not the caller:
    // a store built with DIFFERENT params must still answer correctly
    // through the same call (no bits/bucketBits to get wrong)
    val path2 = java.nio.file.Files.createTempDirectory("graft-zorder8-").toString
    ZOrder.saveZOrderedStore(ev, path2, 8, 2)
    val g8 = ZOrder.eventGrid(ev, 8)
    val direct8 = g8.filter(col("ux").between(0, 127) && col("ty").between(0, 127))
      .select(col("event_id"), col("user_id"), col("ts"), col("ux"), col("ty"))
      .collect().map(_.toSeq).toSet
    val pruned8 = ZOrder.zRectQuery(spark, path2, 0, 127, 0, 127)
      .collect().map(_.toSeq).toSet
    assert(pruned8 == direct8 && direct8.nonEmpty)
  }

  test("zorder time travel: version list, snapshot == history build, latest == current, guards") {
    import graft.sources.{IndexManifest, IndexManifestException}
    val ev = Tables.events(spark, dir)
    val cut = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    val path = java.nio.file.Files.createTempDirectory("graft-ztt-").toString
    ZOrder.saveZOrderedStore(ev.filter(col("event_id") <= cut), path, 10, 4)
    ZOrder.appendZOrderedStore(ev.filter(col("event_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    // version 1's watermark is the build cut
    assert(IndexManifest.readVersion(path, 1).corpusMaxId == cut)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // snapshot v1 == a direct store built on the history half alone
    val p1 = java.nio.file.Files.createTempDirectory("graft-ztt1-").toString
    ZOrder.saveZOrderedStore(ev.filter(col("event_id") <= cut), p1, 10, 4)
    val v1 = rows(ZOrder.zRectQueryAt(spark, path, 1, 0, 1023, 0, 1023))
    assert(v1 == rows(ZOrder.zRectQuery(spark, p1, 0, 1023, 0, 1023)))
    assert(v1.nonEmpty)
    // snapshot at the LATEST version == the current read
    val v2 = rows(ZOrder.zRectQueryAt(spark, path, 2, 0, 1023, 0, 1023))
    assert(v2 == rows(ZOrder.zRectQuery(spark, path, 0, 1023, 0, 1023)))
    assert(v1.subsetOf(v2) && v1.size < v2.size)
    // a missing version is a named error listing what exists
    val e = intercept[IndexManifestException] {
      ZOrder.zRectQueryAt(spark, path, 7, 0, 1023, 0, 1023)
    }
    assert(e.getMessage.contains("no version 7") &&
      e.getMessage.contains("1, 2"), e.getMessage)
  }

  test("srp time travel: snapshot serve == direct history-build serve; missing version loud") {
    import graft.sources.{IndexManifest, IndexManifestException}
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    val path = java.nio.file.Files.createTempDirectory("graft-srptt-").toString
    Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), path, 16, 3)
    Similarity.appendSrpIndex(emb.filter(col("vec_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    val pHist = java.nio.file.Files.createTempDirectory("graft-srph-").toString
    Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), pHist, 16, 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val pred = col("vec_id") % 50 === 0
    // as-of v1 == serving a store that only ever saw the history half
    // (full-corpus queries both times — only the CANDIDATES travel)
    val atV1 = rows(Similarity.srpBucketTopKIndexed(emb, pred, path, 3,
      pruneScan = true, asOfVersion = Some(1)))
    val hist = rows(Similarity.srpBucketTopKIndexed(emb, pred, pHist, 3,
      pruneScan = true))
    assert(atV1 == hist && atV1.nonEmpty)
    // as-of the latest version == the current serve
    val atV2 = rows(Similarity.srpBucketTopKIndexed(emb, pred, path, 3,
      pruneScan = true, asOfVersion = Some(2)))
    assert(atV2 == rows(Similarity.srpBucketTopKIndexed(emb, pred, path, 3,
      pruneScan = true)))
    val e = intercept[IndexManifestException] {
      Similarity.srpBucketTopKIndexed(emb, pred, path, 3,
        asOfVersion = Some(9)).collect()
    }
    assert(e.getMessage.contains("no version 9"), e.getMessage)
    // an overwrite rebuild RESETS the lineage: stale snapshots would
    // claim watermarks the rewritten data no longer corresponds to
    Similarity.saveSrpIndex(emb, path, 16, 3)
    assert(IndexManifest.versions(path) == Seq(1))
    assert(IndexManifest.readVersion(path, 1).corpusMaxId ==
      emb.agg(max(col("vec_id"))).head().getLong(0))
  }

  test("ivf-sq8 time travel: snapshot serve == direct history-build serve (frozen book)") {
    import graft.sources.IndexManifest
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    val path = java.nio.file.Files.createTempDirectory("graft-ivftt-").toString
    Similarity.saveIvfSq8Index(emb.filter(col("vec_id") <= cut), path,
      16, partitionByCell = true)
    Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    // v1's codebook IS the live codebook (appends never retrain), so
    // the snapshot equals a store that only ever saw the history half
    val pHist = java.nio.file.Files.createTempDirectory("graft-ivfh-").toString
    Similarity.saveIvfSq8Index(emb.filter(col("vec_id") <= cut), pHist,
      16, partitionByCell = true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val pred = col("vec_id") % 50 === 0
    val atV1 = rows(Similarity.ivfSq8TopKIndexed(emb, pred, path, 3, 4,
      pruneScan = true, asOfVersion = Some(1)))
    assert(atV1 == rows(Similarity.ivfSq8TopKIndexed(emb, pred, pHist, 3, 4,
      pruneScan = true)) && atV1.nonEmpty)
    val atV2 = rows(Similarity.ivfSq8TopKIndexed(emb, pred, path, 3, 4,
      pruneScan = true, asOfVersion = Some(2)))
    assert(atV2 == rows(Similarity.ivfSq8TopKIndexed(emb, pred, path, 3, 4,
      pruneScan = true)))
  }

  test("gram-index time travel: snapshot probe == pre-append cut; latest self-cuts; guards") {
    import graft.sources.{IndexManifest, IndexManifestException}
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val hist = docs.filter(col("doc_id") <= cut)
    val inc = docs.filter(col("doc_id") > cut)
    val path = java.nio.file.Files.createTempDirectory("graft-gtt-").toString
    Dedup.saveGramIndex(hist, path, 8)
    Dedup.appendGramIndex(inc, path, 8)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // as-of v1 == probing an index that only ever saw history
    val pHist = java.nio.file.Files.createTempDirectory("graft-gh-").toString
    Dedup.saveGramIndex(hist, pHist, 8)
    val atV1 = rows(Dedup.exactSubstrIncrementalIndexed(inc, path, 8,
      asOfVersion = Some(1)))
    assert(atV1 == rows(Dedup.exactSubstrIncrementalIndexed(inc, pHist, 8)))
    assert(atV1.nonEmpty)
    // the LATEST index contains the increment's OWN grams, so probing
    // it cuts every >= minLen doc completely — the contrast that makes
    // the snapshot read the only way to recover pre-append behavior
    val atLatest = Dedup.exactSubstrIncrementalIndexed(inc, path, 8)
    val longDocs = atLatest.filter(col("n_words") >= 8)
    assert(longDocs.count() > 0 &&
      longDocs.filter(col("clean_text") =!= "").count() == 0L,
      "latest-version probe must self-cut every >= minLen doc")
    // non-monotone append is a named error
    val e = intercept[IndexManifestException] { Dedup.appendGramIndex(inc, path, 8) }
    assert(e.getMessage.contains("id-monotone"))
    // a rebuild resets the lineage
    Dedup.saveGramIndex(docs, path, 8)
    assert(IndexManifest.versions(path) == Seq(1))
  }

  test("zorder append: equals rebuild row-for-row; guards fire") {
    import graft.sources.{IndexManifest, IndexManifestException}
    val ev = Tables.events(spark, dir)
    val cut = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    val hist = ev.filter(col("event_id") <= cut)
    val inc = ev.filter(col("event_id") > cut)
    val p1 = java.nio.file.Files.createTempDirectory("graft-zap-").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft-zfull-").toString
    ZOrder.saveZOrderedStore(hist, p1, 10, 4)
    ZOrder.appendZOrderedStore(inc, p1)
    ZOrder.saveZOrderedStore(ev, p2, 10, 4)
    def rows(p: String) = spark.read.parquet(s"$p/data")
      .select(col("event_id"), col("zkey"), col("zbucket").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(rows(p1) == rows(p2))
    // non-monotone append is a named error
    val e = intercept[IndexManifestException] { ZOrder.appendZOrderedStore(inc, p1) }
    assert(e.getMessage.contains("id-monotone"))
    // crashed-append window: data landed, manifest flip lost → orphans
    val stale = IndexManifest.read(p2)
    val inc2 = ev.filter(col("event_id") > cut) // ids below p2's watermark
    val p3 = java.nio.file.Files.createTempDirectory("graft-zorph-").toString
    ZOrder.saveZOrderedStore(hist, p3, 10, 4)
    val preAppend = IndexManifest.read(p3)
    ZOrder.appendZOrderedStore(inc2, p3)
    IndexManifest.write(p3, preAppend) // simulate the lost flip
    val e2 = intercept[IndexManifestException] { ZOrder.appendZOrderedStore(inc2, p3) }
    assert(e2.getMessage.contains("watermark"))
  }

  // ---- m11: media admission ----

  test("mediaAdmission: keep = conjunction of the three bounds; rules bite") {
    val docs = Tables.documents(spark, dir)
    val adm = Multimodal.mediaAdmission(Multimodal.mediaView(docs)).cache()
    try {
      assert(adm.filter(col("keep") =!=
        (col("ok_dim") && col("ok_aspect") && col("ok_bytes"))).count() == 0)
      // every rule splits the corpus (the gate is not vacuous)
      Seq("ok_dim", "ok_aspect", "ok_bytes").foreach { c =>
        val n = adm.filter(col(c)).count()
        assert(n > 0 && n < adm.count(), s"$c is vacuous: $n")
      }
      // dims match the decode stub's arithmetic
      val bad = adm.filter(
        col("width") =!= (lit(16) + col("n_bytes") % 64) ||
          col("height") =!= (lit(16) + (expr("n_bytes div 64")) % 64)).count()
      assert(bad == 0)
    } finally adm.unpersist()
  }

  // ---- d136: Kneser-Ney ----

  test("kneserNeyLm: covers the d45 doc set; nll positive; per-context mass <= 1") {
    val docs = Tables.documents(spark, dir)
    val kn = TextAnalysis.kneserNeyLm(docs).cache()
    try {
      val d45 = TextAnalysis.bigramLm(docs)
      assert(kn.select("doc_id").collect().map(_.getLong(0)).toSet ==
        d45.select("doc_id").collect().map(_.getLong(0)).toSet)
      assert(kn.filter(col("avg_nll") <= 0.0).count() == 0)
      // reconstruct the model and check sum over SEEN continuations of
      // P(cur|prev) <= 1 for every context (the discount guarantees
      // headroom for unseen mass)
      val g = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(2, size(w)), i -> struct(element_at(w, i - 1) AS prev, element_at(w, i) AS cur))")).as("b"))
        .select(col("b.prev").as("prev"), col("b.cur").as("cur"))
      val c2 = g.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("prev").agg(sum("c2").as("c1"), count(lit(1)).as("n1p"))
      val n1r = c2.groupBy("cur").agg(count(lit(1)).as("n1r"))
      val b = c2.count()
      val overMass = c2.join(c1, "prev").join(n1r, "cur")
        .select(col("prev"), (((col("c2").cast("double") - 0.75) / col("c1")) +
          (lit(0.75) * col("n1p") / col("c1")) * (col("n1r").cast("double") / b))
          .as("p"))
        .groupBy("prev").agg(sum("p").as("mass"))
        .filter(col("mass") > 1.0 + 1e-9)
        .count()
      assert(overMass == 0)
    } finally kn.unpersist()
  }

  // ---- d137/d138: WordPiece ----

  test("wordPiece: segments reconstruct the marked word; counts consistent") {
    val docs = Tables.documents(spark, dir)
    val merges = TextAnalysis.bpeTrain(docs, 5)
    val seg = TextAnalysis.wordPieceSegments(docs, merges).cache()
    try {
      val bad = seg.filter(
        expr("concat(word, '¶') <> array_join(split(seg, '\\\\|'), '')") ||
          col("n_pieces") =!= size(split(col("seg"), "\\|")))
        .count()
      assert(bad == 0)
      // greedy never yields more pieces than characters (+ marker)
      assert(seg.filter(col("n_pieces") > length(col("word")) + 1).count() == 0)
      val enc = TextAnalysis.wordPieceEncode(docs, merges)
      // every word >= 1 piece, so per-doc wp tokens >= words
      assert(enc.filter(col("n_tokens_wp") < col("n_words")).count() == 0)
      // both tokenizers cover the same doc set
      assert(enc.count() == docs.count())
    } finally seg.unpersist()
  }

  test("wordPiece greedy takes the longest prefix (constructed fixture)") {
    // vocabulary engineered so greedy and merge-replay disagree:
    // corpus of 'abab' words makes merges (a,b)->ab then (ab,ab)->abab;
    // the word 'ababa' greedy-segments as [abab, a, ¶] — the longest
    // piece wins at position 1 even though merge replay on 'ababa'
    // would stop at [ab, ab, a, ¶]
    val docs = Seq((1L, "abab abab abab ababa"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, 2)
    val seg = TextAnalysis.wordPieceSegments(docs, merges)
      .filter(col("word") === "ababa").head()
    assert(seg.getAs[String]("seg") == "abab|a|¶",
      s"got ${seg.getAs[String]("seg")}")
  }

  // ---- d139: containment ----

  test("containment >= jaccard on every co-occurring pair; planted subset scores 1.0") {
    val slice = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val cont = Dedup.containmentPairs(slice, 0.0, 10000L)
      .withColumnRenamed("doc_src", "doc_a")
      .withColumnRenamed("doc_dst", "doc_b")
    val jac = Dedup.jaccardAll(slice, 0.0, 10000L)
    val bad = cont.join(jac, Seq("doc_a", "doc_b"))
      .filter(col("containment") < col("jaccard") - lit(1e-12)).count()
    assert(bad == 0)
    // planted: A's text is a prefix slice of B's -> containment(A->B)=1
    val words = (1 to 40).map(i => s"w$i")
    val fix = Seq(
      (1L, words.take(10).mkString(" ")),
      (2L, words.mkString(" "))).toDF("doc_id", "text")
    val planted = Dedup.containmentPairs(fix, 0.5, 10000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(planted.contains((1L, 2L, 1.0)), s"got $planted")
    assert(!planted.exists(p => p._1 == 2L && p._3 >= 0.5))
  }

  // ---- d140: preference pairs ----

  test("preferencePairs: chosen outranks rejected; all-equal groups pick (min,max)") {
    val docs = Tables.documents(spark, dir)
    val pp = Curation.preferencePairs(docs).cache()
    try {
      assert(pp.filter(col("chosen_score") < col("rejected_score")).count() == 0)
      assert(pp.filter(col("chosen_id") === col("rejected_id")).count() == 0)
      assert(pp.filter(col("margin") < 0.0).count() == 0)
    } finally pp.unpersist()
    // degenerate fixture: equal scores everywhere -> ids break the tie
    val fix = Seq(
      (10L, "x y", "s1"), (11L, "x y", "s1"), (12L, "x y", "s1"),
      (20L, "lone doc", "s2"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.preferencePairs(fix).collect()
    assert(rows.length == 1) // singleton s2 drops
    val r = rows.head
    assert(r.getAs[Long]("chosen_id") == 10L &&
      r.getAs[Long]("rejected_id") == 12L)
    assert(r.getAs[Double]("margin") == 0.0)
  }
}
