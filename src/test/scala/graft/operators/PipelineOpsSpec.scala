package graft.operators

import graft.SparkTestSession
import graft.functions.KmvSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-3 pipeline additions: the KMV distinct sketch,
  * the Bloom incremental dedup, and the IVF ANN path.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- KmvSketch ----

  private def kmvOf(values: Seq[Long], k: Int): Double = {
    val agg = new KmvSketch(k)
    values.foldLeft(agg.zero)(agg.reduce) match { case buf => agg.finish(buf) }
  }

  test("KmvSketch: exact below k, estimate within the sketch error above") {
    // fewer than k distinct → exact count, duplicates ignored
    assert(kmvOf(Seq(5L, 9L, 5L, 7L, 9L), 64) == 3.0)
    // 60-bit md5-style hashes for 0..1999 (the q11b hash family)
    def h60(x: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"${b & 0xff}%02x").mkString.substring(0, 15), 16)
    }
    val n = 2000
    val est = kmvOf((0 until n).map(i => h60(i.toLong)), 64)
    // KMV relative std error ≈ 1/sqrt(k−2) ≈ 12.7% at k=64; 3σ bound
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
  }

  test("KmvSketch: merge is associative with reduce (partition-split invariance)") {
    val agg = new KmvSketch(8)
    val vals = (1L to 100L).map(x => x * 7919L % 1048576L)
    val whole = vals.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = vals.splitAt(37)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(whole.toSeq == merged.toSeq)
    assert(whole.length <= 8, "buffer must stay bounded at k")
    assert(whole.toSeq == whole.toSeq.sorted.distinct, "buffer sorted+distinct")
  }

  test("KmvSketch via udaf matches a driver-side fold (distributed merge path)") {
    val kmv = udaf(new KmvSketch(16))
    val hashes = (1L to 500L).map(x => (x % 3, x * 2654435761L % (1L << 40)))
    val viaSpark = hashes.toDF("g", "h").repartition(8)
      .groupBy("g").agg(kmv(col("h")).as("est"))
      .orderBy("g").as[(Long, Double)].collect().toSeq
    val expected = hashes.groupBy(_._1).view
      .mapValues(vs => kmvOf(vs.map(_._2), 16)).toMap
    viaSpark.foreach { case (g, est) => assert(est == expected(g), s"group $g") }
  }

  // ---- bloomDedup ----

  test("bloomDedup: exact semantics (bloom only prunes, never changes the result)") {
    // multiples of 6 are in the new batch (even), outside history
    // (% 3 == 0) AND textually unique → guaranteed is_dup = false rows;
    // other texts repeat every 20 ids → cross-split duplicates
    def textOf(i: Long) = if (i % 6 == 0) s"only-$i" else s"text-${i % 20}"
    val docs = (1L to 60L).map(i => (i, textOf(i))).toDF("doc_id", "text")
    val out = Dedup.bloomDedup(docs, col("doc_id") % 3 =!= 0, col("doc_id") % 2 === 0)
      .orderBy("doc_id").as[(Long, Boolean)].collect().toSeq
    // expected: even ids; dup iff some history doc (id % 3 != 0) shares text
    val texts = (1L to 60L).map(i => i -> textOf(i)).toMap
    val histTexts = (1L to 60L).filter(_ % 3 != 0).map(texts).toSet
    val expected = (1L to 60L).filter(_ % 2 == 0).map(i => (i, histTexts.contains(texts(i))))
    assert(out == expected)
    assert(out.exists(_._2) && out.exists(!_._2), "needs both outcomes to be meaningful")
  }

  // ---- bm25 ----

  test("bm25: raw-odds idf scoring matches the closed form") {
    val docs = Seq((1L, "table query table"), (2L, "spark x y"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("table", "spark"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val (k1, b) = (1.2, 0.75)
    val (nd, avg) = (3.0, 9.0 / 3.0)
    def s(tf: Double, df: Double, dl: Double): Double =
      ((nd - df + 0.5) / (df + 0.5)) * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * (dl / avg)))
    assert(out == Seq(
      (1L, s(2, 1, 3) + s(0, 1, 3)),
      (2L, s(0, 1, 3) + s(1, 1, 3)),
      (3L, s(0, 1, 3) + s(0, 1, 3))))
  }

  // ---- vocab ----

  test("vocab: tf/df counts, deterministic rank under ties, top-k cut") {
    val docs = Seq((1L, "b b a c"), (2L, "a b c c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocab(docs, k = 3)
      .orderBy("rank").as[(Long, String, Long, Long)].collect().toSeq
    // tf: b=3, c=3, a=2; tie b/c broken by token asc
    assert(out == Seq((1L, "b", 3L, 2L), (2L, "c", 3L, 2L), (3L, "a", 2L, 2L)))
  }

  // ---- stratified sample ----

  test("stratified: membership is a pure hash of doc_id, rates per stratum") {
    val docs = (1L to 200L).map(i => (i, if (i % 2 == 0) "ev" else "od"))
      .toDF("doc_id", "stratum0")
    val out = Sampling.stratified(docs, col("stratum0"),
      Map("ev" -> 0.5), 0.0)
      .orderBy("doc_id").as[(Long, String, Double)].collect().toSeq
    // rate 0 kills every odd row; evens keep iff u < 0.5
    assert(out.forall(r => r._2 == "ev" && r._3 < 0.5))
    assert(out.nonEmpty && out.size < 100)
    // deterministic: a repartitioned input selects the same set
    val out2 = Sampling.stratified(docs.repartition(7), col("stratum0"),
      Map("ev" -> 0.5), 0.0)
      .orderBy("doc_id").as[(Long, String, Double)].collect().toSeq
    assert(out2 == out)
  }

  // ---- repetition ----

  test("repetition: dup-token and top-bigram fractions, short-doc zero case") {
    val docs = Seq(
      (1L, "a b a b a"),  // tokens 5, distinct 2; bigrams: "a b"×2,"b a"×2 → top 2/4
      (2L, "x y z"),      // all distinct; bigrams "x y","y z" → top 1/2
      (3L, "q")           // 1 token → no bigrams → top 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs)
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 1.0 - 2.0 / 5, 2.0 / 4),
      (2L, 3L, 0.0, 1.0 / 2),
      (3L, 1L, 0.0, 0.0)))
  }

  // ---- packPlan ----

  test("packPlan: per-shard running offsets and window assignment") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("doc_id", "text")
    val out = Curation.packPlan(docs, nShards = 1, seqLen = 4)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    // one shard, doc_id order: offsets 0, 3, 5 → windows 0, 0, 1
    assert(out == Seq((1L, 0L, 3L, 0L, 0L), (2L, 0L, 2L, 3L, 0L), (3L, 0L, 1L, 5L, 1L)))
  }

  test("mixtureStats: token shares sum to 1 over strata") {
    val docs = Seq((1L, "x y z"), (2L, "x"), (3L, "q w e r")).toDF("doc_id", "text")
    val out = Curation.mixtureStats(docs,
        when(col("doc_id") <= 2, "a").otherwise("b"))
      .orderBy("stratum").as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 2L, 4L, 4.0 / 8), ("b", 1L, 4L, 4.0 / 8)))
  }

  // ---- keepList ----

  test("keepList: eval-anchored cluster still keeps its train representative") {
    // docs 10 (eval), 11 and 21 (train) are identical → one cluster with
    // component min = 10, an EVAL doc. The train representative must be
    // 11, not nobody. 20+ tokens so the length gate isn't the reason a
    // row drops; doc 33 is a clean unique train doc (its own rep).
    val dup = (1 to 24).map(i => s"w$i").mkString(" ")
    val solo = (1 to 24).map(i => s"x$i").mkString(" ")
    val docs = Seq((10L, dup), (11L, dup), (21L, dup), (33L, solo))
      .toDF("doc_id", "text")
    val out = Curation.keepList(docs, col("doc_id") % 10 === 0,
        Map.empty, defaultRate = 1.0, k = 8, bands = 4, threshold = 0.5,
        maxBucket = 1000L, maxDf = 10000L)
      .orderBy("doc_id")
      .select("doc_id", "is_rep", "clean", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    // 11 IS the train rep (despite cluster min 10); contaminated though
    // (shares grams with eval 10) so still dropped — for the right
    // reason. 21 is neither rep nor clean. 33 is rep + clean → kept.
    assert(out == Seq(
      (11L, true, false, false),
      (21L, false, false, false),
      (33L, true, true, true)))
  }

  test("keepList: heavy partial copying drops a doc the near-dup gate cannot catch") {
    // doc 1 is 10 own words + a 22-word passage lifted from doc 2
    // (220+ words): whole-doc Jaccard ~0.09 — far below the 0.5 cluster
    // threshold, so BOTH docs are their own cluster representatives —
    // but >50% of doc 1's words sit inside the copied span, so ok_copy
    // is the bit that (correctly) drops it. doc 2's coverage is ~10%.
    val passage = (1 to 22).map(i => s"p$i").mkString(" ")
    val own = (1 to 10).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 200).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$own $passage"),
      (2L, s"$fillerB $passage")
    ).toDF("doc_id", "text")
    val out = Curation.keepList(docs, col("doc_id") % 10 === 0,
        Map.empty, defaultRate = 1.0, k = 8, bands = 4, threshold = 0.5,
        maxBucket = 1000L, maxDf = 10000L)
      .orderBy("doc_id")
      .select("doc_id", "is_rep", "ok_copy", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, true, false, false), // its own rep, dropped ONLY for copying
      (2L, true, true, true)))
  }

  test("keepSummary: per-reason counts, multi-gate failures increment each") {
    // the eval-anchored fixture: train docs 11/21 identical to eval 10.
    // 11 fails clean + ok_copy (copied from its twin); 21 additionally
    // fails is_rep; 33 is kept. Per-REASON accounting means the drop
    // columns sum to 5 though only 2 docs dropped.
    val dup = (1 to 24).map(i => s"w$i").mkString(" ")
    val solo = (1 to 24).map(i => s"x$i").mkString(" ")
    val docs = Seq((10L, dup), (11L, dup), (21L, dup), (33L, solo))
      .toDF("doc_id", "text")
    val verdict = Curation.keepList(docs, col("doc_id") % 10 === 0,
      Map.empty, defaultRate = 1.0, k = 8, bands = 4, threshold = 0.5,
      maxBucket = 1000L, maxDf = 10000L)
    val out = Curation.keepSummary(verdict)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    //          n_train n_keep n_dup n_cont n_short n_rep n_copied n_unsamp
    assert(out == Seq((3L, 1L, 1L, 2L, 0L, 0L, 2L, 0L)))
  }

  // ---- dupSpans ----

  test("dupSpans: cross-doc span fraction, within-doc repeats don't count") {
    val docs = Seq(
      (1L, "a b c d"),    // grams "a b c","b c d"; "a b c" shared with doc 2
      (2L, "a b c x"),    // grams "a b c","b c x"
      (3L, "p q r p q r"),// within-doc repeat only: distinct grams, none shared
      (4L, "s t")         // < 3 tokens → no grams
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // doc 3 grams: "p q r","q r p","r p q","p q r" → per-doc distinct = 3
    assert(out == Seq(
      (1L, 2L, 0.5), (2L, 2L, 0.5), (3L, 3L, 0.0), (4L, 0L, 0.0)))
  }

  // ---- contamination ----

  test("contamination: gram hits flagged, short and clean docs report clean") {
    val docs = Seq(
      (10L, "a b c d"),  // eval split (% 10 == 0): grams "a b c", "b c d"
      (1L, "a b c x"),   // shares "a b c" → contaminated, 1 hit
      (2L, "z z z z"),   // no shared gram → clean
      (3L, "q w")        // shorter than n → zero grams → clean
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(docs, col("doc_id") % 10 === 0)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  // ---- dedupClusters ----

  test("dedupClusters: merges overlapping pairs, keeps singletons, chain converges") {
    val docs = (1L to 9L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    // component {1,2,3} via overlapping pairs; a 4-hop chain {4..8}
    // (exercises multi-pass propagation); 9 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(docs, pairs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 5L), (5L, 4L, 5L), (6L, 4L, 5L), (7L, 4L, 5L), (8L, 4L, 5L),
      (9L, 9L, 1L)))
  }

  test("dedupClusters: superseded checkpoint snapshots are freed (no storage leak)") {
    val sc = spark.sparkContext
    // set-diff of RDD ids, not a size delta: background ContextCleaner
    // activity on other suites' RDDs must not mask (or fake) a leak
    val before = sc.getPersistentRDDs.keySet
    val docs = (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    assert(Dedup.dedupClusters(docs, pairs).count() == 50)
    // cap at the max RDD id right after the run: ids are monotonic, so
    // anything a background task persists LATER can't inflate the count
    val ceiling = sc.getPersistentRDDs.keySet.maxOption.getOrElse(0)
    // unpersist(blocking = false) is async — poll briefly. Only the
    // FINAL labels snapshot may remain pinned (the result reads it).
    val deadline = System.currentTimeMillis() + 5000
    def leaked = (sc.getPersistentRDDs.keySet -- before).count(_ <= ceiling)
    while (leaked > 1 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(leaked <= 1, s"$leaked checkpoint snapshots still pinned (expected <= 1)")
  }

  test("ivfTopK: empty centroid set fails fast with a clear message") {
    val emb = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, col("vec_id") === 100L, 1, nCentroids = 16)
    }
    assert(e.getMessage.contains("no centroid vectors"))
  }

  test("bloomDedupManaged: broadcast handle is destroyable after materialization") {
    val docs = (1L to 20L).map(i => (i, s"text-${i % 5}")).toDF("doc_id", "text")
    val (out, handle) =
      Dedup.bloomDedupManaged(docs, col("doc_id") <= 10, col("doc_id") > 10)
    assert(out.count() == 10)
    handle.destroy() // per-batch ingest loops reclaim the sketch here
    // a destroyed broadcast must fail fast on reuse, not silently leak
    intercept[org.apache.spark.SparkException] { handle.value }
  }

  // ---- frameSample ----

  test("frameSample: complete frames only, stride selection, byte-exact digest") {
    import org.apache.spark.sql.functions.col
    // 10-byte payload, 4-byte frames → 2 complete frames (trailing 2
    // bytes dropped); stride 2 keeps frame 0 only
    val docs = Seq((1L, "abcdWXYZqq"), (2L, "abc")).toDF("doc_id", "text")
    val media = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.frameSample(media, frameBytes = 4, stride = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    // doc 1: frames "abcd","WXYZ"; stride 2 keeps frame 0; the output is
    // a digest of per-frame digests (frameSample doc: linear, not O(S²))
    assert(out.head == (1L, 2L, 1L, md5hex(md5hex("abcd"))))
    // doc 2: shorter than one frame → zero frames, digest of empty input
    assert(out(1) == (2L, 0L, 0L, md5hex("")))
  }

  test("resizePlan: fit-in-box, never upscale, floor-1 clamp; stubDims ≡ decodeAll dims") {
    import org.apache.spark.sql.functions.col
    val dims = Seq(
      (1L, 20L, 30L),    // inside the box → untouched
      (2L, 1000L, 1L),   // extreme landscape → height clamps to 1
      (3L, 96L, 96L),    // square downscale → (48, 48)
      (4L, 1L, 100L)     // extreme portrait → clamp fires on width
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.resizePlan(dims, 48)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 20L, 30L, 20L, 30L),
      (2L, 1000L, 1L, 48L, 1L),  // 1*48 div 1000 = 0 → clamped to 1
      (3L, 96L, 96L, 48L, 48L),
      (4L, 1L, 100L, 1L, 48L)))  // 1*48 div 100 = 0 → clamped to 1
    // the Column-side stub dims must match the codec's Scala dims
    val media = Seq((1L, "x" * 100), (2L, "y" * 5000), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val viaColumns = Multimodal.stubDims(media)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val viaCodec = Seq((1L, "x" * 100), (2L, "y" * 5000), (3L, "")).map { case (id, t) =>
      val (w, h, _) = Multimodal.StubCodec.decode(t.getBytes("UTF-8"))
      (id, w.toLong, h.toLong)
    }
    assert(viaColumns == viaCodec)
  }

  // ---- ivfTopK ----

  test("ivfTopK: bounded per-query output, no self-matches, cells partition the corpus") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.ivfTopK(emb, col("vec_id") % 50 === 0, 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    // ≤ k rows per query, ranks 1..k contiguous, no self-matches
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.size <= 3)
      assert(rows.map(_._2).sorted == (1L to rows.size))
      assert(rows.forall(_._3 != q))
    }
    // per-query ranks strictly ordered by cosine desc
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank == byRank.sorted.reverse)
    }
  }

  test("ivfTopK with all cells probed ≡ exact brute-force top-k") {
    // probing every centroid's cell makes IVF exhaustive — results must
    // equal cosineTopK exactly (same scores, same tie-breaks)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivf = Similarity.ivfTopK(emb, col("vec_id") % 100 === 0, 3,
        nCentroids = 8, probes = 8)
      .orderBy("query_id", "rk").as[(Long, Long, Long, Double)].collect().toSeq
    val exact = Similarity.cosineTopK(emb, col("vec_id") % 100 === 0, 3)
      .orderBy("query_id", "rk").as[(Long, Long, Long, Double)].collect().toSeq
    assert(ivf == exact)
  }
}
