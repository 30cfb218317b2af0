package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 additions: signature-only MinHash Jaccard
  * estimation (d27).
  */
class Round7OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---- minhashEstPairs ----

  test("minhashEstPairs: identical docs estimate 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "entirely different content with no overlapping shingles at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashEstPairs(docs, k = 64, bands = 16)
      .as[(Long, Long, Double)].collect().toSeq
    // identical shingle sets → every permutation min agrees → est = 1.0
    assert(out.contains((1L, 2L, 1.0)))
    // doc 3 shares no shingle with 1/2: its signature can only collide
    // bandwise by md5 accident — require it absent
    assert(out.forall { case (a, b, _) => !(a == 3L || b == 3L) })
  }

  test("minhashEstPairs: estimates are n/64 rationals within statistical error of exact Jaccard") {
    val docs = Tables.documents(spark, dir)
    val est = Dedup.minhashEstPairs(docs, k = 64, bands = 16)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(est.nonEmpty, "no candidate pairs at sf0.001 — corpus regression?")
    // every estimate is an exact multiple of 1/64
    est.values.foreach(e => assert((e * 64).isWhole && e >= 0.0 && e <= 1.0))
    // exact Jaccard for the same pairs via the inverted-index path
    val hsh = Dedup.hashedShingles(docs)
    val cand = est.keys.toSeq.toDF("a", "b")
    val exact = Dedup.jaccard(hsh, cand)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // k=64 ⇒ std-err ≤ 1/(2·√64) = 0.0625; allow 4σ per pair and a
    // tight mean bound (both deterministic on this fixed corpus)
    val errs = exact.map { case (p, j) => math.abs(est(p) - j) }
    assert(errs.max <= 0.25, s"worst estimate off by ${errs.max}")
    assert(errs.sum / errs.size <= 0.08, s"mean |est - J| = ${errs.sum / errs.size}")
  }

  // ---- simhashHammingPairs ----

  test("simhashHammingPairs: FULL recall at the radius — block candidates lose nothing vs brute force") {
    val docs = Tables.documents(spark, dir)
    val viaBlocks = Dedup.simhashHammingPairs(docs, radius = 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over the signatures themselves (quadratic, test-only)
    val sigs = Dedup.simhash(docs).as[(Long, Long)].collect().toSeq
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(viaBlocks == brute,
      s"pigeonhole recall broken: blocks=${viaBlocks.size} brute=${brute.size}")
  }

  test("simhashHammingPairs: identical docs pair at hamming 0; radius bounds the output") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val out = Dedup.simhashHammingPairs(docs, radius = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.contains((1L, 2L, 0L)))
    assert(out.forall(_._3 <= 3))
  }

  // ---- minhashKnnGraph ----

  test("minhashKnnGraph: symmetric, rank-contiguous, and consistent with the pair estimates") {
    val docs = Tables.documents(spark, dir)
    val est = Dedup.minhashEstPairs(docs, k = 64, bands = 16)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    val knn = Dedup.minhashKnnGraph(docs, k = 3, sigK = 64, bands = 16)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(knn.nonEmpty)
    // every edge is one of the pair estimates with the same value
    knn.foreach { case (v, _, n, e) =>
      val key = if (v < n) (v, n) else (n, v)
      assert(est(key) == e, s"graph edge ($v,$n) disagrees with pair estimate")
    }
    // per-vertex ranks are 1..deg(v) with non-increasing estimates
    knn.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size))
      assert(sorted.map(_._4).sliding(2).forall(p => p.size < 2 || p(0) >= p(1)))
    }
  }

  // ---- cdcIncremental ----

  test("cdcIncremental: an edited re-submission still matches its ancestor; fresh content does not") {
    // history doc 1: 40 tokens → several CDC chunks. new doc 10: the
    // same text with ONE token inserted mid-stream — content-defined
    // boundaries keep every untouched chunk's digest identical, so the
    // overlap stays high. new doc 20: disjoint vocabulary.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = ((1 to 20).map(i => s"tok$i") ++ Seq("INSERTED") ++
      (21 to 40).map(i => s"tok$i")).mkString(" ")
    val fresh = (1 to 30).map(i => s"other$i").mkString(" ")
    val history = Seq((1L, base)).toDF("doc_id", "text")
    val incoming = Seq((10L, edited), (20L, fresh)).toDF("doc_id", "text")
    val out = Dedup.cdcIncremental(incoming, history, modulus = 4, threshold = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Option[Long], Long, Double, Boolean)].collect().toSeq
    val Seq(ed, fr) = out
    assert(ed._1 == 10L && ed._3.contains(1L) && ed._6,
      s"edited copy must flag against its ancestor: $ed")
    assert(ed._5 > 0.5 && ed._5 < 1.0, s"edit must cost SOME chunks, not all: $ed")
    assert(fr._1 == 20L && fr._3.isEmpty && fr._4 == 0L && fr._5 == 0.0 && !fr._6,
      s"fresh content must not match: $fr")
  }

  test("cdcIncremental: a FIXED-STRIDE chunking would lose the ancestor after the same edit") {
    // the motivating contrast: hash the same edited pair with fixed
    // 8-token windows — every window after the insertion shifts, so
    // shared-digest containment collapses to the prefix only
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = ((1 to 20).map(i => s"tok$i") ++ Seq("INSERTED") ++
      (21 to 40).map(i => s"tok$i")).mkString(" ")
    def strideDigests(text: String): Set[String] =
      Curation.chunkPlan(Seq((1L, text)).toDF("doc_id", "text"), 8, 8)
        .select("chunk_digest").as[String].collect().toSet
    def cdcDigests(text: String): Set[String] =
      Curation.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"), 4)
        .select("chunk_digest").as[String].collect().toSet
    val strideShared = strideDigests(base).intersect(strideDigests(edited)).size.toDouble /
      strideDigests(edited).size
    val cdcShared = cdcDigests(base).intersect(cdcDigests(edited)).size.toDouble /
      cdcDigests(edited).size
    assert(cdcShared > strideShared,
      s"CDC must out-survive fixed stride after an edit: cdc=$cdcShared stride=$strideShared")
    assert(cdcShared > 0.5 && strideShared <= 0.5)
  }

  // ---- product quantization ----

  test("pqEncode: hand-checked sub-codebook assignment (4 dims, m=2, ks=2)") {
    // seeds (vec 0,1) make each subspace's nearest centroid obvious
    val emb = Seq(
      (0L, Array(0f, 0f, 10f, 10f)),
      (1L, Array(5f, 5f, 0f, 0f)),
      (2L, Array(1f, 0f, 1f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(emb, m = 2, ks = 2)
      .orderBy("vec_id", "sub").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 1L, 0L), (0L, 2L, 0L),   // seed 0 quantizes to itself in sub 1; sub 2: d(10,10)→(0,0)=200 > 0
      (1L, 1L, 1L), (1L, 2L, 1L),
      (2L, 1L, 0L), (2L, 2L, 1L)))  // (1,0): 1 vs 41 → c0; (1,1): 162 vs 2 → c1
  }

  test("pqEncode: equidistant subspace breaks toward the smaller centroid id") {
    val emb = Seq(
      (0L, Array(0f, 0f)),
      (1L, Array(2f, 0f)),
      (2L, Array(1f, 0f))           // exactly between seeds 0 and 2 → code 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(emb, m = 1, ks = 2)
      .filter(col("vec_id") === 2L).as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L, 0L)))
  }

  test("pqAdcTopK: a query equal to a seed ranks that seed first at distance 0") {
    val emb = Seq(
      (0L, Array(0f, 0f, 8f, 8f)),
      (1L, Array(5f, 5f, 0f, 0f)),
      (5L, Array(5f, 5f, 0f, 0f))   // duplicate of seed 1 — the query
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqAdcTopK(emb, col("vec_id") === 5L, k = 2, m = 2, ks = 2)
      .orderBy("rk").as[(Long, Long, Long, Double)].collect().toSeq
    // neighbor 1's quantized form IS the query → ADC 0; neighbor 0 is far
    assert(out.head == ((5L, 1L, 1L, 0.0)))
    assert(out(1)._3 == 0L && out(1)._4 > 0.0)
  }

  test("pqTrain: cell means partition the (vector × subspace) mass; trained re-encode still partitions") {
    val emb = Tables.embeddings(spark, dir)
    val nVec = emb.count()
    val trained = Similarity.pqTrain(emb, m = 8, ks = 16)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // per subspace: member counts over cells sum to the corpus, and
    // every present cell emits exactly subDim=8 dim rows with one count
    trained.groupBy(_._1).foreach { case (_, rows) =>
      val byCell = rows.groupBy(_._2)
      assert(byCell.values.map(_.head._4).sum == nVec)
      byCell.values.foreach { cellRows =>
        assert(cellRows.map(_._3).sorted == (1L to 8L))
        assert(cellRows.map(_._4).distinct.size == 1)
      }
    }
    val recoded = Similarity.pqEncodeTrained(emb, m = 8, ks = 16)
      .as[(Long, Long, Long)].collect().toSeq
    assert(recoded.size == nVec * 8)
    assert(recoded.forall { case (_, s, c) => s >= 1 && s <= 8 && c >= 0 && c < 16 })
    // training must actually move SOME assignment vs the seed encoding
    // (seeds are arbitrary vectors, means are not)
    val seedCodes = Similarity.pqEncode(emb, m = 8, ks = 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(recoded.toSet != seedCodes, "trained codebook changed nothing — training is a no-op?")
  }

  test("minhashEstPairs: d27 plan scores from signatures only — exactly 3 joins, no shingle self-join") {
    val p = graft.SparkEntry.queries("d27_minhash_est")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // band-bucket self-join + the two signature lookups; the exact
    // path's shingle-intersection join (x.hs = y.hs) must NOT appear
    val joins = """(?m)^\(\d+\) (BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|BroadcastNestedLoopJoin)""".r
      .findAllIn(p).length
    assert(joins == 3, s"expected exactly 3 join operators, found $joins\n" + p.take(2000))
  }
}
