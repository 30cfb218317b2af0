package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-8 changes, headlined by the 64-bit SimHash
  * widening (round-7 verdict item #1): the multi-index Hamming join's
  * blocks go from 8 to 16 bits, so the bucket cap becomes a pathology
  * guard instead of the default path at corpus scale.
  */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---- 64-bit simhash ----

  test("simhash: signatures occupy the full 64-bit width (high bits live)") {
    val sigs = Dedup.simhash(Tables.documents(spark, dir))
      .as[(Long, Long)].collect().map(_._2)
    // If the widening regressed to 32 bits every signature would sit in
    // [0, 2^32); require the upper half populated across the corpus.
    assert(sigs.exists(s => (s >>> 32) != 0L),
      "no signature uses bits 32-63 — width regressed to 32 bits")
    // Bit 63 makes the signature signed; the corpus flips it on roughly
    // half of all docs (majority vote over ~uniform md5 bits).
    assert(sigs.exists(_ < 0L), "bit 63 never set — top bit dead")
    assert(sigs.exists(_ >= 0L), "bit 63 always set — vote broken")
  }

  test("simhashHammingPairs: brute-force equality holds at 64-bit width, radius 3") {
    val docs = Tables.documents(spark, dir)
    val viaBlocks = Dedup.simhashHammingPairs(docs, radius = 3)
      .as[(Long, Long, Long)].collect().toSet
    val sigs = Dedup.simhash(docs).as[(Long, Long)].collect().toSeq
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(viaBlocks == brute,
      s"pigeonhole recall broken at 64 bits: blocks=${viaBlocks.size} brute=${brute.size}")
  }

  test("simhashHammingPairs: radius 1 (two 32-bit blocks) also matches brute force") {
    val docs = Tables.documents(spark, dir)
    val viaBlocks = Dedup.simhashHammingPairs(docs, radius = 1)
      .as[(Long, Long, Long)].collect().toSet
    val sigs = Dedup.simhash(docs).as[(Long, Long)].collect().toSeq
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 1
    } yield (a, b, h.toLong)).toSet
    assert(viaBlocks == brute)
  }

  test("PQ kernels: a null vector component yields NULL, never a 0.0 quantization") {
    import graft.functions.PqCodebook
    // m=2, subDim=2, ks=2; slices[c][s][j]: centroid 0 all-zero, 1 all-one
    val slices = Seq(
      Seq(Seq(0.0, 0.0), Seq(0.0, 0.0)),
      Seq(Seq(1.0, 1.0), Seq(1.0, 1.0)))
    val df = spark.sql(
      """SELECT array(1.0d, 1.0d, 1.0d, 1.0d) AS good,
        |       array(1.0d, cast(null as double), 1.0d, 1.0d) AS bad,
        |       array(0l, 0l) AS codes_ok,
        |       array(0l, cast(null as long)) AS codes_bad""".stripMargin)
      .select(
        PqCodebook.assign(col("good"), slices, m = 2, subDim = 2).as("a_good"),
        PqCodebook.assign(col("bad"), slices, m = 2, subDim = 2).as("a_bad"),
        PqCodebook.adcDist(col("good"), col("codes_ok"), slices, m = 2, subDim = 2).as("d_ok"),
        PqCodebook.adcDist(col("bad"), col("codes_ok"), slices, m = 2, subDim = 2).as("d_badq"),
        PqCodebook.adcDist(col("good"), col("codes_bad"), slices, m = 2, subDim = 2).as("d_badc"))
    val r = df.collect().head
    assert(r.getSeq[Long](r.fieldIndex("a_good")).toSeq == Seq(1L, 1L))
    assert(r.isNullAt(r.fieldIndex("a_bad")),
      "null component quantized instead of returning NULL")
    assert(r.getDouble(r.fieldIndex("d_ok")) == 4.0)
    assert(r.isNullAt(r.fieldIndex("d_badq")), "null query component scored")
    assert(r.isNullAt(r.fieldIndex("d_badc")), "null code scored")
  }

  test("PQ kernels: interpreted eval matches the codegen null-element policy") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val flatOk = graft.functions.PqAssign(
      Literal.create(Seq(1.0, 1.0, 1.0, 1.0), ArrayType(DoubleType, true)),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0), m = 2, subDim = 2)
    assert(flatOk.eval(null) != null)
    val flatNull = graft.functions.PqAssign(
      Literal.create(Seq[Any](1.0, null, 1.0, 1.0), ArrayType(DoubleType, true)),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0), m = 2, subDim = 2)
    assert(flatNull.eval(null) == null)
    val distNullCode = graft.functions.PqAdcDist(
      Literal.create(Seq(1.0, 1.0, 1.0, 1.0), ArrayType(DoubleType, true)),
      Literal.create(Seq[Any](0L, null), ArrayType(LongType, true)),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0), m = 2, subDim = 2)
    assert(distNullCode.eval(null) == null)
  }

  // ---- ANN recall levers: normalization (e16) + iterated PQ training (e11b) ----

  test("unitNormalized: every output vector is unit-norm") {
    val norms = Similarity.normalized(
        Similarity.unitNormalized(Tables.embeddings(spark, dir)))
      .select(col("nrm")).as[Double].collect()
    assert(norms.nonEmpty)
    assert(norms.forall(v => math.abs(v - 1.0) < 1e-12),
      s"max deviation ${norms.map(v => math.abs(v - 1.0)).max}")
  }

  test("annRecall: normalization strictly wins on a norm-skewed corpus (e16's reason to exist)") {
    // The shipped corpus is already unit-norm, so e16 ties e15 there
    // (measured — annRecall doc). THIS corpus is the one the operator is
    // for: per-vector scale factors 1..5 leave every cosine (and hence
    // the exact baseline) unchanged up to float rounding, but put raw
    // ADC-L2 on magnitudes that swamp angular structure.
    val skew = Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> x * cast(1 + vec_id % 5 as float))").as("embedding"))
    def meanRecall(corpus: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecall(corpus, col("vec_id") % 10 === 0, 10)
        .agg(avg(col("recall"))).as[Double].collect().head
    val raw = meanRecall(skew)
    val norm = meanRecall(Similarity.unitNormalized(skew))
    assert(norm > raw, s"normalized=$norm raw=$raw — normalization should dominate on skewed norms")
  }

  test("pqTrainIterated: one pass IS pqTrain") {
    val emb = Tables.embeddings(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(rows(Similarity.pqTrainIterated(emb, passes = 1)) ==
      rows(Similarity.pqTrain(emb)))
  }

  test("pqTrainIterated: the second pass moves the book within the same grid") {
    val emb = Tables.embeddings(spark, dir)
    def byKey(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2, r._3) -> r._5).toMap
    val p1 = byKey(Similarity.pqTrainIterated(emb, passes = 1))
    val p2 = byKey(Similarity.pqTrainIterated(emb, passes = 2))
    // same (sub, code, dim) key space family: every key within the 8×16 grid
    assert(p2.keys.forall { case (s, c, d) => s >= 1 && s <= 8 && c >= 0 && c < 16 && d >= 1 && d <= 8 })
    // Lloyd moved at least one centroid component between passes
    val shared = p1.keySet intersect p2.keySet
    assert(shared.nonEmpty)
    assert(shared.exists(k => p1(k) != p2(k)),
      "pass 2 produced identical means — iteration is a no-op")
  }

  test("annRecallLsh: n_hit equals the true per-query intersection of its components") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 10 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pairs(Similarity.cosineTopK(emb, pred, 3))
    val approx = pairs(Similarity.annTopKMultiProbe(emb, pred, 3))
    val recall = Similarity.annRecallLsh(emb, pred, 3)
      .as[(Long, Long, Double)].collect()
    assert(recall.map(_._1).toSet == exact.keySet)
    recall.foreach { case (q, nHit, r) =>
      val truth = (exact(q) intersect approx.getOrElse(q, Set.empty)).size.toLong
      assert(nHit == truth, s"query $q: n_hit=$nHit truth=$truth")
      assert(r == nHit.toDouble / 3)
    }
  }

  test("oovRate: exact rational rate against the corpus's own top-k cut") {
    val docs = Seq(
      (1L, "a a b"), // "a" is the top-1 token (tf 3); b,c are OOV at k=1
      (2L, "c"),
      (3L, "a")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, vocabK = 1)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 1.0 / 3),
      (2L, 1L, 1L, 1.0),
      (3L, 1L, 0L, 0.0)))
  }

  test("centroidAffinity/cellOccupancy: assignment-consistent with kmeansUpdate, shares sum to 1") {
    val emb = Tables.embeddings(spark, dir)
    val aff = Similarity.centroidAffinity(emb).as[(Long, Long, Double)].collect()
    assert(aff.nonEmpty)
    assert(aff.forall(r => r._3 <= 1.0 + 1e-9 && r._3 >= -1.0 - 1e-9))
    val occ = Similarity.cellOccupancy(emb).as[(Long, Long, Double)].collect()
    assert(occ.map(_._2).sum == aff.length, "occupancy must cover every vector exactly once")
    assert(math.abs(occ.map(_._3).sum - 1.0) < 1e-9)
    // the same assignment device drives k-means: per-cell member counts
    // must agree with kmeansUpdate's
    val km = Similarity.kmeansUpdate(emb)
      .select(col("cell"), col("n_members")).distinct()
      .as[(Long, Long)].collect().toMap
    assert(occ.map(t => t._1 -> t._2).toMap == km)
  }

  test("redactPii: rewrites emails/URLs/long digits on constructed rows; identity on the corpus") {
    val docs = Seq(
      (1L, "mail me at alice.smith+x@example.co.uk today"),
      (2L, "see https://example.com/a?b=1 and http://x.io"),
      (3L, "call 12345678 or 555 1234567"),
      (4L, "clean text stays clean"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "mail me at <EMAIL> today", 1L)), out(0))
    assert(out(1) == ((2L, "see <URL> and <URL>", 2L)), out(1))
    assert(out(2) == ((3L, "call <NUM> or 555 <NUM>", 2L)), out(2))
    assert(out(3) == ((4L, "clean text stays clean", 0L)))
    assert(out(4) == ((5L, "", 0L)))
    // the shipped corpus carries zero redactable spans (measured — the
    // registered oracle row checks the identity path; if this ever
    // fails, the caveat in redactPii's doc is stale)
    val corpus = TextAnalysis.redactPii(Tables.documents(spark, dir))
      .agg(sum(col("n_redacted"))).as[Long].collect().head
    assert(corpus == 0L, s"corpus now has $corpus redactable spans — update d32's caveat")
  }

  // ---- winnowing (d33) ----

  /** Test-side hash60 (md5 hex prefix, 15 chars → 60-bit Long). */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Reference winnowing: window minima with the rightmost-tie rule. */
  private def bruteWinnow(text: String, n: Int, w: Int): Set[(Long, Long)] = {
    val tk = text.split(" ", -1)
    if (tk.length < n + w - 1) return Set.empty
    val grams = (0 to tk.length - n).map(i => (i + 1L, h60(tk.slice(i, i + n).mkString(" "))))
    (w to grams.length).map { e =>
      val win = grams.slice(e - w, e)
      val minH = win.map(_._2).min
      (win.filter(_._2 == minH).map(_._1).max, minH) // rightmost tie
    }.toSet
  }

  test("winnowFingerprints matches the reference algorithm on the whole sf0.001 corpus") {
    val docs = Tables.documents(spark, dir)
    val got = Dedup.winnowFingerprints(docs, 3, 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    var checked = 0
    texts.foreach { case (id, text) =>
      val want = bruteWinnow(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
      if (want.nonEmpty) checked += 1
    }
    assert(checked > 100, s"only $checked docs produced fingerprints — corpus too short to test")
  }

  test("winnowing guarantee: a shared (w+n-1)-word run shares a selected fingerprint") {
    // Two otherwise-different docs sharing exactly one 6-word run
    // (w=4, n=3 → w+n-1=6) must share at least one fingerprint VALUE.
    val shared = "omega psi chi phi upsilon tau"
    val docs = Seq(
      (1L, s"aa bb cc dd $shared ee ff gg hh"),
      (2L, s"zz yy xx $shared ww vv uu tt ss rr")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, 3, 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "winnowing guarantee violated: shared 6-word run, no shared fingerprint")
    // density: far fewer fingerprints than grams survive selection
    val grams1 = docs.filter($"doc_id" === 1L).select("text").as[String].head()
      .split(" ").length - 2
    assert(fps(1L).size < grams1, "selection kept every gram — not winnowing")
  }

  test("winnowCopyPairs matches the brute-force fingerprint-set intersection") {
    val docs = Tables.documents(spark, dir)
    val got = Dedup.winnowCopyPairs(docs, 3, 4, minShared = 2L)
      .as[(Long, Long, Long)].collect().toSet
    val sets = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> bruteWinnow(t, 3, 4).map(_._2) }
      .filter(_._2.nonEmpty)
    // no fingerprint reaches the 1000-doc df cap on this corpus, so the
    // brute pair set is the plain pairwise intersection count
    val dfs = sets.flatMap(_._2.toSeq).groupBy(identity).view.mapValues(_.length)
    assert(dfs.values.max <= 1000, "df cap active — brute reference must model it")
    val want = (for {
      (a, fa) <- sets; (b, fb) <- sets if a < b
      n = (fa intersect fb).size if n >= 2
    } yield (a, b, n.toLong)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty, "corpus yields no pairs — test is vacuous")
  }

  test("winnowCopyPairs finds a copied passage that whole-doc Jaccard dilutes away") {
    // a 12-word passage pasted into two long, otherwise-unrelated docs
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val fillerA = (1 to 200).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 200).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillerA $passage"),
      (2L, s"$passage $fillerB")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowCopyPairs(docs, 3, 4, minShared = 2L)
      .as[(Long, Long, Long)].collect()
    assert(pairs.length == 1 && pairs.head._1 == 1L && pairs.head._2 == 2L,
      s"copied passage not detected: ${pairs.toSeq}")
    // the same pair's whole-doc Jaccard is ~10/400 — far below any
    // near-dup threshold; this asymmetry is d34's reason to exist
    val hsh = Dedup.hashedShingles(docs, 3)
    val shared = hsh.groupBy(col("hs")).count().filter(col("count") >= 2).count()
    val total = hsh.select(col("hs")).distinct().count()
    assert(shared.toDouble / total < 0.1, s"jaccard $shared/$total not dilute — fixture broken")
  }

  test("winnowMatchEvidence aligns the copied span at a constant position offset") {
    // same fixture as the d34 contrast test: a 12-word passage at word
    // offset 200 in doc 1 and offset 0 in doc 2 — every piece of
    // shared-passage evidence must carry the SAME pos_a − pos_b, and
    // that offset must be the construction's 200
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val fillerA = (1 to 200).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 200).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillerA $passage"),
      (2L, s"$passage $fillerB")
    ).toDF("doc_id", "text")
    val ev = Dedup.winnowMatchEvidence(docs, 3, 4, minShared = 2L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(ev.nonEmpty, "no evidence for a detected pair")
    val offsets = ev.map { case (_, _, _, pa, pb) => pa - pb }.distinct
    assert(offsets.toSeq == Seq(200L),
      s"aligned evidence must sit at the construction's offset, got ${offsets.toSeq}")
    // the evidence positions are inside the passage's gram range on
    // both sides (doc 2: grams 1..10 of a 12-word passage)
    assert(ev.forall { case (_, _, _, _, pb) => pb >= 1 && pb <= 10 })
  }

  test("winnowCopySpans assembles the aligned evidence into one span covering the passage") {
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val fillerA = (1 to 200).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 200).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillerA $passage"),
      (2L, s"$passage $fillerB")
    ).toDF("doc_id", "text")
    val spans = Dedup.winnowCopySpans(docs, 3, 4, minShared = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(spans.length == 1, s"expected one assembled span, got ${spans.toSeq}")
    val (da, db, off, sa, sb, ea, nf) = spans.head
    assert((da, db, off) == ((1L, 2L, 200L)))
    // the span's word range sits inside the passage on both sides:
    // doc 2's copy occupies words 1..12, doc 1's words 201..212
    assert(sb >= 1L && sa == sb + 200L && ea <= 212L && ea > sa, spans.head.toString)
    assert(nf >= 2L)
  }

  test("winnowCopyCoverage: copied fraction on pair members, zero on untouched docs") {
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val fillerA = (1 to 200).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 200).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillerA $passage"),
      (2L, s"$passage $fillerB"),
      (3L, (1 to 50).map(i => s"c$i").mkString(" ")) // untouched
    ).toDF("doc_id", "text")
    val cov = Dedup.winnowCopyCoverage(docs, 3, 4, minShared = 2L)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(cov.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val Array(d1, d2, d3) = cov
    // both pair members carry the SAME merged copied length (one span,
    // equal extent on both sides), bounded by the passage size
    assert(d1._3 == d2._3 && d1._3 >= 2L && d1._3 <= 12L, (d1, d2).toString)
    assert(d1._2 == 212L && d1._4 == d1._3.toDouble / 212L)
    assert(d3._3 == 0L && d3._4 == 0.0)
  }

  test("winnowMergedExtents merges overlapping spans from different alignments") {
    // doc 2 carries the passage TWICE, so doc 1's single copy aligns at
    // two different offsets — d36 reports (at least) two overlapping
    // spans on doc 1's axis, the merged view exactly one extent
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val fillerA = (1 to 200).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 100).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillerA $passage"),
      (2L, s"$passage $fillerB $passage")
    ).toDF("doc_id", "text")
    val spans = Dedup.winnowCopySpans(docs, 3, 4, minShared = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val offsets = spans.map(_._3).distinct
    assert(offsets.length >= 2,
      s"fixture must produce two alignments, got spans ${spans.toSeq}")
    val ext = Dedup.winnowMergedExtents(docs, 3, 4, minShared = 2L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(ext.length == 1, s"expected one merged extent, got ${ext.toSeq}")
    val (da, db, sa, ea, nSpans, nFps) = ext.head
    assert((da, db) == ((1L, 2L)))
    // the extent is the union of the per-offset spans, inside the
    // passage's word range on doc 1 (words 201..212)
    assert(sa == spans.map(_._4).min && ea == spans.map(_._6).max)
    assert(sa >= 201L && ea <= 212L, ext.head.toString)
    assert(nSpans == spans.length && nFps == spans.map(_._7).sum)
  }

  test("persisted IVF+SQ8 index serves bit-identical results to the in-memory path") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfsq8-spec-").toString
    Similarity.saveIvfSq8Index(emb, path, 16)
    val direct = Similarity.ivfSq8TopK(emb, pred, 5, 16, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val indexed = Similarity.ivfSq8TopKIndexed(emb, pred, path, 5, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(direct.nonEmpty && indexed == direct)
  }

  test("persisted IVF-PQ index serves bit-identical results without re-training") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-spec-").toString
    Similarity.saveIvfPqIndex(emb, path, 16, 8, 16)
    val direct = Similarity.ivfPqTopK(emb, pred, 5, 16, 4, 8, 16)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val indexed = Similarity.ivfPqTopKIndexed(emb, pred, path, 5, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(direct.nonEmpty && indexed == direct)
  }

  test("cell-partitioned index prunes unprobed cells at the file-index layer") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfsq8-part-").toString
    Similarity.saveIvfSq8Index(emb, path, 16, partitionByCell = true)
    val indexed = Similarity.ivfSq8TopKIndexed(emb, pred, path, 5, 4,
      pruneScan = true)
    val p = indexed.queryExecution.executedPlan.toString
    // the literal probed-cell set compiles to IN or INSET inside the
    // scan's PartitionFilters — file-index-layer pruning, the claim
    assert("PartitionFilters: \\[[^\\]]*cell#\\d+ (INSET|IN )".r.findFirstIn(p).isDefined,
      "probed-cell literal must land in PartitionFilters\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    val direct = Similarity.ivfSq8TopK(emb, pred, 5, 16, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = indexed
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got.nonEmpty && got == direct)
  }

  test("ivfProbeCurve: full-probe endpoint equals the flat SQ8 scan exactly") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val curve = Similarity.ivfProbeCurve(emb, pred, 3, 16, Seq(1, 16))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(curve.map(_._1) == Seq(1L, 16L))
    assert(curve.map(_._2).distinct.size == 1, "query count must not vary")
    // probes = nCells probes EVERY cell: the candidate set and scoring
    // are then identical to the flat sq8TopK, so the endpoint equals
    // e25's mean recall BY CONSTRUCTION, not approximately
    val flat = Similarity.annRecallSq8(emb, pred, 3)
      .agg(sum(col("n_hit")), count(lit(1))).as[(Long, Long)].head()
    val flatMean = flat._1.toDouble / (flat._2 * 3L)
    assert(curve.last._4 == flatMean,
      s"endpoint ${curve.last._4} != flat $flatMean")
    assert(curve.last._4 >= curve.head._4)
  }

  // ---- ExactSubstr dedup (d40/d41) ----

  // shared fixture: a 10-word passage repeated WITHIN doc 1 and shared
  // across docs 2/3; doc 4 is untouched; docs 5/6 are identical (fully
  // duplicated). All filler vocabularies are disjoint, so only the
  // passage's 8-grams duplicate.
  private lazy val exSubstrDocs = {
    val p = (1 to 10).map(i => s"p$i").mkString(" ")
    Seq(
      (1L, s"${(1 to 20).map(i => s"f$i").mkString(" ")} $p ${(1 to 5).map(i => s"g$i").mkString(" ")} $p"),
      (2L, s"${(1 to 50).map(i => s"x$i").mkString(" ")} $p"),
      (3L, s"$p ${(1 to 50).map(i => s"y$i").mkString(" ")}"),
      (4L, (1 to 30).map(i => s"u$i").mkString(" ")),
      (5L, (1 to 12).map(i => s"z$i").mkString(" ")),
      (6L, (1 to 12).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("exactSubstrSpans: within-doc repeats count, maximal merged spans") {
    val spans = Dedup.exactSubstrSpans(exSubstrDocs, minLen = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(s => (s._1, s._2)).toSeq
    // a 10-word passage at word offset o anchors 8-grams at o+1..o+3
    // (3 anchors), covering words o+1..o+10
    assert(spans == Seq(
      (1L, 21L, 30L, 3L), (1L, 36L, 45L, 3L),   // both in-doc copies
      (2L, 51L, 60L, 3L),
      (3L, 1L, 10L, 3L),
      (5L, 1L, 12L, 5L), (6L, 1L, 12L, 5L)))    // identical docs: fully covered
  }

  test("exactSubstrKeepFirst: the corpus-ordered first occurrence survives the cut") {
    val out = Dedup.exactSubstrKeepFirst(exSubstrDocs, minLen = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val f = (1 to 20).map(i => s"f$i").mkString(" ")
    val g = (1 to 5).map(i => s"g$i").mkString(" ")
    val p = (1 to 10).map(i => s"p$i").mkString(" ")
    assert(out == Seq(
      // doc 1 holds the passage's global-first occurrence: its FIRST
      // copy survives, the in-doc repeat is cut
      (1L, 45L, 10L, s"$f $p $g"),
      (2L, 60L, 10L, (1 to 50).map(i => s"x$i").mkString(" ")),
      (3L, 60L, 10L, (1 to 50).map(i => s"y$i").mkString(" ")),
      (4L, 30L, 0L, (1 to 30).map(i => s"u$i").mkString(" ")),
      // identical docs: 5 is first and keeps EVERYTHING, 6 empties —
      // the remove-everywhere policy (d41) empties both
      (5L, 12L, 0L, (1 to 12).map(i => s"z$i").mkString(" ")),
      (6L, 12L, 12L, "")))
  }

  test("exactSubstrIncremental cuts only history-duplicating text, ignores in-increment dups") {
    val p = (1 to 10).map(i => s"p$i").mkString(" ")
    val history = Seq(
      (1L, s"${(1 to 20).map(i => s"h$i").mkString(" ")} $p"),
      (3L, (1 to 30).map(i => s"m$i").mkString(" "))
    ).toDF("doc_id", "text")
    val q15 = (1 to 15).map(i => s"q$i").mkString(" ")
    val increment = Seq(
      (2L, s"${(1 to 10).map(i => s"x$i").mkString(" ")} $p ${(11 to 20).map(i => s"x$i").mkString(" ")}"),
      (4L, s"$q15 $q15") // duplicated WITHIN the increment only: out of scope
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrIncremental(history, increment, minLen = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (2L, 30L, 10L, (1 to 20).map(i => s"x$i").mkString(" ")),
      (4L, 30L, 0L, s"$q15 $q15")))
  }

  test("keep-first removes a pointwise subset of remove-everywhere (real corpus)") {
    // d42's anchors are d41's minus each gram's first occurrence, so
    // merged coverage — and therefore n_removed — dominates pointwise
    // per doc. Checked on the real table, not a fixture.
    val docs = Tables.documents(spark, dir)
    val all = Dedup.exactSubstrRemoval(docs, 8)
      .select(col("doc_id"), col("n_removed").as("nr_all"))
    val first = Dedup.exactSubstrKeepFirst(docs, 8)
      .select(col("doc_id"), col("n_removed").as("nr_first"))
    val viol = all.join(first, Seq("doc_id"))
      .filter(col("nr_first") > col("nr_all")).count()
    assert(viol == 0L)
    // and the family found real duplication to act on
    assert(all.filter(col("nr_all") > 0).count() > 0L)
  }

  test("d43 plan: one semi-join probe of history, broadcast cut join") {
    val docs = Tables.documents(spark, dir)
    val p = Dedup.exactSubstrIncremental(
      docs.filter(col("doc_id") % 4 =!= 0),
      docs.filter(col("doc_id") % 4 === 0), 8)
      .queryExecution.executedPlan.toString
    assert("LeftSemi".r.findAllIn(p).length == 1,
      "increment must probe history via exactly one semi join\n" + p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "the span->cut join must broadcast the pair-scale span side")
    assert(!p.toLowerCase.contains("cartesian"), "no cartesian products")
  }

  test("persisted gram index serves bit-identical incremental cuts") {
    val docs = Tables.documents(spark, dir)
    val hist = docs.filter(col("doc_id") % 4 =!= 0)
    val inc = docs.filter(col("doc_id") % 4 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-gram-spec-").toString
    Dedup.saveGramIndex(hist, path, 8)
    val direct = Dedup.exactSubstrIncremental(hist, inc, 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val indexed = Dedup.exactSubstrIncrementalIndexed(inc, path, 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(direct.nonEmpty && indexed == direct)
  }

  test("exactSubstrRemoval cuts duplicated spans everywhere, empties identical docs") {
    val out = Dedup.exactSubstrRemoval(exSubstrDocs, minLen = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val f = (1 to 20).map(i => s"f$i").mkString(" ")
    val g = (1 to 5).map(i => s"g$i").mkString(" ")
    assert(out == Seq(
      (1L, 45L, 20L, s"$f $g"),
      (2L, 60L, 10L, (1 to 50).map(i => s"x$i").mkString(" ")),
      (3L, 60L, 10L, (1 to 50).map(i => s"y$i").mkString(" ")),
      (4L, 30L, 0L, (1 to 30).map(i => s"u$i").mkString(" ")),
      (5L, 12L, 12L, ""), (6L, 12L, 12L, "")))
  }

  // ---- two-stage retrieval (e20/e21) ----

  test("rerank top-k IS the exact-cosine order of the ADC shortlist") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val shortl = Similarity.ivfPqTopK(emb, pred, 12, 16, 4, 8, 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rer = Similarity.ivfPqRerankTopK(emb, pred, 3, 12, 16, 4, 8, 16)
      .select("query_id", "rk", "neighbor_id").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // exact cosines recomputed with the same left-to-right double fold
    val vecs = emb.selectExpr("vec_id", "transform(embedding, x -> cast(x as double))")
      .as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0)((s, p) => s + p._1 * p._2)
    def cos(a: Long, b: Long) = {
      val (x, y) = (vecs(a), vecs(b))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    assert(rer.nonEmpty)
    rer.foreach { case (q, got) =>
      val want = shortl(q).toSeq
        .sortBy(nb => (-cos(q, nb), nb)).take(3)
      assert(got == want, s"query $q: got $got want $want")
    }
  }

  test("re-rank recall dominates the raw-index recall pointwise (e21 >= e15)") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val raw = Similarity.annRecall(emb, pred, 3, 16, 4, 8, 16)
      .select("query_id", "recall").as[(Long, Double)].collect().toMap
    val rer = Similarity.annRecallReranked(emb, pred, 3, 12, 16, 4, 8, 16)
      .select("query_id", "recall").as[(Long, Double)].collect().toMap
    assert(raw.keySet == rer.keySet)
    raw.foreach { case (q, r15) =>
      assert(rer(q) >= r15, s"query $q: rerank ${rer(q)} < raw $r15")
    }
  }

  test("residual encoding strictly tightens the ADC estimator (e22's mechanism)") {
    // The provable property of residual IVF-PQ is about the ESTIMATOR:
    // quantization error enters dist(q, x) once, and quantizing
    // x − centroid(cell) leaves less to quantize wherever cells carry
    // any mass concentration. Assert |adc − true L2²| over each
    // operator's returned pairs: residual must be strictly tighter on
    // a clustered corpus (64 tight clusters, 16 cells). Measured:
    // 0.362 vs 0.382 here, and 0.532 vs 0.564 even on the
    // structureless corpus — yet end-to-end RECALL on the registered
    // corpus still favors raw PQ (0.102 vs 0.238 at sf0.01,
    // BENCH_NOTES): a pointwise-tighter estimator does not imply a
    // better per-query ranking when the per-cell error bias differs.
    // Both effects are real; e23 being REGISTERED is what lets an
    // operator read them for their own corpus instead of trusting the
    // construction's reputation. All arithmetic is deterministic, so
    // the strict inequality is stable, not a flaky margin.
    val raw = Tables.embeddings(spark, dir)
    val vecs = raw.selectExpr("vec_id", "transform(embedding, x -> cast(x as double))")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val centers = (0 until 64).map(g => vecs(200 + g)._2)
    val clustered = vecs.map { case (id, v) =>
      val c = centers((id % 64).toInt)
      (id, v.zip(c).map { case (x, cc) => (0.9 * cc + 0.1 * x).toFloat }.toArray)
    }.toSeq.toDF("vec_id", "embedding")
    val lookup = clustered.selectExpr("vec_id", "transform(embedding, x -> cast(x as double))")
      .as[(Long, Seq[Double])].collect().toMap
    def trueL2(a: Long, b: Long): Double = {
      val (x, y) = (lookup(a), lookup(b))
      x.zip(y).foldLeft(0.0)((s, p) => s + (p._1 - p._2) * (p._1 - p._2))
    }
    val pred = col("vec_id") % 50 === 0
    def meanErr(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.select("query_id", "neighbor_id", "adc_dist")
        .as[(Long, Long, Double)].collect()
      rows.map { case (q, nb, adc) => math.abs(adc - trueL2(q, nb)) }.sum / rows.length
    }
    val rawErr = meanErr(Similarity.ivfPqTopK(clustered, pred, 10, 16, 4, 8, 16, 1))
    val resErr = meanErr(Similarity.ivfPqResidualTopK(clustered, pred, 10, 16, 4, 8, 16, 1))
    assert(resErr < rawErr,
      f"residual ADC ($resErr%.4f) must estimate true distances tighter than raw ($rawErr%.4f)")
  }

  test("SQ8: near-exact recall at 4x compression; codes stay in [0, 255]") {
    val emb = Tables.embeddings(spark, dir)
    val r = Similarity.annRecallSq8(emb, col("vec_id") % 50 === 0, 10)
      .agg(avg(col("recall"))).as[Double].collect().head
    // per-dimension byte resolution on [min, max] ranges loses almost
    // nothing at this dimensionality — the ladder's 4× rung sits near
    // the exact baseline while the 64× PQ rungs sit at 0.27/0.45
    // (re-ranked); deterministic corpus, deterministic number
    assert(r > 0.9, f"SQ8 recall@10 $r%.3f — quantization broke ranking")
    // decoded distances are true squared L2 within the quantization
    // step: every SQ distance of a returned pair must be non-negative
    // and finite (degenerate-scale and clamp edges included)
    val ds = Similarity.sq8TopK(emb, col("vec_id") % 50 === 0, 10)
      .select("sq_dist").as[Double].collect()
    assert(ds.forall(d => d >= 0.0 && java.lang.Double.isFinite(d)))
  }

  test("IVF+SQ8 isolates the probe-coverage ceiling (e27's factoring role)") {
    // The recall decomposition the e25/e27/e15 triple pins: with
    // near-exact codes (flat SQ8 0.986), the IVF+SQ8 number reads as
    // the probe-coverage ceiling — so it must (a) clearly dominate
    // IVF-PQ under the SAME candidates (the PQ codes are what lose the
    // rest) and (b) never exceed the EXACT ceiling |top-k ∩ probed
    // candidates|/k, computed here from the operator's own candidate
    // sets. The re-rank curve converging to this ceiling (0.450→0.504
    // vs 0.508, BENCH_NOTES) is the same geometry seen from below.
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val k = 10
    def mean(df: org.apache.spark.sql.DataFrame) =
      df.agg(avg(col("recall"))).as[Double].collect().head
    val sq = mean(Similarity.annRecallIvfSq8(emb, pred, k, 16, 4))
    val pq = mean(Similarity.annRecall(emb, pred, k, 16, 4, 8, 16, 1))
    assert(sq > pq + 0.1,
      f"IVF+SQ8 ($sq%.3f) must clearly dominate IVF-PQ ($pq%.3f) on the same candidates")
    // exact ceiling: per query, the fraction of exact top-k that the
    // probed candidate set contains at all (candidate sets recovered
    // from the operator run with k = corpus size)
    val cands = Similarity.ivfSq8TopK(emb, pred, 100000, 16, 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.cosineTopK(emb, pred, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ceiling = exact.map { case (q, ex) =>
      (ex intersect cands.getOrElse(q, Set.empty)).size.toDouble / k
    }.sum / exact.size
    assert(sq <= ceiling + 1e-9, f"e27 ($sq%.3f) exceeded its own coverage ceiling ($ceiling%.3f)")
    assert(sq >= ceiling - 0.05,
      f"e27 ($sq%.3f) far below the ceiling ($ceiling%.3f) — SQ8 ranking broke within candidates")
  }

  test("simhashHammingPairs: block keys mask off bit 63's sign extension") {
    // Two identical docs must collide in EVERY block even when bit 63 is
    // set on their shared signature (arithmetic shift would otherwise
    // sign-extend the top block's key).
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val out = Dedup.simhashHammingPairs(docs, radius = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L)))
  }
}
