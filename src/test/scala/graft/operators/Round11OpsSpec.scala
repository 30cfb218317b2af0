package graft.operators

import graft.SparkTestSession
import graft.sources.{IndexManifest, IndexManifestException, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 specs: the advice-hardening items — the append-vs-manifest
  * crash window (orphan rows above the watermark are a named error and
  * sync recovers by rebuild), the zero-truth band-curve NULL, and the
  * unimaxSelect unmatched-stratum loud failure.
  */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def chain(t: Throwable): String =
    if (t == null) "" else t.toString + "|" + chain(t.getCause)

  test("lsh index: a crashed append (data landed, manifest stale) makes the retry a named error and sync a rebuild") {
    val docs = Tables.documents(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val (cut1, cut2) = (maxId / 2, maxId * 3 / 4)
    val history = docs.filter(col("doc_id") <= cut1)
    val inc = docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2)
    val path = tmp("graft-lshorph-")
    Dedup.saveLshIndex(history, path, 16, 4)
    val stale = IndexManifest.read(path)
    // simulate the crash window: the append's data writes committed but
    // the manifest flip did not (restore the pre-append manifest)
    Dedup.appendLshIndex(inc, path)
    IndexManifest.write(path, stale)
    // the retry passes the id-monotone guard against the STALE watermark
    // — exactly the silent-duplication path — and must now fail loudly
    val e = intercept[IndexManifestException] { Dedup.appendLshIndex(inc, path) }
    assert(e.getMessage.contains("above its manifest watermark"))
    // sync recovers by rebuilding, and the rebuilt store equals a fresh
    // build row-for-row (no duplicated signatures)
    assert(Dedup.lshIndexSync(docs.filter(col("doc_id") <= cut2), path, 16, 4)
      == "rebuild")
    assert(Dedup.lshIndexSync(docs.filter(col("doc_id") <= cut2), path, 16, 4)
      == "fresh")
    val freshPath = tmp("graft-lshfresh-")
    Dedup.saveLshIndex(docs.filter(col("doc_id") <= cut2), freshPath, 16, 4)
    def rows(p: String) = spark.read.parquet(s"$p/sig").collect()
      .map(_.toSeq).toSet
    assert(rows(path) == rows(freshPath))
    val nIds = spark.read.parquet(s"$path/sig").count()
    assert(nIds == spark.read.parquet(s"$path/sig")
      .select(col("doc_id")).distinct().count(), "duplicated signature rows")
  }

  test("srp index: orphan rows above the watermark are a named error; sync rebuilds") {
    val emb = Tables.embeddings(spark, dir)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val (cut1, cut2) = (maxId / 2, maxId * 3 / 4)
    val path = tmp("graft-srporph-")
    Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut1), path, 16, 3)
    val stale = IndexManifest.read(path)
    Similarity.appendSrpIndex(
      emb.filter(col("vec_id") > cut1 && col("vec_id") <= cut2), path)
    IndexManifest.write(path, stale)
    val e = intercept[IndexManifestException] {
      Similarity.appendSrpIndex(
        emb.filter(col("vec_id") > cut1 && col("vec_id") <= cut2), path)
    }
    assert(e.getMessage.contains("above its manifest watermark"))
    assert(Similarity.srpIndexSync(emb.filter(col("vec_id") <= cut2), path, 16, 3)
      == "rebuild")
    assert(Similarity.srpIndexSync(emb.filter(col("vec_id") <= cut2), path, 16, 3)
      == "fresh")
  }

  test("lshBandCurve: a zero-truth slice reports NULL recall, not NaN") {
    import spark.implicits._
    // wholly disjoint vocabularies: no pair reaches any Jaccard > 0
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "red green blue yellow purple orange")).toDF("doc_id", "text")
    val curve = Dedup.lshBandCurve(docs, Seq(2, 4), 16, 4, 0.5).collect()
    assert(curve.nonEmpty)
    curve.foreach { r =>
      assert(r.getAs[Long]("n_truth") == 0L)
      assert(r.isNullAt(r.fieldIndex("recall")),
        s"recall should be NULL on a zero-truth slice, got ${r.get(r.fieldIndex("recall"))}")
    }
  }

  test("saveCuratedShards: exactly the selected docs land, the curated stream packs from 0, placement matches the direct build, single-shard reads prune") {
    val docs = Tables.documents(spark, dir)
    val sel = docs.select(col("doc_id")).filter(col("doc_id") % 3 === 0)
    val path = tmp("graft-curated-")
    Packing.saveCuratedShards(docs, sel, path, 4096L)
    val store = spark.read.parquet(s"$path/shards")
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        col("shard_id").cast("long").as("shard_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only + all selected docs land
    val selIds = sel.collect().map(_.getLong(0)).toSet
    assert(store.map(_._1).toSet == selIds && selIds.nonEmpty)
    // contiguous packing from token 0: dropped docs leave no holes
    val spans = store.map(t => (t._3, t._2)).sortBy(_._1)
    spans.foldLeft(0L) { case (expect, (st, n)) =>
      assert(st == expect, s"curated stream has a gap/overlap at $st"); st + n
    }
    // the shard budget contract: shard = start DIV budget, so every
    // doc STARTS inside its shard's budget window (overrun ≤ one tail)
    store.foreach { case (id, _, st, sh) =>
      assert(sh == st / 4096L, s"doc $id shard $sh != ${st / 4096L}") }
    // placement ≡ the plain shards build on the pre-filtered corpus
    val direct = Packing.tokenShards(
      docs.filter(col("doc_id") % 3 === 0), 4096L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(store.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
    // the store stays a first-class shards store: pruned single-shard read
    val one = Packing.readShard(spark, path, 0L)
    assert(one.count() > 0)
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("shard_id"),
      s"single-shard read is not partition-pruned:\n$scan")
  }

  test("curatedShardsSync: fresh/append/rebuild; a count-preserving membership flip below the watermark still rebuilds; history files frozen on append") {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val sel = docs.select(col("doc_id")).filter(col("doc_id") % 3 === 0)
    val path = tmp("graft-cursync-")
    val B = 4096L
    Packing.saveCuratedShards(docs.filter(col("doc_id") <= cut), sel, path, B)
    def files(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(path, "shards")).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.size(p)).toMap
    }
    val before = files()
    // monotone growth under an unchanged verdict: append, history
    // shard files byte-frozen, second sync fresh
    assert(Packing.curatedShardsSync(docs, sel, path, B) == "append")
    val after = files()
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "append rewrote a frozen history shard file")
    assert(Packing.curatedShardsSync(docs, sel, path, B) == "fresh")
    // the store now matches the two-stage placement; a PREFIX-count-
    // preserving membership flip (drop one old selected id, add one
    // old unselected id — rows AND maxId unchanged) must still rebuild:
    // the watermark pair alone cannot see it, the identity check can
    val selIds = sel.filter(col("doc_id") <= cut).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    val dropId = selIds(1)
    val addId = dropId + 1 // % 3 != 0 by construction, same id range
    assert(addId % 3 != 0 && addId <= cut)
    val flipped = docs.select(col("doc_id"))
      .filter((col("doc_id") % 3 === 0 && col("doc_id") =!= dropId) ||
        col("doc_id") === addId)
    assert(Packing.curatedShardsSync(docs, flipped, path, B) == "rebuild")
    // the rebuilt store equals a fresh curated build on the flipped set
    val freshPath = tmp("graft-curfresh-")
    Packing.saveCuratedShards(docs, flipped, freshPath, B)
    def rows(p: String) = spark.read.parquet(s"$p/shards")
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        col("shard_id").cast("long")).collect().map(_.toSeq).toSet
    assert(rows(path) == rows(freshPath))
    assert(Packing.curatedShardsSync(docs, flipped, path, B) == "fresh")
  }

  test("saveCuratedShards: an EMPTY selection writes a readable schema-only store; sync grows it into a real store once a selection appears") {
    val docs = Tables.documents(spark, dir)
    val none = docs.select(col("doc_id")).filter(lit(false))
    val path = tmp("graft-curempty-")
    Packing.saveCuratedShards(docs, none, path, 4096L)
    // the empty store must be READABLE (schema-only parquet), not a
    // bare _SUCCESS that fails schema inference
    val st = spark.read.parquet(s"$path/shards")
    assert(st.count() == 0 && st.columns.contains("doc_id"))
    val m = IndexManifest.require(path, "shards")
    assert(m.corpusRows == 0L && m.params("n_tokens_total") == 0L)
    // a selection appears: sync appends, which on a zero-length frozen
    // stream IS a fresh build (and must be — a partitioned append onto
    // the unpartitioned empty file would leave a mixed layout)
    val sel = docs.select(col("doc_id")).filter(col("doc_id") % 3 === 0)
    assert(Packing.curatedShardsSync(docs, sel, path, 4096L) == "append")
    val direct = Packing.tokenShards(docs.filter(col("doc_id") % 3 === 0), 4096L)
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(s"$path/shards")
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        col("shard_id").cast("long")).collect().map(_.toSeq).toSet
    assert(got == direct)
    assert(Packing.curatedShardsSync(docs, sel, path, 4096L) == "fresh")
  }

  test("fullVerdictCached: artifact round trip is bit-identical to the direct composition; warm hit serves without rebuild; knob drift rebuilds") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val rates = Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.125)
    val keepPath = tmp("graft-fvkeep-")
    val path = tmp("graft-fv-")
    def cached(minTokens: Int = 20) = Curation.fullVerdictCached(docs,
      col("doc_id") % 10 === 0, rates, 1.0, 8, 4, 0.5, 1000L, 10000L,
      16, col("lang") === "en", 64, 3, keepPath, path, minTokens = minTokens)
    val direct = Curation.fullVerdict(docs,
      Curation.keepList(docs, col("doc_id") % 10 === 0, rates, 1.0,
        8, 4, 0.5, 1000L, 10000L),
      16, col("lang") === "en", 64, 3)
      .as[(Long, Boolean, String, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    val art = cached()
      .as[(Long, Boolean, String, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(direct.nonEmpty && art == direct)
    def verdictFiles(): Map[String, java.nio.file.attribute.FileTime] = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(path, "verdict")).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    }
    val before = verdictFiles()
    cached().count()
    assert(verdictFiles() == before, "warm hit rewrote the artifact")
    // ANY knob drift — including a keep-leg gate param — must rebuild
    cached(minTokens = 9999).count()
    assert(verdictFiles() != before, "params drift served the stale artifact")
  }

  test("packedContexts: windows tile exactly at ctxLen (tail partial), digests equal an independent JVM reconstruction") {
    val docs = Tables.documents(spark, dir)
    val ctxLen = 512
    val out = Packing.packedContexts(docs, ctxLen).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .sortBy(_._1)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val totalTokens = texts.values.map(_.split(" ").length.toLong).sum
    // tiling: windows are 0..N-1, full ctxLen each except a partial tail
    assert(out.map(_._1).toSeq == (0L until out.length.toLong))
    out.dropRight(1).foreach { case (id, (_, n, _)) =>
      assert(n == ctxLen, s"window $id holds $n tokens") }
    assert(out.map(_._2._2).sum == totalTokens)
    // independent reconstruction: spans + raw texts, assembled in plain
    // Scala, digested with MessageDigest — no Spark expressions shared
    // with the operator under test
    val spans = Packing.packSequences(docs, ctxLen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byWindow = spans.groupBy(_._2)
    out.foreach { case (ctxId, (nDocs, _, digest)) =>
      val segs = byWindow(ctxId).sortBy(_._3).map { case (docId, _, _, off, len) =>
        texts(docId).split(" ").slice(off.toInt, (off + len).toInt).mkString(" ")
      }
      assert(segs.length == nDocs)
      val payload = segs.mkString(" ")
      val jvmMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(jvmMd5 == digest, s"window $ctxId digest mismatch")
    }
  }

  test("unimaxSelect: a NULL stratum fails loudly instead of silently bypassing the budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f", Some("en")),
      (2L, "g h i", Some("de")),
      (3L, "j k", Option.empty[String])).toDF("doc_id", "text", "s")
    val ex = intercept[Throwable] {
      Curation.unimaxSelect(docs, col("s"), 0.5, 1.0).collect()
    }
    assert(chain(ex).contains("NULL stratum"),
      s"expected the loud NULL-stratum error, got: ${chain(ex)}")
    val ex2 = intercept[Throwable] {
      Curation.unimaxMixture(docs, col("s"), 0.5, 1.0).collect()
    }
    assert(chain(ex2).contains("NULL stratum"))
  }

  test("embedDrift: identical slices report exactly zero mean drift and unit variance ratio") {
    import spark.implicits._
    // two slices with IDENTICAL vector multisets: drift must be exact 0/1
    val vecs = (0 until 8).map(i => Array.fill(4)(0.1f * (i + 1)))
    val emb = (vecs.zipWithIndex.map { case (v, i) => (i.toLong * 2, v) } ++
      vecs.zipWithIndex.map { case (v, i) => (i.toLong * 2 + 1, v) })
      .toDF("vec_id", "embedding")
    val r = Similarity.embedDrift(emb, col("vec_id") % 2 === 0).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_ref") == 8 && r.head.getAs[Long]("n_new") == 8)
    assert(r.head.getAs[Double]("l2sq_mean_diff") == 0.0)
    assert(r.head.getAs[Double]("mean_var_ratio") == 1.0)
  }

  test("tokenDrift: identical slices report exactly zero divergence and OOV; disjoint vocabularies report ln(2) and full OOV") {
    import spark.implicits._
    val same = Seq((0L, "a b b c"), (1L, "a b b c")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenDrift(same, col("doc_id") % 2 === 0).collect().head
    assert(r.getAs[Double]("js_div") == 0.0)
    assert(r.getAs[Double]("oov_mass_new") == 0.0
      && r.getAs[Double]("oov_mass_ref") == 0.0)
    // disjoint vocabularies: JS = ln 2, both OOV masses = 1
    val disj = Seq((0L, "a b"), (1L, "x y")).toDF("doc_id", "text")
    val d = TextAnalysis.tokenDrift(disj, col("doc_id") % 2 === 0).collect().head
    assert(math.abs(d.getAs[Double]("js_div") - math.log(2)) < 1e-8,
      s"js=${d.getAs[Double]("js_div")}")
    assert(d.getAs[Double]("oov_mass_new") == 1.0
      && d.getAs[Double]("oov_mass_ref") == 1.0)
  }

  test("propagateKeep: only children of kept parents survive") {
    import spark.implicits._
    val keep = Seq((1L, true), (2L, false), (3L, true))
      .toDF("doc_id", "keep")
    val side = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "orphan"))
      .toDF("vec_id", "payload")
    val got = Curation.propagateKeep(keep, side, "vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("d116: retrieved chunks decode to real document windows and carry query-term mass") {
    val out = graft.SparkEntry.queries("d116_chunk_retrieval")(spark, dir)
      .collect()
    assert(out.nonEmpty && out.length <= 20)
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val terms = Set("table", "query", "spark")
    // scores are sorted descending; every hit decodes to a real window
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      val (d, c) = (r.getLong(0), r.getLong(1))
      val w = texts(d)
      val chunk = w.slice(c.toInt * 24, c.toInt * 24 + 32)
      assert(chunk.nonEmpty, s"chunk ($d,$c) out of range")
      if (r.getDouble(2) > 0)
        assert(chunk.exists(terms), s"positive-scored chunk ($d,$c) has no query term")
    }
  }

  test("chunkDocs: hand-checked fixture (short tail kept) and full-coverage property on real docs") {
    import spark.implicits._
    // chunk=3, stride=2 over 7 words: starts 0,2,4,6 — last chunk 1 word
    val fix = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(fix, 3, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == Map(
      (1L, 0L) -> ((0L, 3L, "a b c")), (1L, 1L) -> ((2L, 3L, "c d e")),
      (1L, 2L) -> ((4L, 3L, "e f g")), (1L, 3L) -> ((6L, 1L, "g")),
      (2L, 0L) -> ((0L, 2L, "x y"))), got.toString)
    // property: with stride <= chunk every word position is covered and
    // chunk word-counts reconstruct per-doc totals under the overlap
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 100)
    val ch = TextAnalysis.chunkDocs(docs, 32, 24)
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val bad = ch.groupBy(col("doc_id"))
      .agg(max(col("start_tok") + col("n_tok")).as("covered_end"),
        min(col("start_tok")).as("first"))
      .join(lens, Seq("doc_id"))
      .filter(col("covered_end") < col("n") || col("first") =!= 0L)
      .count()
    assert(bad == 0L, "chunks must start at 0 and cover every word")
  }

  test("d121: fold pairing equals the sequential fold over (len desc, id) and respects the context") {
    val ctx = 108
    val docs = Tables.documents(spark, dir)
    val got = Packing.pairPack(docs, ctx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // sequential twin: rank by (len desc, id), fold rank i onto n+1-i
    val lens = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ", -1).length.toLong))
    val ranked = lens.sortBy { case (id, n) => (-n, id) }.zipWithIndex
      .map { case ((id, n), i) => (id, n, i + 1L) }
    val n = ranked.length.toLong
    val lenAt = ranked.map(d => d._3 -> d._2).toMap
    val want = ranked.map { case (id, len, rnk) =>
      val prnk = n + 1L - rnk
      val paired = rnk != prnk && len + lenAt(prnk) <= ctx
      val bin = if (paired) math.min(rnk, prnk) else rnk
      val slot = if (paired && rnk > prnk) 1L else 0L
      id -> ((len, rnk, bin, slot))
    }.toMap
    assert(got == want)
    // structural invariants: every doc exactly once; a shared bin holds
    // exactly the (rank, mirror) pair and fits; slot 0 is the longer
    assert(got.size == lens.length)
    val byBin = got.values.groupBy(_._3)
    byBin.foreach { case (bin, ms) =>
      assert(ms.size <= 2, s"bin $bin holds ${ms.size} docs")
      if (ms.size == 2) {
        assert(ms.map(_._1).sum <= ctx, s"bin $bin overflows")
        assert(ms.map(_._4).toSet == Set(0L, 1L), s"bin $bin slots")
        val bySlot = ms.map(m => m._4 -> m._1).toMap
        assert(bySlot(0L) >= bySlot(1L), "slot 0 must be the longer member")
      }
    }
  }

  test("d122: the three padding bills agree with the d121 bins and the closed forms") {
    val ctx = 108
    val docs = Tables.documents(spark, dir)
    val got = Packing.packEfficiency(docs, ctx).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val fills = Packing.pairPack(docs, ctx).collect()
      .groupBy(_.getLong(3)).map(_._2.map(_.getLong(1)).sum)
    assert(got("paired") ==
      ((fills.size.toLong, fills.map(f => math.max(0L, ctx - f)).sum)))
    val lens = docs.collect()
      .map(_.getAs[String]("text").split(" ", -1).length.toLong)
    assert(got("singleton") ==
      ((lens.length.toLong, lens.map(l => math.max(0L, ctx - l)).sum)))
    val total = lens.sum
    val nSeq = (total + ctx - 1) / ctx
    assert(got("concat") == ((nSeq, nSeq * ctx - total)))
    // and the ordering that justifies the operator: pairing pays less
    // padding than no packing at all
    assert(got("paired")._2 < got("singleton")._2)
  }

  test("e52: MMR selection equals the sequential greedy over exact cosines; first pick is pure relevance") {
    val (poolK, outK) = (12, 5)
    val emb = Tables.embeddings(spark, dir)
    val got = Similarity.mmrRerank(emb, 0L, poolK, outK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // JVM twin from raw vectors: same left-to-right double folds
    val vecs = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
    val pool = vecs.keys.filter(_ != 0L).toSeq
      .map(id => (id, cos(0L, id)))
      .sortBy { case (id, c) => (-c, id) }.take(poolK)
    val rel = pool.toMap
    var sel = Vector.empty[(Long, Double, Double)]
    var rem = pool.map(_._1)
    while (sel.size < outK && rem.nonEmpty) {
      val scored = rem.map { c =>
        val ms = if (sel.isEmpty) 0.0
          else sel.map(s => cos(c, s._1)).max(Ordering.Double.TotalOrdering)
        (c, rel(c), 0.5 * rel(c) - 0.5 * ms)
      }
      val best = scored.minBy { case (id, _, m) => (-m, id) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      sel :+= best
      rem = rem.filterNot(_ == best._1)
    }
    val want = sel.zipWithIndex.map { case ((id, r, m), i) => (i + 1L, id, r, m) }
    assert(got.toSeq == want)
    // first pick maximizes relevance outright (empty-set MMR term)
    assert(got.head._2 == pool.head._1)
    // selected ids are distinct members of the pool
    assert(got.map(_._2).distinct.length == outK)
    assert(got.map(_._2).toSet.subsetOf(pool.map(_._1).toSet))
  }

  test("e53: the ANN-pool MMR selects within the query's sign bucket and replays the same greedy") {
    val (poolK, outK, bits) = (12, 5, 6)
    val emb = Tables.embeddings(spark, dir)
    val got = Similarity.mmrRerankAnn(emb, 0L, poolK, outK, bits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // the pool is the op's own ANN top-k (e02-oracle-pinned); the
    // greedy must equal the e52 driver loop over that pool
    val pool = Similarity.annTopK(emb, col("vec_id") === 0L, poolK, bits)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
    assert(pool.nonEmpty && got.nonEmpty)
    assert(got.map(_._2).toSet.subsetOf(pool.map(_._1).toSet))
    assert(got.length == math.min(outK, pool.length))
    // first pick is the pool's pure-relevance argmax
    val first = pool.minBy { case (id, c) => (-c, id) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    assert(got.head._2 == first._1 && got.head._3 == first._2)
  }

  test("d123: triplets elect the max-jaccard positive and a collision-free deterministic negative") {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val pairs = Dedup.lshNearDupPairs(docs, 8, 4, 0.5, 1000L, 10000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assume(pairs.nonEmpty, "corpus must yield near-dup pairs")
    val sym = pairs.flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
    val want = sym.groupBy(_._1).map { case (anchor, ps) =>
      val (_, p, j) = ps.minBy { case (_, p, j) => (-j, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      val h = Dedup.hash60Jvm(s"neg:$anchor") % nDocs
      val neg =
        if (h != anchor && h != p) h
        else if ((h + 1) % nDocs != anchor && (h + 1) % nDocs != p) (h + 1) % nDocs
        else (h + 2) % nDocs
      anchor -> ((p, j, neg))
    }
    val got = Dedup.tripletMine(docs, 8, 4, 0.5, 1000L, 10000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == want)
    // the negative is never the anchor, never the positive, always a
    // real document id
    got.foreach { case (a, (p, _, n)) =>
      assert(n != a && n != p && n >= 0 && n < nDocs, s"bad negative for $a")
    }
  }

  test("d124: proximity rerank orders by coverage, then the exact min cover window, then BM25") {
    val terms = Seq("table", "query", "spark")
    val (poolK, outK) = (20, 10)
    val docs = Tables.documents(spark, dir)
    val got = TextAnalysis.proximityRerank(docs, terms, poolK, outK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getDouble(4)))
    // JVM twin: pool from the operator's own scorer (already oracle-
    // pinned), spans by brute force over the raw texts
    val scores = TextAnalysis.bm25(docs, terms).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val pool = scores.sortBy { case (id, s) => (-s, id) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)).take(poolK)
    val texts = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val want = pool.map { case (id, s) =>
      val ws = texts(id).split(" ", -1)
      val posOf = terms.map(t => ws.zipWithIndex.collect {
        case (w, i) if w == t => i.toLong
      })
      val nPresent = posOf.count(_.nonEmpty).toLong
      val span: Option[Long] =
        if (posOf.exists(_.isEmpty)) None
        else Some((for (a <- posOf(0); b <- posOf(1); c <- posOf(2))
          yield math.max(a, math.max(b, c)) - math.min(a, math.min(b, c)) + 1).min)
      (id, nPresent, span, s)
    }.sortBy { case (id, np, sp, s) =>
      (-np, sp.getOrElse(Long.MaxValue), -s, id)
    }(Ordering.Tuple4(Ordering.Long, Ordering.Long,
      Ordering.Double.TotalOrdering, Ordering.Long))
      .take(outK).zipWithIndex
      .map { case ((id, np, sp, s), i) => (i + 1L, id, np, sp, s) }
    assert(got.toSeq == want.toSeq)
    // coverage dominates: n_present is non-increasing down the ranking
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("d125: the hard negative is the best non-duplicate ANN neighbor; positives match d123's election") {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val got = Dedup.tripletMineHard(docs, emb, 8, 4, 0.5, 1000L, 10000L, 3, 6)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))))
      .toMap
    assume(got.nonEmpty)
    val dupSet = Dedup.lshNearDupPairs(docs, 8, 4, 0.5, 1000L, 10000L)
      .collect().flatMap(r => {
        val (a, b) = (r.getLong(0), r.getLong(1))
        Seq((a, b), (b, a))
      }).toSet
    // positives agree with the random-negative miner's election
    val base = Dedup.tripletMine(docs, 8, 4, 0.5, 1000L, 10000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == base)
    // hard negatives: recompute the election from the knn op (itself
    // e06-oracle-pinned) minus the dup set
    val knn = Similarity.knnGraph(emb, 3, 6).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine")))
    got.foreach { case (anchor, (p, _, hn)) =>
      val cands = knn.filter(k => k._1 == anchor && !dupSet((anchor, k._2)))
      val want =
        if (cands.isEmpty) None
        else {
          val b = cands.minBy { case (_, id, c) => (-c, id) }(
            Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
          Some((b._2, b._3))
        }
      assert(hn == want, s"anchor $anchor")
      hn.foreach { case (id, _) =>
        assert(id != anchor && id != p && !dupSet((anchor, id)))
      }
    }
  }

  test("d126/d127: bucketed batches fill in length order and pay less padding than arrival order") {
    val (bS, wS) = (16, 16)
    val docs = Tables.documents(spark, dir)
    val got = Packing.bucketBatches(docs, bS, wS).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // JVM twin: per-bucket (len, id) order chopped into B-sized batches
    val lens = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ", -1).length.toLong))
    val want = lens.toSeq.groupBy { case (_, n) => n / wS }.flatMap { case (bkt, ds) =>
      ds.sortBy { case (id, n) => (n, id) }.zipWithIndex.map {
        case ((id, n), i) => id -> ((n, bkt, i.toLong / bS, i.toLong % bS))
      }
    }
    assert(got == want)
    // every batch holds at most B docs; slots are 0..n-1 within batch
    got.values.groupBy(v => (v._2, v._3)).foreach { case (b, ms) =>
      assert(ms.size <= bS, s"batch $b overfull")
      assert(ms.map(_._4).toSeq.sorted == (0L until ms.size).toSeq, s"batch $b slots")
    }
    // stats row agrees with the assignment's own padding arithmetic
    val stats = Packing.bucketBatchStats(docs, bS, wS).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batches = got.values.groupBy(v => (v._2, v._3)).values
    val pad = batches.map(ms => ms.size * ms.map(_._1).max - ms.map(_._1).sum).sum
    assert(stats("bucketed") == ((batches.size.toLong, pad)))
    assert(stats("bucketed")._2 < stats("shuffled")._2,
      "length bucketing must beat arrival-order batching on padding")
  }

  test("d128: MRR/p@k recompute from the ranked lists; coverage-first rerank dominates on the conjunctive label") {
    val terms = Seq("dup", "table", "spark")
    val (poolK, outK) = (20, 10)
    val docs = Tables.documents(spark, dir)
    val got = TextAnalysis.retrievalEval(docs, terms, poolK, outK)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val rel = docs.collect().filter { r =>
      val ws = r.getAs[String]("text").split(" ", -1).toSet
      terms.forall(ws.contains)
    }.map(_.getAs[Long]("doc_id")).toSet
    import org.apache.spark.sql.expressions.Window
    val bm = TextAnalysis.bm25(docs, terms)
      .orderBy(col("score").desc, col("doc_id")).limit(outK)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val px = TextAnalysis.proximityRerank(docs, terms, poolK, outK)
      .select(col("doc_id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def metrics(ranked: Seq[(Long, Long)]): (Double, Double) = {
      val relRks = ranked.filter(d => rel(d._1)).map(_._2)
      val mrr = if (relRks.isEmpty) 0.0 else 1.0 / relRks.min.toDouble
      (mrr, relRks.size.toDouble / outK)
    }
    assert(got("bm25") == metrics(bm.toSeq))
    assert(got("proximity") == metrics(px.toSeq))
    // the rerank can only help a conjunctive label: full-coverage docs
    // in the pool sort before everything else
    assert(got("proximity")._1 >= got("bm25")._1)
    assert(got("proximity")._2 >= got("bm25")._2)
  }

  test("d129: dataset card facts recompute from the raw corpus; duplication registers on a doubled corpus") {
    val docs = Tables.documents(spark, dir)
    val card = TextAnalysis.datasetCard(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val texts = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val n = texts.length.toDouble
    assert(card("n_docs") == n)
    assert(card("n_tokens") == texts.map(_._2.split(" ", -1).length).sum.toDouble)
    assert(card("vocab_size") ==
      texts.flatMap(_._2.split(" ", -1)).distinct.length.toDouble)
    assert(card("mean_doc_tokens") == card("n_tokens") / card("n_docs"))
    assert(card("exact_dup_frac") ==
      1.0 - texts.map(_._2).distinct.length / n)
    val langs = Seq("en", "es", "de", "fr")
    val shareSum = langs.map(l => card(s"lang_share_$l")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    assert(card.size == 6 + langs.size)
    // duplicating every doc under fresh ids halves the distinct mass
    import spark.implicits._
    val doubled = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val card2 = TextAnalysis.datasetCard(doubled).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card2("exact_dup_frac") == 0.5 + card("exact_dup_frac") / 2)
  }

  test("d130: source cap keeps exactly min(cap, |source|) per source via the deterministic draw") {
    val cap = 15
    val docs = Tables.documents(spark, dir)
    val got = Curation.sourceCap(docs, cap).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val bySource = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
      .groupBy(_._2)
    assert(got.size == bySource.values.map(_.length).sum)
    bySource.foreach { case (src, ds) =>
      val kept = ds.map(_._1).filter(id => got(id)._3)
      assert(kept.length == math.min(cap, ds.length), s"source $src")
      // the election is the hash60 draw order, recomputed JVM-side
      val want = ds.map(_._1)
        .sortBy(id => (Dedup.hash60Jvm(s"cap:$id"), id)).take(cap).toSet
      assert(kept.toSet == want, s"source $src election")
      // ranks are a permutation of 1..n within the source
      assert(ds.map(d => got(d._1)._2).sorted.toSeq == (1L to ds.length).toSeq)
    }
  }

  test("d131: a clean store audits all-ok; text corruption, row loss, and duplication each fire the detector") {
    import org.apache.spark.sql.DataFrame
    val docs = Tables.documents(spark, dir)
    val budget = 4096L
    def build(): String = {
      val p = tmp("graft-audit-")
      Packing.saveTokenShards(docs, p, budget)
      p
    }
    def audit(p: String): Map[Long, Boolean] =
      Packing.shardAudit(spark, p).collect()
        .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val clean = build()
    val ok0 = audit(clean)
    assert(ok0.nonEmpty && ok0.values.forall(identity), ok0.toString)
    // corrupt one shard partition three different ways; the others
    // must keep auditing ok and the victim must flip
    def mutate(f: DataFrame => DataFrame): Map[Long, Boolean] = {
      val p = build()
      val victim = ok0.keys.min
      val part = s"$p/shards/shard_id=$victim"
      val rows = spark.read.parquet(part).localCheckpoint(true)
      f(rows).write.mode("overwrite").parquet(part)
      audit(p)
    }
    val victim = ok0.keys.min
    // (a) text corruption preserving counts: append a word to one text
    val a = mutate(r => r.withColumn("text",
      when(col("doc_id") === r.agg(min(col("doc_id"))).head().getLong(0),
        concat(col("text"), lit(" corrupted"))).otherwise(col("text"))))
    assert(!a(victim) && a.filter(_._1 != victim).values.forall(identity), a.toString)
    // (b) a dropped row breaks the within-shard chain
    val b = mutate(r => r.orderBy(col("start_token"))
      .filter(col("start_token") =!= r.orderBy(col("start_token"))
        .select(col("start_token")).collect()(1).getLong(0)))
    assert(!b(victim), b.toString)
    // (c) a duplicated row breaks the chain too
    val c = mutate(r => r.unionByName(r.orderBy(col("start_token")).limit(1)))
    assert(!c(victim), c.toString)
  }

  test("d132: card append equals a fresh full build bit-exactly; a crashed append is a named error and sync rebuilds") {
    val docs = Tables.documents(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut = maxId / 2
    def card(p: String): Map[String, Double] =
      TextAnalysis.cardFromStore(spark, p).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // merge exactness: half + append ≡ full build, every double bit-equal
    val inc = tmp("graft-card-inc-")
    TextAnalysis.saveCardStore(docs.filter(col("doc_id") <= cut), inc)
    TextAnalysis.appendCardStore(docs.filter(col("doc_id") > cut), inc)
    val full = tmp("graft-card-full-")
    TextAnalysis.saveCardStore(docs, full)
    assert(card(inc) == card(full))
    // estimates actually estimate: vocab within 25% of the exact count
    val vocabExact = docs.select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0).toDouble
    assert(math.abs(card(full)("vocab_hll") - vocabExact) / vocabExact < 0.25,
      s"${card(full)("vocab_hll")} vs $vocabExact")
    // crashed append (state landed, manifest did not): retry is a named
    // error, sync recovers by rebuild, then reports fresh
    val crash = tmp("graft-card-crash-")
    TextAnalysis.saveCardStore(docs.filter(col("doc_id") <= cut), crash)
    val stale = graft.sources.IndexManifest.read(crash)
    TextAnalysis.appendCardStore(docs.filter(col("doc_id") > cut), crash)
    graft.sources.IndexManifest.write(crash, stale)
    val e = intercept[IndexManifestException] {
      TextAnalysis.appendCardStore(docs.filter(col("doc_id") > cut), crash)
    }
    assert(e.getMessage.contains("above its manifest watermark"))
    assert(TextAnalysis.cardStoreSync(docs, crash) == "rebuild")
    assert(TextAnalysis.cardStoreSync(docs, crash) == "fresh")
    assert(card(crash) == card(full))
  }

  test("d133: prefix filtering returns the exact join's answer while generating fewer candidate postings") {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val t = 0.4
    def pairs(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(Dedup.jaccardAll(docs, t, 10000L))
    val pp = pairs(Dedup.ppJoinPairs(docs, t, 10000L))
    assert(pp == exact, s"ppjoin ${pp.size} vs exact ${exact.size}")
    assert(exact.nonEmpty, "fixture must yield pairs")
    // the pruning is real: the prefix index is a strict subset of the
    // postings, so its self-join emits strictly fewer candidate rows
    val sh = Dedup.hashedShingles(docs)
    val full = sh.count()
    // mirror of ppJoinPairs' prefix construction
    import org.apache.spark.sql.expressions.Window
    val dfq = sh.groupBy(col("hs")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("hs"))
    val wSz = Window.partitionBy(col("doc_id"))
    val prefRows = sh.join(dfq, Seq("hs"))
      .withColumn("pos", row_number().over(wDoc).cast("long"))
      .withColumn("sz", count(lit(1)).over(wSz).cast("long"))
      .filter(col("pos") <= col("sz") - ceil(lit(t) * col("sz") - lit(1e-9)) + 1L)
      .count()
    assert(prefRows < full,
      s"prefix index ($prefRows rows) must prune the postings ($full)")
    assert(prefRows.toDouble / full < 1.0 - t + 0.1,
      s"pruning should approach the (1-t) fraction: $prefRows/$full")
  }

  test("d134: the Vose table satisfies the exact mass identity; realized shares track the weights") {
    // mass identity: for every stratum i,
    //   Σ_j [primary_j = i]·thr_j + [alias_j = i]·(W − thr_j) = wᵢ·K
    // — the alias method's correctness proof, executable
    def identityOk(ws: Seq[(String, Long)]): Unit = {
      val tab = Sampling.aliasTable(ws)
      val w = ws.map(_._2).sum
      val k = ws.size
      ws.foreach { case (s, wi) =>
        val mass = tab.map { case (_, p, thr, a) =>
          (if (p == s) thr else 0L) + (if (a == s && a != p) w - thr else 0L)
        }.sum
        assert(mass == wi * k, s"stratum $s: $mass != ${wi * k} (ws=$ws)")
      }
      // every threshold in (0, W]; a full column aliases itself
      tab.foreach { case (_, p, thr, a) =>
        assert(thr > 0 && thr <= w)
        if (thr == w) assert(a == p)
      }
    }
    identityOk(Seq("en" -> 4L, "es" -> 3L, "de" -> 2L, "fr" -> 1L))
    identityOk(Seq("a" -> 1L, "b" -> 1L))
    identityOk(Seq("x" -> 7L))
    identityOk(Seq("a" -> 1L, "b" -> 99L, "c" -> 900L))
    // realized shares: data-driven weights (per-lang token totals from
    // the corpus) land within 5 points of the true shares at 4000 slots
    val docs = Tables.documents(spark, dir)
    val ws = TextAnalysis.langId(docs)
      .groupBy(col("pred_lang"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val w = ws.map(_._2).sum
    val n = 4000L
    val counts = Sampling.aliasRealize(spark, ws, n)
      .groupBy(col("stratum")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ws.foreach { case (s, wi) =>
      val got = counts.getOrElse(s, 0L).toDouble / n
      val want = wi.toDouble / w
      assert(math.abs(got - want) < 0.05, s"$s: $got vs $want")
    }
  }
}
