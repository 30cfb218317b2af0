package graft.operators

import graft.SparkTestSession
import graft.sources.{IndexManifest, IndexManifestException, StaleIndexException, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-9 changes, headlined by index manifests (round-8
  * verdict item #3): every persisted index (gram d44, IVF+SQ8 e31,
  * IVF-PQ e32) records its build params and a corpus watermark, and
  * loaders verify instead of trusting the caller — a params mismatch or
  * a missing manifest is a NAMED error, and corpus drift since the
  * build is detectable before serving stale neighbors.
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---- index manifests: params gate ----

  test("manifest: an unmanifested directory fails loudly, not with a downstream symptom") {
    val path = tmp("graft-noman-")
    val e = intercept[IndexManifestException] {
      Similarity.ivfSq8TopKIndexed(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, path, 3, 4)
    }
    assert(e.getMessage.contains("MANIFEST.json"))
  }

  test("manifest: loading an index as the wrong KIND is a named error") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("graft-kind-")
    Dedup.saveGramIndex(docs, path, minLen = 8)
    val e = intercept[IndexManifestException] {
      Similarity.ivfSq8TopKIndexed(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, path, 3, 4)
    }
    assert(e.getMessage.contains("gram") && e.getMessage.contains("ivf-sq8"))
  }

  test("manifest: gram index probed at a different minLen than built is rejected") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("graft-minlen-")
    Dedup.saveGramIndex(docs.filter(col("doc_id") % 4 =!= 0), path, minLen = 8)
    val e = intercept[IndexManifestException] {
      Dedup.exactSubstrIncrementalIndexed(
        docs.filter(col("doc_id") % 4 === 0), path, minLen = 5)
    }
    assert(e.getMessage.contains("min_len"))
    // the matching minLen still loads and runs
    assert(Dedup.exactSubstrIncrementalIndexed(
      docs.filter(col("doc_id") % 4 === 0), path, minLen = 8).count() > 0)
  }

  test("manifest: probing more cells than the index was built with is rejected") {
    val emb = Tables.embeddings(spark, dir)
    val path = tmp("graft-probes-")
    Similarity.saveIvfSq8Index(emb, path, nCells = 4)
    val e = intercept[IndexManifestException] {
      Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
        path, 3, probes = 8)
    }
    assert(e.getMessage.contains("probes=8") && e.getMessage.contains("4 cells"))
    // a legal probe count on the same index serves fine
    assert(Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
      path, 3, probes = 4).count() > 0)
  }

  // ---- incremental index append (e33) ----

  test("appendIvfSq8Index: history code files untouched, increment lands, watermark advances") {
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
    val history = emb.filter(col("vec_id") <= cut)
    val increment = emb.filter(col("vec_id") > cut)
    val path = tmp("graft-append-")
    Similarity.saveIvfSq8Index(history, path, nCells = 8, partitionByCell = true)

    def codeFiles(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(path, "codes")
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.size(p)).toMap
    }
    val before = codeFiles()
    Similarity.appendIvfSq8Index(increment, path)
    val after = codeFiles()
    // history's code files are bit-untouched (same set, same sizes) —
    // the no-recompute claim at the file level — and the increment
    // added new files inside the existing cell layout
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "a history code file was rewritten by the append")
    assert(after.size > before.size, "no new code files appended")
    // the watermark moved WITH the corpus: fresh vs full, stale vs history
    assert(IndexManifest.isFresh(path, emb, "vec_id"))
    assert(!IndexManifest.isFresh(path, history, "vec_id"))
    // served results now cover increment members as neighbors
    val served = Similarity.ivfSq8TopKIndexed(emb, col("vec_id") % 50 === 0,
      path, 3, 4, pruneScan = true)
      .as[(Long, Long, Long, Double)].collect()
    assert(served.nonEmpty)
    assert(served.exists(_._3 > cut),
      "no increment vector ever surfaces as a neighbor — append invisible")
  }

  test("appendIvfSq8Index: an overlapping (non-monotone) increment is a named error") {
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
    val path = tmp("graft-appovl-")
    Similarity.saveIvfSq8Index(emb.filter(col("vec_id") <= cut), path, nCells = 8)
    val e = intercept[IndexManifestException] {
      Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cut / 2), path)
    }
    assert(e.getMessage.contains("id-monotone"))
  }

  test("appendIvfSq8Index: one-shot and chunked appends serve identical results") {
    val emb = Tables.embeddings(spark, dir)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val (cutA, cutB) = (maxId / 2, maxId * 3 / 4)
    val history = emb.filter(col("vec_id") <= cutA)
    val pred = col("vec_id") % 50 === 0
    val p1 = tmp("graft-app1-")
    Similarity.saveIvfSq8Index(history, p1, nCells = 8)
    Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cutA), p1)
    val p2 = tmp("graft-app2-")
    Similarity.saveIvfSq8Index(history, p2, nCells = 8)
    Similarity.appendIvfSq8Index(
      emb.filter(col("vec_id") > cutA && col("vec_id") <= cutB), p2)
    Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cutB), p2)
    val r1 = Similarity.ivfSq8TopKIndexed(emb, pred, p1, 3, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val r2 = Similarity.ivfSq8TopKIndexed(emb, pred, p2, 3, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(r1.nonEmpty && r1 == r2)
  }

  // ---- index sync policy (e34) ----

  test("ivfSq8IndexSync: fresh=no-op, monotone growth=append, drift=rebuild") {
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
    val history = emb.filter(col("vec_id") <= cut)
    val path = tmp("graft-sync-")
    // no manifest yet → rebuild
    assert(Similarity.ivfSq8IndexSync(history, path, nCells = 8) == "rebuild")
    def codeFiles(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(path, "codes")).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.size(p)).toMap
    }
    val built = codeFiles()
    // same corpus again → fresh, nothing touched
    assert(Similarity.ivfSq8IndexSync(history, path, nCells = 8) == "fresh")
    assert(codeFiles() == built)
    // monotone growth → append: history files stay, new files land
    assert(Similarity.ivfSq8IndexSync(emb, path, nCells = 8) == "append")
    val appended = codeFiles()
    assert(built.forall { case (f, sz) => appended.get(f).contains(sz) })
    assert(appended.size > built.size)
    // …and the sync result is indistinguishable from a manual append
    val manual = tmp("graft-syncm-")
    Similarity.saveIvfSq8Index(history, manual, nCells = 8)
    Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cut), manual)
    val pred = col("vec_id") % 50 === 0
    val viaSync = Similarity.ivfSq8TopKIndexed(emb, pred, path, 3, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaManual = Similarity.ivfSq8TopKIndexed(emb, pred, manual, 3, 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaSync.nonEmpty && viaSync == viaManual)
    // a SHRUNK corpus is not monotone growth → full rebuild
    assert(Similarity.ivfSq8IndexSync(history, path, nCells = 8) == "rebuild")
    // params drift (different cell count) → rebuild, not a poisoned serve
    assert(Similarity.ivfSq8IndexSync(history, path, nCells = 4) == "rebuild")
  }

  // ---- persisted curation verdict (d19 artifact) ----

  private val RATES = Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.125)

  test("keepListCached: artifact round trip is bit-identical to the direct chain") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("graft-keep-")
    val direct = Curation.keepList(docs, col("doc_id") % 10 === 0,
      RATES, 1.0, 8, 4, 0.5, 1000L, 10000L)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    val cached = Curation.keepListCached(docs, col("doc_id") % 10 === 0,
      RATES, 1.0, 8, 4, 0.5, 1000L, 10000L, path)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(direct.nonEmpty && cached == direct)
  }

  test("keepListCached: a warm hit scans the artifact without rebuilding; drift rebuilds") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("graft-keepc-")
    Curation.keepListCached(docs, col("doc_id") % 10 === 0,
      RATES, 1.0, 8, 4, 0.5, 1000L, 10000L, path).count()
    def verdictFiles(): Map[String, java.nio.file.attribute.FileTime] = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(path, "verdict")).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    }
    val before = verdictFiles()
    // same params + same corpus → artifact served as-is
    Curation.keepListCached(docs, col("doc_id") % 10 === 0,
      RATES, 1.0, 8, 4, 0.5, 1000L, 10000L, path).count()
    assert(verdictFiles() == before, "warm hit rewrote the artifact")
    // a gate-params change MUST miss (a differently-gated verdict is a
    // different artifact, not a cache hit)
    val n1 = Curation.keepListCached(docs, col("doc_id") % 10 === 0,
      RATES, 1.0, 8, 4, 0.5, 1000L, 10000L, path, minTokens = 9999).count()
    assert(verdictFiles() != before, "params drift served the stale artifact")
    assert(n1 > 0)
    // corpus drift MUST miss too (watermark mismatch)
    val shrunk = docs.filter(col("doc_id") % 7 =!= 0)
    val direct = Curation.keepList(shrunk, col("doc_id") % 10 === 0,
      RATES, 1.0, 8, 4, 0.5, 1000L, 10000L)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    val rebuilt = Curation.keepListCached(shrunk, col("doc_id") % 10 === 0,
      RATES, 1.0, 8, 4, 0.5, 1000L, 10000L, path)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(rebuilt == direct, "corpus drift served the stale artifact")
  }

  // ---- index manifests: staleness gate ----

  test("manifest: corpus drift since the build is detectable and loud") {
    val emb = Tables.embeddings(spark, dir)
    val history = emb.filter(col("vec_id") % 5 =!= 0)
    val path = tmp("graft-stale-")
    Similarity.saveIvfSq8Index(history, path, nCells = 8)
    // the corpus the index was built on is fresh
    assert(IndexManifest.isFresh(path, history, "vec_id"))
    IndexManifest.requireFresh(path, history, "vec_id")
    // the grown corpus is not — requireFresh names both watermarks
    assert(!IndexManifest.isFresh(path, emb, "vec_id"))
    val e = intercept[StaleIndexException] {
      IndexManifest.requireFresh(path, emb, "vec_id")
    }
    assert(e.getMessage.contains("rebuild or append"))
  }

  // ---- bigram LM (d45/d46) ----

  test("bigramLm: n_bigrams = n_tokens - 1, and identical docs score identically") {
    val docs = Tables.documents(spark, dir)
    val lm = TextAnalysis.bigramLm(docs)
    val nTok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val bad = lm.join(nTok, "doc_id")
      .filter(col("n_bigrams") =!= col("n") - 1).count()
    assert(bad == 0)
    // clones of the same text inside one corpus must tie to the digit:
    // scoring is a pure function of the token sequence given the model
    val twice = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 100000, col("text")))
    val perText = TextAnalysis.bigramLm(twice)
      .withColumn("orig", when(col("doc_id") >= 100000, col("doc_id") - 100000)
        .otherwise(col("doc_id")))
      .groupBy(col("orig"))
      .agg(countDistinct(col("avg_nll")).as("nv"))
      .filter(col("nv") =!= 1).count()
    assert(perText == 0)
  }

  test("perplexityTiers: rnk is a permutation ordered by avg_nll and tiers are terciles") {
    val t = TextAnalysis.perplexityTiers(Tables.documents(spark, dir))
    val n = t.count()
    assert(t.select(countDistinct(col("rnk"))).head().getLong(0) == n)
    assert(t.agg(min(col("rnk")), max(col("rnk"))).head() ===
      org.apache.spark.sql.Row(1L, n))
    // rank order agrees with score order (ties broken by doc_id)
    val rows = t.select(col("rnk"), col("avg_nll"), col("doc_id"))
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(rows.sliding(2).forall {
      case Array((_, a, ida), (_, b, idb)) => a < b || (a == b && ida < idb)
      case _ => true })
    val byTier = t.groupBy(col("tier")).count().as[(String, Long)].collect().toMap
    assert(Seq("head", "middle", "tail").forall(k =>
      math.abs(byTier(k) - n / 3.0) <= 1))
    // head really is the low-nll end
    val headMax = t.filter(col("tier") === "head").agg(max(col("avg_nll"))).head().getDouble(0)
    val tailMin = t.filter(col("tier") === "tail").agg(min(col("avg_nll"))).head().getDouble(0)
    assert(headMax <= tailMin)
  }

  test("persisted bigram LM: manifest-gated, and all three backoff tiers fire cross-domain") {
    val docs = Tables.documents(spark, dir)
    val ref = docs.filter(col("lang") === "en")
    val path = tmp("graft-lm-")
    TextAnalysis.saveBigramLm(ref, path)
    // manifest: right kind recorded, wrong-kind load is a named error
    assert(IndexManifest.read(path).kind == "bigram-lm")
    val e = intercept[IndexManifestException] {
      Similarity.ivfSq8TopKIndexed(Tables.embeddings(spark, dir),
        col("vec_id") % 50 === 0, path, 3, 4)
    }
    assert(e.getMessage.contains("bigram-lm"))
    // scoring the reference slice itself touches only the seen tier;
    // the cross-domain corpus must exercise all three
    val model = spark.read.parquet(s"$path/model")
    val ctx = spark.read.parquet(s"$path/ctx")
    val grams = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(w)), i -> struct(element_at(w, i - 1) AS prev, element_at(w, i) AS cur))")).as("b"))
      .select(col("b.prev").as("prev"), col("b.cur").as("cur"))
    val tiers = grams
      .join(model.withColumn("seen", lit(1)), Seq("prev", "cur"), "left_outer")
      .join(ctx.withColumn("known_ctx", lit(1)), Seq("prev"), "left_outer")
      .agg(sum(col("seen")).as("seen"),
        sum(when(col("seen").isNull && col("known_ctx") === 1, 1)).as("unseen_ctx")).head()
    assert(tiers.getLong(0) > 0 && tiers.getLong(1) > 0)
    // tier 3 (unknown context) never fires naturally — the languages
    // share a vocabulary — so drive it with constructed unknown tokens:
    // a doc of only-OOV grams must score exactly the persisted oov_nll
    val oovNll = spark.read.parquet(s"$path/consts").head().getDecimal(1)
    val oovDoc = Seq((900001L, "zzqa zzqb zzqc zzqd")).toDF("doc_id", "text")
    val oovScore = TextAnalysis.bigramLmScoreIndexed(oovDoc, path).head()
    assert(oovScore.getLong(1) == 3L)
    // exact decimal sum of three oov terms, then the one double divide
    assert(oovScore.getDouble(2) ==
      oovNll.multiply(new java.math.BigDecimal(3)).doubleValue() / 3)
    // every scored doc is finite and positive (nll of probabilities < 1)
    val scored = TextAnalysis.bigramLmScoreIndexed(docs, path)
    assert(scored.count() == docs.filter(size(split(col("text"), " ")) >= 2).count())
    assert(scored.filter(col("avg_nll") <= 0 || col("avg_nll").isNull).count() == 0)
    // cross-domain discrimination: the reference language scores lower
    // (more model-like) on average than the rest of the corpus
    val byLang = scored.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en").agg(avg(col("avg_nll")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) < byLang(false))
  }

  test("SRP: recall is nondecreasing in output dims — the JL ladder points the right way") {
    val emb = Tables.embeddings(spark, dir)
    val rs = Seq(4, 16, 32).map { od =>
      Similarity.annRecallSrp(emb, col("vec_id") % 50 === 0, 3, od)
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    assert(rs == rs.sorted, s"recall ladder must be nondecreasing: $rs")
    assert(rs.last > 0.0, s"32 dims must recover something: $rs")
  }

  test("SRP re-rank dominance: e38 >= e36 pointwise (exact ordering cannot lose shortlist members)") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val raw = Similarity.annRecallSrp(emb, pred, 3, 16)
      .select(col("query_id"), col("n_hit")).as[(Long, Long)].collect().toMap
    val rr = Similarity.annRecallSrpReranked(emb, pred, 3, 12, 16)
      .select(col("query_id"), col("n_hit")).as[(Long, Long)].collect().toMap
    assert(raw.keySet == rr.keySet && raw.nonEmpty)
    raw.foreach { case (q, h) => assert(rr(q) >= h, s"query $q: ${rr(q)} < $h") }
    // and the lift is real on this corpus, not vacuous
    assert(rr.values.sum > raw.values.sum,
      s"re-rank must buy recall here: ${rr.values.sum} vs ${raw.values.sum}")
  }

  // ---- packing (d47/d48) ----

  test("tokenOffsets: exact prefix sums of the hash60 order, invariant to bucketBits") {
    val docs = Tables.documents(spark, dir)
    val got = Packing.tokenOffsets(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // recompute the prefix sum sequentially on the driver (test scale)
    val ordered = docs.select(col("doc_id"),
        Dedup.hash60(col("doc_id").cast("string")).as("k"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._1))
    var cum = 0L
    ordered.foreach { case (id, _, n) =>
      assert(got(id) == ((n, cum)), s"doc $id")
      cum += n
    }
    // the bucketed device is pure plumbing: coarser/finer grids agree
    val alt = Packing.tokenOffsets(docs, bucketBits = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(alt == got)
  }

  test("tokenShards: doc-contiguous budget fill — shards overrun by at most one doc tail") {
    val budget = 2048L
    val s = Packing.tokenShards(Tables.documents(spark, dir), budget)
    val perShard = s.groupBy(col("shard_id"))
      .agg(sum(col("n_tokens")).as("tok"), max(col("n_tokens")).as("mx"),
        min(col("start_token")).as("lo"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val nShards = perShard.length
    assert(nShards > 1)
    perShard.foreach { case (sid, tok, mx, lo) =>
      assert(lo >= sid * budget && lo < (sid + 1) * budget)
      // every shard but the last covers its budget window before
      // spilling at most one doc's tail past it
      if (sid < nShards - 1) assert(tok >= (sid + 1) * budget - lo && tok < budget + mx)
    }
  }

  test("shard store: single-shard reads prune at the file-index layer and round-trip exactly") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("graft-shards-")
    Packing.saveTokenShards(docs, path, budget = 2048L)
    assert(IndexManifest.read(path).params("budget") == 2048L)
    val one = Packing.readShard(spark, path, 0L)
    one.count()
    val p = one.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*shard_id#\\d+[^\\]]*0".r.findFirstIn(p).isDefined,
      "shard_id literal must land in PartitionFilters\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    // the store's shard-0 rows are exactly the direct assignment's
    val direct = Packing.tokenShards(docs, 2048L).filter(col("shard_id") === 0)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("start_token"), col("text"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val got = one.select(col("doc_id"), col("n_tokens"), col("start_token"), col("text"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got.nonEmpty && got == direct)
    // a grown corpus is caught by the freshness gate before stale reads
    val grown = docs.union(docs.select(col("doc_id") + 500000,
      col("text"), col("lang"), col("source"), col("n_chars")))
    intercept[StaleIndexException] {
      IndexManifest.requireFresh(path, grown, "doc_id")
    }
  }

  test("packSequences: windows tile exactly — full ctx windows sum to ctxLen, docs to n_tokens") {
    val ctx = 64
    val docs = Tables.documents(spark, dir)
    val p = Packing.packSequences(docs, ctx)
    val total = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val lastCtx = (total - 1) / ctx
    val perCtx = p.groupBy(col("ctx_id")).agg(sum(col("len")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(perCtx.size == lastCtx + 1)
    perCtx.foreach { case (cid, s) =>
      assert(if (cid < lastCtx) s == ctx else s == total - lastCtx * ctx, s"ctx $cid") }
    // per-doc spans are contiguous and cover the doc exactly
    val byDoc = p.select(col("doc_id"), col("doc_offset"), col("len"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val nTok = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    byDoc.foreach { case (id, spans) =>
      val sorted = spans.sortBy(_._2)
      assert(sorted.head._2 == 0L && sorted.map(_._3).sum == nTok(id), s"doc $id")
      assert(sorted.sliding(2).forall {
        case Array((_, o1, l1), (_, o2, _)) => o2 == o1 + l1; case _ => true }, s"doc $id")
    }
  }
}
