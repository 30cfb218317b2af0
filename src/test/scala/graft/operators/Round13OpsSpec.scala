package graft.operators

import graft.SparkTestSession
import graft.sources.{IndexManifest, IndexManifestException, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 specs: the advice-hardening items — Spark-SQL string-literal
  * escaping (backslash, not ''), the stale-lineage readVersion guard
  * (the crash-window twin of clear-before-overwrite), and the spectral
  * DECIMAL(38,24) headroom guard.
  */
class Round13OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def chain(t: Throwable): String =
    if (t == null) "" else t.toString + "|" + chain(t.getCause)

  test("blocklistFilter: a quote-bearing block word matches its own token, not the concatenated mangle") {
    import spark.implicits._
    // under the broken '' escaping, 'don''t' parses as the Spark literal
    // "dont" — doc 1 would false-positive and doc 2 would be missed
    val docs = Seq(
      (1L, "we dont block this"),
      (2L, "but don't is blocked"),
      (3L, "clean row")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(docs, Seq("don't"))
      .orderBy(col("doc_id")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 0L)))
    // and a backslash-bearing word survives the double-escape round trip
    val out2 = TextAnalysis.blocklistFilter(docs, Seq("""back\slash"""))
      .agg(sum(col("n_hits"))).head().getLong(0)
    assert(out2 == 0L)
  }

  test("readVersion: a version file from a dead lineage is a named error, not a silently-wrong snapshot") {
    val path = tmp("graft-lineage-")
    // live manifest at watermark 100 ...
    IndexManifest.writeVersioned(path,
      IndexManifest.Manifest("zorder", Map("bits" -> 10L), 10L, 100L))
    // ... plus a stale version file claiming watermark 500 — the residue
    // of a pre-rebuild lineage whose clearVersions never ran (crash in
    // the overwrite window). readVersion must refuse to serve it.
    val v2 = IndexManifest.versions(path).last + 1
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    node.put("kind", "zorder")
    node.put("corpus_rows", 50L)
    node.put("corpus_max_id", 500L)
    node.putObject("params")
    Files.write(java.nio.file.Paths.get(path, s"MANIFEST.v$v2.json"),
      om.writeValueAsBytes(node))
    val e = intercept[IndexManifestException] { IndexManifest.readVersion(path, v2) }
    assert(e.getMessage.contains("not a prefix") &&
      e.getMessage.contains("stale lineage"), e.getMessage)
    // a wrong-kind version file is equally dead
    val node2 = om.createObjectNode()
    node2.put("kind", "srp")
    node2.put("corpus_rows", 5L)
    node2.put("corpus_max_id", 50L)
    node2.putObject("params")
    Files.write(java.nio.file.Paths.get(path, s"MANIFEST.v${v2 + 1}.json"),
      om.writeValueAsBytes(node2))
    val e2 = intercept[IndexManifestException] {
      IndexManifest.readVersion(path, v2 + 1)
    }
    assert(e2.getMessage.contains("not a prefix"), e2.getMessage)
    // the genuine prefix version still reads fine
    assert(IndexManifest.readVersion(path, 1).corpusMaxId == 100L)
  }

  test("shard-store time travel: snapshot read + packing == pre-append store, bit-stably; rebuild resets lineage") {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val hist = docs.filter(col("doc_id") <= cut)
    val path = tmp("graft-shtt-")
    Packing.saveTokenShards(hist, path, 4096L)
    Packing.appendTokenShards(docs.filter(col("doc_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    assert(IndexManifest.readVersion(path, 1).corpusMaxId == cut)
    // v1's n_tokens_total param pins where ITS frozen stream ends
    val histTokens = hist
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(IndexManifest.readVersion(path, 1).params("n_tokens_total") == histTokens)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // the snapshot read == a store that only ever saw the history half
    // (canonical column order — partitioned reads append the partition
    // column last, so compare on an explicit projection)
    val pHist = tmp("graft-shh-")
    Packing.saveTokenShards(hist, pHist, 4096L)
    val cols = Seq("doc_id", "n_tokens", "start_token", "text", "shard_id")
    val atV1 = rows(Packing.readShardStoreAt(spark, path, 1)
      .select(cols.map(col): _*))
    assert(atV1 == rows(
      spark.read.parquet(s"$pHist/shards").select(cols.map(col): _*)))
    assert(atV1.nonEmpty)
    // the PINNED packing consumer reproduces the pre-append windows
    // bit-stably — the dataloader-immutability contract through time
    val packedAt1 = rows(Packing.packShardStoreAt(spark, path, 1, 128))
    assert(packedAt1 == rows(Packing.packShardStore(spark, pHist, 128)))
    assert(packedAt1.nonEmpty)
    // the latest snapshot == the current read
    assert(rows(Packing.packShardStoreAt(spark, path, 2, 128)) ==
      rows(Packing.packShardStore(spark, path, 128)))
    // a missing version is a named error
    val e = intercept[IndexManifestException] {
      Packing.readShardStoreAt(spark, path, 9)
    }
    assert(e.getMessage.contains("no version 9"), e.getMessage)
    // a rebuild RESETS the lineage
    Packing.saveTokenShards(docs, path, 4096L)
    assert(IndexManifest.versions(path) == Seq(1))
  }

  test("lsh time travel: as-of probe == history-only index probe (cap at snapshot counts); rebuild resets") {
    val docs = Tables.documents(spark, dir)
    val history = docs.filter(col("doc_id") % 4 =!= 0)
    val inc = docs.filter(col("doc_id") % 4 === 0)
    val cut = history.agg(max(col("doc_id"))).head().getLong(0) / 2
    val path = tmp("graft-lshtt-")
    Dedup.saveLshIndex(history.filter(col("doc_id") <= cut), path, 16, 4)
    Dedup.appendLshIndex(history.filter(col("doc_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val pHist = tmp("graft-lshh-")
    Dedup.saveLshIndex(history.filter(col("doc_id") <= cut), pHist, 16, 4)
    val atV1 = rows(Dedup.lshDedupIndexed(inc, path, 0.5, 1000L,
      asOfVersion = Some(1)))
    assert(atV1 == rows(Dedup.lshDedupIndexed(inc, pHist, 0.5, 1000L)))
    assert(atV1.nonEmpty)
    // latest snapshot == current probe
    assert(rows(Dedup.lshDedupIndexed(inc, path, 0.5, 1000L,
      asOfVersion = Some(2))) ==
      rows(Dedup.lshDedupIndexed(inc, path, 0.5, 1000L)))
    // rebuild resets the lineage
    Dedup.saveLshIndex(history, path, 16, 4)
    assert(IndexManifest.versions(path) == Seq(1))
  }

  test("segment-log snapshot: read at W stable across compact+append; name-range pruning skips future segments") {
    import graft.sources.RedditLog
    val logDir = tmp("graft-r16log-")
    def seg(lo: Long, hi: Long): Unit = RedditLog.writeSegment(logDir,
      (lo to hi).map(i => Map[String, Any](
        "id" -> i, "event" -> (if (i % 3 == 0) "rs" else "rc"),
        "created_utc" -> (1000L + i), "author" -> s"user_$i",
        "subreddit" -> "click", "domain" -> null, "over_18" -> null,
        "is_self" -> null, "json" -> s"""{"k":$i}""")))
    seg(1, 100); seg(101, 200)
    val wm = RedditLog.maxId(logDir)
    assert(wm == 200L)
    val before = RedditLog.batchRead(spark, logDir, Some(wm))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(before == (1L to 200L))
    // grow + COMPACT: compaction preserves rows exactly, so membership
    // at or below any past watermark never changes — the contract that
    // makes the watermark a valid snapshot pin on this store
    seg(201, 300); seg(301, 400)
    RedditLog.compact(logDir, 1000L)
    val after = RedditLog.batchRead(spark, logDir, Some(wm))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)
    // name-range metadata pruning: a segment wholly above the snapshot
    // watermark is never opened (it doesn't even reach the file list)
    seg(401, 500)
    val snap = RedditLog.batchRead(spark, logDir, Some(wm))
    assert(snap.inputFiles.length < RedditLog.listSegments(logDir).size)
    // and the latest (unpinned) read sees the whole log
    assert(RedditLog.batchRead(spark, logDir).count() == 500L)
    // an empty snapshot (watermark below every segment) is schema-stable
    assert(RedditLog.batchRead(spark, logDir, Some(0L)).count() == 0L)
  }

  test("trained-quantizer IVF store: frozen trained book across appends; as-of serve == history-trained store") {
    import org.apache.spark.sql.DataFrame
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    val hist = emb.filter(col("vec_id") <= cut)
    val path = tmp("graft-ivft-")
    Similarity.saveIvfSq8Index(hist, path, 8, partitionByCell = true,
      trainIters = 2)
    assert(IndexManifest.read(path).params("train_iters") == 2L)
    Similarity.appendIvfSq8Index(emb.filter(col("vec_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val pred = col("vec_id") % 50 === 0
    // the trained book froze at build: the snapshot serve equals a
    // store that only ever saw (and trained on) the history half
    val pHist = tmp("graft-ivfth-")
    Similarity.saveIvfSq8Index(hist, pHist, 8, partitionByCell = true,
      trainIters = 2)
    val atV1 = rows(Similarity.ivfSq8TopKIndexed(emb, pred, path, 3, 4,
      pruneScan = true, asOfVersion = Some(1)))
    assert(atV1 == rows(Similarity.ivfSq8TopKIndexed(emb, pred, pHist, 3, 4,
      pruneScan = true)) && atV1.nonEmpty)
    // the seed-centroid sync policy must NOT silently adopt a trained
    // store: param drift -> rebuild (which retrains as seeds, the
    // caller's stated geometry)
    assert(Similarity.ivfSq8IndexSync(emb, path, 8,
      partitionByCell = true) == "rebuild")
    assert(IndexManifest.read(path).params("train_iters") == 0L)
  }

  test("spectral time travel: delta-merged as-of model == pre-append model AND latest == live; vacuum drops old versions") {
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    val hist = emb.filter(col("vec_id") <= cut)
    val path = tmp("graft-spectt-")
    Similarity.saveSpectralIndex(hist, path, 64, 3)
    Similarity.appendSpectralIndex(emb.filter(col("vec_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    def top(m: Similarity.SpectralModel) =
      Similarity.pcaTopComponentOf(m)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // as-of v1 == the model trained on the history half alone — the
    // delta merge reproduces the prefix stats EXACTLY (decimal sums)
    val atV1 = top(Similarity.loadSpectralIndexAt(spark, path, 1))
    val pHist = tmp("graft-specth-")
    Similarity.saveSpectralIndex(hist, pHist, 64, 3)
    assert(atV1 == top(Similarity.loadSpectralIndex(spark, pHist)))
    // as-of the LATEST version == the live merged model
    assert(top(Similarity.loadSpectralIndexAt(spark, path, 2)) ==
      top(Similarity.loadSpectralIndex(spark, path)))
    // a rebuild resets lineage AND deltas: old versions are gone, the
    // new v1 serves the rebuilt corpus
    Similarity.saveSpectralIndex(emb, path, 64, 3)
    assert(IndexManifest.versions(path) == Seq(1))
    assert(top(Similarity.loadSpectralIndexAt(spark, path, 1)) ==
      top(Similarity.loadSpectralIndex(spark, path)))
    // retention: DELTA COMPACTION folds everything <= upTo into one
    // base; kept as-of reads serve the same bits, dropped versions are
    // named errors, and re-running the sweep is idempotent
    val p3 = tmp("graft-specvac-")
    Similarity.saveSpectralIndex(hist, p3, 64, 3)
    val thirds = (cut + 1 to emb.agg(max(col("vec_id"))).head().getLong(0))
    val mid = cut + (thirds.length / 2)
    Similarity.appendSpectralIndex(
      emb.filter(col("vec_id") > cut && col("vec_id") <= mid), p3)
    Similarity.appendSpectralIndex(emb.filter(col("vec_id") > mid), p3)
    assert(IndexManifest.versions(p3) == Seq(1, 2, 3))
    val at2 = top(Similarity.loadSpectralIndexAt(spark, p3, 2))
    val at3 = top(Similarity.loadSpectralIndexAt(spark, p3, 3))
    Similarity.compactSpectralDeltas(spark, p3, 2)
    assert(IndexManifest.versions(p3) == Seq(2, 3))
    assert(top(Similarity.loadSpectralIndexAt(spark, p3, 2)) == at2)
    assert(top(Similarity.loadSpectralIndexAt(spark, p3, 3)) == at3)
    val e = intercept[IndexManifestException] {
      IndexManifest.readVersion(p3, 1)
    }
    assert(e.getMessage.contains("no version 1"), e.getMessage)
    // idempotent re-run (the interrupted-sweep recovery path)
    Similarity.compactSpectralDeltas(spark, p3, 2)
    assert(IndexManifest.versions(p3) == Seq(2, 3) &&
      top(Similarity.loadSpectralIndexAt(spark, p3, 3)) == at3)
    // vacuum WITHOUT compaction must fail the as-of read LOUDLY (the
    // coverage guard), never silently under-count
    val p5 = tmp("graft-specvac2-")
    Similarity.saveSpectralIndex(hist, p5, 64, 3)
    Similarity.appendSpectralIndex(emb.filter(col("vec_id") > cut), p5)
    assert(IndexManifest.vacuumVersions(p5, 1) == Seq(1))
    val e2 = intercept[IndexManifestException] {
      Similarity.loadSpectralIndexAt(spark, p5, 2)
    }
    assert(e2.getMessage.contains("no covering stats base"), e2.getMessage)
  }

  test("shard-store version diff: v1->v2 == the appended increment exactly; bad order is loud") {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val path = tmp("graft-shdiff-")
    Packing.saveTokenShards(docs.filter(col("doc_id") <= cut), path, 4096L)
    Packing.appendTokenShards(docs.filter(col("doc_id") > cut), path)
    val cols = Seq("doc_id", "n_tokens", "start_token", "shard_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val diff = rows(Packing.shardStoreDiff(spark, path, 1, 2))
    // the diff is exactly the store minus its v1 snapshot
    val all = rows(spark.read.parquet(s"$path/shards"))
    val v1 = rows(Packing.readShardStoreAt(spark, path, 1))
    assert(diff == all.diff(v1) && diff.nonEmpty)
    val e = intercept[IndexManifestException] {
      Packing.shardStoreDiff(spark, path, 2, 1)
    }
    assert(e.getMessage.contains("must precede"), e.getMessage)
  }

  test("phash time travel: as-of probe == history-only index probe; rebuild resets") {
    val media = Multimodal.mediaView(Tables.documents(spark, dir))
    val history = media.filter(col("doc_id") % 4 =!= 0)
    val inc = media.filter(col("doc_id") % 4 === 0)
    val cut = history.agg(max(col("doc_id"))).head().getLong(0) / 2
    val path = tmp("graft-phtt-")
    Multimodal.savePhashIndex(history.filter(col("doc_id") <= cut), path, 3)
    Multimodal.appendPhashIndex(history.filter(col("doc_id") > cut), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val pHist = tmp("graft-phh-")
    Multimodal.savePhashIndex(history.filter(col("doc_id") <= cut), pHist, 3)
    val atV1 = rows(Multimodal.mediaNearDupIndexed(inc, path,
      asOfVersion = Some(1)))
    assert(atV1 == rows(Multimodal.mediaNearDupIndexed(inc, pHist)))
    assert(atV1.nonEmpty)
    assert(rows(Multimodal.mediaNearDupIndexed(inc, path,
      asOfVersion = Some(2))) ==
      rows(Multimodal.mediaNearDupIndexed(inc, path)))
    Multimodal.savePhashIndex(history, path, 3)
    assert(IndexManifest.versions(path) == Seq(1))
  }

  test("spectral append: a crashed append (stats landed, manifest stale) is a named error; sync rebuilds") {
    val emb = Tables.embeddings(spark, dir)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val (cut1, cut2) = (maxId / 2, maxId * 3 / 4)
    val inc = emb.filter(col("vec_id") > cut1 && col("vec_id") <= cut2)
    val path = tmp("graft-specorph-")
    Similarity.saveSpectralIndex(emb.filter(col("vec_id") <= cut1), path, 64, 3)
    val stale = IndexManifest.read(path)
    // simulate the crash window: stats committed, manifest flip lost
    Similarity.appendSpectralIndex(inc, path)
    IndexManifest.write(path, stale)
    // a retried append passes the id-monotone guard against the STALE
    // watermark — the silent double-merge path — and must fail loudly
    // on the nrow witness instead (stats rows carry no ids, so the
    // shared orphan guard cannot see this)
    val e = intercept[IndexManifestException] {
      Similarity.appendSpectralIndex(inc, path)
    }
    assert(e.getMessage.contains("crashed between the stats write"),
      e.getMessage)
    // sync recovers by rebuild, and the rebuilt model equals the
    // direct full-corpus chain
    assert(Similarity.spectralIndexSync(emb, path, 64, 3) == "rebuild")
    val rebuilt = Similarity.pcaTopComponentOf(
      Similarity.loadSpectralIndex(spark, path))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = Similarity.pcaTopComponent(emb, 64, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rebuilt == direct)
  }

  test("bm25 append: appended index == rebuild bit-for-bit; as-of v1 == history ranking; crashed append loud") {
    val docs = Tables.documents(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val (cut1, cut2) = (maxId / 2, maxId * 3 / 4)
    val hist = docs.filter(col("doc_id") <= cut1)
    val terms = Seq("table", "query", "spark")
    val path = tmp("graft-bm25a-")
    TextAnalysis.saveBm25Index(hist, path)
    TextAnalysis.appendBm25Index(docs.filter(col("doc_id") > cut1), path)
    assert(IndexManifest.versions(path) == Seq(1, 2))
    def scores(p: String, asOf: Option[Int] = None) =
      TextAnalysis.bm25Indexed(spark, p, terms, asOfVersion = asOf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // appended == full rebuild, score for score (exact integer merges
    // feed the same double expression)
    val pFull = tmp("graft-bm25f-")
    TextAnalysis.saveBm25Index(docs, pFull)
    assert(scores(path) == scores(pFull))
    // as-of v1 == the ranking a history-only index served (constants
    // included — idf/avgdl are version-pinned, not today's)
    val pHist = tmp("graft-bm25h-")
    TextAnalysis.saveBm25Index(hist, pHist)
    assert(scores(path, Some(1)) == scores(pHist))
    // sync actions + bucketed-layout append keeps its pruned layout
    val pb = tmp("graft-bm25b-")
    TextAnalysis.saveBm25Index(hist, pb, termBuckets = 16)
    assert(TextAnalysis.bm25IndexSync(docs, pb, 16) == "append")
    assert(TextAnalysis.bm25IndexSync(docs, pb, 16) == "fresh")
    assert(scores(pb) == scores(pFull))
    // crashed append (postings landed, manifest stale): the retry is a
    // named orphan error and sync recovers by rebuild
    val pc = tmp("graft-bm25c-")
    TextAnalysis.saveBm25Index(hist, pc)
    val stale = IndexManifest.read(pc)
    val inc = docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2)
    TextAnalysis.appendBm25Index(inc, pc)
    IndexManifest.write(pc, stale)
    val e = intercept[IndexManifestException] {
      TextAnalysis.appendBm25Index(inc, pc)
    }
    assert(e.getMessage.contains("above its manifest watermark"), e.getMessage)
    assert(TextAnalysis.bm25IndexSync(docs, pc) == "rebuild")
    assert(scores(pc) == scores(pFull))
  }

  test("spectral normalization: an iterate past the DECIMAL(38,24) headroom fails loudly and NAMED") {
    import spark.implicits._
    // the dangerous window is max|v| in (1e6, ~1e7): each v·v product
    // still fits DECIMAL(38,24)'s 14 integer digits, so under non-ANSI
    // configs the SUM quietly overflows to NULL and λ/‖v‖ decay to NaN
    // (and under ANSI the error is a cryptic cast failure deep in the
    // agg) — the guard turns both into one actionable named error.
    // Build the model directly in that window: tiny covariance, iterate
    // entries ~2e6.
    val cov = (for (i <- 0 until 4; j <- 0 until 4)
      yield (i, j, if (i == j) 1e-3 else 0.0)).toDF("i", "j", "c")
    val iter = (0 until 4).map(j => (j, 2e6 + j)).toDF("j", "v")
    val m = Similarity.SpectralModel(4, 1, Array.fill(4)(0.0), cov, iter)
    val e = intercept[Exception] {
      Similarity.pcaSecondComponentOf(m).collect()
    }
    assert(chain(e).contains("DECIMAL(38,24) quantization headroom"), chain(e))
    val e2 = intercept[Exception] { Similarity.pcaSpectrum(m).collect() }
    assert(chain(e2).contains("DECIMAL(38,24) quantization headroom"), chain(e2))
    // and a sane corpus still passes through the guard untouched
    val ok = Tables.embeddings(spark, dir)
    val mok = Similarity.trainSpectral(ok, 64, 3)
    assert(Similarity.pcaSecondComponentOf(mok).count() == 64L)
  }
}
