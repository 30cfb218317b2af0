package graft.operators

import graft.SparkTestSession
import graft.sources.{IndexManifest, IndexManifestException, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 specs, headlined by the shard-store incremental append
  * (d51): [[Packing.appendTokenShards]] applies the e33 frozen-book
  * pattern to the training-shard layout — existing shard FILES are
  * never rewritten, the increment lands after the frozen token stream,
  * and the manifest watermark advances to the grown corpus.
  */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private val BUDGET = 4096L

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def shardFiles(path: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(path, "shards")).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.size(p)).toMap
  }

  test("appendTokenShards: history shard files untouched, increment placed after the frozen stream, watermark advances") {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val history = docs.filter(col("doc_id") <= cut)
    val increment = docs.filter(col("doc_id") > cut)
    val path = tmp("graft-shapp-")
    Packing.saveTokenShards(history, path, BUDGET)
    val base = IndexManifest.require(path, "shards").params("n_tokens_total")
    assert(base > 0L)
    // the frozen assignment, captured before the append
    val beforeAsg = spark.read.parquet(s"$path/shards")
      .select(col("doc_id"), col("start_token")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val beforeFiles = shardFiles(path)

    Packing.appendTokenShards(increment, path)

    // file-level no-recompute: every pre-append file survives with its
    // exact size; growth is NEW files only
    val afterFiles = shardFiles(path)
    assert(beforeFiles.forall { case (f, sz) => afterFiles.get(f).contains(sz) },
      "a history shard file was rewritten by the append")
    assert(afterFiles.size > beforeFiles.size, "no new shard files appended")

    val store = spark.read.parquet(s"$path/shards")
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        col("shard_id").cast("long").as("shard_id")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // history start_tokens are bit-frozen; increment docs all land at or
    // after the frozen stream's end, contiguously (total span = sum)
    beforeAsg.foreach { case (id, st) => assert(store(id)._2 == st,
      s"history doc $id moved: $st -> ${store(id)._2}") }
    val incrIds = increment.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(incrIds.nonEmpty && incrIds.forall(id => store(id)._2 >= base))
    assert(store.keySet == beforeAsg.keySet ++ incrIds)
    // shard_id stays derived from the global position everywhere
    store.foreach { case (id, (_, st, sh)) => assert(sh == st / BUDGET,
      s"doc $id shard $sh != start_token $st DIV $BUDGET") }
    // the packing invariant survives the append: starts tile exactly
    val spans = store.values.map { case (n, st, _) => (st, n) }.toSeq.sortBy(_._1)
    spans.foldLeft(0L) { case (expectSt, (st, n)) =>
      assert(st == expectSt, s"token stream has a gap/overlap at $st (expected $expectSt)")
      st + n
    }
    // manifest: fresh vs the grown corpus, stale vs history; token total
    // advanced by exactly the increment's tokens
    assert(IndexManifest.isFresh(path, docs, "doc_id"))
    assert(!IndexManifest.isFresh(path, history, "doc_id"))
    val m = IndexManifest.require(path, "shards")
    assert(m.params("n_tokens_total") == spans.map(_._2).sum)
  }

  test("appendTokenShards: a non-monotone (overlapping) increment is a named error") {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val path = tmp("graft-shovl-")
    Packing.saveTokenShards(docs.filter(col("doc_id") <= cut), path, BUDGET)
    val e = intercept[IndexManifestException] {
      Packing.appendTokenShards(docs.filter(col("doc_id") > cut / 2), path)
    }
    assert(e.getMessage.contains("id-monotone"))
  }

  test("appendTokenShards: wrong index kind is a named error; empty increment is a no-op") {
    val docs = Tables.documents(spark, dir)
    val gramPath = tmp("graft-shkind-")
    Dedup.saveGramIndex(docs, gramPath, minLen = 8)
    val e = intercept[IndexManifestException] {
      Packing.appendTokenShards(docs, gramPath)
    }
    assert(e.getMessage.contains("shards"))

    val path = tmp("graft-shempty-")
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    Packing.saveTokenShards(docs.filter(col("doc_id") <= cut), path, BUDGET)
    val before = shardFiles(path)
    val mBefore = IndexManifest.read(path)
    Packing.appendTokenShards(docs.filter(col("doc_id") > cut * 100), path)
    assert(shardFiles(path) == before && IndexManifest.read(path) == mBefore,
      "an empty increment perturbed the store")
  }

  test("srpBucketTopK: equals a brute-force share-a-block reference; hamming<=radius pairs are never lost") {
    val emb = Tables.embeddings(spark, dir)
    val (outDims, radius, k) = (16, 3, 3)
    val nBlocks = radius + 1
    val bs = outDims / nBlocks
    val mask = (1L << bs) - 1
    // brute-force reference from the driver: project with the SAME
    // derandomized matrix, sign-bit signature, candidates = pairs
    // sharing >= 1 block, rank by reduced-space L2
    val signs = Similarity.srpSignMatrix(outDims, 64)
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble)
        val p = signs.map(row => row.zipWithIndex.foldLeft(0.0) {
          case (acc, (s, i)) => if (s > 0) acc + e(i) else acc - e(i)
        })
        val sig = p.zipWithIndex.map { case (x, i) =>
          if (x >= 0.0) 1L << i else 0L }.sum
        (r.getLong(0), p, sig)
      }
    def blocks(sig: Long): Seq[Long] =
      (0 until nBlocks).map(j => (sig >> (j * bs)) & mask)
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val queries = rows.filter(_._1 % 50 == 0)
    val expected = queries.flatMap { case (qid, qp, qsig) =>
      val cands = rows.filter { case (nid, _, nsig) =>
        nid != qid && blocks(nsig).zip(blocks(qsig)).exists(p => p._1 == p._2)
      }
      // pigeonhole: every hamming<=radius signature must be a candidate
      rows.foreach { case (nid, _, nsig) =>
        if (nid != qid && hamming(nsig, qsig) <= radius)
          assert(cands.exists(_._1 == nid),
            s"neighbor $nid at hamming ${hamming(nsig, qsig)} <= $radius not a candidate of $qid")
      }
      cands.map { case (nid, np, _) =>
        val d = qp.zip(np).foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }
        (qid, nid, d)
      }.sortBy(t => (t._3, t._2)).take(k).zipWithIndex
        .map { case ((q, n, d), i) => (q, (i + 1).toLong, n, d) }
    }.toSet
    val got = Similarity.srpBucketTopK(emb, col("vec_id") % 50 === 0, k, outDims, radius)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("srpBucketTopK: the serve plan is the block equi-join, not a nested-loop scan") {
    val emb = Tables.embeddings(spark, dir)
    val plan = Similarity.srpBucketTopK(emb, col("vec_id") % 50 === 0, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed SRP fell back to a per-query corpus scan:\n$plan")
    assert(plan.contains("bpos") && plan.contains("bval"),
      "the join is not keyed on the Hamming blocks")
    // contrast: the flat e35 rung IS the nested-loop scan by design
    val flat = Similarity.srpTopK(emb, col("vec_id") % 50 === 0, 3)
      .queryExecution.executedPlan.toString
    assert(flat.contains("BroadcastNestedLoopJoin"))
  }

  test("srp index: persisted serve is bit-identical to the in-memory chain; probed blocks prune the scan") {
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val path = tmp("graft-srpidx-")
    Similarity.saveSrpIndex(emb, path)
    val fromIndex = Similarity.srpBucketTopKIndexed(emb, pred, path, 3, pruneScan = true)
    val inMemory = Similarity.srpBucketTopK(emb, pred, 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(fromIndex) == rows(inMemory) && rows(fromIndex).nonEmpty)
    // the probed-block literals land in the scan's PartitionFilters —
    // file-index-layer pruning, the e31 device in two dimensions
    val scan = fromIndex.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("bpos") &&
      scan.contains("bval"), s"probed blocks not in PartitionFilters:\n$scan")
  }

  test("srp index: append equals a fresh rebuild bit-for-bit; history files untouched") {
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
    val pred = col("vec_id") % 50 === 0
    val appended = tmp("graft-srpapp-")
    Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), appended)
    def blockFiles(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(appended, "blocks")).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.size(p)).toMap
    }
    val before = blockFiles()
    Similarity.appendSrpIndex(emb.filter(col("vec_id") > cut), appended)
    val after = blockFiles()
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "a history block file was rewritten by the append")
    assert(after.size > before.size, "no new block files appended")
    assert(IndexManifest.isFresh(appended, emb, "vec_id"))
    // the SRP codebook is parameter-derived, so appended == rebuilt
    // EXACTLY (stronger than IVF's frozen-book consistency)
    val rebuilt = tmp("graft-srpreb-")
    Similarity.saveSrpIndex(emb, rebuilt)
    def serve(p: String) = Similarity.srpBucketTopKIndexed(emb, pred, p, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(serve(appended) == serve(rebuilt) && serve(appended).nonEmpty)
  }

  test("dsirWeights: the importance contrast points at the target domain") {
    val docs = Tables.documents(spark, dir)
    val w = TextAnalysis.dsirWeights(docs, col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val byLang = w.groupBy(col("lang") === "en")
      .agg(avg(col("weight")).as("mw"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // the log-ratio must rank target-domain docs above the rest — the
    // method's whole point (Xie et al.: importance weights select for
    // the target distribution)
    assert(byLang(true)._1 > byLang(false)._1,
      s"en mean weight ${byLang(true)._1} not above non-en ${byLang(false)._1}")
    assert(byLang(true)._2 > 0 && byLang(false)._2 > 0)
    // keep agrees with the sign of the exact-decimal contrast
    val bad = w.filter((col("weight") >= 0.0) =!= col("keep")).count()
    assert(bad == 0, s"$bad docs have keep disagreeing with weight sign")
  }

  test("dsirSelect: exactly the top third by weight, rank cut deterministic") {
    val docs = Tables.documents(spark, dir)
    val rows = TextAnalysis.dsirSelect(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    val n = rows.length
    assert(n > 0)
    // ranks are a permutation of 1..n (the distributed device composes
    // to a total order)
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq)
    // the selection is exactly the rank cut, size ceil(n/3)
    val sel = rows.filter(_._4)
    assert(sel.length == (n + 2) / 3)
    assert(sel.map(_._3).max <= rows.filterNot(_._4).map(_._3).min)
    // rank order agrees with (weight desc, doc_id asc)
    val byRank = rows.sortBy(_._3)
    byRank.sliding(2).foreach {
      case Array((id1, w1, _, _), (id2, w2, _, _)) =>
        assert(w1 > w2 || (w1 == w2 && id1 < id2),
          s"rank order violates (weight desc, doc_id): ($id1,$w1) before ($id2,$w2)")
      case _ => ()
    }
  }

  test("srpRadiusCurve: nested blocks make recall nondecreasing in radius") {
    val emb = Tables.embeddings(spark, dir)
    val rows = Similarity.srpRadiusCurve(emb, col("vec_id") % 50 === 0, 3)
      .orderBy(col("radius")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 7L, 15L))
    // block alignment: an r-level match implies matches at every deeper
    // level, so candidate sets nest and hits cannot drop
    rows.sliding(2).foreach {
      case Array((r1, h1, _), (r2, h2, _)) =>
        assert(h2 >= h1, s"recall dropped: radius $r1 hits $h1 -> radius $r2 hits $h2")
      case _ => ()
    }
    rows.foreach { case (_, _, rec) => assert(rec >= 0.0 && rec <= 1.0) }
  }

  test("minhashAgreement: high-Jaccard pairs are never estimator-missed; estimates land within signature resolution") {
    val slice = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val rows = Dedup.minhashAgreement(slice).collect().map { r =>
      (Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getString(4))
    }
    assert(rows.nonEmpty)
    // status is consistent with which scores are present
    rows.foreach { case (ex, es, st) => st match {
      case "both"       => assert(ex.isDefined && es.isDefined)
      case "exact_only" => assert(ex.isDefined && es.isEmpty)
      case "est_only"   => assert(ex.isEmpty && es.isDefined)
      case other        => fail(s"unknown status $other")
    }}
    // the d04 contract: every pair at-or-above the near-dup threshold
    // is surfaced by the estimator too (banding misses only the low-
    // Jaccard tail on this corpus)
    val high = rows.filter(_._1.exists(_ >= 0.4))
    assert(high.nonEmpty, "corpus lost its near-dup pairs — fixture drift")
    assert(high.forall(_._3 == "both"),
      s"a >=0.4 pair was estimator-missed: ${high.filter(_._3 != "both").mkString(",")}")
    // where both paths score, the k=64 signature resolves within its
    // sampling noise (SD <= 1/(2*sqrt(64)) = 0.0625; 4 sigma bound)
    rows.collect { case (Some(ex), Some(es), _) =>
      assert(math.abs(ex - es) <= 0.25, s"|$ex - $es| beyond signature resolution") }
    // scores stay in [0, 1]
    rows.foreach { case (ex, es, _) =>
      (ex.toSeq ++ es.toSeq).foreach(v => assert(v >= 0.0 && v <= 1.0)) }
  }

  test("srpIndexSync: fresh=no-op, monotone growth=append, drift=rebuild") {
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
    val path = tmp("graft-srpsync-")
    Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), path)
    assert(Similarity.srpIndexSync(emb, path) == "append")
    assert(Similarity.srpIndexSync(emb, path) == "fresh")
    // a shrunk corpus (history prefix broken) forces the rebuild arm
    assert(Similarity.srpIndexSync(
      emb.filter(col("vec_id") % 2 === 0), path) == "rebuild")
    // params drift also rebuilds (different outDims than built)
    assert(Similarity.srpIndexSync(emb, path, outDims = 8, radius = 3) == "rebuild")
    // and the synced index serves
    assert(Similarity.srpBucketTopKIndexed(emb, col("vec_id") % 50 === 0,
      path, 3, pruneScan = true).count() > 0)
  }

  test("srp index: non-monotone append and wrong kind are named errors") {
    val emb = Tables.embeddings(spark, dir)
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
    val path = tmp("graft-srperr-")
    Similarity.saveSrpIndex(emb.filter(col("vec_id") <= cut), path)
    val e1 = intercept[IndexManifestException] {
      Similarity.appendSrpIndex(emb.filter(col("vec_id") > cut / 2), path)
    }
    assert(e1.getMessage.contains("id-monotone"))
    val e2 = intercept[IndexManifestException] {
      Similarity.srpBucketTopKIndexed(emb, col("vec_id") % 50 === 0,
        tmp("graft-srpnone-"), 3)
    }
    assert(e2.getMessage.contains("MANIFEST"))
  }

  test("appendTokenShards: readShard still prunes to one partition on the grown store") {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val path = tmp("graft-shread-")
    Packing.saveTokenShards(docs.filter(col("doc_id") <= cut), path, BUDGET)
    Packing.appendTokenShards(docs.filter(col("doc_id") > cut), path)
    val df = Packing.readShard(spark, path, 0L)
    assert(df.count() > 0)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("shard_id"),
      s"single-shard read is not partition-pruned:\n$scan")
  }

  test("packShardStore: windows tile per shard, spans cover each doc, and the shard stream is the global slice shifted to 0") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val path = tmp("graft-shpack-")
    val ctx = 64
    Packing.saveTokenShards(docs, path, BUDGET)
    val p = Packing.packShardStore(spark, path, ctx)
      .select(col("shard_id"), col("doc_id"), col("ctx_id"),
        col("ctx_offset"), col("doc_offset"), col("len"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(p.nonEmpty)
    // per (shard, ctx) tiling: every window sums to ctxLen except each
    // shard's LAST window (the shard tail), which carries the remainder
    val store = spark.read.parquet(s"$path/shards")
      .select(col("shard_id").cast("long"), col("doc_id"),
        col("n_tokens"), col("start_token"))
      .as[(Long, Long, Long, Long)].collect()
    val shardTok = store.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    p.groupBy(r => (r._1, r._3)).foreach { case ((sid, cid), rows) =>
      val lastCtx = (shardTok(sid) - 1) / ctx
      val s = rows.map(_._6).sum
      if (cid < lastCtx) assert(s == ctx, s"shard $sid ctx $cid sums $s")
      else assert(s == shardTok(sid) - lastCtx * ctx, s"shard $sid tail ctx $cid")
    }
    // per-doc spans are contiguous from doc_offset 0 and cover n_tokens
    val nTok = store.map(r => r._2 -> r._3).toMap
    p.groupBy(_._2).foreach { case (id, spans) =>
      val sorted = spans.sortBy(_._5)
      assert(sorted.head._5 == 0L && sorted.map(_._6).sum == nTok(id), s"doc $id")
    }
    // shard-local positions are the stored global stream shifted so each
    // shard's first doc starts at 0 (frozen order preserved)
    val firstStart = store.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._4).min }
    val localStart = p.groupBy(_._2).map { case (id, spans) =>
      val first = spans.minBy(_._5)
      id -> (first._1, first._3 * ctx + first._4)
    }
    store.foreach { case (sid, id, _, st) =>
      assert(localStart(id) == ((sid, st - firstStart(sid))), s"doc $id local pos") }
    // an appended store packs its frozen history shards identically:
    // non-boundary history windows are bit-stable under growth
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val path2 = tmp("graft-shpack2-")
    Packing.saveTokenShards(docs.filter(col("doc_id") <= cut), path2, BUDGET)
    val before = Packing.packShardStore(spark, path2, ctx)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    Packing.appendTokenShards(docs.filter(col("doc_id") > cut), path2)
    val after = Packing.packShardStore(spark, path2, ctx)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val boundary = before.map(_._1).max // the one partially-filled tail shard
    assert(before.filter(_._1 < boundary).subsetOf(after),
      "a frozen history shard's packing changed under append")
  }

  test("gopherRules: each rule drops exactly its violator on constructed docs; corpus verdict is the AND of its bits") {
    import spark.implicits._
    val ok = ("the that have " * 20).trim // 60 words, mean len 3.67, 3 stop hits
    val fixtures = Seq(
      (0L, ok),                                      // passes everything
      (1L, "the that"),                              // too few words (mean len 3.5 still ok)
      (2L, ("the blah bluh " * 20).trim),            // one stopword hit only
      (3L, ok + " " + ("ab#cd# " * 9).trim),         // symbol-heavy (18 #/69 words > 0.1)
      (4L, ok.replace("have", "12345")),             // alpha fraction 2/3 < 0.8
      (5L, (0 until 60).map(_ => "the that have").mkString("\n")), // newline-only structure — passes
      (6L, ok + "\n" + (0 until 200).map(_ => "- the that have").mkString("\n")), // 200/201 bullet lines
      (7L, ok + "\n" + "the that have...\n" * 2 + ok)) // 2/4 ellipsis lines > 0.3
    val df = TextAnalysis.gopherRules(fixtures.toDF("doc_id", "text"))
    val rows = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[Boolean]("keep"))
    def failsOnly(id: Long, bit: String): Unit = {
      assert(!rows(id).getAs[Boolean](bit), s"doc $id should fail $bit")
      assert(!rows(id).getAs[Boolean]("keep"))
      val others = Seq("ok_words", "ok_word_len", "ok_symbol", "ok_bullet",
        "ok_ellipsis", "ok_alpha", "ok_stop").filterNot(_ == bit)
      others.foreach(o => assert(rows(id).getAs[Boolean](o), s"doc $id should pass $o"))
    }
    failsOnly(1L, "ok_words")
    failsOnly(2L, "ok_stop")
    failsOnly(3L, "ok_symbol")
    failsOnly(4L, "ok_alpha")
    assert(rows(5L).getAs[Boolean]("keep"), "newlines alone must not drop a doc")
    failsOnly(6L, "ok_bullet")
    failsOnly(7L, "ok_ellipsis")
    // corpus: verdict is exactly the AND of its bits, and the registered
    // stop list splits the corpus both ways
    val corpus = TextAnalysis.gopherRules(Tables.documents(spark, dir),
      stopWords = TextAnalysis.markers.head._2)
    val bad = corpus.filter(col("keep") =!= (col("ok_words") && col("ok_word_len") &&
      col("ok_symbol") && col("ok_bullet") && col("ok_ellipsis") &&
      col("ok_alpha") && col("ok_stop"))).count()
    assert(bad == 0L)
    val split = corpus.groupBy(col("keep")).count().as[(Boolean, Long)].collect().toMap
    assert(split.getOrElse(true, 0L) > 0 && split.getOrElse(false, 0L) > 0,
      s"corpus verdict is degenerate: $split")
  }

  test("c4LineFilter: line keeps/drops and doc gates on constructed docs; all-drop on the punctuation-free corpus") {
    import spark.implicits._
    val good = "one two three four five." // 5 words, terminal period
    val fixtures = Seq(
      (0L, s"$good\n$good\nis this five words too?"),     // 3 kept lines -> keep
      (1L, s"$good\n$good\nno terminal punctuation here"), // 2 kept -> drop
      (2L, s"$good\n$good\nfour words only here."),        // 4-word line dropped -> 2 kept -> drop
      (3L, s"$good\n$good\nthis line mentions JavaScript today."), // js line dropped
      (4L, s"$good\n$good\n$good\nvar x = {};"),            // brace kills the doc
      (5L, s"$good\n$good\n$good\nLorem Ipsum dolor sit amet."),   // lorem kills the doc
      (6L, s"""he said "stop right there now""""),          // end-quote terminal, but 1 kept < 3
      (7L, s"$good!\n$good?\nshort line.\nno punct line here now")) // !/? count; short + no-punct dropped
    val out = TextAnalysis.c4LineFilter(fixtures.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("keep") &&
      out(0L).getAs[String]("text_out") == s"$good\n$good\nis this five words too?")
    assert(!out(1L).getAs[Boolean]("keep") && out(1L).getAs[Long]("n_kept") == 2)
    assert(!out(2L).getAs[Boolean]("keep") && out(2L).getAs[Long]("n_kept") == 2)
    assert(!out(3L).getAs[Boolean]("keep") && out(3L).getAs[Long]("n_kept") == 2)
    assert(!out(4L).getAs[Boolean]("keep") && out(4L).getAs[Boolean]("has_brace")
      && out(4L).getAs[Long]("n_kept") == 3 && out(4L).getAs[String]("text_out") == "")
    assert(!out(5L).getAs[Boolean]("keep") && out(5L).getAs[Boolean]("has_lorem"))
    assert(!out(6L).getAs[Boolean]("keep") && out(6L).getAs[Long]("n_kept") == 1)
    assert(!out(7L).getAs[Boolean]("keep") && out(7L).getAs[Long]("n_kept") == 2)
    // the measured caveat the registered row rides: the synthetic corpus
    // has no terminal punctuation, so every doc takes the all-drop path
    val corpus = TextAnalysis.c4LineFilter(Tables.documents(spark, dir))
    assert(corpus.filter(col("keep") || col("n_kept") =!= 0L ||
      col("text_out") =!= "").count() == 0L)
  }

  test("semanticDedup: keep-lowest-id within cluster on constructed vectors; cluster floor always keeps on the corpus") {
    import spark.implicits._
    val fix = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),      // seed centroid / cluster 0 floor
      (1L, Array(0f, 1f, 0f, 0f)),      // seed centroid / cluster 1 floor
      (2L, Array(1f, 0.01f, 0f, 0f)),   // ~dup of 0 -> dropped
      (3L, Array(0.99f, 0.02f, 0f, 0f)),// ~dup of 0 AND 2 -> dropped, 2 lower dups
      (4L, Array(0f, 1f, 0.5f, 0f)),    // cluster 1, cosine 0.894 < 0.95 -> keeps
      (5L, Array(0f, 1f, 0.001f, 0f)))  // ~dup of 1 only -> dropped, 1 lower dup
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(fix, 0.95, nCells = 2)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(0L) == ((0L, 0L, true)) && out(1L) == ((1L, 0L, true)))
    assert(out(2L) == ((0L, 1L, false)))
    assert(out(3L) == ((0L, 2L, false)))
    assert(out(4L) == ((1L, 0L, true)), "below-threshold neighbor must keep")
    assert(out(5L) == ((1L, 1L, false)))
    // corpus properties: the assignment IS the shared IVF assignment,
    // each cell's lowest id always keeps, and keep <-> zero lower dups
    val emb = Tables.embeddings(spark, dir)
    val sd = Similarity.semanticDedup(emb, 0.35)
    val aff = Similarity.centroidAffinity(emb)
      .select(col("vec_id"), col("cell").as("aff_cell"))
    assert(sd.join(aff, "vec_id").filter(col("cell") =!= col("aff_cell")).count() == 0L)
    assert(sd.filter(col("keep") =!= (col("n_lower_dups") === 0L)).count() == 0L)
    val floors = sd.groupBy(col("cell")).agg(min(col("vec_id")).as("vec_id"))
    assert(sd.join(floors, Seq("cell", "vec_id")).filter(!col("keep")).count() == 0L)
    // and the threshold genuinely splits the corpus both ways
    val parts = sd.groupBy(col("keep")).count().as[(Boolean, Long)].collect().toMap
    assert(parts.getOrElse(true, 0L) > 0 && parts.getOrElse(false, 0L) > 0, parts.toString)
    // extremity keep policy (e49) on the same fixture: the dup group
    // {0,2,3} keeps vec 3 (lowest centroid affinity — it sits farthest
    // from the seed it is grouped under), {1,5} keeps 5, singleton 4
    // keeps — a genuinely different keeper set than keep-lowest-id
    val ext = Similarity.semanticDedupExtremity(fix, 0.95, nCells = 2)
      .select(col("vec_id"), col("group_id"), col("keep"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(ext(0L) == ((0L, false)) && ext(2L) == ((0L, false)) &&
      ext(3L) == ((0L, true)), "group {0,2,3} must keep the extremity member")
    assert(ext(1L) == ((1L, false)) && ext(5L) == ((1L, true)))
    assert(ext(4L) == ((4L, true)), "singletons always keep")
    // corpus: exactly one keeper per group, and it carries the group's
    // minimum affinity
    val extc = Similarity.semanticDedupExtremity(emb, 0.35)
    val perGroup = extc.groupBy(col("group_id"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("nk"),
        min(col("affinity")).as("mina"))
    assert(perGroup.filter(col("nk") =!= 1L).count() == 0L)
    val badKeeper = extc.filter(col("keep"))
      .join(perGroup.select(col("group_id"), col("mina")), "group_id")
      .filter(col("affinity") =!= col("mina"))
    assert(badKeeper.count() == 0L)
    // trained-centroid variant: same verdict machinery over the Lloyd
    // cluster structure — the keep-bit invariant holds, the assignment
    // genuinely moved for some vectors, and dup evidence still exists
    val sdt = Similarity.semanticDedup(emb, 0.35, 16, lloydIters = 2)
    assert(sdt.filter(col("keep") =!= (col("n_lower_dups") === 0L)).count() == 0L)
    val moved = sd.select(col("vec_id"), col("cell").as("c0"))
      .join(sdt.select(col("vec_id"), col("cell").as("c1")), "vec_id")
      .filter(col("c0") =!= col("c1")).count()
    assert(moved > 0L, "2 Lloyd passes should move at least one assignment")
    assert(sdt.filter(!col("keep")).count() > 0L)
  }

  test("gopherRepetition: hand-computed char fractions on constructed docs; verdict is the AND of its bits on the corpus") {
    import spark.implicits._
    val distinct40 = (0 until 40).map(i => f"w$i%02d").mkString(" ")
    val fixtures = Seq(
      (0L, "x y\nx y\nz w q"),                    // 2/3 dup line slots, 6/13 dup chars
      (1L, "aa bb aa bb aa bb cc dd ee ff gg hh"), // top bigram "aa bb" x3
      (2L, distinct40),                            // no repetition — keep
      (3L, "abc"))                                 // < n words: gram fracs 0
    val out = TextAnalysis.gopherRepetition(fixtures.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Double]("dup_line_frac") == 2.0 / 3)
    assert(out(0L).getAs[Double]("dup_line_char_frac") == 6.0 / 13)
    assert(!out(0L).getAs[Boolean]("ok_dup_line") &&
      !out(0L).getAs[Boolean]("ok_dup_line_char"))
    assert(out(1L).getAs[Double]("top2_char_frac") == 3.0 * 5 / 35)
    assert(!out(1L).getAs[Boolean]("ok_top2"))
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Double]("top2_char_frac") == 0.0 &&
      out(3L).getAs[Double]("top4_char_frac") == 0.0 &&
      out(3L).getAs[Boolean]("keep"))
    // corpus: the verdict is exactly the AND of its bits and every
    // fraction stays inside [0, 1]
    val corpus = TextAnalysis.gopherRepetition(Tables.documents(spark, dir))
    assert(corpus.filter(col("keep") =!= (col("ok_dup_line") && col("ok_dup_line_char") &&
      col("ok_top2") && col("ok_top3") && col("ok_top4"))).count() == 0L)
    val fracs = Seq("dup_line_frac", "dup_line_char_frac",
      "top2_char_frac", "top3_char_frac", "top4_char_frac")
    assert(corpus.filter(fracs.map(f => col(f) < 0.0 || col(f) > 1.0)
      .reduce(_ || _)).count() == 0L)
  }

  test("kCenterGreedy: farthest-point-first order on constructed vectors; radius nonincreasing and ids distinct on the corpus") {
    import spark.implicits._
    val fix = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),   // seed (lowest id)
      (1L, Array(0f, 1f, 0f, 0f)),   // orthogonal: md 1 after {0,2}
      (2L, Array(-1f, 0f, 0f, 0f)),  // antipode: md 2 -> picked second
      (3L, Array(0.7f, 0.7f, 0f, 0f))) // diagonal: md ~0.293 -> last
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(fix, 4)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(0L, 2L, 1L, 3L))
    assert(got(0)._3 == 2.0 && math.abs(got(1)._3 - 2.0) < 1e-12 &&
      math.abs(got(2)._3 - 1.0) < 1e-12 && math.abs(got(3)._3 - 0.2928932) < 1e-6)
    // corpus: seed is the lowest id, selections are distinct, coverage
    // radius is nonincreasing and stays positive on random vectors
    val emb = Tables.embeddings(spark, dir)
    val sel = Similarity.kCenterGreedy(emb, 8)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(sel.length == 8 && sel.map(_._2).distinct.length == 8)
    assert(sel(0)._2 == emb.agg(min(col("vec_id"))).head().getLong(0))
    assert(sel.sliding(2).forall {
      case Array(a, b) => b._3 <= a._3 && b._3 > 0; case _ => true })
  }

  test("contaminationFrac: wholesale copies flagged, incidental overlap tolerated, short docs zero") {
    import spark.implicits._
    val ev = "a b c d e f g h i j"
    val longTail = (1 to 20).map(i => s"x$i").mkString(" ")
    val fix = Seq((10L, ev),                       // eval split
      (1L, ev),                                    // wholesale copy -> frac 1
      (2L, s"a b c d e f g h $longTail"),          // one shared 8-gram of 21
      (3L, "p q"))                                 // too short
      .toDF("doc_id", "text")
    val out = Dedup.contaminationFrac(fix, col("doc_id") % 10 === 0, 8, 0.7)
      .as[(Long, Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 3L, 1.0, true)))
    assert(out(2L)._2 == 21L && out(2L)._3 == 1L && !out(2L)._5)
    assert(out(3L) == ((3L, 0L, 0L, 0.0, false)))
    assert(!out.contains(10L), "the eval split is not scored")
    // corpus: the planted cross-split copies flag (7 at sf0.001 —
    // measured), the verdict is exactly the threshold comparison, and
    // hits never exceed totals
    val docs = Tables.documents(spark, dir)
    val reg = Dedup.contaminationFrac(docs, col("doc_id") % 10 === 0)
    assert(reg.filter(col("contaminated")).count() > 0)
    assert(reg.filter(col("contaminated") =!= (col("overlap_frac") >= 0.7)).count() == 0)
    assert(reg.filter(col("n_hits") > col("n_grams")).count() == 0)
  }

  test("unimaxMixture: exact waterfall on constructed strata; budget and cap invariants on the corpus") {
    import spark.implicits._
    // strata of 10/20/30/40 tokens, budget 50, cap 1 epoch: the small
    // stratum caps at 10 and its unused share waterfalls to the rest
    val fix = Seq(("a", 10), ("b", 20), ("c", 30), ("d", 40))
      .zipWithIndex.map { case ((l, n), i) => (i.toLong, ("w " * n).trim, l) }
      .toDF("doc_id", "text", "lang")
    val got = Curation.unimaxMixture(fix, col("lang"), 0.5, 1.0)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    var rem = 50.0
    val expect = Seq(("a", 10L, 10.0), ("b", 20L, 20.0), ("c", 30L, 30.0),
      ("d", 40L, 40.0)).zipWithIndex.map { case ((s, n, cap), i) =>
      val alloc = math.min(cap, rem / (4 - i)); rem -= alloc
      s -> ((s, n, cap, alloc, alloc / n.toDouble))
    }.toMap
    assert(got == expect)
    assert(got("a")._4 == 10.0 && got("a")._5 == 1.0) // capped exactly
    assert(got("d")._4 > 50.0 / 4, "redistribution must lift the uncapped tail")
    // corpus at the registered constants: allocations never exceed
    // caps, epochs never exceed the cap, and the budget is respected
    val docs = Tables.documents(spark, dir)
    val reg = Curation.unimaxMixture(TextAnalysis.langId(docs),
      col("pred_lang"), 0.48, 0.5)
      .as[(String, Long, Double, Double, Double)].collect()
    val totalTokens = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(reg.forall(r => r._4 <= r._3 && r._5 <= 0.5 + 1e-12))
    assert(reg.map(_._4).sum <= totalTokens * 0.48 + 1e-6)
  }

  test("bpeSpans: spans tile each marked word exactly and concatenate back to it") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val spans = TextAnalysis.bpeSpans(docs, 5)
      .as[(String, Long, String, Long, Long)].collect()
    assert(spans.nonEmpty)
    spans.groupBy(_._1).foreach { case (word, toks) =>
      val sorted = toks.sortBy(_._2)
      // contiguous from 0, tiling len(word) + 1 (the marker)
      assert(sorted.head._4 == 0L, s"word $word")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => b._4 == a._4 + a._5; case _ => true }, s"word $word")
      assert(sorted.map(_._5).sum == word.length + 1, s"word $word")
      // symbols concatenate back to the marked word
      assert(sorted.map(_._3).mkString == word + "¶", s"word $word")
    }
  }

  test("lineDedup: keep-first across and within docs, rebuild preserves order; twins empty out on the registered shape") {
    import spark.implicits._
    val fixtures = Seq(
      (0L, "alpha\nshared line\nbeta"),
      (1L, "shared line\ngamma\nshared line"), // both occurrences lose to doc 0
      (2L, "delta\ndelta\nepsilon"))           // within-doc repeat
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(fixtures)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 3L, 0L, "alpha\nshared line\nbeta")))
    assert(out(1L) == ((1L, 3L, 2L, "gamma")))
    assert(out(2L) == ((2L, 3L, 1L, "delta\nepsilon")))
    // the registered shape: exact twin copies empty out, originals
    // survive untouched (the corpus itself has no duplicate texts)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val twins = docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val dd = Dedup.lineDedup(docs.unionByName(twins))
    assert(dd.filter(col("doc_id") >= 1000000L)
      .filter(col("text_out") =!= "" || col("n_removed") =!= col("n_lines"))
      .count() == 0L)
    val intact = dd.filter(col("doc_id") < 1000000L)
      .join(docs, "doc_id")
      .filter(col("text_out") =!= col("text") || col("n_removed") =!= 0L)
    assert(intact.count() == 0L)
  }

  test("media phash/neardup: block-local corruption stays within radius; every corrupted twin is found") {
    import spark.implicits._
    val base = "x" * 240 // blockLen 4, 60 blocks cover it exactly
    def corrupt(s: String, blocks: Seq[Int]): String = {
      val arr = s.toCharArray
      blocks.foreach(b => (0 until 4).foreach(i => arr(b * 4 + i) = ('A' + b % 26).toChar))
      new String(arr)
    }
    val fix = Seq(
      (0L, base), (1L, base),                     // identical -> distance 0
      (2L, corrupt(base, Seq(0))),                // one block -> <= 1 bit
      (3L, corrupt(base, Seq(0, 10, 20))))        // three blocks -> <= 3 bits
      .toDF("doc_id", "text")
    val media = Multimodal.mediaView(fix.withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text"))))
    val ph = Multimodal.mediaPhash(media).as[(Long, Long)].collect().toMap
    assert(ph(0L) == ph(1L))
    assert(java.lang.Long.bitCount(ph(0L) ^ ph(2L)) <= 1)
    assert(java.lang.Long.bitCount(ph(0L) ^ ph(3L)) <= 3)
    val pairs = Multimodal.mediaNearDupPairs(media, 3)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((0L, 1L)) == 0L)
    assert(pairs.contains((0L, 2L)), "one-block corruption must be found")
    assert(pairs.contains((0L, 3L)), "radius-wide corruption must be found (pigeonhole)")
    // the registered m06 shape: every even-id doc pairs with its
    // single-byte corrupted twin on the real corpus
    val docs = Tables.documents(spark, dir)
    val mv = Multimodal.mediaView(docs)
    val twins = mv.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("cast(concat(cast('Z' as binary), substring(payload, 2, octet_length(payload) - 1)) as binary)")
          .as("payload"), col("lang"), col("source"))
    val got = Multimodal.mediaNearDupPairs(mv.unionByName(twins), 3)
      .as[(Long, Long, Long)].collect()
    val evens = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id")).as[Long].collect().toSet
    val twinPairs = got.filter(r => r._2 == r._1 + 1000000L).map(_._1).toSet
    assert(twinPairs == evens, s"missing twins: ${(evens -- twinPairs).take(5)}")
    assert(got.forall(_._3 <= 3))
  }

  test("curriculumShards: tiers form contiguous curriculum blocks, within-tier order is the shared shuffle, stream tiles exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val cs = Packing.curriculumShards(docs, BUDGET)
      .select(col("doc_id"), col("tier"), col("n_tokens"),
        col("start_token"), col("shard_id"))
      .as[(Long, String, Long, Long, Long)].collect()
    assert(cs.length == docs.count())
    // the token stream tiles exactly from 0
    val byStart = cs.sortBy(_._4)
    byStart.foldLeft(0L) { case (exp, (_, _, n, st, sh)) =>
      assert(st == exp && sh == st / BUDGET); st + n }
    // tiers are contiguous blocks in head < middle < tail order
    val range = cs.groupBy(_._2).map { case (t, rs) =>
      t -> (rs.map(_._4).min, rs.map(r => r._4 + r._3).max) }
    for (Seq(a, b) <- Seq("head", "middle", "tail").sliding(2))
      (range.get(a), range.get(b)) match {
        case (Some((_, aEnd)), Some((bStart, _))) => assert(aEnd <= bStart, s"$a/$b overlap")
        case _ => // a tier may be empty on tiny corpora
      }
    // tier assignment is exactly perplexityTiers' (short docs -> tail)
    val tiers = TextAnalysis.perplexityTiers(docs, 16)
      .select(col("doc_id"), col("tier")).as[(Long, String)].collect().toMap
    cs.foreach { case (id, t, _, _, _) =>
      assert(t == tiers.getOrElse(id, "tail"), s"doc $id tier") }
    // within a tier the relative order is the shared hash60 shuffle
    val hashOrder = docs.select(col("doc_id"),
        graft.operators.Dedup.hash60(col("doc_id").cast("string")).as("k"))
      .as[(Long, Long)].collect().toMap
    cs.groupBy(_._2).foreach { case (t, rs) =>
      val byPos = rs.sortBy(_._4).map(_._1).toSeq
      val byKey = rs.map(_._1).sortBy(id => (hashOrder(id), id)).toSeq
      assert(byPos == byKey, s"tier $t order")
    }
  }

  test("kmeansKcenterSeeded: cells are the k-center exemplars (pass 1) and the Lloyd invariants hold") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val seedIds = Similarity.kCenterGreedy(emb, 8)
      .select(col("vec_id")).as[Long].collect().toSet
    // one pass: every surviving cell id IS a selected exemplar
    val one = Similarity.kmeansKcenterSeeded(emb, 8, iters = 1)
    val cells1 = one.select(col("cell")).distinct().as[Long].collect().toSet
    assert(cells1.subsetOf(seedIds) && cells1.nonEmpty)
    // two passes: dims complete per cell, members account for the corpus
    val two = Similarity.kmeansKcenterSeeded(emb, 8, iters = 2)
    val dims = two.groupBy(col("cell"))
      .agg(countDistinct(col("dim")).as("nd"), max(col("n_members")).as("nm"))
      .as[(Long, Long, Long)].collect()
    val width = emb.select(size(col("embedding"))).head().getInt(0)
    assert(dims.forall(_._2 == width))
    assert(dims.map(_._3).sum == emb.count())
    // and the spread seeding genuinely differs from the id-seeded run
    val idSeeded = Similarity.kmeansIterate(emb, 8, 2)
      .select(col("cell"), col("dim"), col("val")).as[(Long, Long, Double)].collect().toSet
    val spread = two.select(col("cell"), col("dim"), col("val"))
      .as[(Long, Long, Double)].collect().toSet
    assert(idSeeded != spread)
  }

  test("bpe: pair stats count the weighted vocabulary; training merges leftmost-first with nonincreasing frequency") {
    import spark.implicits._
    // vocab {aa: 2, ab: 1} -> pairs (a,a)=2, (a,¶)=2, (a,b)=1, (b,¶)=1
    val tiny = Seq((0L, "aa ab"), (1L, "aa")).toDF("doc_id", "text")
    val stats = TextAnalysis.bpePairStats(tiny, 10)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(stats == Seq((1L, "a", "a", 2L), (2L, "a", "¶", 2L),
      (3L, "a", "b", 1L), (4L, "b", "¶", 1L)))
    // 'aaa' under merge (a,a) collapses leftmost-first: aa|a, then the
    // end-of-word pair, then the final two symbols
    val tr = TextAnalysis.bpeTrain(Seq((0L, "aaa")).toDF("doc_id", "text"), 3)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(tr == Seq((1L, "a", "a", 2L), (2L, "a", "¶", 1L), (3L, "aa", "a¶", 1L)))
    // corpus: step 1 is exactly the stats table's rank 1, and the merged
    // frequency never increases across steps (merges only split mass)
    val docs = Tables.documents(spark, dir)
    val first = TextAnalysis.bpePairStats(docs, 1)
      .as[(Long, String, String, Long)].head()
    val steps = TextAnalysis.bpeTrain(docs, 3)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert((steps(0)._2, steps(0)._3, steps(0)._4) == ((first._2, first._3, first._4)))
    assert(steps.sliding(2).forall {
      case Array(a, b) => b._4 <= a._4; case _ => true })
  }

  test("bpeEncode: token counts shrink by exactly the applied merge occurrences") {
    import spark.implicits._
    // vocab {aab: 2, ab: 1}: merge1 = (a,b) tf 3 -> aab = a|ab|¶ (3),
    // ab = ab|¶ (2); merge2 = (ab,¶) tf 3 -> aab = a|ab¶ (2), ab = ab¶ (1)
    val tiny = Seq((0L, "aab ab aab")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(tiny, 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc == Seq((0L, 3L, 5L)))
    // corpus: every doc's BPE token count sits between its word count
    // (fully merged floor) and chars+words (fully split ceiling), and
    // merging strictly reduced tokens somewhere
    val docs = Tables.documents(spark, dir)
    val out = TextAnalysis.bpeEncode(docs, 5)
    val base = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("nw"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
    val joined = out.join(base, "doc_id")
    assert(joined.filter(col("n_words") =!= col("nw")).count() == 0L)
    assert(joined.filter(col("n_tokens_bpe") < col("n_words") ||
      col("n_tokens_bpe") > col("nc") + col("nw")).count() == 0L)
    val unmergedTotal = joined.agg(sum(col("nc") + col("nw"))).head().getLong(0)
    val total = out.agg(sum(col("n_tokens_bpe"))).head().getLong(0)
    assert(total < unmergedTotal, "5 merges must reduce the corpus token total")
    // the per-stratum fairness report partitions exactly the same totals
    val fair = TextAnalysis.bpeFairness(docs, 5)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(fair.map(_._1).sorted.toSeq == Seq("de", "en", "es", "fr"))
    assert(fair.map(_._4).sum == total)
    assert(fair.forall(r => r._5 >= 1.0 && r._5 == r._4.toDouble / r._3.toDouble))
  }

  test("perceptron classifier: separable fixture converges, pass-1 update is the class-difference vector, corpus scoring is self-consistent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple", "en"),
      (2L, "apple apple", "en"),
      (3L, "banana banana banana", "xx"),
      (4L, "banana banana", "xx")).toDF("doc_id", "text", "lang")
    val B = 64
    val buckets = spark.range(1)
      .select((Dedup.hash60(lit("apple")) % B).as("a"),
        (Dedup.hash60(lit("banana")) % B).as("b")).head()
    val (aB, bB) = (buckets.getLong(0), buckets.getLong(1))
    assert(aB != bB, "fixture words must hash to distinct buckets")

    // pass 1 from w=0: every margin is 0, every doc counts as
    // misclassified, so the update is exactly Σ y·x per bucket
    val w1 = Classifier.trainPerceptron(docs, col("lang") === "en", B, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1.size == B + 1)
    assert(w1(aB) == 5L && w1(bB) == -5L && w1(B.toLong) == 0L)
    assert(w1.values.map(math.abs).sum == 10L, "no other bucket moves")

    // the fixture is separable and pass 1 already separates it, so the
    // 3-pass classifier is perfect and passes 2-3 are no-ops
    val res = Classifier.classifyPerceptron(docs, col("lang") === "en", B, 3)
      .collect()
    assert(res.length == 4 && res.forall(_.getAs[Boolean]("correct")))
    val w3 = Classifier.trainPerceptron(docs, col("lang") === "en", B, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w3 == w1, "converged weights must be stable under further passes")

    // corpus self-consistency: classify margins equal the dot product of
    // the separately-trained weights with the shared feature stream
    val corpus = Tables.documents(spark, dir)
    val w = Classifier.trainPerceptron(corpus, col("lang") === "en", B, 3)
      .withColumnRenamed("w", "wt")
    val manual = Classifier.hashedFeatures(corpus, B)
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("x") * col("wt")).cast("long").as("m"))
    val scored = Classifier.classifyPerceptron(corpus, col("lang") === "en", B, 3)
    assert(scored.join(manual, Seq("doc_id"))
      .filter(col("margin") =!= col("m")).count() == 0L)
    assert(scored.count() == corpus.count())
  }

  test("saveClassifier/classifyIndexed: persistence round-trip is margin-identical, manifest gates kind") {
    val corpus = Tables.documents(spark, dir)
    val path = tmp("graft-cls-")
    Classifier.saveClassifier(corpus, col("lang") === "en", path, 64, 3)
    val m = IndexManifest.require(path, "perceptron")
    assert(m.params("n_buckets") == 64L && m.params("passes") == 3L)
    // serving from the artifact must equal training-time scoring bit
    // for bit (margins are exact Longs — no tolerance)
    val live = Classifier.classifyPerceptron(corpus, col("lang") === "en", 64, 3)
      .select(col("doc_id"), col("margin"))
    val served = Classifier.classifyIndexed(corpus, path)
    assert(served.join(live, Seq("doc_id"))
      .filter(live("margin") =!= served("margin")).count() == 0L)
    assert(served.count() == corpus.count())
    // wrong-kind artifacts fail loudly
    intercept[IndexManifestException] {
      Classifier.classifyIndexed(corpus, tmpWrongKind())
    }
  }

  private def tmpWrongKind(): String = {
    val p = tmp("graft-clswrong-")
    IndexManifest.write(p,
      IndexManifest.Manifest("bigram-lm", Map.empty, 1L, 1L))
    p
  }

  test("averaged perceptron: converged fixture margins are the pass-count multiple with identical predictions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple", "en"), (2L, "apple apple", "en"),
      (3L, "banana banana banana", "xx"), (4L, "banana banana", "xx"))
      .toDF("doc_id", "text", "lang")
    // the fixture converges in pass 1, so w1=w2=w3 and the summed
    // (averaged, unnormalized) margins are exactly 3x the final ones
    val fin = Classifier.classifyPerceptron(docs, col("lang") === "en", 64, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val avg = Classifier.classifyAveraged(docs, col("lang") === "en", 64, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(avg.size == 4)
    avg.foreach { case (id, m, pred) =>
      assert(m == 3 * fin(id) && pred == (m > 0), s"doc $id")
    }
    // corpus: same shape and internal consistency
    val corpus = Tables.documents(spark, dir)
    val out = Classifier.classifyAveraged(corpus, col("lang") === "en", 64, 3)
    assert(out.count() == corpus.count())
    assert(out.filter((col("margin") > 0) =!= col("predicted")).count() == 0L)
  }

  test("classifier update/sync: online continuation advances the artifact; sync is update-then-fresh and rebuilds on history change") {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val history = docs.filter(col("doc_id") <= cut)
    val increment = docs.filter(col("doc_id") > cut)

    // explicit update path
    val p1 = tmp("graft-clsupd-")
    Classifier.saveClassifier(history, col("lang") === "en", p1, 64, 3)
    val m1 = IndexManifest.require(p1, "perceptron")
    assert(m1.params("passes") == 3L && m1.corpusRows == history.count())
    Classifier.updateClassifier(increment, col("lang") === "en", p1, 1)
    val m2 = IndexManifest.require(p1, "perceptron")
    assert(m2.params("passes") == 4L)
    assert(m2.corpusRows == docs.count())
    assert(m2.corpusMaxId ==
      docs.agg(max(col("doc_id"))).head().getLong(0))
    val served = Classifier.classifyIndexed(docs, p1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // sync path: grown corpus fires the SAME online update, then no-ops
    val p2 = tmp("graft-clssync-")
    Classifier.saveClassifier(history, col("lang") === "en", p2, 64, 3)
    assert(Classifier.classifierSync(docs, col("lang") === "en", p2, 64, 3) == "update")
    assert(Classifier.classifierSync(docs, col("lang") === "en", p2, 64, 3) == "fresh")
    val served2 = Classifier.classifyIndexed(docs, p2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served2 == served, "sync's update must be margin-identical to updateClassifier")

    // a shrunk/rewritten corpus cannot ride the online path
    assert(Classifier.classifierSync(docs.filter(col("doc_id") % 2 === 0),
      col("lang") === "en", p2, 64, 3) == "rebuild")
  }

  test("weightedSample: top-k nesting, layout invariance, and zero-weight exclusion") {
    val docs = Tables.documents(spark, dir)
    val k100 = Sampling.weightedSample(docs, col("n_chars"), 100).collect()
    assert(k100.length == 100)
    // priorities are emitted in draw order (descending, doc_id ties)
    val ps = k100.map(r => (r.getAs[Double]("priority"), r.getLong(0)))
    assert(ps.sameElements(ps.sortBy { case (p, id) => (-p, id) }))
    // ES keys nest: the k=10 sample IS the first 10 draws of the k=100
    val k10 = Sampling.weightedSample(docs, col("n_chars"), 10).collect()
    assert(k10.map(_.getLong(0)).sameElements(k100.take(10).map(_.getLong(0))))
    // membership is a pure function of the row, not the layout
    val reparted = Sampling.weightedSample(docs.repartition(7), col("n_chars"), 100)
      .collect().map(_.getLong(0))
    assert(reparted.sameElements(k100.map(_.getLong(0))))
    // zero/negative weights are never drawn
    import spark.implicits._
    val withZero = Seq((900001L, 0L), (900002L, 5L)).toDF("doc_id", "n_chars")
    val drawn = Sampling.weightedSample(withZero, col("n_chars"), 10)
      .collect().map(_.getLong(0))
    assert(drawn.sameElements(Array(900002L)))
  }

  test("temperatureMixture: probabilities normalize, alpha<1 flattens toward uniform, epochs anti-monotone in stratum size") {
    val docs = TextAnalysis.langId(Tables.documents(spark, dir))
    val out = Curation.temperatureMixture(docs, col("pred_lang"), 0.3, 0.48)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("p_frac"),
        r.getAs[Double]("exp_tokens"), r.getAs[Double]("epochs")))
    assert(out.length >= 2)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-9)
    val totTokens = out.map(_._2).sum.toDouble
    assert(math.abs(out.map(_._4).sum - totTokens * 0.48) < 1e-6 * totTokens)
    // flattening: p_frac/token_share > 1 for below-average strata and
    // < 1 above it ⇔ epochs strictly decrease as stratum size grows
    val bySize = out.sortBy(_._2)
    assert(bySize.sliding(2).forall {
      case Array((_, n1, _, _, e1), (_, n2, _, _, e2)) => n1 == n2 || e1 > e2
      case _ => true
    })
    // alpha = 1 recovers the natural distribution exactly
    val nat = Curation.temperatureMixture(docs, col("pred_lang"), 1.0, 0.48)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("p_frac")))
    val tot = nat.map(_._2).sum.toDouble
    assert(nat.forall { case (_, n, p) => math.abs(p - n / tot) < 1e-9 })
  }

  test("softDedupWeights: duplicated content scores more common than unique content, all-unique floor is ln(1/N)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd ee"),   // identical twin A
      (2L, "aa bb cc dd ee"),   // identical twin B
      (3L, "pp qq rr ss tt")    // unique content
    ).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("log_commonness")).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // twins share every gram (df=2 of 3), unique doc's grams df=1 of 3
    val q = (x: Double) => BigDecimal(math.log(x))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mean of 3 equal quantized values (sum exact in decimal, one
    // double divide) — equal to the per-gram value within an ulp or two
    assert(math.abs(out(1L) - q(2.0 / 3.0)) < 1e-12)
    assert(out(1L) == out(2L))
    assert(math.abs(out(3L) - q(1.0 / 3.0)) < 1e-12)
    assert(out(1L) > out(3L), "common content must score less negative")
    // corpus: every value is in (ln(1/N), 0]
    val corpus = Tables.documents(spark, dir)
    val n = corpus.count().toDouble
    val vals = Dedup.softDedupWeights(corpus).collect()
      .map(_.getAs[Double]("log_commonness"))
    assert(vals.nonEmpty && vals.forall(v => v >= math.log(1.0 / n) - 1e-6 && v <= 0.0))
  }

  private def indexFiles(path: String, sub: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(path, sub)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.size(p)).toMap
  }

  test("lsh index: append ≡ rebuild row-identical with history files frozen; probe flags exact twins, clears gibberish, never reads history text") {
    import spark.implicits._
    val common = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, common),
      (2L, ((1 to 15).map(i => s"w$i") ++ Seq("x1", "x2") ++
        (18 to 30).map(i => s"w$i")).mkString(" ")),
      (3L, (1 to 30).map(i => s"a$i").mkString(" ")),
      (4L, (1 to 30).map(i => s"b$i").mkString(" ")),
      (10L, common),                                  // exact twin of 1
      (11L, (1 to 30).map(i => s"z$i").mkString(" ")) // unseen content
    ).toDF("doc_id", "text")
    val history = docs.filter(col("doc_id") <= 4)
    val increment = docs.filter(col("doc_id") >= 10)

    val fresh = tmp("graft-lshfresh-")
    Dedup.saveLshIndex(history, fresh, 64, 16)
    val app = tmp("graft-lshapp-")
    Dedup.saveLshIndex(history.filter(col("doc_id") <= 2), app, 64, 16)
    val before = indexFiles(app, "sig") ++ indexFiles(app, "bands")
    Dedup.appendLshIndex(history.filter(col("doc_id") > 2), app)
    // file-level no-recompute: pre-append files survive byte-for-byte
    val after = indexFiles(app, "sig") ++ indexFiles(app, "bands")
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "a history index file was rewritten by the append")
    assert(after.size > before.size, "no new index files appended")
    // append ≡ rebuild: sig and bands tables row-identical (signatures
    // are parameter-derived — nothing trained)
    def rows(p: String, sub: String) =
      spark.read.parquet(s"$p/$sub").collect().map(_.toSeq).toSet
    assert(rows(fresh, "sig") == rows(app, "sig"))
    assert(rows(fresh, "bands") == rows(app, "bands"))
    assert(IndexManifest.require(app, "lsh").corpusMaxId ==
      IndexManifest.require(fresh, "lsh").corpusMaxId)

    // probe: twin flagged against its history original, unseen content
    // clean with zero candidates; both indexes serve identical verdicts
    def probe(p: String) = Dedup.lshDedupIndexed(increment, p)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3), r.getBoolean(4))).toMap
    val v = probe(fresh)
    assert(probe(app) == v, "appended index must serve identical verdicts")
    val (n10, dup10, est10, is10) = v(10L)
    assert(n10 >= 1L && dup10 == 1L && est10 == 1.0 && is10,
      s"twin verdict: $n10 $dup10 $est10 $is10")
    assert(v(11L) == ((0L, -1L, -1.0, false)), s"clean verdict: ${v(11L)}")
  }

  test("lsh index sync: append-then-fresh on monotone growth, rebuild on rewritten history; probe gates on the manifest kind") {
    val docs = Tables.documents(spark, dir)
    val history = docs.filter(col("doc_id") % 4 =!= 0)
    val cut = history.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4
    val path = tmp("graft-lshsync-")
    Dedup.saveLshIndex(history.filter(col("doc_id") <= cut), path, 64, 16)
    assert(Dedup.lshIndexSync(history, path, 64, 16) == "append")
    assert(Dedup.lshIndexSync(history, path, 64, 16) == "fresh")
    // a shrunk/rewritten corpus cannot ride the append path
    assert(Dedup.lshIndexSync(history.filter(col("doc_id") % 2 === 1),
      path, 64, 16) == "rebuild")
    // params drift rebuilds rather than serving stale geometry
    assert(Dedup.lshIndexSync(history.filter(col("doc_id") % 2 === 1),
      path, 64, 8) == "rebuild")
    assert(IndexManifest.require(path, "lsh").params("bands") == 8L)
    // probing a foreign index kind is a named error
    val gramPath = tmp("graft-lshkind-")
    Dedup.saveGramIndex(docs, gramPath, minLen = 8)
    intercept[IndexManifestException] {
      Dedup.lshDedupIndexed(docs, gramPath)
    }
  }

  test("doremi: lambdas are clipped nonnegative with a clean rank permutation; the weight update normalizes, orders by lambda, and floors at the smoothing mix") {
    val docs = Tables.documents(spark, dir)
    val ex = TextAnalysis.doremiExcess(docs, col("lang") === "en")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getLong(4)))
    assert(ex.nonEmpty && ex.forall(_._3 >= 0.0), "token-level clip ⇒ λ ≥ 0")
    // rnk is exactly the descending-λ permutation with lang ties
    val expect = ex.sortBy(t => (-t._3, t._1)).map(_._1)
    assert(ex.sortBy(_._4).map(_._1).toSeq == expect.toSeq)

    val k = ex.length
    val w = TextAnalysis.doremiWeights(docs, col("lang") === "en",
      eta = 1.0, smoothing = 0.01)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(math.abs(w.map(_._3).sum - 1.0) < 1e-12, "weights must normalize")
    assert(w.forall(_._3 >= 0.01 / k - 1e-15), "smoothing floors every domain")
    // weight order = λ order (exp is monotone; smoothing preserves order)
    assert(w.sortBy(-_._3).map(_._1).toSeq == w.sortBy(-_._2).map(_._1).toSeq)
    // η = 0 with no smoothing is exactly uniform
    val u = TextAnalysis.doremiWeights(docs, col("lang") === "en",
      eta = 0.0, smoothing = 0.0).collect().map(_.getDouble(2))
    assert(u.forall(v => math.abs(v - 1.0 / k) < 1e-15))
  }

  test("hll gram cardinality: estimator lands within the m=256 error regime and is duplicate-invariant (max is idempotent)") {
    val docs = Tables.documents(spark, dir)
    val out = Dedup.hllGramCardinality(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty)
    out.foreach { case (lang, (exact, est, err)) =>
      // raw-estimator regime: counts here are far above the 2.5m
      // small-range boundary, so ~1.04/√m (±6.5%) applies; 3σ bound
      assert(exact > 640L, s"$lang n_exact=$exact below the raw regime")
      assert(math.abs(err) <= 0.20, s"$lang rel_err=$err")
      assert(math.abs(est - exact) / exact == math.abs(err))
    }
    // feeding every document twice changes NOTHING: registers are
    // maxes, exact counts are distincts
    val doubled = Dedup.hllGramCardinality(docs.unionByName(docs)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(doubled == out)
  }

  test("phash index: append ≡ rebuild row-identical with frozen history files; probe flags corrupted twins against their originals, passes fresh blobs; sync is append-then-fresh") {
    val media = Multimodal.mediaView(Tables.documents(spark, dir))
    val history = media.filter(col("doc_id") % 4 =!= 0)
    val cut = history.agg(max(col("doc_id"))).head().getLong(0) * 3 / 4

    val fresh = tmp("graft-phfresh-")
    Multimodal.savePhashIndex(history, fresh, 3)
    val app = tmp("graft-phapp-")
    Multimodal.savePhashIndex(history.filter(col("doc_id") <= cut), app, 3)
    val before = indexFiles(app, "blocks")
    Multimodal.appendPhashIndex(history.filter(col("doc_id") > cut), app)
    val after = indexFiles(app, "blocks")
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "a history block file was rewritten by the append")
    assert(after.size > before.size)
    def rows(p: String) =
      spark.read.parquet(s"$p/blocks").collect().map(_.toSeq).toSet
    assert(rows(fresh) == rows(app), "append must equal rebuild row-for-row")

    // probe: corrupted twins of %4=1 history blobs + fresh %4=0 blobs
    val twins = history.filter(col("doc_id") % 4 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        expr("cast(concat(cast('Z' as binary), substring(payload, 2, octet_length(payload) - 1)) as binary)")
          .as("payload"), col("lang"), col("source"))
    val probe = media.filter(col("doc_id") % 4 === 0).unionByName(twins)
    def collectV(p: String) = Multimodal.mediaNearDupIndexed(probe, p)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toMap
    val v = collectV(fresh)
    assert(collectV(app) == v, "appended index must serve identical verdicts")
    // every twin flags within hamming 1 (its original differs in at
    // most the corrupted first block's bit; dup_of may be a DIFFERENT
    // history doc at equal hamming — the templated corpus has
    // near-identical texts, and lowest-id-at-best is the contract)
    v.filter(_._1 >= 2000000L).foreach { case (id, (dup, best, isDup)) =>
      assert(isDup && best <= 1L && dup >= 0L, s"twin $id -> ($dup, $best)") }
    assert(v.exists(!_._2._3), "some fresh blob should pass")

    // sync policy round trip
    val p2 = tmp("graft-phsync-")
    Multimodal.savePhashIndex(history.filter(col("doc_id") <= cut), p2, 3)
    assert(Multimodal.phashIndexSync(history, p2, 3) == "append")
    assert(Multimodal.phashIndexSync(history, p2, 3) == "fresh")
    assert(Multimodal.phashIndexSync(history.filter(col("doc_id") % 2 === 1),
      p2, 3) == "rebuild")
  }

  test("heapsCurve: cumulative counts are monotone prefixes, the final checkpoint is the whole corpus, betas are finite past the first row") {
    val docs = Tables.documents(spark, dir)
    val out = TextAnalysis.heapsCurve(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .sortBy(_._1)
    assert(out.length == 8 && out.map(_._1).toSeq == (0L to 7L))
    // prefixes grow monotonically in every axis
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2 && b._3 > a._3 && b._4 >= a._4, s"$a -> $b") }
    // the last checkpoint IS the corpus
    val (nd, nt, nv) = (docs.count(),
      docs.agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0),
      docs.select(explode(split(col("text"), " "))).distinct().count())
    assert(out.last._2 == nd && out.last._3 == nt && out.last._4 == nv)
    // β defined everywhere past the first row, NaN only there
    assert(out.head._5.isNaN)
    out.tail.foreach { case (c, _, _, _, b) =>
      assert(!b.isNaN && b >= 0.0 && b <= 1.0, s"chk $c beta $b") }
  }

  test("bm25 index: indexed scores are bit-identical to the batch kernel, absent terms included; the freshness gate sees growth") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("graft-bm25-")
    TextAnalysis.saveBm25Index(docs, path)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val terms = Seq("table", "query", "spark")
    assert(scores(TextAnalysis.bm25Indexed(spark, path, terms)) ==
      scores(TextAnalysis.bm25(docs, terms)),
      "indexed scores must be bit-identical to the batch kernel")
    // a term absent from the corpus takes the zero-tf form in both
    val t2 = Seq("table", "zzz_not_in_corpus")
    assert(scores(TextAnalysis.bm25Indexed(spark, path, t2)) ==
      scores(TextAnalysis.bm25(docs, t2)))
    // all-absent query: every doc scores exactly 0.0 (empty probe guarded)
    val t3 = Seq("zzz_not_in_corpus")
    val z = scores(TextAnalysis.bm25Indexed(spark, path, t3))
    assert(z.size == docs.count() && z.values.forall(_ == 0.0))
    // the freshness gate sees a grown corpus (round 13 added the
    // append arm — Round13OpsSpec pins append ≡ rebuild; this guard
    // remains what keeps a STALE serve loud for consumers that demand
    // freshness)
    assert(IndexManifest.isFresh(path, docs, "doc_id"))
    assert(!IndexManifest.isFresh(path,
      docs.unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))), "doc_id"))
  }

  test("full curation (d85): the composed verdict equals its standalone legs doc-for-doc over exactly the train split") {
    val docs = Tables.documents(spark, dir)
    val out = graft.SparkEntry.queries("d85_full_curation")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getString(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    val train = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.keySet == train, "one verdict row per train doc, none else")
    // legs recomputed standalone
    val tiers = TextAnalysis.perplexityTiers(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val cls = Classifier.classifySelectTop(docs, col("lang") === "en", 64, 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    out.foreach { case (id, (ck, tier, ckls, sel)) =>
      assert(tier == tiers(id), s"doc $id tier")
      assert(ckls == cls(id), s"doc $id classifier")
      assert(sel == (ck && tier != "tail" && ckls), s"doc $id selection")
    }
    // the classifier budget cut takes exactly the top half by margin
    val n = cls.size
    assert(cls.values.count(identity) == (n + 1) / 2 ||
      cls.values.count(identity) == n / 2, s"cut size off: ${cls.values.count(identity)} of $n")
    // the composition must actually divide the corpus somewhere
    assert(out.values.exists(!_._4))
    assert(cls.values.exists(identity) && tiers.values.exists(_ != "tail"))
  }

  test("lshBandCurve: nondecreasing by construction; mid-Jaccard fixtures grade the curve; corpus twins stay full-recall") {
    import spark.implicits._
    // 40 pairs at j ≈ 0.58 (30 of 40 words shared): the banding hit law
    // 1-(1-j^4)^b must show through as a strictly graded curve
    val docs = (0 until 40).flatMap { i =>
      val shared = (1 to 40).map(w => s"p${i}w$w")
      Seq((2L * i, shared.mkString(" ")),
        (2L * i + 1, (shared.take(30) ++ (1 to 10).map(u => s"p${i}u$u"))
          .mkString(" ")))
    }.toDF("doc_id", "text")
    val curve = Dedup.lshBandCurve(docs, Seq(2, 4, 8, 16), 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(curve.map(_._2).distinct.length == 1 && curve.head._2 == 40L,
      s"truth must be the 40 constructed pairs: ${curve.toSeq}")
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"curve must be nondecreasing: ${curve.toSeq}") }
    assert(curve.last._3 > curve.head._3,
      s"mid-Jaccard pairs must grade the curve: ${curve.toSeq}")
    assert(curve.forall(r => r._4 == r._3.toDouble / r._2))

    // corpus slice: the registered flat-1.0 regime (twins band everywhere)
    val corpus = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val reg = Dedup.lshBandCurve(corpus, Seq(2, 16), 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(reg.forall(_._2 == 1.0), s"corpus twins must band everywhere: ${reg.toSeq}")
  }

  test("unimaxSelect: per stratum, selection is the budget-cut prefix of the shuffled stream; epochs >= 1 selects everything") {
    val docs = TextAnalysis.langId(Tables.documents(spark, dir))
    val alloc = Curation.unimaxMixture(docs, col("pred_lang"), 0.48, 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val sel = Curation.unimaxSelect(docs, col("pred_lang"), 0.48, 0.5)
      .collect().map(r => (r.getString(1),
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4))))
    assert(sel.nonEmpty)
    sel.groupBy(_._1).foreach { case (stratum, rows) =>
      val a = alloc(stratum)
      val docsIn = rows.map(_._2).sortBy(_._3)
      // selection = exactly the start < alloc prefix of the ordered stream
      docsIn.foreach { case (id, n, st, s) =>
        assert(s == (st.toDouble < a), s"$stratum doc $id") }
      // positions tile the stratum stream exactly
      docsIn.foldLeft(0L) { case (exp, (_, n, st, _)) =>
        assert(st == exp, s"$stratum gap at $st"); st + n }
      // budget honored up to one boundary-doc tail
      val kept = docsIn.filter(_._4)
      assert(kept.nonEmpty, s"$stratum kept nothing")
      val keptTok = kept.map(_._2).sum
      assert(keptTok.toDouble >= a || kept.size == docsIn.size,
        s"$stratum under-filled: $keptTok < $a with docs left")
      assert(keptTok.toDouble - a < kept.map(_._2).max.toDouble,
        s"$stratum overshoot beyond the boundary doc")
    }
    // a budget past every cap: epochs >= 1 per stratum selects ALL docs
    val all = Curation.unimaxSelect(docs, col("pred_lang"), 10.0, 2.0)
      .collect()
    assert(all.forall(_.getBoolean(4)), "epochs >= 1 must select everything")
  }

  test("interleavedPack: windows tile exactly, per-doc media/text budgets are conserved, and media occupies the doc prefix") {
    val docs = Tables.documents(spark, dir)
    val ctx = 128
    val out = Packing.interleavedPack(docs, ctx, 256, 4, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, co, dof, len, ml, tl) =>
      assert(len >= 1 && ml >= 0 && tl >= 0 && ml + tl == len)
      assert(co >= 0 && co + len <= ctx, s"span leaves its window: $co+$len")
      assert(dof >= 0)
    }
    // every window except the last is exactly full
    val byCtx = out.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val lastCtx = byCtx.keys.max
    byCtx.foreach { case (c, tot) =>
      if (c != lastCtx) assert(tot == ctx, s"ctx $c holds $tot of $ctx") }
    // per-doc budgets: Σ media_len = n_media, Σ text_len = n_text
    val expected = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_text"),
        expr("(((octet_length(cast(text AS BINARY)) div 256) + 3) div 4) * 16")
          .cast("long").as("n_media")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.groupBy(_._1).foreach { case (id, spans) =>
      val (nText, nMedia) = expected(id)
      assert(spans.map(_._6).sum == nMedia, s"doc $id media budget")
      assert(spans.map(_._7).sum == nText, s"doc $id text budget")
      // media-first: sorted by doc_offset, media_len fills before text
      val sorted = spans.sortBy(_._4)
      sorted.foreach { case (_, _, _, dof, len, ml, _) =>
        assert(ml == math.min(math.max(nMedia - dof, 0L), len),
          s"doc $id span at $dof: media $ml not the prefix overlap")
      }
    }
  }
}
