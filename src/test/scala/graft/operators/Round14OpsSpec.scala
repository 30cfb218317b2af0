package graft.operators

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 specs: the optimization-round contract pins — the spectral
  * store's dense-embedding contract (round-13 advice #2: a NULL/empty
  * or short embedding row must fail LOUDLY instead of silently making
  * the stats' n diverge from the manifest's row accounting), and the
  * fused srpRadiusCurve (one finest-level block join + per-radius
  * filters) against the per-arm srpBucketTopK loop it replaced.
  */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def vec(seed: Int, dims: Int): Seq[Double] =
    (1 to dims).map(j => ((seed * 31 + j * 7) % 13 - 6) / 7.0)

  test("spectral store: an EMPTY embedding row fails loudly, not a silent n drift") {
    import spark.implicits._
    val emb = Seq(
      (1L, vec(1, 8)), (2L, vec(2, 8)), (3L, Seq.empty[Double]))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.saveSpectralIndex(emb, tmp("r14-spectral-empty"), 8)
    }
    // the contract names the failure: rows vs contributing rows
    assert(e.getMessage.contains("dense"), e.getMessage)
  }

  test("spectral store: a SHORT embedding row fails loudly, not polluted low-index sums") {
    import spark.implicits._
    val emb = Seq(
      (1L, vec(1, 8)), (2L, vec(2, 8)), (3L, vec(3, 4)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.saveSpectralIndex(emb, tmp("r14-spectral-short"), 8)
    }
    assert(e.getMessage.contains("shorter"), e.getMessage)
  }

  test("spectral append: a non-dense increment fails loudly under the same contract") {
    import spark.implicits._
    val history = Seq((1L, vec(1, 8)), (2L, vec(2, 8)))
      .toDF("vec_id", "embedding")
    val path = tmp("r14-spectral-append")
    Similarity.saveSpectralIndex(history, path, 8)
    val inc = Seq((5L, vec(5, 8)), (6L, Seq.empty[Double]))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.appendSpectralIndex(inc, path)
    }
    assert(e.getMessage.contains("dense"), e.getMessage)
  }

  test("lshBandCurve: each fused arm equals the production lshCandidates kernel") {
    // the fused deepest-prefix join tags pairs with min(bno); arm nb
    // must equal the candidate set the PUBLIC lshCandidates kernel
    // computes over bands 0..nb-1 — pinned cross-kernel so the inlined
    // fused copy cannot silently drift from the production path it
    // claims to measure (round-14 review finding)
    val docs = graft.sources.Tables.documents(spark, dir)
    val bandCounts = Seq(2, 4, 8)
    val curve = Dedup.lshBandCurve(docs, bandCounts, 64, 16, 0.5, 1000L, 10000L)
      .orderBy(col("n_bands")).collect()
    val truth = Dedup.jaccardAll(docs, 0.5, 10000L)
      .select(col("doc_a").as("a"), col("doc_b").as("b")).localCheckpoint(true)
    val banded =
      Dedup.bandKeys(Dedup.minhash(Dedup.hashedShingles(docs), 64), 64, 16)
    val nTruth = truth.count()
    assert(nTruth > 0, "fixture must plant >= threshold pairs")
    bandCounts.zip(curve).foreach { case (nb, row) =>
      val refFound = truth.join(Dedup.lshCandidates(banded, nb, 1000L),
        Seq("a", "b"), "left_semi").count()
      assert(row.getLong(0) == nb.toLong)
      assert(row.getLong(1) == nTruth, s"n_truth at nb=$nb")
      assert(row.getLong(2) == refFound,
        s"n_found at nb=$nb: fused=${row.getLong(2)} ref=$refFound")
    }
  }

  test("ivfProbeCurve: each fused arm equals the production ivfSq8TopK kernel") {
    // same cross-kernel pin for the IVF curve: the fused pair pass's
    // per-arm (n_queries, n_hits) must equal a recall computed from the
    // PUBLIC ivfSq8TopK the curve claims to sweep
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val (k, cells) = (3, 16)
    val probes = Seq(2, 4)
    val curve = Similarity.ivfProbeCurve(emb, pred, k, cells, probes)
      .orderBy(col("probes")).collect()
    val exact = Similarity.cosineTopK(emb, pred, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val nQueries = exact.select(col("query_id")).distinct().count()
    probes.zip(curve).foreach { case (p, row) =>
      val arm = Similarity.ivfSq8TopK(emb, pred, k, cells, p)
        .select(col("query_id"), col("neighbor_id"))
      val hits =
        exact.join(arm, Seq("query_id", "neighbor_id"), "left_semi").count()
      assert(row.getLong(0) == p.toLong)
      assert(row.getLong(1) == nQueries)
      assert(row.getLong(2) == hits,
        s"n_hits at probes=$p: fused=${row.getLong(2)} ref=$hits")
    }
  }

  test("srpRadiusCurve: the fused path equals the per-arm loop row for row") {
    // outDims = 12 admits a NON-nesting radius pair (2, 3): block widths
    // 4 and 3, 4 % 3 != 0 — that list takes the original per-arm
    // srpBucketTopK loop. Each SINGLETON list nests trivially and takes
    // the fused path. Equal rows pin fused ≡ per-arm on real data.
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val loop = Similarity.srpRadiusCurve(emb, pred, 3, 12, Seq(2, 3))
      .orderBy(col("radius")).collect()
    val fused = Seq(2, 3).map { r =>
      Similarity.srpRadiusCurve(emb, pred, 3, 12, Seq(r)).collect()(0)
    }
    assert(loop.length == 2 && fused.length == 2)
    loop.zip(fused).foreach { case (a, b) =>
      assert(a == b, s"fused row $b != per-arm row $a")
    }
  }
}
