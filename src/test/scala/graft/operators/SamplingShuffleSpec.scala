package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 loader-side sampling ops: the deterministic epoch shuffle
  * (d95), the hash train/val/test split (d96), and systematic
  * token-proportional resampling (d97). Each test pins a property the
  * oracle row cannot see (balance bounds, growth stability,
  * multiplicity bounds).
  */
class SamplingShuffleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  test("epochShuffle: each epoch is a contiguous permutation, shards balance to ±1, epochs reorder") {
    val epochs = 3
    val nShards = 4
    val out = Sampling.epochShuffle(docs, epochs, nShards).cache()
    val n = docs.count()
    assert(out.count() == n * epochs)
    // rk is 1..N per epoch with no gaps or dups
    val perEpoch = out.groupBy("epoch")
      .agg(count(lit(1)).as("c"), countDistinct(col("rk")).as("d"),
        min(col("rk")).as("mn"), max(col("rk")).as("mx"))
      .collect()
    assert(perEpoch.length == epochs)
    perEpoch.foreach { r =>
      assert(r.getAs[Long]("c") == n && r.getAs[Long]("d") == n)
      assert(r.getAs[Long]("mn") == 1L && r.getAs[Long]("mx") == n)
    }
    // round-robin shard sizes differ by at most 1 within every epoch
    val shardCounts = out.groupBy("epoch", "shard").agg(count(lit(1)).as("c"))
      .groupBy("epoch").agg((max(col("c")) - min(col("c"))).as("spread"))
      .collect()
    shardCounts.foreach(r => assert(r.getAs[Long]("spread") <= 1L))
    // epoch 0 and epoch 1 are genuinely different permutations
    val disagree = out.filter(col("epoch") === 0).select(col("doc_id"), col("rk"))
      .join(out.filter(col("epoch") === 1)
        .select(col("doc_id"), col("rk").as("rk1")), "doc_id")
      .filter(col("rk") =!= col("rk1")).count()
    assert(disagree > n / 2, s"epochs nearly identical: only $disagree moved")
    out.unpersist()
  }

  test("hashSplit: disjoint+exhaustive, near-target fractions, stable under corpus growth") {
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.hashSplit(docs, "v1", fracs).cache()
    val n = docs.count()
    assert(out.count() == n) // one row per doc: exhaustive
    assert(out.select("doc_id").distinct().count() == n) // disjoint
    val byName = out.groupBy("split").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("c")).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    // hash-uniformity at N=600: generous ±8 percentage-point tolerance
    fracs.foreach { case (nm, f) =>
      val got = byName(nm).toDouble / n
      assert(math.abs(got - f) < 0.08, s"$nm: got $got want ~$f")
    }
    // growth stability: the half-corpus assignment agrees with the full
    val half = Sampling.hashSplit(docs.filter(col("doc_id") % 2 === 0), "v1", fracs)
    val moved = half.withColumnRenamed("split", "s2")
      .join(out, "doc_id").filter(col("s2") =!= col("split")).count()
    assert(moved == 0L)
    // re-salting redraws: some docs must change split
    val resalted = Sampling.hashSplit(docs, "v2", fracs)
      .withColumnRenamed("split", "s2")
      .join(out, "doc_id").filter(col("s2") =!= col("split")).count()
    assert(resalted > 0L)
    out.unpersist()
  }

  test("splitCuts: fractions must sum to 1; final cut covers the full hash space") {
    intercept[IllegalArgumentException] {
      Sampling.splitCuts(Seq("a" -> 0.5, "b" -> 0.4))
    }
    val cuts = Sampling.splitCuts(Seq("a" -> 0.25, "b" -> 0.75))
    assert(cuts.last._2 == (1L << 60))
    assert(cuts.head._2 == (1L << 58)) // 0.25 * 2^60 exactly
  }

  test("systematicResample: exactly n draws, per-doc multiplicity within floor/ceil of n*w/W") {
    val n = 50
    val out = Sampling.systematicResample(docs, n).cache()
    assert(out.count() == n.toLong)
    assert(out.select("sample_id").distinct().count() == n.toLong)
    val w = Packing.tokenOffsets(docs)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    val mult = out.groupBy("doc_id", "n_tokens").agg(count(lit(1)).as("m"))
      .collect()
    mult.foreach { r =>
      val exp = n.toDouble * r.getAs[Long]("n_tokens") / w
      val m = r.getAs[Long]("m")
      assert(m >= math.floor(exp) && m <= math.ceil(exp) + 1,
        s"doc ${r.getAs[Long]("doc_id")}: multiplicity $m vs expectation $exp")
    }
    // determinism: a second run is row-identical
    val again = Sampling.systematicResample(docs, n)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    out.unpersist()
  }
}
