package graft.operators

import graft.SparkTestSession
import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewAndAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join ≡ plain inner join (skewed key spread over salts)") {
    // 10k rows of one hot key + a tail
    val left = (Seq.fill(10000)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val right = Seq(("hot", 1), ("a", 2), ("z", 9)).toDF("k", "v")
    val plain = left.join(right, Seq("k")).groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", factor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val p = plain.orderBy("k").as[(String, Long, Long)].collect().toSeq
    val s = salted.orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(p == s)
    assert(p.exists(_._1 == "hot"))
  }

  test("MinHashAgg (typed Aggregator) matches the Column-API minhash") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different words in this one here friend")
    ).toDF("doc_id", "text")
    val k = 4
    val sh = Dedup.shingles(docs)

    val viaColumns = Dedup.minhash(Dedup.hashedShingles(docs), k)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), (1 to k).map(r.getLong)))

    val agg = new MinHashAgg[(Long, String)](k, _._2).toColumn.name("sig")
    val viaAggregator = sh.as[(Long, String)]
      .groupByKey(_._1)
      .agg(agg)
      .collect()
      .sortBy(_._1)

    viaAggregator.zip(viaColumns).foreach { case ((id1, sig), (id2, cols)) =>
      assert(id1 == id2)
      assert(sig.toSeq == cols.toSeq)
    }
  }
}
