package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 text-statistics + positional-retrieval ops: Zipf fit (d98),
  * Count-Min estimates (d99), phrase search over the positional index
  * (d100). Properties the oracle rows cannot see: CMS one-sidedness and
  * width monotonicity, phrase-match exactness on constructed fixtures,
  * bucket pruning on the probe plan.
  */
class TextStatsPhraseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("zipfSlope: one-row fit, negative slope on natural-ish text, alpha = -slope") {
    val r = TextAnalysis.zipfSlope(docs, 100).collect()
    assert(r.length == 1)
    val row = r.head
    val slope = row.getAs[Double]("slope")
    assert(slope < 0.0, s"frequency must fall with rank, slope=$slope")
    assert(row.getAs[Double]("alpha") == -slope)
    assert(row.getAs[Long]("n_words") >= 2L)
  }

  test("countMin: estimates are one-sided (est >= truth) and tighten with width") {
    val terms = Seq("the", "spark", "hash", "zzz")
    def estOf(width: Int): Map[String, Long] =
      TextAnalysis.countMinEstimate(docs, terms, 4, width).collect()
        .map(r => r.getAs[String]("term") -> r.getAs[Long]("est")).toMap
    val out = TextAnalysis.countMinEstimate(docs, terms, 4, 64).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("true_cnt"),
        s"CMS must overestimate: ${r}")
    }
    assert(out.find(_.getAs[String]("term") == "zzz")
      .get.getAs[Long]("true_cnt") == 0L)
    val narrow = estOf(64)
    val wide = estOf(8192)
    terms.foreach { t =>
      assert(wide(t) <= narrow(t), s"$t: wider sketch must not be looser")
    }
    // at width 8192 on a 31-word vocabulary collisions are (nearly)
    // impossible — the estimate should be exact for present terms
    val truth = out.map(r => r.getAs[String]("term") -> r.getAs[Long]("true_cnt")).toMap
    terms.filter(truth(_) > 0).foreach(t => assert(wide(t) == truth(t)))
  }

  test("phraseSearchIndexed: exact adjacency on constructed docs, repeated terms included") {
    import spark.implicits._
    val fix = Seq(
      (1L, "a b c a b c"),   // "a b" at 0 and 3; "a b c" at 0 and 3
      (2L, "a a a"),          // "a a" at 0 and 1 (overlapping)
      (3L, "b a c b"),        // no "a b"
      (4L, "x a b y")         // "a b" at 1
    ).toDF("doc_id", "text")
    val path = tmp("graft-pos-")
    TextAnalysis.savePositionalIndex(fix, path, termBuckets = 4)
    def got(phrase: Seq[String]): Map[Long, (Long, Long)] =
      TextAnalysis.phraseSearchIndexed(spark, path, phrase).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    assert(got(Seq("a", "b")) == Map(1L -> (2L, 0L), 4L -> (1L, 1L)))
    assert(got(Seq("a", "b", "c")) == Map(1L -> (2L, 0L)))
    // overlapping occurrences of a repeated-term phrase both count
    assert(got(Seq("a", "a")) == Map(2L -> (2L, 0L)))
    // a phrase whose terms all exist but never adjacently matches nothing
    assert(got(Seq("c", "x")).isEmpty)
  }

  test("d100 probe: bucket literals land in PartitionFilters; term filter pushes") {
    val path = tmp("graft-posbig-")
    TextAnalysis.savePositionalIndex(docs, path, termBuckets = 16)
    val df = TextAnalysis.phraseSearchIndexed(spark, path, Seq("order", "fast"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*tb#".r.findFirstIn(p).isDefined,
      "probed-bucket literals must prune at the file index\n" + p.take(3000))
    assert("PushedFilters: \\[[^\\]]*(In|EqualTo)\\(term".r.findFirstIn(p).isDefined,
      "phrase-term filter must push into the postings scan\n" + p.take(3000))
    // and the matches agree with a direct batch computation
    val direct = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val a = direct.filter(col("term") === "order")
      .select(col("doc_id"), col("pos"))
    val b = direct.filter(col("term") === "fast")
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    val want = a.join(b, Seq("doc_id", "pos")).groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).cast("long").as("first_pos"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    val gotMap = df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    assert(gotMap == want)
  }
}
