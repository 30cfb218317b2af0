package graft.plans

import graft.{GraftExtensions, SparkTestSession}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injectOptimizerRule hook: a naive BETWEEN-style interval join,
  * written the way a user would write it, must plan as the bin-bucketed
  * equi-join (never a nested loop) once the rule is installed and the
  * bin width set — with results identical to the un-rewritten query.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    val base = SparkTestSession.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions()).getOrCreate()
    try f(s)
    finally {
      s.conf.unset("spark.graft.rangeJoin.binWidth")
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def intervals(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, 1L, 5L, 15L), (2L, 1L, 10L, 20L), (3L, 2L, 7L, 34L), (4L, 1L, 40L, 40L))
      .toDF("iid", "k", "lo", "hi")
  }
  private def points(s: SparkSession): DataFrame = {
    import s.implicits._
    (0L to 45L).flatMap(t => Seq((100 + t, 1L, t), (200 + t, 2L, t)))
      .toDF("pid", "k", "ts")
  }

  private def naive(s: SparkSession): DataFrame =
    intervals(s).join(points(s),
      col("k") === points(s)("k") && col("ts") >= col("lo") && col("ts") < col("hi"))

  test("naive interval join rewrites to a bin equi-join with identical results") {
    withExtSession { s =>
      import s.implicits._
      val i = intervals(s).as("i")
      val p = points(s).as("p")
      // queryExecution caches plans per DataFrame — rebuild after each
      // conf change or the "off" plan gets frozen in
      def q = i.join(p, $"i.k" === $"p.k" && $"p.ts" >= $"i.lo" && $"p.ts" < $"i.hi")
        .select($"iid", $"pid", $"p.ts")

      // rule off (no bin width): Spark hash-joins on k alone and drags
      // the range as a RESIDUAL — every (interval, point) pair of a key
      // is still compared, the low-cardinality-key blowup at scale
      s.conf.unset("spark.graft.rangeJoin.binWidth")
      val offPlan = q.queryExecution.executedPlan.toString
      assert(!offPlan.contains("__graft_bin"))
      val expected = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expected.nonEmpty)

      // rule on: the join key tightens to (k, bin), same rows
      s.conf.set("spark.graft.rangeJoin.binWidth", "10")
      val onPlan = q.queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin") && !onPlan.contains("Cartesian"),
        "rewrite must not nested-loop\n" + onPlan.take(1500))
      assert(onPlan.contains("__graft_bin"), "bin key missing from the rewritten plan\n" + onPlan.take(1500))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    }
  }

  test("with NO equi key the naive plan is a nested loop; the rewrite replaces it") {
    withExtSession { s =>
      import s.implicits._
      // single-key data (drop k): containment is the ONLY condition
      val i = intervals(s).filter($"k" === 1L).select($"iid", $"lo", $"hi")
      val p = points(s).filter($"k" === 1L).select($"pid", $"ts")
      def q = i.join(p, $"ts" >= $"lo" && $"ts" < $"hi").select($"iid", $"pid", $"ts")
      s.conf.unset("spark.graft.rangeJoin.binWidth")
      val offPlan = q.queryExecution.executedPlan.toString
      assert(offPlan.contains("BroadcastNestedLoopJoin"),
        "precondition: containment-only joins nested-loop without the rule\n" + offPlan.take(1500))
      val expected = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      s.conf.set("spark.graft.rangeJoin.binWidth", "10")
      val onPlan = q.queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin") && onPlan.contains("__graft_bin"),
        "rewrite must replace the nested loop with the bin equi-join\n" + onPlan.take(1500))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    }
  }

  test("rewrite handles the swapped orientation (points on the left)") {
    withExtSession { s =>
      import s.implicits._
      val i = intervals(s).as("i")
      val p = points(s).as("p")
      def q = p.join(i, $"i.k" === $"p.k" && $"p.ts" >= $"i.lo" && $"p.ts" < $"i.hi")
        .select($"iid", $"pid", $"p.ts")
      s.conf.unset("spark.graft.rangeJoin.binWidth")
      val expected = q.collect().toSeq.map(_.toSeq).sortBy(_.toString)
      s.conf.set("spark.graft.rangeJoin.binWidth", "10")
      val onPlan = q.queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin") && onPlan.contains("__graft_bin"))
      assert(q.collect().toSeq.map(_.toSeq).sortBy(_.toString) == expected)
    }
  }

  test("inverted intervals (lo > hi) bin to an empty sequence, not descending bins") {
    withExtSession { s =>
      import s.implicits._
      // before the guard, Sequence auto-stepped -1 over the inverted
      // range and generated spurious candidate bins (correct after the
      // exact filter, but wasted join work — and a huge inverted span
      // would explode). Now: zero bins, zero candidates, same rows.
      val i = Seq((1L, 1L, 20L, 10L), (2L, 1L, 5L, 15L))
        .toDF("iid", "k", "lo", "hi").as("i")
      val p = points(s).as("p")
      def q = i.join(p, $"i.k" === $"p.k" && $"p.ts" >= $"i.lo" && $"p.ts" < $"i.hi")
        .select($"iid", $"pid")
      s.conf.unset("spark.graft.rangeJoin.binWidth")
      val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.nonEmpty && expected.forall(_._1 == 2L),
        "precondition: the inverted interval matches nothing")
      s.conf.set("spark.graft.rangeJoin.binWidth", "10")
      assert(q.queryExecution.executedPlan.toString.contains("__graft_bin"))
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    }
  }

  test("an interval spanning more than maxBins fails fast with a remediation-pointing error") {
    withExtSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.rangeJoin.binWidth", "1")
      s.conf.set("spark.graft.rangeJoin.maxBins", "10")
      try {
        val i = Seq((1L, 1L, 0L, 100000L)).toDF("iid", "k", "lo", "hi").as("i")
        val p = points(s).as("p")
        val q = i.join(p, $"i.k" === $"p.k" && $"p.ts" >= $"i.lo" && $"p.ts" < $"i.hi")
          .select($"iid", $"pid")
        assert(q.queryExecution.executedPlan.toString.contains("__graft_bin"),
          "precondition: the rewrite fired")
        val e = intercept[Throwable](q.collect())
        val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .flatMap(t => Option(t.getMessage)).mkString(" | ")
        assert(messages.contains("rangeJoin"),
          s"error must point at the binWidth/maxBins confs, got: $messages")
      } finally s.conf.unset("spark.graft.rangeJoin.maxBins")
    }
  }

  test("hand-built RangeJoin plans are left alone (idempotence guard on __bin keys)") {
    withExtSession { s =>
      s.conf.set("spark.graft.rangeJoin.binWidth", "10")
      val out = graft.operators.RangeJoin.pointInInterval(
        intervals(s), points(s).withColumnRenamed("ts", "pts"),
        Seq("k"), "lo", "hi", "pts", binWidth = 10L)
      // exactly one Generate (the operator's own explode) — a second one
      // would mean the rule re-binned the already-binned join
      val gens = "Generate".r.findAllIn(out.queryExecution.executedPlan.toString).length
      assert(gens == 1, s"expected 1 explode, found $gens — rule re-binned a binned plan")
      assert(out.count() > 0)
    }
  }
}
