package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lastEarlier: latest right at-or-before each left, inclusive ties, NULL when none") {
    val left = Seq(
      (1L, 10L, "l-a"),   // before any right row of key 1 → NULL
      (1L, 20L, "l-b"),   // tie with right@20 → matched (inclusive)
      (1L, 35L, "l-c"),   // right@30 wins over right@20
      (2L, 99L, "l-d")    // key 2 has no right rows at all → NULL
    ).toDF("k", "t", "lp")
    val right = Seq(
      (1L, 20L, 2.0),
      (1L, 30L, 3.0),
      (1L, 50L, 5.0)      // after everything → never matched
    ).toDF("k", "t", "v")

    val got = AsOfJoin.lastEarlier(left, right, "k", "t", Seq("v"))
      .select("lp", "asof_time", "asof_v")
      .as[(String, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq

    assert(got == Seq(
      ("l-a", None, None),
      ("l-b", Some(20L), Some(2.0)),
      ("l-c", Some(30L), Some(3.0)),
      ("l-d", None, None)))
  }

  test("NULL right-payload columns do not tear the matched row apart") {
    // the matched row (t=30) carries a NULL payload; a per-column fill
    // would resurrect t=20's value next to t=30's timestamp
    val left = Seq((1L, 40L, "l")).toDF("k", "t", "lp")
    val right = Seq((1L, 20L, Option(2.0)), (1L, 30L, Option.empty[Double]))
      .toDF("k", "t", "v")
    val got = AsOfJoin.lastEarlier(left, right, "k", "t", Seq("v"))
      .select("asof_time", "asof_v")
      .as[(Option[Long], Option[Double])].head()
    assert(got == (Some(30L), None))
  }
}
