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
}
