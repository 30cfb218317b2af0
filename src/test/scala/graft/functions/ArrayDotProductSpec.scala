package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

class ArrayDotProductSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the HOF formulation bit-for-bit on well-formed input") {
    val df = Seq((Seq(1.5, -2.25, 3.0), Seq(0.5, 4.0, -1.25))).toDF("a", "b")
    val (native, hof) = df.select(
      ArrayDotProduct(col("a"), col("b")),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
      .as[(Double, Double)].head()
    assert(native == hof)
  }

  test("ragged arrays yield NULL, not a truncated score") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val got = df.select(ArrayDotProduct(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("NULL input arrays yield NULL") {
    val df = Seq((Option.empty[Seq[Double]], Option(Seq(1.0)))).toDF("a", "b")
    val got = df.select(ArrayDotProduct(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(got.isEmpty)
  }
}
