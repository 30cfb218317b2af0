package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JsonKeySubsetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(json: String, keys: Seq[String]): Option[String] =
    Seq(json).toDF("j")
      .select(JsonKeySubset(col("j"), keys).as("out"))
      .as[Option[String]].head()

  test("preserves value types (numbers, bools, nested, null)") {
    val j = """{"a":1,"b":"s","c":true,"d":{"x":[1,2]},"e":null}"""
    assert(run(j, Seq("a", "c", "d", "e")) ==
      Some("""{"a":1,"c":true,"d":{"x":[1,2]},"e":null}"""))
  }

  test("output key order follows the PAYLOAD (sse.py:237), absent keys dropped silently") {
    assert(run("""{"a":1,"b":2}""", Seq("b", "zzz", "a")) == Some("""{"a":1,"b":2}"""))
    assert(run("""{"b":2,"a":1}""", Seq("a", "b")) == Some("""{"b":2,"a":1}"""))
  }

  test("empty selection → empty object") {
    assert(run("""{"a":1}""", Seq("nope")) == Some("{}"))
  }

  test("malformed payload → NULL (documented deviation: reference raises)") {
    assert(run("""{"a": """, Seq("a")).isEmpty)
    assert(run("""[1,2,3]""", Seq("a")).isEmpty)
  }

  test("NULL input → NULL") {
    val out = Seq(Option.empty[String]).toDF("j")
      .select(JsonKeySubset(col("j"), Seq("a")).as("out"))
      .as[Option[String]].head()
    assert(out.isEmpty)
  }
}
