package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary over the driver-generated testdata (TESTDATA.md).
  *
  * Round 9 lost 21 oracle rows at driver-bench time because a testdata
  * regeneration silently changed `events.ts` from parquet TIMESTAMP(NANOS)
  * to timestamp[us] and nothing in `sbt test` touched the real files. This
  * suite opens every `/root/testdata/sf0.001` table and asserts exactly the
  * envelope the registered queries assume, so the NEXT regeneration fails
  * loudly here instead of silently zeroing a round's correctness record.
  *
  * Deliberately reads the real driver files (not in-memory frames) — that
  * is the point of the canary. sf0.001 keeps it sub-second.
  */
class TestdataCanarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    Tables.load(spark, dir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: ts normalizes to nanosecond Longs; envelope columns present") {
    val raw = fields("events")
    assert(Set("event_id", "ts", "user_id", "event_type", "props").subsetOf(raw.keySet),
      s"events columns drifted: ${raw.keySet}")
    assert(raw("event_id") == LongType && raw("user_id") == LongType)
    assert(raw("event_type") == StringType && raw("props") == StringType)
    // ts may be nanos-Long (nanosAsLong conf) or timestamp[us]; either way
    // Tables.events must hand every consumer a LongType nanos column.
    val norm = Tables.events(spark, dir)
    assert(norm.schema("ts").dataType == LongType,
      s"Tables.events did not normalize ts (raw=${raw("ts")}, norm=${norm.schema("ts").dataType})")
    // and the values must be epoch NANOSECONDS (2020–2040 ⇒ ~1.5e18–2.3e18),
    // not seconds/millis/micros — a wrong unit would pass the type check but
    // shift every created_utc by 10^3..10^9
    import org.apache.spark.sql.functions._
    val Seq(lo, hi) = norm.agg(min("ts"), max("ts")).collect()(0).toSeq.map(_.asInstanceOf[Long])
    assert(lo > 1_000_000_000_000_000_000L && hi < 4_000_000_000_000_000_000L,
      s"events.ts range [$lo, $hi] is not epoch nanoseconds")
  }

  test("documents: text corpus columns the d-family assumes") {
    val f = fields("documents")
    assert(Set("doc_id", "text", "lang", "source", "n_chars").subsetOf(f.keySet),
      s"documents columns drifted: ${f.keySet}")
    assert(f("doc_id") == LongType && f("text") == StringType)
    assert(f("lang") == StringType && f("source") == StringType)
  }

  test("embeddings: vector column the e-family assumes (width 64 floats)") {
    val f = fields("embeddings")
    assert(Set("vec_id", "embedding", "label").subsetOf(f.keySet),
      s"embeddings columns drifted: ${f.keySet}")
    assert(f("vec_id") == LongType)
    assert(f("embedding") == ArrayType(FloatType, containsNull = true) ||
      f("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding is ${f("embedding")}, expected array<float>")
    import org.apache.spark.sql.functions._
    val widths = Tables.embeddings(spark, dir)
      .select(size(col("embedding")).as("w")).distinct().collect().map(_.getInt(0)).toSet
    assert(widths == Set(64), s"embedding widths drifted: $widths (queries assume 64)")
  }

  test("relational tables: key columns the q-family assumes") {
    assert(Set("l_orderkey", "l_quantity", "l_returnflag", "l_extendedprice")
      .subsetOf(fields("lineitem").keySet))
    assert(Set("o_orderkey", "o_custkey", "o_totalprice").subsetOf(fields("orders").keySet))
    assert(Set("c_custkey", "c_nationkey").subsetOf(fields("customer").keySet))
    assert(Set("n_nationkey", "n_regionkey").subsetOf(fields("nation").keySet))
  }
}
