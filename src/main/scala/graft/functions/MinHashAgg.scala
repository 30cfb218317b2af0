package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.1): a k-wide MinHash signature as an
  * `Aggregator[IN, BUF, OUT]` — the user-facing custom-aggregate API.
  *
  * Produces exactly the same signature as the Column-API formulation in
  * [[graft.operators.Dedup.minhash]] (mh_i = min over shingles of
  * md5("i|" ++ shingle)), so the same DuckDB oracle validates both.
  * The buffer is a fixed k-array of current minima — associative and
  * commutative, so Spark can partial-aggregate map-side and merge across
  * partitions, the shape any 100 TB aggregation needs.
  */
class MinHashAgg[I](k: Int, shingleOf: I => String)
    extends Aggregator[I, Array[String], Array[String]] {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], row: I): Array[String] = {
    val shingle = shingleOf(row)
    var i = 0
    while (i < k) {
      val h = md5hex(s"$i|$shingle")
      if (buf(i) == null || h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf
  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
