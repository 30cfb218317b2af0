package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.1): a k-wide MinHash signature as an
  * `Aggregator[IN, BUF, OUT]` — the user-facing custom-aggregate API.
  *
  * Produces exactly the same signature as the Column-API formulation in
  * [[graft.operators.Dedup.minhash]] (one md5 per shingle → 60-bit base
  * value → k universal-hash permutations mod P), so the same DuckDB
  * oracle validates both. The buffer is a fixed k-array of current
  * minima — associative and commutative, so Spark can partial-aggregate
  * map-side and merge across partitions, the shape any 100 TB
  * aggregation needs.
  */
class MinHashAgg[I](k: Int, shingleOf: I => String)
    extends Aggregator[I, Array[Long], Array[Long]] {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  private val params: Array[(Long, Long)] =
    (0 until k).map(Dedup.hashParams).toArray

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], row: I): Array[Long] = {
    val h = java.lang.Long.parseLong(md5hex(shingleOf(row)).substring(0, 15), 16) % Dedup.HashP
    var i = 0
    while (i < k) {
      val (a, b) = params(i)
      val v = (a * h + b) % Dedup.HashP
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
