package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the scale-safe companion to q11's exact `countDistinct`.
  *
  * Exact distinct counting shuffles every distinct value; at 100 TB the
  * expand + two-phase distinct aggregate dominates the job. KMV keeps
  * only the k smallest distinct hash values per group — O(k) state,
  * associative and commutative (the buffer is a bounded sorted set whose
  * union re-trims to k), so Spark partial-aggregates map-side and merges
  * across partitions like any sum. Standard estimator: with uniform
  * hashes on [0, M) and kth-smallest h_k,  D ≈ (k−1)·M / h_k  (Beyer et
  * al., "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations", SIGMOD'07); fewer than k distinct values observed means
  * the buffer IS the distinct set, so the exact size is returned.
  *
  * Unlike HLL (`approx_count_distinct`), every step here — md5-derived
  * 60-bit hashes, integer compares, one double division — is
  * bit-identical in DuckDB, so the estimate itself hash-matches the
  * oracle instead of needing a bounds check.
  *
  * Input is the pre-hashed 60-bit value (see the q11b registration:
  * `conv(substr(md5(x),1,15),16,10)` — the engine-portable hash family
  * used across [[graft.operators.Dedup]]).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {

  /** M = 2⁶⁰: the hash domain size for 15-hex-char md5 prefixes. */
  private val M = 1152921504606846976.0

  // Buffer: sorted ascending, distinct, at most k values. An Array
  // (not a TreeSet) so the buffer encoder stays a primitive array —
  // no kryo, cheap shuffles.
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length >= k && ins >= k) buf // larger than the current kth
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keep the k smallest
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    var first = true
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (first || v != last) { out(n) = v; n = n + 1; last = v; first = false }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * M / buf(k - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
