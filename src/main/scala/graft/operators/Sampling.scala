package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines. The
  * built-in `Dataset.sample` draws from a partition-seeded RNG, so the
  * selected set changes with partitioning, task retries, and scale-ups —
  * unacceptable when a 100 TB mixture has to be reproducible and
  * auditable. Here membership is a pure function of the row key: an
  * md5-derived 60-bit hash mapped to a uniform `u ∈ [0,1)`, kept iff
  * `u < rate(stratum)`. Per-row expression work only (no shuffle, no
  * state), identical output on any cluster layout, and the same formula
  * runs in DuckDB for the oracle. (Extension territory — SURVEY.md §2.1.)
  */
object Sampling {

  /** 2^60 as a double; the hash below is 60 bits so `u` is in [0, 1). */
  private val TwoPow60 = 1152921504606846976.0

  /** Uniform [0,1) deterministic in the key: [[Dedup.hash60]] of the
    * key's decimal string over 2^60, bit-identical in DuckDB.
    */
  def uniformHash(key: Column): Column =
    Dedup.hash60(key.cast("string")).cast("double") / lit(TwoPow60)

  /** Stratified sample: keep a row iff `uniformHash(doc_id) <
    * rate(stratum)`, where `rates` maps stratum values to keep-rates and
    * `defaultRate` covers unlisted strata. Expects a `doc_id` column;
    * `strata` is any string expression over the input (language, source
    * domain, quality bucket). Returns (doc_id, stratum, u) for the kept
    * rows — `u` is exposed so downstream re-sampling can tighten a rate
    * without rescanning (keep `u < r'` ⊂ `u < r` for r' < r, the nested
    * property hash sampling gives for free).
    */
  def stratified(docs: DataFrame, strata: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col("stratum") === s, lit(r)).otherwise(acc)
    }
    docs.select(col("doc_id"), strata.as("stratum"),
        uniformHash(col("doc_id")).as("u"))
      .filter(col("u") < rate)
  }
}
