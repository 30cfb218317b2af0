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

  /** Weighted sampling WITHOUT replacement (d70) — Efraimidis & Spirakis
    * 2006 ("Weighted random sampling with a reservoir"): draw `u_i`
    * uniform per item, key `u_i^(1/w_i)`, and the k LARGEST keys are an
    * exact probability-proportional-to-weight sample without
    * replacement — the one-pass, order-free construction production
    * mixture jobs need (a sequential weighted reservoir cannot shard).
    * Deterministic here: `u` is the md5 hash uniform above, and the key
    * is compared in the log domain (`ln(u)/w`, larger = better since
    * ln u < 0) rounded to DECIMAL(28,8) — the established cross-engine
    * ln device — with doc_id as the total-order tiebreak.
    *
    * Scale shape: per-row expression work plus ONE top-k, which plans
    * as TakeOrderedAndProject (per-partition k-row heads, single k-row
    * merge on the driver side of the exchange) — no global sort is
    * materialized at any corpus size. Zero-or-negative weights are
    * excluded (they have probability 0 in the published scheme).
    *
    * Returns the k selected rows as (doc_id, w, priority), ordered by
    * draw priority (first row = first draw in the equivalent
    * sequential scheme).
    */
  def weightedSample(docs: DataFrame, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    docs.select(col("doc_id"), weight.cast("double").as("w"),
        uniformHash(col("doc_id")).as("u"))
      .filter(col("w") > 0)
      .select(col("doc_id"), col("w"),
        // quantize at DECIMAL(28,8) (the ln device), expose as DOUBLE
        // (decimal→double is the same nearest-double in both engines)
        (log(col("u")) / col("w")).cast("decimal(28,8)")
          .cast("double").as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }
}
