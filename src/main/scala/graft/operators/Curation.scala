package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end curation verdict: every training document with its
  * keep decision and the reason bits behind it — the composition of the
  * pipeline's registered operators into the one DataFrame a corpus
  * curation run actually writes out. (Extension territory — SURVEY.md
  * §2.1; registered as `d19_curation_keep`.)
  */
object Curation {

  /** One row per TRAIN doc (`!evalPred`):
    * (doc_id, is_rep, clean, ok_len, ok_rep, sampled, keep).
    *
    *  - `is_rep`: the doc is its near-dup cluster's TRAIN-side
    *    representative (minimum train doc_id in the component).
    *    Clustering runs over the WHOLE corpus — eval near-dups must
    *    still collapse train docs — but the representative is picked
    *    among train members only: an eval-anchored component minimum
    *    would silently drop clean train content whose only
    *    "representative" is an eval doc.
    *  - `clean`: no word n-gram shared with the eval split
    *    ([[Dedup.contamination]]).
    *  - `ok_len` / `ok_rep`: length and repetition quality gates
    *    ([[TextAnalysis.repetition]]).
    *  - `sampled`: language-stratified hash-sample membership
    *    ([[Sampling.stratified]]).
    *  - `keep` = the conjunction.
    */
  def keepList(docs: DataFrame, evalPred: Column,
      rates: Map[String, Double], defaultRate: Double,
      k: Int, bands: Int, threshold: Double,
      maxBucket: Long, maxDf: Long,
      minTokens: Int = 20, maxTopNgram: Double = 0.2,
      maxDupToken: Double = 0.8): DataFrame = {
    val clusters = Dedup.dedupClusters(docs,
      Dedup.lshNearDupPairs(docs, k, bands, threshold, maxBucket, maxDf))
    val trainRep = clusters.filter(!evalPred)
      .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("train_rep"))
    val contam = Dedup.contamination(docs, evalPred)
    val rep = TextAnalysis.repetition(docs)
    val samp = Sampling.stratified(
      TextAnalysis.langId(docs).select(col("doc_id"), col("pred_lang")),
      col("pred_lang"), rates, defaultRate)
    contam.select(col("doc_id"), col("contaminated"))
      .join(clusters.select(col("doc_id"), col("cluster_id")), Seq("doc_id"))
      .join(trainRep, Seq("cluster_id"))
      .join(rep.select(col("doc_id"), col("n_tokens"),
        col("dup_token_frac"), col("top_ngram_frac")), Seq("doc_id"))
      .join(samp.select(col("doc_id"), lit(true).as("in_sample")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        (col("doc_id") === col("train_rep")).as("is_rep"),
        (!col("contaminated")).as("clean"),
        (col("n_tokens") >= minTokens).as("ok_len"),
        (col("top_ngram_frac") <= maxTopNgram &&
          col("dup_token_frac") <= maxDupToken).as("ok_rep"),
        coalesce(col("in_sample"), lit(false)).as("sampled"))
      .withColumn("keep",
        col("is_rep") && col("clean") && col("ok_len") && col("ok_rep") && col("sampled"))
  }
}
