package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece "unigram"
  * model) — the OTHER standard trained tokenizer family beside BPE
  * (d58-d66): instead of greedily merging pairs, hold a candidate piece
  * vocabulary with costs and segment each word by VITERBI (cheapest
  * composition of pieces), then re-estimate piece costs from the
  * segmentations (hard-EM — the deterministic Viterbi-count variant of
  * the paper's EM; same fixed-point shape, no forward-backward floats).
  *
  * Everything runs over the wc-weighted VOCABULARY, never the token
  * stream (the d58/d59 BPE device): seed candidates are all substrings
  * of length ≤ `maxPieceLen` of the distinct words; the Viterbi DP is
  * `maxWordLen` rounds of vocabulary-scale joins (states (word, j)
  * extend by pieces ending at j); re-counts explode best paths back to
  * pieces weighted by word frequency. At 100 TB the vocabulary is
  * millions of rows against a corpus of trillions of tokens — the DP
  * never touches the corpus, and the final encode is one equi-join of
  * the token stream against the broadcast segmentation map.
  *
  * Cross-engine exactness: piece costs are ln-ratios of exact BIGINT
  * counts quantized at DECIMAL(28,8) (the repo's ln device); path costs
  * are exact decimal sums; the best path per (word, position) is the
  * (cost, n_pieces, path-string) argmin — a total order both engines
  * share, so ties cannot drift. The oracle enumerates ALL compositions
  * per word with a recursive CTE (words are short; compositions with
  * parts ≤ L are Fibonacci-ish in length) and takes the same argmin —
  * an independently-computed fixed point, not a DP transcription.
  */
object Unigram {

  /** (word, wc, wlen) distinct words with corpus frequencies. */
  private def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("wlen", length(col("word")))

  /** Seed model: every substring of length 1..L of every word, counted
    * with the word's frequency (each occurrence position counts);
    * cost = ln(total/cnt) at DECIMAL(28,8).
    */
  private def seedModel(words: DataFrame, maxPieceLen: Int): DataFrame = {
    val subs = words
      .withColumn("i", explode(expr("sequence(0, wlen - 1)")))
      .withColumn("l", explode(expr(
        s"sequence(1, least($maxPieceLen, wlen - i))")))
      .select(expr("substring(word, i + 1, l)").as("piece"), col("wc"))
    val cnts = subs.groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("tot"))
    cnts.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt").cast("long").as("cnt"), expr(
        "CAST(ln(CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)) AS DECIMAL(28,8))")
        .as("nll"))
  }

  /** Viterbi best segmentation of every word under `model(piece, nll)`:
    * DP states (word, j) for j = 0..wlen, extended j-at-a-time by
    * pieces ending at j (length ≤ L); per (word, j) the
    * (cost, np, path) argmin survives. Returns one row per word:
    * (word, wc, wlen, cost, np, path) with path = "|p1|p2|…".
    */
  private def viterbi(words: DataFrame, model: DataFrame, maxWordLen: Int,
      maxPieceLen: Int): DataFrame = {
    var best = words.select(col("word"), col("wc"), col("wlen"),
      lit(0).as("j"), expr("CAST(0 AS DECIMAL(28,8))").as("cost"),
      lit(0).as("np"), lit("").as("path"))
    for (j <- 1 to maxWordLen) {
      val ext = best
        .filter(col("j") >= j - maxPieceLen && col("j") < j &&
          col("wlen") >= j)
        .withColumn("piece", expr(s"substring(word, j + 1, $j - j)"))
        .join(model.select(col("piece"), col("nll")), Seq("piece"))
        .select(col("word"), col("wc"), col("wlen"), lit(j).as("j"),
          (col("cost") + col("nll")).cast("decimal(28,8)").as("cost"),
          (col("np") + 1).as("np"),
          concat(col("path"), lit("|"), col("piece")).as("path"))
      val w = Window.partitionBy(col("word"))
        .orderBy(col("cost"), col("np"), col("path"))
      val bestJ = ext.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      best = best.unionByName(bestJ).localCheckpoint(true)
    }
    best.filter(col("j") === col("wlen"))
      .select(col("word"), col("wc"), col("wlen"), col("cost"), col("np"),
        col("path"))
  }

  /** Re-estimated model from Viterbi segmentations: piece counts are
    * path occurrences weighted by wc; survivors are used pieces PLUS
    * every single character (coverage guarantee — SentencePiece never
    * prunes length-1); costs are add-one smoothed so zero-count
    * single-chars stay finite: nll = ln((tot + V)/(cnt + 1)).
    */
  private def reestimate(segs: DataFrame, seed: DataFrame): DataFrame = {
    val used = segs
      .select(col("wc"), explode(split(expr("substring(path, 2)"), "\\|"))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
    val base = seed.filter(length(col("piece")) === 1)
      .select(col("piece"))
      .join(used, Seq("piece"), "left_outer")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .unionByName(used.join(
        seed.filter(length(col("piece")) === 1).select(col("piece")),
        Seq("piece"), "left_anti"))
    val consts = base.agg(sum(col("cnt")).as("tot"),
      count(lit(1)).as("v"))
    base.crossJoin(broadcast(consts))
      .select(col("piece"), col("cnt").cast("long").as("cnt"), expr(
        "CAST(ln(CAST(tot + v AS DOUBLE) / CAST(cnt + 1 AS DOUBLE)) AS DECIMAL(28,8))")
        .as("nll"))
  }

  /** Train the unigram tokenizer (d101): seed → `emRounds` ×
    * (Viterbi segment → re-count → re-cost). Returns the final model
    * (piece, cnt, nll) — cnt from the LAST segmentation pass, nll the
    * add-one cost the encoder uses.
    */
  def unigramTrain(docs: DataFrame, maxPieceLen: Int = 4,
      emRounds: Int = 2): DataFrame = {
    require(maxPieceLen >= 1 && emRounds >= 1,
      s"maxPieceLen=$maxPieceLen emRounds=$emRounds")
    val words = vocab(docs).localCheckpoint(true)
    val maxWordLen = words.agg(max(col("wlen"))).head().getInt(0)
    val seed = seedModel(words, maxPieceLen).localCheckpoint(true)
    var model = seed
    for (_ <- 1 to emRounds) {
      val segs = viterbi(words, model, maxWordLen, maxPieceLen)
      model = reestimate(segs, seed).localCheckpoint(true)
    }
    model
  }

  /** Encode the corpus with the trained model (d102): per document, the
    * word count and the total piece count under the final Viterbi
    * segmentation — the tokenizer-fertility audit (pieces per word)
    * training pipelines track. One equi-join of the token stream
    * against the vocabulary-scale segmentation map. Returns
    * (doc_id, n_words, n_pieces, fertility).
    */
  def unigramEncode(docs: DataFrame, maxPieceLen: Int = 4,
      emRounds: Int = 2): DataFrame = {
    val words = vocab(docs).localCheckpoint(true)
    val maxWordLen = words.agg(max(col("wlen"))).head().getInt(0)
    val model = unigramTrain(docs, maxPieceLen, emRounds)
    val segMap = viterbi(words, model, maxWordLen, maxPieceLen)
      .select(col("word"), col("np"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(segMap, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("np")).cast("long").as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        (col("n_pieces").cast("double") / col("n_words")).as("fertility"))
  }
}
