package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID
  * (marker-n-gram heuristic), quality scoring, token counting, document
  * fingerprinting. All pure per-row column expressions — embarrassingly
  * parallel, fully codegen'd, no shuffle. (Extension territory —
  * SURVEY.md §2.1.)
  */
object TextAnalysis {

  /** Marker vocabularies per language bucket. A real pipeline would load
    * per-language character-n-gram profiles; the mechanism (score per
    * language, deterministic argmax) is identical.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "table", "row", "column"),
    "de" -> Seq("join", "merge", "group", "agg"),
    "fr" -> Seq("stream", "batch", "window", "spark"))

  private def hitCount(words: Seq[String]): Column =
    size(filter(split(col("text"), " "), t => t.isin(words.map(x => x: Any): _*)))

  /** Quote a string as a Spark SQL literal for splicing into `expr`.
    * Spark string literals use BACKSLASH escapes — doubling the quote
    * ('') is NOT an escape (adjacent literals concatenate, so 'don''t'
    * parses as the literal "dont", silently matching the wrong word —
    * ADVICE r12); the backslash itself must be doubled first.
    */
  private[operators] def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Per-language marker-hit scores; ties broken by marker-list order
    * (en ≥ es ≥ de ≥ fr). Deterministic and oracle-mirrorable.
    */
  def langId(docs: DataFrame): DataFrame = {
    // text rides along so downstream per-stratum ops (mixture stats)
    // can token-count without a self-join back to the corpus
    val scored = docs.select(
      col("doc_id") +: col("text") +:
        markers.map { case (l, ws) => hitCount(ws).as(s"sc_$l") }: _*)
    val langs = markers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((l, i), els) =>
        val beatsRest = langs.drop(i + 1)
          .map(o => col(s"sc_$l") >= col(s"sc_$o"))
          .reduce((a: Column, b: Column) => a && b)
        when(beatsRest, lit(l)).otherwise(els)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Length/stopword quality features. Single-pass, no shuffle; doubles
    * come from one int/int division each so they are bit-deterministic.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks))
        .as("avg_word_len"),
      (hitCount(markers.head._2).cast("double") / size(toks)).as("stop_ratio"))
  }

  /** Gopher document-quality rule suite (d56) — the published
    * document-level filter set of Rae et al. 2021 ("Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * Appendix A1.1) as ONE scan-side pass: word-count bounds, mean
    * word-length bounds, symbol-to-word ratio (# and ellipsis), bullet-
    * and ellipsis-line fractions, alphabetic-word fraction, and the
    * ≥`minStopHits`-of-a-designated-stopword-list rule. Pure per-row
    * column expressions — embarrassingly parallel, fully codegen'd,
    * zero shuffle, so it runs at scan speed on any corpus size.
    *
    * Cross-engine determinism: every fraction is ONE double division of
    * two exact longs (both engines perform the identical IEEE op), and
    * every rule bit compares that division against a literal — so the
    * booleans hash-match bit-for-bit. Thresholds default to the
    * published constants; `stopWords` defaults to the published English
    * list (the registered query passes the corpus's marker vocabulary
    * instead — the published list is degenerate on the synthetic
    * vocabulary, measured 0/500 docs with ≥2 hits, while the marker
    * list splits 446/500 and the word-count bound splits 277/500).
    *
    * Returns (doc_id, n_words, mean_word_len, symbol_ratio,
    * bullet_frac, ellipsis_frac, alpha_frac, n_stop, ok_words,
    * ok_word_len, ok_symbol, ok_bullet, ok_ellipsis, ok_alpha,
    * ok_stop, keep).
    */
  def gopherRules(docs: DataFrame,
      stopWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2L): DataFrame = {
    require(stopWords.nonEmpty, "stopWords must be non-empty")
    val sig = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("wchars"),
      (length(col("text")) - length(expr("replace(text, '#', '')")))
        .cast("long").as("n_hash"),
      expr("CAST((length(text) - length(replace(text, '...', ''))) DIV 3 AS BIGINT)")
        .as("n_ellipsis"),
      size(split(col("text"), "\n", -1)).cast("long").as("n_lines"),
      expr("CAST(size(filter(split(text, chr(10), -1), " +
        "l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %')) AS BIGINT)")
        .as("n_bullet"),
      expr("CAST(size(filter(split(text, chr(10), -1), l -> l LIKE '%...')) AS BIGINT)")
        .as("n_ell_lines"),
      expr("CAST(size(filter(split(text, ' '), x -> x RLIKE '[a-zA-Z]')) AS BIGINT)")
        .as("n_alpha"),
      stopWords.map(s => array_contains(split(col("text"), " "), s).cast("long"))
        .reduce(_ + _).as("n_stop"))
    sig.select(col("doc_id"), col("n_words"),
        (col("wchars").cast("double") / col("n_words")).as("mean_word_len"),
        ((col("n_hash") + col("n_ellipsis")).cast("double") / col("n_words"))
          .as("symbol_ratio"),
        (col("n_bullet").cast("double") / col("n_lines")).as("bullet_frac"),
        (col("n_ell_lines").cast("double") / col("n_lines")).as("ellipsis_frac"),
        (col("n_alpha").cast("double") / col("n_words")).as("alpha_frac"),
        col("n_stop"))
      .withColumn("ok_words", col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_word_len",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("ok_symbol", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("ok_bullet", col("bullet_frac") <= maxBulletFrac)
      .withColumn("ok_ellipsis", col("ellipsis_frac") <= maxEllipsisFrac)
      .withColumn("ok_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("ok_stop", col("n_stop") >= minStopHits)
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_symbol") &&
          col("ok_bullet") && col("ok_ellipsis") && col("ok_alpha") && col("ok_stop"))
  }

  /** C4's badword blocklist rule (d143) — the document-level filter of
    * Raffel et al. 2020 §2.2 the d57 line rules DON'T cover: drop any
    * page containing a word from a designated blocklist ("List of
    * Dirty, Naughty, Obscene..." in the paper; the list is a
    * parameter here). Matching is token-level on the lowercased text
    * (the word-boundary semantics of the published filter; substring
    * matching would false-positive on innocent words — the documented
    * contract). Pure scan-side array work — one filter lambda per row,
    * zero shuffle, codegen'd; the blocklist is a literal IN list
    * (bounded by the list size, the driver-constant device).
    * Returns (doc_id, n_hits, keep).
    */
  def blocklistFilter(docs: DataFrame, blockWords: Seq[String]): DataFrame = {
    require(blockWords.nonEmpty, "empty blocklist")
    val inList = blockWords.map(sqlLit).mkString("(", ",", ")")
    docs.select(col("doc_id"),
        expr(s"size(filter(split(lower(text), ' '), x -> x IN $inList))")
          .cast("long").as("n_hits"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** C4-style line-level cleaning (d57) — the published rule set of
    * Raffel et al. 2020 ("Exploring the Limits of Transfer Learning…",
    * §2.2) re-expressed per-row: keep only lines that end in a terminal
    * punctuation mark (period / exclamation / question / end quote) and
    * have at least `minLineWords` words; drop any line containing
    * "javascript"; drop the whole document if it contains a curly brace
    * or "lorem ipsum" (case-insensitive), or if fewer than
    * `minKeptLines` lines survive.
    *
    * Scale shape: NO explode/groupBy round trip — the line work is
    * `filter` over the split-lines array inside one projection, so the
    * operator is pure scan-side expression work (codegen'd, zero
    * shuffle), and the cleaned text is rebuilt with `array_join` in the
    * same pass. Terminal-punct checks are LIKE/endsWith (identical
    * semantics in both engines — no regex corner cases).
    *
    * Honesty note (the d32 ship-with-measured-caveat pattern): the
    * synthetic corpus has no sentence punctuation or newlines, so every
    * corpus doc drops (n_kept = 0) and the registered row verifies the
    * all-drop path end-to-end; the real line semantics are spec-proven
    * on constructed multi-line documents (Round10OpsSpec).
    *
    * Returns (doc_id, n_lines, n_kept, has_brace, has_lorem, keep,
    * text_out) — text_out is the kept lines rejoined, '' for dropped
    * docs.
    */
  def c4LineFilter(docs: DataFrame, minLineWords: Int = 5,
      minKeptLines: Int = 3): DataFrame = {
    def lineKeep(l: Column): Column =
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        size(split(l, " ")) >= minLineWords &&
        !lower(l).contains("javascript")
    docs.select(
        col("doc_id"),
        split(col("text"), "\n", -1).as("lines"),
        col("text").contains("{").as("has_brace"),
        lower(col("text")).contains("lorem ipsum").as("has_lorem"))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        filter(col("lines"), lineKeep _).as("kept"),
        col("has_brace"), col("has_lorem"))
      .withColumn("n_kept", size(col("kept")).cast("long"))
      .withColumn("keep",
        !col("has_brace") && !col("has_lorem") && col("n_kept") >= minKeptLines)
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("has_brace"), col("has_lorem"), col("keep"),
        when(col("keep"), array_join(col("kept"), "\n")).otherwise(lit(""))
          .as("text_out"))
  }

  /** The corpus vocabulary in BPE symbol representation: one row per
    * DISTINCT word with its corpus count, the word spelled as
    * '¦'-separated symbols with the end-of-word marker '¶' appended
    * (the `</w>` of Sennrich et al. 2016 respelled as one character).
    * This is the classic BPE-training reduction: all later passes run
    * over the VOCABULARY (≪ token stream), weighted by `wc` — the one
    * corpus-scale scan is the word count here, a map-side-combined
    * aggregate. Separator and marker are outside the corpus alphabet
    * (documented contract; a production build would byte-escape).
    */
  private def bpeVocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"),
        rtrim(regexp_replace(concat(col("word"), lit("¶")), "(.)", "$1¦"), "¦")
          .as("rep"), col("wc"))

  /** Adjacent-symbol-pair counts over a symbol representation —
    * the merge-candidate statistics of one BPE training step.
    */
  private def bpePairCounts(rep: DataFrame): DataFrame =
    rep.select(split(col("rep"), "¦").as("syms"), col("wc"))
      // fully-merged words (one symbol) carry no pairs — and MUST be
      // filtered before the sequence: Spark's sequence(1, 0) counts
      // DOWN ([1, 0]), so a 1-symbol rep would explode into bogus
      // indexes and element_at(syms, 2) crashes the training step
      .filter(size(col("syms")) >= 2)
      .select(col("syms"), col("wc"),
        explode(expr("sequence(1, size(syms) - 1)")).as("i"))
      .select(element_at(col("syms"), col("i")).as("s1"),
        element_at(col("syms"), col("i") + 1).as("s2"), col("wc"))
      .groupBy(col("s1"), col("s2")).agg(sum(col("wc")).as("tf"))

  /** BPE pair-statistics pass (d58) — the counting kernel of
    * byte-pair-encoding tokenizer training (Sennrich et al. 2016): the
    * corpus frequency of every adjacent symbol pair (end-of-word
    * marker included), top-`k` by frequency — rank 1 IS the first BPE
    * merge. Runs over the deduplicated vocabulary weighted by word
    * counts ([[bpeVocab]] doc), so pair counting never touches the
    * token stream; the top-k plans as TakeOrderedAndProject (k rows
    * per partition to the reducer, no global sort). Total order
    * (tf desc, s1 asc, s2 asc) makes ranks deterministic cross-engine.
    * Returns (rank, s1, s2, tf).
    */
  def bpePairStats(docs: DataFrame, k: Int = 50): DataFrame = {
    val ordW = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("s1").asc, col("s2").asc)
    bpePairCounts(bpeVocab(docs))
      .orderBy(col("tf").desc, col("s1").asc, col("s2").asc).limit(k)
      .withColumn("rank", row_number().over(ordW).cast("long"))
      .select(col("rank"), col("s1"), col("s2"), col("tf"))
  }

  /** BPE training proper (d59): `nMerges` iterations of count-pairs →
    * take the most frequent → merge it corpus-wide, returning the merge
    * table (step, s1, s2, tf) — the artifact a BPE tokenizer ships.
    * Merge application is ONE literal string replace on the separator
    * representation ('s1¦s2' → 's1s2'): left-to-right non-overlapping
    * replacement IS the leftmost-first merge semantics ('a¦a¦a' under
    * merge (a,a) → 'aa¦a'), and both engines share it, so the whole
    * training trajectory is oracle-reproducible by chaining stat/merge
    * CTE stages.
    *
    * Scale shape, k-means-style: the merge list is driver-resident (as
    * centroids are in every k-means), collected one row per step; the
    * distributed work per step is one aggregate over the VOCABULARY
    * table, not the corpus — the [[bpeVocab]] reduction — and each
    * step's representation is one added projection, checkpointed per
    * step so the lineage stays flat.
    */
  def bpeTrain(docs: DataFrame, nMerges: Int = 5): DataFrame = {
    require(nMerges >= 1, s"nMerges=$nMerges")
    var rep = bpeVocab(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to nMerges) {
      val top = bpePairCounts(rep)
        .orderBy(col("tf").desc, col("s1").asc, col("s2").asc).limit(1)
        .collect()
      require(top.nonEmpty, s"BPE step $step: no pairs left to merge")
      val (s1, s2, tf) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((step.toLong, s1, s2, tf))
      rep = rep.withColumn("rep",
          replace(col("rep"), lit(s1 + "¦" + s2), lit(s1 + s2)))
        .localCheckpoint(true)
    }
    docs.sparkSession.createDataFrame(merges.toSeq)
      .toDF("step", "s1", "s2", "tf")
  }

  /** Gopher repetition suite (d60) — the CHARACTER-fraction repetition
    * signals of Rae et al. 2021 Appendix A1.1 that d14's count-share
    * signals don't cover: fraction of line slots in duplicated lines,
    * fraction of characters in duplicated lines, and the fraction of
    * characters covered by the most frequent word {2,3,4}-gram
    * (occurrence count × gram char length / doc chars — the standard
    * non-overlap-corrected published formulation). Rule bits carry the
    * published thresholds (0.30 / 0.20 / 0.20 / 0.18 / 0.16).
    *
    * Scale shape: per-row array work over the doc's own lines/grams —
    * no explode, no groupBy, zero shuffle: per-document repetition is
    * inherently local, so the right distribution is embarrassing
    * parallelism, not a (doc, gram) keyed aggregation whose key space
    * is the corpus gram stream. The top-gram argmax is ONE
    * sort-then-fold pass (O(G log G) per doc): sort the gram array,
    * track the longest equal run with a struct-state `aggregate` —
    * strictly-greater updates mean ties resolve to the
    * lexicographically SMALLEST gram automatically (it is seen first
    * in sorted order), the same tie the oracle's
    * `list_min(argmax set)` takes. (A first cut computed counts with
    * nested filter lambdas per reference; projection collapse inlined
    * the gram construction into every one of its ~6 references per n
    * and the tree blew past codegen into interpreted O(G²)·dups —
    * measured minutes instead of seconds. The fold keeps every
    * reference count at 1-2.) Every fraction is one double
    * multiply/divide over exact ints — bit-identical cross-engine.
    *
    * Returns (doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    * top2_char_frac, top3_char_frac, top4_char_frac, ok_dup_line,
    * ok_dup_line_char, ok_top2, ok_top3, ok_top4, keep).
    */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    // longest-equal-run fold over a SORTED gram array: state carries
    // (prev gram, current run, best run, best gram); IF(x = pg, run+1, 1)
    // is inlined (no let-binding in Spark SQL lambdas)
    def runFold(sorted: String) =
      s"""aggregate($sorted,
         |  named_struct('pg', '', 'run', 0, 'best', 0, 'bg', ''),
         |  (a, x) -> named_struct(
         |    'pg', x,
         |    'run', IF(x = a.pg, a.run + 1, 1),
         |    'best', IF(IF(x = a.pg, a.run + 1, 1) > a.best, IF(x = a.pg, a.run + 1, 1), a.best),
         |    'bg', IF(IF(x = a.pg, a.run + 1, 1) > a.best, x, a.bg)),
         |  a -> named_struct('m', a.best, 'g', a.bg))""".stripMargin.replace("\n", " ")
    // widened: the per-row n-gram sort + run folds below are the row's
    // whole cost and otherwise run in the scan's single bench-scale
    // task; still no keyed shuffle (plan-guarded) (ScanParallelism doc)
    var df = graft.sources.ScanParallelism.widen(docs).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        split(col("text"), "\n", -1).as("lines"),
        split(col("text"), " ").as("w"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      // lines per doc are few; the sorted-run device applies here too:
      // a slot is duplicated iff its line's run length >= 2
      .withColumn("lsorted", array_sort(col("lines")))
      .withColumn("dup_slots", expr(
        "CAST(size(filter(lsorted, l -> size(filter(lsorted, x -> x = l)) >= 2)) AS BIGINT)"))
      .withColumn("dup_chars", expr(
        "CAST(aggregate(filter(lsorted, l -> size(filter(lsorted, x -> x = l)) >= 2), " +
          "0, (a, x) -> a + length(x)) AS BIGINT)"))
    for (n <- Seq(2, 3, 4)) {
      df = df
        .withColumn(s"st$n", expr(runFold(
            s"array_sort(IF(size(w) >= $n, " +
              s"transform(sequence(1, size(w) - ${n - 1}), i -> array_join(slice(w, i, $n), ' ')), " +
              "CAST(array() AS ARRAY<STRING>)))")))
        .withColumn(s"top${n}_char_frac",
          when(col(s"st$n").getField("m") > 0,
            col(s"st$n").getField("m").cast("double")
              * length(col(s"st$n").getField("g")) / col("n_chars"))
            .otherwise(lit(0.0)))
    }
    df.select(col("doc_id"), col("n_lines"),
        (col("dup_slots").cast("double") / col("n_lines")).as("dup_line_frac"),
        (col("dup_chars").cast("double") / col("n_chars")).as("dup_line_char_frac"),
        col("top2_char_frac"), col("top3_char_frac"), col("top4_char_frac"))
      .withColumn("ok_dup_line", col("dup_line_frac") <= 0.30)
      .withColumn("ok_dup_line_char", col("dup_line_char_frac") <= 0.20)
      .withColumn("ok_top2", col("top2_char_frac") <= 0.20)
      .withColumn("ok_top3", col("top3_char_frac") <= 0.18)
      .withColumn("ok_top4", col("top4_char_frac") <= 0.16)
      .withColumn("keep", col("ok_dup_line") && col("ok_dup_line_char") &&
        col("ok_top2") && col("ok_top3") && col("ok_top4"))
  }

  /** BPE encode pass (d61) — the CONSUMER of [[bpeTrain]]'s merge
    * table: apply the learned merges, in learned order, and report each
    * document's BPE token count next to its whitespace word count (the
    * tokens-per-doc accounting every tokenizer report and token-budget
    * plan needs). Encoding is WORD-local, so merges apply at vocabulary
    * scale — `nMerges` literal replaces on the distinct-word table —
    * and documents just equi-join their words to the encoded
    * vocabulary: the join fast BPE implementations make. The
    * vocabulary side is broadcast (Heaps' law keeps it ≪ corpus; an
    * extreme-scale vocabulary would drop the hint and shuffle).
    * Returns (doc_id, n_words, n_tokens_bpe).
    */
  def bpeEncode(docs: DataFrame, nMerges: Int = 5): DataFrame =
    bpeApplyMerges(docs, bpeTrain(docs, nMerges).orderBy(col("step"))
      .collect().map(r => (r.getString(1), r.getString(2))))

  /** The shared encode tail of [[bpeEncode]] (in-memory training) and
    * [[bpeEncodeIndexed]] (persisted merges): apply an ordered merge
    * list to the TARGET corpus's vocabulary as literal replaces, join
    * the token stream to the symbol counts. One code path, so the two
    * serving shapes cannot drift.
    */
  private def bpeApplyMerges(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(bpeWordSyms(docs, merges)), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_tokens_bpe"))

  /** Per-word BPE symbol counts under an ordered merge list — the
    * vocabulary-scale lookup table [[bpeApplyMerges]] and
    * [[wordPieceEncode]] both join against. (word, n_syms).
    */
  private def bpeWordSyms(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var v = bpeVocab(docs)
    merges.foreach { case (s1, s2) =>
      v = v.withColumn("rep",
        replace(col("rep"), lit(s1 + "¦" + s2), lit(s1 + s2)))
    }
    v.select(col("word"), size(split(col("rep"), "¦")).cast("long").as("n_syms"))
  }

  /** Persist a trained BPE merge table (d113) — the tokenizer
    * deployment shape the unigram family already has (d104): train
    * ONCE, encode arbitrary corpora forever. The artifact is the
    * ordered merge list — nMerges rows, the entire model — under the
    * shared manifest (kind "bpe").
    */
  def saveBpeModel(docs: DataFrame, path: String, nMerges: Int = 5): Unit = {
    import graft.sources.IndexManifest
    bpeTrain(docs, nMerges).write.mode("overwrite").parquet(s"$path/merges")
    val (rows, maxId) = IndexManifest.watermark(docs, "doc_id")
    IndexManifest.write(path, IndexManifest.Manifest("bpe",
      Map("n_merges" -> nMerges.toLong), rows, maxId))
  }

  /** Encode a corpus with a persisted BPE model ([[saveBpeModel]]) —
    * reads the nMerges-row merge table and runs [[bpeEncode]]'s tail
    * verbatim. Registered against d61's oracle text verbatim (the
    * d104 convention: the store is an implementation detail that must
    * not change an encoding).
    */
  def bpeEncodeIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, docs: DataFrame): DataFrame = {
    graft.sources.IndexManifest.require(path, "bpe")
    bpeEncodeWith(docs, spark.read.parquet(s"$path/merges"))
  }

  /** Encode under an ALREADY-TRAINED merge frame (step, s1, s2) —
    * the [[Unigram.encodeWithModel]] counterpart for BPE; the d103
    * audit and [[bpeEncodeIndexed]] share it.
    */
  def bpeEncodeWith(docs: DataFrame, merges: DataFrame): DataFrame =
    bpeApplyMerges(docs, merges.orderBy(col("step")).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"))))

  /** The trained BPE merges as a cached artifact (the
    * unigramModelCached convention): one slot per (corpus, params)
    * version at `path`; consumers read the store, whichever runs
    * first pays the training. Returns the merges frame.
    */
  def bpeModelCached(docs: DataFrame, path: String,
      nMerges: Int = 5): DataFrame = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val params = Map("n_merges" -> nMerges.toLong)
    val hit = try {
      IndexManifest.require(path, "bpe", params)
      IndexManifest.isFresh(path, docs, "doc_id")
    } catch { case _: IndexManifestException => false }
    if (!hit) saveBpeModel(docs, path, nMerges)
    docs.sparkSession.read.parquet(s"$path/merges")
  }

  /** WordPiece greedy segmentation (d137) — the THIRD tokenizer family
    * beside BPE (merge-order replay, d61) and unigram (Viterbi, d102):
    * BERT's serving algorithm (Devlin et al. 2019; maximal munch): walk
    * each word left to right, at every position taking the LONGEST
    * vocabulary piece that prefixes the remaining suffix. The vocabulary
    * is the standard BPE-derived piece set — every merge result plus
    * the corpus alphabet (real WordPiece vocabs include all single
    * characters for exactly this reason: the greedy walk can then never
    * dead-end, no [UNK] path needed). Same marked-word domain as the
    * BPE family (word + '¶'), so the two tokenizers' counts compare
    * one-to-one ([[wordPieceEncode]]).
    *
    * Scale shape: the walk runs over the DISTINCT-word vocabulary (the
    * bpeVocab reduction — never the token stream), as one scan-side
    * `aggregate` fold per word: position state advances by the best
    * match's length, where the piece set is a LITERAL array (bounded by
    * nMerges + |alphabet| — the driver-constant device, same class as
    * the collected merge table every BPE consumer already holds). Zero
    * joins, zero shuffles beyond the vocabulary groupBy.
    *
    * Determinism: at any position all matching pieces of equal length
    * are the same string, so argmax-by-length is unique; the oracle
    * replays the identical walk as a best-match grid plus a recursive
    * step CTE. Returns (word, wc, n_pieces, seg — '|'-joined pieces).
    */
  def wordPieceSegments(docs: DataFrame, merges: DataFrame): DataFrame = {
    val rep0 = bpeVocab(docs)
    val alpha = rep0.select(explode(split(col("rep"), "¦")).as("p"))
    val pieces = merges.select(concat(col("s1"), col("s2")).as("p"))
      .union(alpha).distinct()
      .collect().map(_.getString(0)).sorted
    val pl = pieces.map(sqlLit).mkString("array(", ",", ")")
    val bestLen =
      s"array_max(transform(filter($pl, p -> substring(mw, s.pos, length(p)) = p), p -> length(p)))"
    rep0.select(col("word"), col("wc"), concat(col("word"), lit("¶")).as("mw"))
      .withColumn("st", expr(
        s"""aggregate(sequence(1, length(mw)),
           |  named_struct('pos', 1, 'n', 0, 'seg', ''),
           |  (s, i) -> IF(i = s.pos,
           |    named_struct('pos', s.pos + $bestLen, 'n', s.n + 1,
           |      'seg', concat(s.seg, '|', substring(mw, s.pos, $bestLen))),
           |    s),
           |  s -> named_struct('n', CAST(s.n AS BIGINT), 'seg', substring(s.seg, 2)))"""
          .stripMargin.replace("\n", " ")))
      .select(col("word"), col("wc"), col("st.n").as("n_pieces"),
        col("st.seg").as("seg"))
  }

  /** Greedy-vs-merge-order disagreement, priced per document (d138):
    * every doc's token count under BPE merge replay AND under the
    * WordPiece greedy walk over the SAME piece vocabulary — the two
    * published serving algorithms genuinely differ (greedy maximal
    * munch can pick a long piece the merge order never assembles, and
    * vice versa), and this row measures by how much on this corpus.
    * One token-stream scan joined against the two broadcast
    * vocabulary-scale lookup tables. Returns (doc_id, n_words,
    * n_tokens_bpe, n_tokens_wp).
    */
  def wordPieceEncode(docs: DataFrame, merges: DataFrame): DataFrame = {
    val ms = merges.orderBy(col("step")).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")))
    val lut = bpeWordSyms(docs, ms.toSeq)
      .join(wordPieceSegments(docs, merges)
        .select(col("word"), col("n_pieces")), Seq("word"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(lut), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_tokens_bpe"),
        sum(col("n_pieces")).as("n_tokens_wp"))
  }

  /** BPE segmentation spans (d64) — the per-word token TABLE a
    * dataloader actually consumes: after applying [[bpeTrain]]'s
    * merges, each vocabulary word's symbol sequence with 0-based char
    * offsets into the MARKED word (word + '¶', so the spans tile
    * len(word)+1 exactly, no special-casing of marker-merged tails —
    * spec-pinned). Vocabulary-scale output (the tokenizer lookup
    * table); per-doc spans are this table joined to the token stream,
    * which d61 already prices. The offset is a running sum windowed
    * per word — partition size = that word's token count, trivially
    * bounded. Returns (word, tok_idx, sym, start, len).
    */
  def bpeSpans(docs: DataFrame, nMerges: Int = 5): DataFrame = {
    val merges = bpeTrain(docs, nMerges).orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    var v = bpeVocab(docs)
    merges.foreach { case (s1, s2) =>
      v = v.withColumn("rep",
        replace(col("rep"), lit(s1 + "¦" + s2), lit(s1 + s2)))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("word")).orderBy(col("tok0"))
    v.select(col("word"),
        posexplode(split(col("rep"), "¦")).as(Seq("tok0", "sym")))
      .select(col("word"), (col("tok0") + 1).cast("long").as("tok_idx"),
        col("sym"),
        (sum(length(col("sym"))).over(w) - length(col("sym"))).cast("long").as("start"),
        length(col("sym")).cast("long").as("len"))
  }

  /** Per-stratum tokenizer compression report (d66) — the fairness
    * metric motivating UniMax-style mixtures: after BPE training on
    * the WHOLE corpus, how many BPE tokens each language stratum pays
    * per word (a tokenizer trained on a mixture over-segments its
    * minority languages; tokens-per-word per stratum is the standard
    * audit). Composes [[bpeEncode]]'s per-doc accounting with
    * [[langId]]'s strata in one aggregation. Returns
    * (stratum, n_docs, n_words, n_tokens_bpe, tokens_per_word).
    */
  def bpeFairness(docs: DataFrame, nMerges: Int = 5): DataFrame =
    bpeEncode(docs, nMerges)
      .join(langId(docs).select(col("doc_id"), col("pred_lang").as("stratum")),
        Seq("doc_id"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens_bpe")).as("n_tokens_bpe"))
      .withColumn("tokens_per_word",
        col("n_tokens_bpe").cast("double") / col("n_words").cast("double"))

  /** Whitespace tokens vs BPE-ish regex tokens (letter runs / digit runs /
    * single punctuation).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Normalization fingerprint: lowercase, strip non-alphanumerics,
    * collapse whitespace, md5. Equal fingerprints ⇒ same text modulo
    * formatting — the cheap first pass before near-dup mining.
    * Normalization is a single codegen'd pass
    * ([[graft.functions.NormalizeText]]) instead of two chained regex
    * rewrites; same output bytes, so the DuckDB oracle keeps its regexp
    * formulation.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(graft.functions.NormalizeText(col("text"))).as("fingerprint"))

  /** Top-`k` vocabulary with term and document frequencies — the count
    * pass of tokenizer/vocab training. The canonical map-side-combine
    * workload: explode tokens, one partial-aggregated count per token
    * (`df` adds a distinct over (token, doc_id) — also partial); the
    * top-k then plans as TakeOrderedAndProject, so no global sort is
    * ever materialized and the reducer sees k rows per partition, not
    * the vocabulary. Rank is assigned AFTER the limit, a window over k
    * rows. Total order (tf desc, token asc) makes the cut and the ranks
    * deterministic across engines.
    *
    * Returns (rank, token, tf, df).
    */
  def vocab(docs: DataFrame, k: Int = 100): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val counts = tok.groupBy(col("token")).agg(
      count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val ordW = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("token").asc)
    counts.orderBy(col("tf").desc, col("token").asc).limit(k)
      .withColumn("rank", row_number().over(ordW).cast("long"))
      .select(col("rank"), col("token"), col("tf"), col("df"))
  }

  /** PII-redaction patterns (d32) — deliberately restricted to regex
    * constructs whose semantics are identical in Java regex (Spark) and
    * RE2 (DuckDB): character classes, bounded/unbounded quantifiers, no
    * backrefs or lookaround. Application ORDER is part of the contract
    * (emails first, so `scheme://user@host/...` redacts its mail-shaped
    * core as an email before the URL pass sees it) — deterministic in
    * both engines, so the composed rewrite hash-matches.
    */
  val PiiEmail = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PiiUrl = "https?://[^\\s]+"
  val PiiNum = "[0-9]{7,}"

  /** PII redaction (d32): emails → `<EMAIL>`, URLs → `<URL>`, long digit
    * runs (≥7 — phone/account shapes) → `<NUM>`, applied in that fixed
    * order, with the per-doc redaction count. Pure per-row
    * `regexp_replace` chain — single pass, codegen'd, no shuffle; the
    * structural template for any production redaction list.
    *
    * Honesty note (TODO #3 history): the synthetic corpus contains ZERO
    * redactable spans (measured — not even a digit), so the registered
    * oracle row verifies the identity path end-to-end (pattern
    * compatibility, counting, column plumbing) while the REWRITE
    * behavior is spec-proven on constructed rows (Round8OpsSpec) — the
    * same ship-with-measured-caveat pattern as e16.
    * Returns (doc_id, redacted, n_redacted).
    */
  def redactPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("ne",
        size(regexp_extract_all(col("text"), lit(PiiEmail), lit(0))).cast("long"))
      .withColumn("t1", regexp_replace(col("text"), PiiEmail, "<EMAIL>"))
      .withColumn("nu",
        size(regexp_extract_all(col("t1"), lit(PiiUrl), lit(0))).cast("long"))
      .withColumn("t2", regexp_replace(col("t1"), PiiUrl, "<URL>"))
      .withColumn("nd",
        size(regexp_extract_all(col("t2"), lit(PiiNum), lit(0))).cast("long"))
      .select(col("doc_id"),
        regexp_replace(col("t2"), PiiNum, "<NUM>").as("redacted"),
        (col("ne") + col("nu") + col("nd")).as("n_redacted"))

  /** Out-of-vocabulary rate against the corpus's OWN top-`vocabK`
    * vocabulary (d31) — the curation twin of the fixed-list stopword
    * ratio in [[qualityScore]]: there the reference list is static;
    * here it is a DERIVED artifact ([[vocab]]'s deterministic top-k
    * cut), so the signal adapts to the corpus. High OOV = vocabulary
    * far from the corpus core — boilerplate, code, non-target-language,
    * or noise; a standard pre-training keep/drop feature.
    *
    * Scale shape: the vocabulary is driver-resident BY CONSTRUCTION
    * (top-k of a partial-aggregated count, k rows collected once) and
    * rides into a scan-side `isin` (compiles to an O(1)-lookup InSet,
    * codegen'd — join-free); scoring is one token explode + one
    * (doc_id) partial aggregate. A production-sized vocabulary (100k+)
    * keeps the same shape via a broadcast-join membership probe instead
    * of the literal InSet. The rate is an exact rational n_oov/n_tokens
    * (one double division), so it hash-matches the oracle.
    * Returns (doc_id, n_tokens, n_oov, oov_rate).
    */
  def oovRate(docs: DataFrame, vocabK: Int = 100): DataFrame = {
    val top = vocab(docs, vocabK).select(col("token"))
      .collect().map(_.getString(0)).toSeq
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("token").isin(top: _*), lit(0L)).otherwise(lit(1L))).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
  }

  /** BM25 relevance of every document against a fixed term set — the
    * retrieval scorer used to mine topical subsets out of a corpus
    * (quality-classifier seeds, domain mixtures). One scalar-aggregate
    * pass computes the corpus stats (N, Σdl, per-term df; all partial
    * aggregates), which then ride a broadcast to a per-row codegen'd
    * scoring expression — the corpus itself is never shuffled.
    *
    * Deviation from textbook BM25, for the oracle's sake: the idf factor
    * is the RAW odds ratio `(N − df + 0.5)/(df + 0.5)`, not its log.
    * `ln` is a libm call whose last bit differs across engines, which
    * would break hash-equality; the raw ratio is rational arithmetic
    * (bit-exact everywhere) and order-equivalent for a single term.
    * Rankings that sum multiple terms weight high-idf terms more than
    * the log form — acceptable for corpus mining, documented here. A
    * production scorer that needs the log form applies `log()` on top;
    * every other factor is unchanged.
    *
    * All double arithmetic is written with explicit parenthesization and
    * term order mirrored in the DuckDB oracle, so scores hash-match.
    * Returns (doc_id, score).
    */
  def bm25(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: need at least one query term")
    val w = split(col("text"), " ")
    val statAggs =
      count(lit(1)).cast("double").as("nd") +:
        sum(size(w)).cast("double").as("sum_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(w, t), 1L).otherwise(0L)).cast("double").as(s"df$i")
        }
    val stats = docs.agg(statAggs.head, statAggs.tail: _*)
    val dl = size(w).cast("double")
    val avgdl = col("sum_dl") / col("nd")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(w, x => x === lit(t))).cast("double")
      val idf = (col("nd") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dl / avgdl)))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
  }

  /** Term-proximity rerank (d124) — the second retrieval stage between
    * the cheap lexical cut and the response: candidates from the BM25
    * top-`poolK` are re-ordered by how TIGHTLY they contain the query —
    * docs covering more distinct query terms first, then by the minimal
    * token window containing ALL terms (the classic min-cover proximity
    * feature), then the BM25 score, then doc_id. A real pairwise
    * (query, document-content) scorer with no model stub: the expensive
    * per-pair work every rerank stage has.
    *
    * Scale shape: the pool cut is the [[bm25]] broadcast-stats scan +
    * top-k; the payload fetch joins the corpus against the BROADCAST
    * k-row pool (the e20 fetch rule); the min-cover search is a
    * per-document position join whose row count is the product of the
    * terms' per-doc frequencies — bounded by document length, never by
    * the corpus. The final rank window orders ≤ poolK rows
    * (rank-after-cut).
    *
    * Returns (rk, doc_id, n_present, span, score); span is NULL when a
    * doc lacks one of the terms (such docs sort after full matches).
    */
  def proximityRerank(docs: DataFrame, terms: Seq[String], poolK: Int,
      outK: Int): DataFrame = {
    require(terms.nonEmpty, "proximityRerank: need at least one term")
    import org.apache.spark.sql.expressions.Window
    val pool = bm25(docs, terms)
      .orderBy(col("score").desc, col("doc_id")).limit(poolK)
    val txt = docs.join(broadcast(pool.select(col("doc_id"))), Seq("doc_id"))
    val poss = txt.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(col("word").isin(terms: _*))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
      .localCheckpoint(true) // read once per term + for presence counts
    val present = poss.groupBy(col("doc_id"))
      .agg(countDistinct(col("word")).cast("long").as("n_present"))
    val per = terms.zipWithIndex.map { case (t, i) =>
      poss.filter(col("word") === t).select(col("doc_id"), col("pos").as(s"p$i"))
    }
    val combos = per.reduce((a, b) => a.join(b, Seq("doc_id")))
    val pcols = terms.indices.map(i => col(s"p$i"))
    val span =
      if (pcols.size == 1) lit(1L)
      else greatest(pcols: _*) - least(pcols: _*) + lit(1L)
    val spans = combos.groupBy(col("doc_id"))
      .agg(min(span).cast("long").as("span"))
    val ord = Window.orderBy(col("n_present").desc, col("span").asc_nulls_last,
      col("score").desc, col("doc_id"))
    pool.join(present, Seq("doc_id"), "left_outer")
      .join(spans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("n_present"), lit(0L)).as("n_present"),
        col("span"), col("score"))
      .withColumn("rk", row_number().over(ord).cast("long"))
      .filter(col("rk") <= outK)
      .select(col("rk"), col("doc_id"), col("n_present"), col("span"), col("score"))
  }

  /** Retrieval-quality evaluation (d128) — the measurement row that
    * justifies a rerank stage: MRR and precision@k of the raw BM25
    * ranking versus [[proximityRerank]], against the deterministic
    * relevance label "document contains EVERY query term" (the
    * all-terms conjunctive intent; no human labels exist in-engine, and
    * this label is exactly what the proximity stage optimizes first, so
    * the row measures how far BM25's bag-of-words scoring strays from
    * conjunctive intent). One bounded row per ranker:
    * (ranker, mrr, p_at_k); mrr is 0 when no relevant doc makes the
    * cut.
    *
    * Scale shape: relevance is a scan-side boolean; each ranked list is
    * ≤ outK rows and rides a broadcast into the label join; the
    * aggregates fold k rows.
    */
  def retrievalEval(docs: DataFrame, terms: Seq[String], poolK: Int,
      outK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = split(col("text"), " ")
    val rel = docs.select(col("doc_id"),
      terms.map(t => array_contains(w, t)).reduce(_ && _).as("relevant"))
    def evalOf(name: String, ranked: DataFrame): DataFrame =
      rel.join(broadcast(ranked), Seq("doc_id"))
        .agg(min(when(col("relevant"), col("rk"))).as("first_rel"),
          sum(when(col("relevant"), lit(1L)).otherwise(lit(0L))).as("n_rel"))
        .select(lit(name).as("ranker"),
          when(col("first_rel").isNull, lit(0.0))
            .otherwise(lit(1.0) / col("first_rel").cast("double")).as("mrr"),
          (col("n_rel").cast("double") / lit(outK)).as("p_at_k"))
    val bmRanked = bm25(docs, terms)
      .orderBy(col("score").desc, col("doc_id")).limit(outK)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long").as("rk"))
    val pxRanked = proximityRerank(docs, terms, poolK, outK)
      .select(col("doc_id"), col("rk"))
    evalOf("bm25", bmRanked).unionByName(evalOf("proximity", pxRanked))
  }

  /** Dataset card (d129) — the one-page corpus summary a curation run
    * publishes with its output (the Datasheets habit, reduced to the
    * engine-derivable facts): size, token volume, vocabulary, mean
    * document length, exact-duplicate mass, mean stopword ratio, and
    * the language mix — one (metric, value) row each, every value a
    * deterministic double (counts and integer ratios; the one mean over
    * per-doc doubles is decimal-summed before its single divide, the
    * d45 cross-engine discipline).
    *
    * Scale shape: two corpus scans (core aggregates + the langId pass),
    * one vocabulary-scale word groupBy (map-side partials — the same
    * class every LM op already pays), the digest distinct inside the
    * core aggregate. Output is ~10 rows.
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val stopRatio = size(filter(w, x =>
      x.isin(markers.head._2.map(s => s: Any): _*))).cast("double") /
      size(w).cast("double")
    val core = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(w)).cast("double").as("n_tokens"),
      countDistinct(md5(col("text"))).cast("double").as("n_distinct"),
      sum(stopRatio.cast("decimal(28,12)")).as("sum_stop"))
    val vocab = docs.select(explode(w).as("t"))
      .agg(countDistinct(col("t")).cast("double").as("v"))
    val scalarRows = core.crossJoin(broadcast(vocab)).select(
      array(
        struct(lit("n_docs").as("metric"), col("n_docs").as("value")),
        struct(lit("n_tokens").as("metric"), col("n_tokens").as("value")),
        struct(lit("vocab_size").as("metric"), col("v").as("value")),
        struct(lit("mean_doc_tokens").as("metric"),
          (col("n_tokens") / col("n_docs")).as("value")),
        struct(lit("exact_dup_frac").as("metric"),
          (lit(1.0) - col("n_distinct") / col("n_docs")).as("value")),
        struct(lit("mean_stop_ratio").as("metric"),
          (col("sum_stop").cast("double") / col("n_docs")).as("value")))
        .as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.metric").as("metric"), col("r.value").as("value"))
    val langNames = markers.map(_._1)
    val langFrame = docs.sparkSession.createDataFrame(
      langNames.map(Tuple1(_))).toDF("pred_lang")
    val langRows = langId(docs).groupBy(col("pred_lang"))
      .agg(count(lit(1)).cast("double").as("c"))
      .join(langFrame, Seq("pred_lang"), "right_outer")
      .crossJoin(broadcast(core.select(col("n_docs"))))
      .select(concat(lit("lang_share_"), col("pred_lang")).as("metric"),
        (coalesce(col("c"), lit(0.0)) / col("n_docs")).as("value"))
    scalarRows.unionByName(langRows)
  }

  // ---- mergeable dataset-card store (d132) ----

  /** HLL registers of a 60-bit hash stream (column `h`), long format —
    * the d81 construction (p-bit register index, rank from the
    * remainder's bit length), tagged by `kind`. Only OCCUPIED registers
    * are stored; readers coalesce the 0-rank default over a generated
    * grid, so the on-disk table is at most 2^p rows per kind however
    * large the stream.
    */
  private def cardHllRegs(h: DataFrame, kind: String, p: Int): DataFrame = {
    val m = 1 << p
    val L1 = 60 - p + 1
    h.select((col("h") % m).as("j"), expr(s"h div $m").as("w"))
      .select(col("j"), expr(
        s"CASE WHEN w = 0 THEN $L1 ELSE CAST($L1 - length(bin(w)) AS INT) END")
        .as("rho"))
      .groupBy(col("j")).agg(max(col("rho")).as("mj"))
      .select(lit(kind).as("kind"), col("j").cast("long").as("j"),
        col("mj").cast("int").as("mj"))
  }

  /** The card store's two increment pieces for one corpus slice:
    * registers (vocab-word + doc-digest HLLs) and the additive state
    * rows (counts, the stop-mass decimal, per-language doc counts, and
    * the slice's max doc id for the orphan check).
    */
  private def cardPieces(docs: DataFrame, p: Int): (DataFrame, DataFrame) = {
    val w = split(col("text"), " ")
    val words = docs.select(explode(w).as("t"))
      .select(Dedup.hash60(col("t")).as("h"))
    val digests = docs.select(Dedup.hash60(col("text")).as("h"))
    val regs = cardHllRegs(words, "vocab", p)
      .unionByName(cardHllRegs(digests, "digest", p))
    val stopRatio = size(filter(w, x =>
      x.isin(markers.head._2.map(s => s: Any): _*))).cast("double") /
      size(w).cast("double")
    val core = docs.agg(
      count(lit(1)).cast("decimal(38,12)").as("n_docs"),
      sum(size(w)).cast("decimal(38,12)").as("n_tokens"),
      sum(stopRatio.cast("decimal(28,12)")).cast("decimal(38,12)")
        .as("sum_stop"),
      max(col("doc_id")).cast("decimal(38,12)").as("max_id"))
    val coreRows = core.select(array(
        struct(lit("n_docs").as("key"), col("n_docs").as("value")),
        struct(lit("n_tokens").as("key"), col("n_tokens").as("value")),
        struct(lit("sum_stop").as("key"), col("sum_stop").as("value")),
        struct(lit("max_id").as("key"), col("max_id").as("value")))
        .as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.key").as("key"), col("r.value").as("value"))
    val langRows = langId(docs).groupBy(col("pred_lang"))
      .agg(count(lit(1)).cast("decimal(38,12)").as("value"))
      .select(concat(lit("lang:"), col("pred_lang")).as("key"), col("value"))
    (regs, coreRows.unionByName(langRows))
  }

  /** PERSIST the mergeable dataset card (the build half of d132) — the
    * production shape of corpus monitoring at 100 TB: the d129 card's
    * facts re-expressed in MERGEABLE state (additive counters + HLL
    * registers for the two distinct counts), so a corpus append updates
    * the card by folding the INCREMENT only — no corpus rescan, no
    * distinct shuffle, ever. Vocabulary and duplicate mass become the
    * d81 cross-engine-exact HLL estimates (registers max-merge;
    * exactness of the merge is what `max` being idempotent and
    * commutative buys). Two parquet tables + the shared manifest:
    * `regs(kind, j, mj)` (≤ 2·2^p rows) and `state(key, value)`
    * (counters, per-language counts, and `max_id` — the append-crash
    * detector: state.max_id ≠ manifest watermark means a previous
    * append's data landed without its manifest flip, and the retry
    * fails loudly instead of double-adding counters; [[cardStoreSync]]
    * recovers by rebuild).
    */
  def saveCardStore(docs: DataFrame, path: String, p: Int = 8): Unit = {
    import graft.sources.IndexManifest
    val (regs, state) = cardPieces(docs, p)
    regs.coalesce(1).write.mode("overwrite").parquet(s"$path/regs")
    state.coalesce(1).write.mode("overwrite").parquet(s"$path/state")
    val (rows, maxId) = IndexManifest.watermark(docs, "doc_id")
    IndexManifest.write(path, IndexManifest.Manifest("card",
      Map("p" -> p.toLong), rows, maxId))
  }

  /** Fold an increment into the card store. Write order is the crash
    * contract: registers first (max-merge is idempotent — a replay
    * re-merges the same ranks to the same values), then state (whose
    * `max_id` moves past the manifest watermark), then the manifest
    * flip. A crash between state and manifest leaves max_id ahead of
    * the watermark; the retry detects it (named error) instead of
    * adding the increment's counters twice.
    */
  def appendCardStore(newDocs: DataFrame, path: String): Unit = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val m = IndexManifest.read(path)
    require(m.kind == "card", s"appendCardStore: manifest kind ${m.kind}")
    val spark = newDocs.sparkSession
    val p = m.params("p").toInt
    val storedMax = spark.read.parquet(s"$path/state")
      .filter(col("key") === "max_id")
      .head().getDecimal(1).longValueExact()
    if (storedMax != m.corpusMaxId)
      throw new IndexManifestException(
        s"card store at $path holds state above its manifest watermark " +
          s"(state max_id $storedMax vs manifest ${m.corpusMaxId}) — a " +
          "previous append crashed before its manifest flip; rebuild " +
          "(cardStoreSync) instead of retrying")
    val minNew = newDocs.agg(min(col("doc_id"))).head().getLong(0)
    if (minNew <= m.corpusMaxId)
      throw new IndexManifestException(
        s"appendCardStore: increment ids from $minNew are not above the " +
          s"manifest watermark ${m.corpusMaxId}")
    val (incRegs, incState) = cardPieces(newDocs, p)
    val mergedRegs = spark.read.parquet(s"$path/regs")
      .unionByName(incRegs)
      .groupBy(col("kind"), col("j")).agg(max(col("mj")).as("mj"))
      .select(col("kind"), col("j"), col("mj").cast("int").as("mj"))
      .localCheckpoint(true) // pin before overwriting its own source
    val mergedState = spark.read.parquet(s"$path/state")
      .unionByName(incState)
      .groupBy(col("key"))
      .agg(sum(col("value")).cast("decimal(38,12)").as("v"),
        max(col("value")).as("mx"))
      .select(col("key"),
        when(col("key") === "max_id", col("mx")).otherwise(col("v"))
          .as("value"))
      .localCheckpoint(true)
    mergedRegs.coalesce(1).write.mode("overwrite").parquet(s"$path/regs")
    mergedState.coalesce(1).write.mode("overwrite").parquet(s"$path/state")
    val (incRows, incMax) = IndexManifest.watermark(newDocs, "doc_id")
    IndexManifest.write(path, IndexManifest.Manifest("card",
      m.params, m.corpusRows + incRows, math.max(m.corpusMaxId, incMax)))
  }

  /** Fresh/append/rebuild maintenance policy for the card store (the
    * e34/e43 convention): untouched corpus → "fresh"; grown with a
    * clean store → fold the increment ("append"); anything else —
    * including the crashed-append state the append guard names —
    * rebuild. Returns the action taken.
    */
  def cardStoreSync(docs: DataFrame, path: String, p: Int = 8): String = {
    import graft.sources.{IndexManifest, IndexManifestException}
    def rebuild(): String = { saveCardStore(docs, path, p); "rebuild" }
    val m =
      try IndexManifest.read(path)
      catch { case _: IndexManifestException => return rebuild() }
    if (m.kind != "card" || m.params.get("p").map(_.toInt) != Some(p))
      return rebuild()
    val (rows, maxId) = IndexManifest.watermark(docs, "doc_id")
    if (rows == m.corpusRows && maxId == m.corpusMaxId) "fresh"
    else if (rows > m.corpusRows && maxId > m.corpusMaxId)
      try {
        appendCardStore(docs.filter(col("doc_id") > m.corpusMaxId), path)
        "append"
      } catch { case _: IndexManifestException => rebuild() }
    else rebuild()
  }

  /** Serve the d129-shaped card from the STORE — counts exact, the two
    * distinct counts as their HLL estimates (metrics named `_hll` to
    * say so), duplication estimated from the digest HLL. Reads two
    * BOUNDED tables (≤ 2·2^p register rows + ~8 state rows) and folds
    * them driver-side (the e52 bounded-residency pattern) — never
    * touches the corpus; every double op (decimal→double cast, the
    * divides, 1 − x) is the same IEEE op the SQL mirror runs. Language
    * rows cover the languages the corpus actually produced (the store
    * cannot know about labels it never saw).
    */
  def cardFromStore(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import graft.sources.IndexManifest
    val m = IndexManifest.read(path)
    require(m.kind == "card", s"cardFromStore: manifest kind ${m.kind}")
    val p = m.params("p").toInt
    val regs = spark.read.parquet(s"$path/regs").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val state = spark.read.parquet(s"$path/state").collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    import spark.implicits._
    spark.createDataset(cardMetrics(regs, state, p)).toDF("metric", "value")
  }

  /** The (metric, value) fold shared by [[cardFromStore]] and the
    * streaming card ([[graft.streaming.EventTimeOps]]): every double op
    * is the same IEEE op the SQL mirror runs. Unlike d81
    * (vocabulary-scale streams, raw regime by construction) the card's
    * streams can be SMALL (a tiny synthetic vocabulary), so the
    * published Flajolet small-range correction applies: with V > 0
    * empty registers and raw ≤ 2.5m, estimate m·ln(m/V) instead — the
    * ln quantized at 1e-8 (the d45 device) so both engines publish the
    * same double despite libm's last bit.
    */
  private[graft] def cardMetrics(regs: Map[(String, Long), Int],
      state: Map[String, java.math.BigDecimal], p: Int): Seq[(String, Double)] = {
    val mm = 1 << p
    val L1 = 60 - p + 1
    val alphaNum = Dedup.hllAlphaNum(p).toDouble
    def est(kind: String): Double = {
      var s = 0L
      var v = 0L
      var j = 0L
      while (j < mm) {
        val mj = regs.getOrElse((kind, j), 0)
        if (mj == 0) v += 1
        s += 1L << (L1 - mj)
        j += 1
      }
      val raw = alphaNum / s.toDouble
      if (v > 0 && raw <= 2.5 * mm)
        mm.toDouble * (math.floor(math.log(mm.toDouble / v) * 1e8) / 1e8)
      else raw
    }
    val nDocs = state("n_docs").doubleValue
    val nTokens = state("n_tokens").doubleValue
    val vocab = est("vocab")
    val docHll = est("digest")
    val scalars = Seq(
      ("n_docs", nDocs),
      ("n_tokens", nTokens),
      ("mean_doc_tokens", nTokens / nDocs),
      ("mean_stop_ratio", state("sum_stop").doubleValue / nDocs),
      ("vocab_hll", vocab),
      ("doc_distinct_hll", docHll),
      ("exact_dup_frac_hll", 1.0 - docHll / nDocs))
    val langs = state.keys.filter(_.startsWith("lang:")).toSeq.sorted
      .map(k => (s"lang_share_${k.drop(5)}", state(k).doubleValue / nDocs))
    scalars ++ langs
  }

  /** The card store's increment pieces for one corpus slice, exposed
    * for the streaming card (batch kernels verbatim per micro-batch —
    * the gate discipline).
    */
  private[graft] def cardIncrement(docs: DataFrame,
      p: Int): (DataFrame, DataFrame) = cardPieces(docs, p)

  /** PERSIST the BM25 inverted index (the build half of d87) — the
    * retrieval production shape: postings (term, doc_id, tf) for EVERY
    * term, per-doc lengths, and the corpus constants (n_docs, sum_dl),
    * built once so any query is answered from postings without
    * re-reading text. At 100 TB the postings table is bucketed BY term
    * so a query's probe co-locates without shuffling the index; it is
    * vocabulary×doc-scale and never broadcast.
    *
    * Maintenance: BM25's idf and avgdl are corpus-global, so the SCORES
    * move with every append — but the INDEX's pieces do not need a
    * rebuild to track them (the round-13 lesson that retired the
    * spectral family's rebuild-only stance, in its simplest form):
    * postings and lengths are doc-keyed append-only rows, and the
    * constants are EXACT integer sums that merge — so
    * [[appendBm25Index]] appends the increment's rows and REPLACES the
    * constants with the merged sums, and the appended index serves
    * scores BIT-IDENTICAL to a full rebuild on the grown corpus
    * (spec-pinned; d159 registers it against d17's oracle verbatim).
    * Every consumer reads the constants per query, so nothing ever
    * serves a frozen ranking function. The store is VERSIONED (the
    * d153 device): each version's manifest carries its own
    * (n_docs = corpus_rows, sum_dl) pair, so an as-of read is the
    * postings/lens doc_id cut plus THAT version's constants — BM25
    * time travel, "the ranking run X saw" (d160).
    */
  def saveBm25Index(docs: DataFrame, path: String, termBuckets: Int = 0): Unit = {
    require(termBuckets >= 0, s"termBuckets=$termBuckets")
    // rebuild = new lineage; versions die before the data overwrite
    graft.sources.IndexManifest.clearVersions(path)
    val w = split(col("text"), " ")
    val postings = docs.select(col("doc_id"), explode(w).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("tf"))
    // termBuckets > 0 (d90): the scaladoc's 100 TB layout made real —
    // postings land PARTITIONED BY the term's hash60 bucket, so a
    // query's probe prunes whole bucket directories at the file-index
    // layer (PartitionFilters) before the term filter even pushes.
    // The bucket is a pure term function (the shared hash60), so the
    // reader derives each query term's bucket driver-side (hash60Jvm,
    // spec-pinned equal to the Column form) — no bucket map to store.
    // the postings/lens writes and the corpus-constants agg are
    // order-independent for a REBUILD (manifest flip below is the
    // commit point) — overlapped (IndexManifest.awaitAll doc). The
    // bucketed postings layout uses an EXPLICIT partition count when
    // the frame is gated small, so AQE cannot coalesce the write back
    // to one task (the round-13 failure mode of bare keyed repartition).
    var c: org.apache.spark.sql.Row = null
    graft.sources.IndexManifest.awaitAll(Seq(
      () =>
        if (termBuckets > 0) {
          val tb = postings.withColumn("tb",
            pmod(Dedup.hash60(col("term")), lit(termBuckets.toLong)))
          val laid = graft.sources.ScanParallelism.layoutForWrite(
            tb, termBuckets, Seq(col("tb")))
          (if (laid eq tb) tb.repartition(col("tb")) else laid)
            .write.mode("overwrite").partitionBy("tb")
            .parquet(s"$path/postings")
        } else {
          postings.write.mode("overwrite").parquet(s"$path/postings")
        },
      () => docs.select(col("doc_id"), size(w).cast("long").as("dl"))
        .write.mode("overwrite").parquet(s"$path/lens"),
      () => c = docs.agg(count(lit(1)).cast("long"),
        coalesce(sum(size(w)).cast("long"), lit(0L))).head()))
    val (nDocs, sumDl) = (c.getLong(0), c.getLong(1))
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/consts")
    val (rows, maxId) = graft.sources.IndexManifest.watermark(docs, "doc_id")
    // sum_dl rides the manifest so (a) the append path merges constants
    // without trusting a possibly-mid-crash consts table and (b) every
    // VERSION pins its own (n_docs, sum_dl) pair for as-of serving
    graft.sources.IndexManifest.writeVersioned(path,
      graft.sources.IndexManifest.Manifest(
        "bm25", Map("term_buckets" -> termBuckets.toLong,
          "sum_dl" -> sumDl), rows, maxId))
  }

  /** APPEND to a persisted BM25 index (d159) — the round-13
    * mergeable-statistics lesson retiring this store's rebuild-only
    * stance: the increment's postings and lengths land as new rows
    * (history files byte-frozen), and the corpus constants are replaced
    * by EXACT integer merges (n_docs + |inc|, sum_dl + Σ inc lengths) —
    * so the appended index serves scores bit-identical to a full
    * rebuild on the grown corpus, while history text is never re-read,
    * re-tokenized, or re-scored at maintenance time. Crash contract:
    * BOTH data tables carry doc_id and BOTH are orphan-guarded before
    * any write (the two table appends run concurrently, so either can
    * commit first) — any crash in the window leaves orphan rows above
    * the watermark in whichever table committed, and the retry fails
    * loudly (requireNoOrphans) instead of double-appending; the
    * constants merge reads the MANIFEST's sum_dl (flipped atomically
    * with the watermark), never the possibly-mid-crash consts table.
    */
  def appendBm25Index(increment: DataFrame, path: String): Unit = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val man = IndexManifest.require(path, "bm25")
    val baseSum = man.params.getOrElse("sum_dl",
      throw new IndexManifestException(
        s"bm25 index at $path predates incremental append (no 'sum_dl') — rebuild once"))
    val w = split(col("text"), " ")
    val stats = increment.agg(count(lit(1)),
      min(col("doc_id").cast("long")), max(col("doc_id").cast("long")),
      coalesce(sum(size(w)).cast("long"), lit(0L))).head()
    if (stats.getLong(0) == 0L) return
    val (rows, minId, maxId, incSum) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    if (minId <= man.corpusMaxId)
      throw new IndexManifestException(
        s"increment ids start at $minId but the index watermark is " +
          s"${man.corpusMaxId} ($path) — appends must be id-monotone")
    // BOTH tables guarded (the appends below are concurrent, so a crash
    // can commit either first — the old sequential order guaranteed
    // lens ⇒ postings); the guards are pure reads, overlapped
    IndexManifest.awaitAll(Seq(
      () => IndexManifest.requireNoOrphans(
        increment.sparkSession.read.parquet(s"$path/postings"), "doc_id",
        man, path),
      () => IndexManifest.requireNoOrphans(
        increment.sparkSession.read.parquet(s"$path/lens"), "doc_id",
        man, path)))
    val postings = increment.select(col("doc_id"), explode(w).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val tb = man.params.getOrElse("term_buckets", 0L)
    IndexManifest.awaitAll(Seq(
      () =>
        if (tb > 0L) {
          val tbl = postings
            .withColumn("tb", pmod(Dedup.hash60(col("term")), lit(tb)))
          val laid = graft.sources.ScanParallelism.layoutForWrite(
            tbl, tb.toInt, Seq(col("tb")))
          (if (laid eq tbl) tbl.repartition(col("tb")) else laid)
            .write.mode("append").partitionBy("tb").parquet(s"$path/postings")
        } else {
          postings.write.mode("append").parquet(s"$path/postings")
        },
      () => increment.select(col("doc_id"), size(w).cast("long").as("dl"))
        .write.mode("append").parquet(s"$path/lens")))
    val spark = increment.sparkSession
    import spark.implicits._
    Seq((man.corpusRows + rows, baseSum + incSum)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/consts")
    IndexManifest.writeVersioned(path,
      man.copy(params = man.params + ("sum_dl" -> (baseSum + incSum)),
        corpusRows = man.corpusRows + rows, corpusMaxId = maxId))
  }

  /** The e34/d79 maintenance policy for the BM25 index: FRESH serves
    * as-is; MONOTONE GROWTH appends ([[appendBm25Index]] — bit-identical
    * to a rebuild by the exact-merge argument); anything else (shrink,
    * rewrite, params drift, pre-append artifact, missing manifest)
    * rebuilds. Idempotent; returns the action taken, spec-pinned.
    */
  def bm25IndexSync(docs: DataFrame, path: String,
      termBuckets: Int = 0): String = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val man = try Some(IndexManifest.require(path, "bm25",
      Map("term_buckets" -> termBuckets.toLong)))
    catch { case _: IndexManifestException => None }
    man match {
      case Some(m) =>
        val stats = docs.agg(count(lit(1)), max(col("doc_id").cast("long")),
          sum(when(col("doc_id") <= m.corpusMaxId, 1L).otherwise(0L))).head()
        val (rows, maxId) = (stats.getLong(0),
          if (stats.isNullAt(1)) -1L else stats.getLong(1))
        val prefixRows = if (stats.isNullAt(2)) 0L else stats.getLong(2)
        if (rows == m.corpusRows && maxId == m.corpusMaxId) "fresh"
        else if (prefixRows == m.corpusRows && maxId > m.corpusMaxId &&
            m.params.contains("sum_dl")) {
          try {
            appendBm25Index(docs.filter(col("doc_id") > m.corpusMaxId), path)
            "append"
          } catch { case _: IndexManifestException =>
            saveBm25Index(docs, path, termBuckets); "rebuild"
          }
        } else { saveBm25Index(docs, path, termBuckets); "rebuild" }
      case None => saveBm25Index(docs, path, termBuckets); "rebuild"
    }
  }

  /** BM25 scoring from a persisted index (d87) — [[bm25]] with text
    * replaced by postings probes: per query term one filtered postings
    * read left-joined onto the length table (tf = 0 when absent — the
    * formula's zero contribution, exactly as the batch kernel computes
    * it), dfs and the corpus constants as a broadcast single row, and
    * the SAME explicitly-parenthesized score expression in the SAME
    * term order, so indexed scores are bit-identical to [[bm25]]'s —
    * registered against d17's oracle verbatim (persistence must not
    * change a score). The per-term contributions are pivoted to
    * COLUMNS before the sum precisely because float addition order is
    * part of the contract — an unordered SUM over posting rows would
    * drift in the last bit.
    */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      asOfVersion: Option[Int] = None): DataFrame = {
    require(terms.nonEmpty, "bm25Indexed: need at least one query term")
    // TIME TRAVEL (d160): a version pins its OWN ranking function —
    // postings and lens cut at the watermark (pushed doc_id filters)
    // plus THAT version's (n_docs, sum_dl) constants off the version
    // manifest, so the as-of read serves exactly the scores a consumer
    // saw at version N (idf/avgdl included), not today's scores over
    // yesterday's documents.
    val snap = asOfVersion.map { v =>
      val s = graft.sources.IndexManifest.readVersion(path, v)
      if (!s.params.contains("sum_dl"))
        throw new graft.sources.IndexManifestException(
          s"version $v at $path predates constant-versioning (no 'sum_dl') — rebuild once")
      s
    }
    // deliberately NOT checkpointed: each consumer keeps its own parquet
    // scan with the term filter PUSHED (PushedFilters, spec-asserted) —
    // reading q postings lists off disk IS the index's serving shape,
    // and a materialization would hide the pushdown and hold the probe
    // in memory for no reuse win. On a d90 bucketed layout the probe is
    // additionally bucket-scoped driver-side (see [[probedPostings]]).
    val postings = snap match {
      case None => probedPostings(spark, path, terms)
      case Some(s) => probedPostings(spark, path, terms)
        .filter(col("doc_id") <= s.corpusMaxId)
    }
    val lens = snap match {
      case None => spark.read.parquet(s"$path/lens")
      case Some(s) => spark.read.parquet(s"$path/lens")
        .filter(col("doc_id") <= s.corpusMaxId)
    }
    // coalesce guards the all-terms-absent probe (empty frame → NULL sums)
    val dfAggs = count(lit(1)).as("probe_rows") +:
      terms.zipWithIndex.map { case (t, i) =>
        coalesce(sum(when(col("term") === t, 1L).otherwise(0L)), lit(0L))
          .cast("double").as(s"df$i")
      }
    val dfs = postings.agg(dfAggs.head, dfAggs.tail: _*).drop("probe_rows")
    val consts = snap match {
      case None => spark.read.parquet(s"$path/consts")
        .select(col("n_docs").cast("double").as("nd"),
          col("sum_dl").cast("double").as("sum_dl"))
      case Some(s) =>
        import spark.implicits._
        Seq((s.corpusRows, s.params("sum_dl"))).toDF("n_docs", "sum_dl")
          .select(col("n_docs").cast("double").as("nd"),
            col("sum_dl").cast("double").as("sum_dl"))
    }
    var scored = lens
    terms.zipWithIndex.foreach { case (t, i) =>
      scored = scored.join(
        postings.filter(col("term") === t)
          .select(col("doc_id"), col("tf").as(s"tf$i")),
        Seq("doc_id"), "left_outer")
    }
    val dl = col("dl").cast("double")
    val avgdl = col("sum_dl") / col("nd")
    val score = terms.indices.map { i =>
      val tf = coalesce(col(s"tf$i"), lit(0L)).cast("double")
      val idf = (col("nd") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dl / avgdl)))
    }.reduce(_ + _)
    scored.crossJoin(broadcast(dfs)).crossJoin(broadcast(consts))
      .select(col("doc_id"), score.as("score"))
  }

  /** Conjunctive (AND) BM25 retrieval (d94) — the other standard
    * serving shape of an inverted index: only documents containing ALL
    * query terms are candidates, and ONLY candidates are scored. The
    * candidate set is the postings-lists intersection, computed as one
    * conditional-aggregate pass over the pushed probe (per doc, each
    * term's tf pivoted to a column; conjunction = every tf non-null) —
    * never a scan of the corpus, never scores for documents the AND
    * semantics excludes. Candidates then fetch their lengths (one
    * equi-join against the lens table — the candidate side is
    * intersection-small, AQE broadcasts it) and run the d17
    * bit-identical score expression with tf from the pivot; the cut is
    * the d89 TakeOrderedAndProject shape. Returns (rk, doc_id, score).
    */
  def bm25TopKAll(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], kTop: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && kTop > 0, s"terms=$terms kTop=$kTop")
    val probe = probedPostings(spark, path, terms)
    val dfAggs = count(lit(1)).as("probe_rows") +:
      terms.zipWithIndex.map { case (t, i) =>
        coalesce(sum(when(col("term") === t, 1L).otherwise(0L)), lit(0L))
          .cast("double").as(s"df$i")
      }
    val dfs = probe.agg(dfAggs.head, dfAggs.tail: _*).drop("probe_rows")
    val cand = probe.groupBy(col("doc_id"))
      .agg(terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf"))).as(s"tf$i")
      }.head, terms.zipWithIndex.drop(1).map { case (t, i) =>
        sum(when(col("term") === t, col("tf"))).as(s"tf$i")
      }: _*)
      .filter(terms.indices.map(i => col(s"tf$i").isNotNull).reduce(_ && _))
    val lens = spark.read.parquet(s"$path/lens")
    val consts = spark.read.parquet(s"$path/consts")
      .select(col("n_docs").cast("double").as("nd"),
        col("sum_dl").cast("double").as("sum_dl"))
    val dl = col("dl").cast("double")
    val avgdl = col("sum_dl") / col("nd")
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = (col("nd") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dl / avgdl)))
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
    cand.join(lens, Seq("doc_id"))
      .crossJoin(broadcast(dfs)).crossJoin(broadcast(consts))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(kTop)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("doc_id"), col("score"))
  }

  /** The manifest-gated, bucket-scoped, term-filtered postings probe
    * shared by every index reader ([[bm25Indexed]], [[bm25TopKAll]]).
    */
  private def probedPostings(spark: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String]): DataFrame = {
    val man = graft.sources.IndexManifest.require(path, "bm25")
    val termBuckets = man.params.getOrElse("term_buckets", 0L)
    val raw = spark.read.parquet(s"$path/postings")
    val scoped =
      if (termBuckets > 0L) {
        val tbs = terms.map(t => graft.operators.Dedup.hash60Jvm(t) % termBuckets)
          .distinct.sorted
        raw.filter(col("tb").isin(tbs: _*))
      } else raw
    scoped.filter(col("term").isin(terms: _*))
  }

  /** BM25 top-k RETRIEVAL from the persisted index (d89) — the serving
    * shape of an inverted index: per query, the k best documents, not a
    * score for every document (d87 proves the scoring; this row proves
    * the retrieval plan). Each query's scores come from
    * [[bm25Indexed]] VERBATIM — the bit-identical pivoted-sum
    * expression over pushed postings probes — and the cut is
    * `orderBy(score desc, doc_id).limit(k)`, which Spark plans as
    * TakeOrderedAndProject (plan-guarded): a per-partition top-k
    * heap + one k-row driver merge, never a global sort — the shape
    * that stays O(k) per partition at any corpus size. Ranks are
    * assigned AFTER the cut (a window over k rows, bounded by
    * construction — the repo's bounded-table window rule).
    *
    * Ties break by doc_id ascending in both the cut and the rank, so
    * the result is total-order deterministic and oracle-exact.
    * Returns (query_id, rk, doc_id, score) for `queries(query_id)`.
    */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: Seq[Seq[String]], kTop: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && kTop > 0, s"queries=$queries kTop=$kTop")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
    queries.zipWithIndex.map { case (terms, qi) =>
      bm25Indexed(spark, path, terms, k1, b)
        .orderBy(col("score").desc, col("doc_id").asc).limit(kTop)
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(lit(qi.toLong).as("query_id"), col("rk"), col("doc_id"),
          col("score"))
    }.reduce(_ unionByName _)
  }

  /** Lexical-diversity quality signals — the full-distribution
    * complement to [[repetition]]'s top-n-gram share: type-token ratio
    * and the Simpson/Herfindahl concentration Σ(c/n)² of the doc's
    * unigram distribution (1 − Simpson = probability two random tokens
    * differ). Low diversity ⇒ template/boilerplate text — a standard
    * corpus-filter axis.
    *
    * Deliberately NOT Shannon entropy: `ln` is a libm call whose last
    * bit differs across engines (see [[bm25]]'s idf note) — the Simpson
    * index carries the same ordering signal as rational arithmetic:
    * `sumsq` is an exact integer in both engines and each double is one
    * exact-int division, so hashes match bit-for-bit. A caller wanting
    * entropy applies `-ln` on top.
    *
    * Pure per-row ARRAY work, zero shuffle: run lengths of the SORTED
    * token array (boundary positions via one linear `filter` pass, the
    * same zip_with construction as [[Curation.cdcChunks]]) replace the
    * explode → groupBy(doc, token) shuffle a naive count would pay.
    * Returns (doc_id, n_tokens, n_types, sumsq, ttr, simpson).
    */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), sort_array(split(col("text"), " ")).as("s"))
      .withColumn("n", size(col("s")))
      // run starts: position 0 plus every position whose token differs
      // from its predecessor (s is sorted, so runs are maximal)
      .withColumn("starts", expr(
        "filter(sequence(0, n - 1), i -> i = 0 OR element_at(s, i + 1) != element_at(s, i))"))
      .withColumn("lens", expr(
        "zip_with(starts, concat(slice(starts, 2, size(starts) - 1), array(n)), (a, b) -> b - a)"))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        expr("size(starts)").cast("long").as("n_types"),
        expr("aggregate(lens, 0L, (acc, c) -> acc + CAST(c AS BIGINT) * CAST(c AS BIGINT))")
          .as("sumsq"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("sumsq"),
        (col("n_types").cast("double") / col("n_tokens").cast("double")).as("ttr"),
        (col("sumsq").cast("double") /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double"))).as("simpson"))

  /** Within-document repetition signals — the quality filters that drop
    * boilerplate/spam before training (the published Gopher curation
    * rules filter on exactly these: fraction of duplicated content and
    * the most-frequent-n-gram share):
    *
    *  - `dup_token_frac` = 1 − distinct/total tokens: per-row expression
    *    work only (`array_distinct` inside the projection), no shuffle;
    *  - `top_ngram_frac` = occurrences of the doc's most frequent
    *    word n-gram / total n-grams: explode → count per (doc, gram) →
    *    max/sum per doc. Both aggregates are partial (map-side combine),
    *    and all keys carry doc_id, so the shuffles are skew-free and the
    *    whole thing scales linearly in corpus size.
    *
    * Fractions are one integer divide each — bit-identical in DuckDB.
    * Docs with fewer than `n` tokens have no n-grams → top_ngram_frac 0.
    * Returns (doc_id, n_tokens, dup_token_frac, top_ngram_frac).
    */
  def repetition(docs: DataFrame, n: Int = 2): DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        size(col("w")).cast("long").as("n_tokens"),
        expr("size(array_distinct(w))").cast("long").as("n_distinct"))
    val grams = base.filter(size(col("w")) >= n).select(col("doc_id"),
      explode(expr(
        s"transform(sequence(1, size(w)-${n - 1}), i -> concat_ws(' ', slice(w, i, $n)))")).as("g"))
    val top = grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"), sum(col("c")).as("n_grams"))
    base.join(top, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")).as("dup_token_frac"),
        coalesce(col("top_c").cast("double") / col("n_grams"), lit(0.0)).as("top_ngram_frac"))
  }

  /** Per-document bigram stream (prev, cur) — one row per adjacent word
    * pair; docs shorter than two tokens emit nothing. Shared by the
    * model-training and scoring halves of [[bigramLm]] so both sides
    * read one definition of "bigram".
    */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(w)), i -> struct(element_at(w, i - 1) AS prev, element_at(w, i) AS cur))")).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))

  /** Corpus-trained bigram language-model score — the CCNet-style
    * quality signal: train add-one-smoothed bigram statistics on the
    * corpus itself, then score every document by its average negative
    * log-likelihood under that model (low = looks like the corpus,
    * high = outlier/noise). The published web-curation pipelines bucket
    * on exactly this number; [[perplexityTiers]] adds the bucketing.
    *
    * Scale shape: bigram counts are a map-side-combined groupBy on the
    * pair key; context totals AND the vocabulary size derive from the
    * already-aggregated pair counts (so text is scanned exactly twice —
    * the model pass and the scoring pass; a production run over one
    * corpus would materialize the gram stream once), and the vocabulary
    * count is a single-row aggregate broadcast into the model (the
    * corpus-totals crossJoin device). V counts tokens that appear in
    * some bigram — identical to "all tokens" on any corpus without
    * single-token documents.
    * Scoring re-joins the gram stream to the model on the pair key —
    * the model side has exactly one row per distinct bigram, so skew
    * lives only on the probe side (hot function words), which AQE's
    * skew-join split handles; the model is corpus-vocabulary-scale and
    * deliberately NOT broadcast.
    *
    * Oracle determinism: each distinct bigram's negative log-prob is
    * computed once in the model, rounded to DECIMAL(28,8) (the
    * cross-engine double→decimal agreement device, see the PQ training
    * oracle), and summed exactly as decimal; `avg_nll` is then one
    * IEEE double divide. Docs with fewer than two tokens have no
    * bigrams and are absent from the output.
    *
    * Returns (doc_id, n_bigrams, avg_nll).
    */
  def bigramLm(docs: DataFrame): DataFrame = {
    val g = bigrams(docs)
    // the model's three consumers (context totals, vocabulary, the
    // model join) all read the aggregated pair counts — an eager
    // localCheckpoint (the CC-iteration device) pins the
    // vocabulary-scale table so the corpus text is scanned exactly
    // twice (model pass + scoring pass), not once per consumer
    val c2 = g.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    val vocab = c2.select(explode(array(col("prev"), col("cur"))).as("t"))
      .agg(countDistinct(col("t")).cast("long").as("v"))
    val model = c2.join(c1, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .select(col("prev"), col("cur"), expr(
        "CAST(ln(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE)) AS DECIMAL(28,8))").as("nll"))
    g.join(model, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"), sum(col("nll")).as("sum_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_nll").cast("double") / col("n_bigrams")).as("avg_nll"))
  }

  /** Kneser-Ney smoothed bigram LM (d136) — the canonical n-gram
    * smoothing (Kneser & Ney 1995; the interpolated form of Chen &
    * Goodman 1998 that KenLM ships as its default), upgrading the
    * add-one model of [[bigramLm]]: absolute discounting with the
    * discounted mass redistributed by CONTINUATION probability
    * (how many distinct contexts a word follows), not raw frequency —
    * the fix for "San Francisco" inflating P(Francisco | anything):
    *
    *   P(cur|prev) = max(c2 − D, 0)/c1 + D·N1+(prev,·)/c1 · N1+(·,cur)/B
    *
    * with D = 3/4, c2/c1 the bigram/context counts, N1+(prev,·) the
    * distinct continuations of prev, N1+(·,cur) the distinct left
    * contexts of cur, and B the distinct-bigram total. Self-scoring
    * (the [[bigramLm]] convention) means every scored bigram is in the
    * model, so c2 ≥ 1 and the max() never clips.
    *
    * Cross-engine exactness: with D = 3/4 the probability is a ratio
    * of two exact BIGINTs — P = ((4·c2 − 3)·B + 3·n1p·n1r)/(4·c1·B) —
    * so each distinct bigram's nll is ln() of one exact integer
    * division, rounded once to DECIMAL(28,8) (the d45 device) and
    * summed exactly; `avg_nll` is one IEEE divide. No Double enters
    * before the final ln.
    *
    * Scale shape: identical to [[bigramLm]] — all four count tables
    * derive from the localCheckpointed pair counts (the corpus text is
    * scanned exactly twice), the model join is vocabulary-scale and
    * deliberately not broadcast, B is the single broadcast scalar.
    * Returns (doc_id, n_bigrams, avg_nll).
    */
  def kneserNeyLm(docs: DataFrame): DataFrame = {
    val g = bigrams(docs)
    val c2 = g.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = c2.groupBy(col("prev"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
    val n1r = c2.groupBy(col("cur")).agg(count(lit(1)).as("n1r"))
    val btot = c2.agg(count(lit(1)).cast("long").as("b"))
    val model = c2.join(c1, Seq("prev")).join(n1r, Seq("cur"))
      .crossJoin(broadcast(btot))
      .select(col("prev"), col("cur"), expr(
        """CAST(ln(CAST(4 * c1 * b AS DOUBLE) /
          |CAST((4 * c2 - 3) * b + 3 * n1p * n1r AS DOUBLE)) AS DECIMAL(28,8))"""
          .stripMargin.replace("\n", " ")).as("nll"))
    g.join(model, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"), sum(col("nll")).as("sum_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_nll").cast("double") / col("n_bigrams")).as("avg_nll"))
  }

  /** PMI collocations (d141) — pointwise mutual information over the
    * shared bigram stream (Church & Hanks 1990: the collocation-mining
    * statistic) plus word2phrase's discounted score (Mikolov et al.
    * 2013, §4: (c₂−δ)·T/(c(a)·c(b)) — the threshold statistic that
    * decides which adjacent pairs become single phrase tokens in a
    * phrase-aware tokenization pass). Marginals are the bigram table's
    * row/column sums (contingency-table PMI), so the whole statistic
    * derives from the one localCheckpointed pair-count table.
    *
    * Cross-engine exactness: pmi = ln of a ratio of two exact BIGINTs
    * (c₂·T / rm·cm), rounded once to DECIMAL(28,8) (the d45 device);
    * the phrase score is one IEEE divide of exact longs. Pairs below
    * `minCount` are dropped FIRST (the published rare-pair guard — PMI
    * is degenerate on hapax pairs, and with minCount ≥ delta the
    * discounted numerator stays non-negative); the top-k plans as
    * TakeOrderedAndProject ordered by the ROUNDED pmi (ties resolved
    * by the pair itself — total order, rank deterministic).
    *
    * Returns (rank, prev, cur, c2, pmi, phrase_score).
    */
  def pmiCollocations(docs: DataFrame, k: Int = 20, minCount: Long = 5,
      delta: Long = 5): DataFrame = {
    require(minCount >= delta, s"minCount=$minCount < delta=$delta")
    val c2 = bigrams(docs)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val rowm = c2.groupBy(col("prev")).agg(sum(col("c2")).as("rm"))
    val colm = c2.groupBy(col("cur")).agg(sum(col("c2")).as("cm"))
    val tot = c2.agg(sum(col("c2")).cast("long").as("t"))
    val scored = c2.filter(col("c2") >= minCount)
      .join(rowm, Seq("prev")).join(colm, Seq("cur"))
      .crossJoin(broadcast(tot))
      .select(col("prev"), col("cur"), col("c2"),
        // round once to DECIMAL(28,8), publish as DOUBLE (one exact
        // cast — the comparator and every consumer read IEEE doubles)
        expr("CAST(CAST(ln(CAST(c2 * t AS DOUBLE) / CAST(rm * cm AS DOUBLE)) AS DECIMAL(28,8)) AS DOUBLE)")
          .as("pmi"),
        expr(s"CAST((c2 - $delta) * t AS DOUBLE) / CAST(rm * cm AS DOUBLE)")
          .as("phrase_score"))
    val ordW = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("prev").asc, col("cur").asc)
    scored.orderBy(col("pmi").desc, col("prev").asc, col("cur").asc).limit(k)
      .withColumn("rank", row_number().over(ordW).cast("long"))
      .select(col("rank"), col("prev"), col("cur"), col("c2"), col("pmi"),
        col("phrase_score"))
  }

  /** Good-Turing count-of-counts (d151) — the frequency-of-frequencies
    * table (Good 1953; the input to Simple Good-Turing smoothing and
    * the standard vocabulary-coverage diagnostic: n₁/N is the
    * probability the NEXT token is unseen — what decides whether a
    * tokenizer vocab or an LM's count table has converged on this
    * corpus): for every word frequency c, how many distinct words have
    * it (n_c), the token-mass share c·n_c/N, and the Turing-adjusted
    * count c* = (c+1)·n_{c+1}/n_c (NULL at the top frequency, where
    * n_{c+1} is undefined — emitted as NULL in both engines rather
    * than guessed).
    *
    * All counts exact; the two published ratios are one IEEE divide
    * each. Two map-side-combined aggregates (word counts, then
    * count-of-counts — the second's key space is the distinct
    * FREQUENCIES, tiny by Zipf) and one frequency-table self-join.
    * Returns (c, n_c, mass_frac, c_star).
    */
  def countOfCounts(docs: DataFrame): DataFrame = {
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // read by the table and the total
    val tot = wc.agg(sum(col("c")).cast("long").as("n"))
    val cc = wc.groupBy(col("c")).agg(count(lit(1)).cast("long").as("n_c"))
      .localCheckpoint(true) // read twice: the row set and the c+1 probe
    val next = cc.select((col("c") - 1).as("c"), col("n_c").as("n_c1"))
    cc.join(next, Seq("c"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("c"), col("n_c"),
        ((col("c") * col("n_c")).cast("double") / col("n")).as("mass_frac"),
        (((col("c") + 1) * col("n_c1")).cast("double") / col("n_c")).as("c_star"))
  }

  /** AMS second-moment sketch (d147) — the F₂ = Σ c_w² estimator of
    * Alon, Matias & Szegedy 1996 (the Gödel-prize streaming sketch;
    * operationally, F₂ over a join key IS the self-join size, which is
    * what a cost-based optimizer wants estimated): each estimator draws
    * a ±1 sign per word from the shared 60-bit hash and keeps one
    * counter X = Σ sign(w)·c_w; E[X²] = F₂. The published estimate
    * averages independent estimators.
    *
    * Cross-engine exactness: signs, counters, squares, and the exact
    * F₂ are ALL integer arithmetic (the signs come from `hash60 mod 2`,
    * identical in both engines); the only doubles are the final
    * mean-of-squares divide and the relative error. One word-count
    * aggregate feeds all `nEst` sign-sums map-side-combined in a single
    * pass — the sketch is O(nEst) state, which is the entire point at
    * stream scale. Returns one row (f2_exact, f2_est, rel_err).
    */
  def amsF2(docs: DataFrame, nEst: Int = 8): DataFrame = {
    require(nEst >= 1, s"nEst=$nEst")
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // read by the sketch row AND the exact row
    val xs = (0 until nEst).map { s =>
      sum((lit(1L) - lit(2L) *
        (graft.operators.Dedup.hash60(concat(lit(s"ams$s:"), col("w"))) % 2)) *
        col("c")).cast("long").as(s"x$s")
    }
    val sketch = wc.agg(xs.head, xs.tail: _*)
    val exact = wc.agg(sum(col("c") * col("c")).cast("long").as("f2_exact"))
    val sq = (0 until nEst).map(s => s"x$s * x$s").mkString(" + ")
    sketch.crossJoin(broadcast(exact))
      .select(col("f2_exact"),
        expr(s"CAST($sq AS DOUBLE) / $nEst").as("f2_est"),
        expr(s"abs(CAST($sq AS DOUBLE) / $nEst - f2_exact) / f2_exact")
          .as("rel_err"))
  }

  /** χ² feature selection (d148) — the classic text-classification
    * preprocessing step (Yang & Pedersen 1997 ranked it the best
    * selector; it is what picks the vocabulary a hashed quality
    * classifier like d68's should spend its buckets on): for each word
    * and a document class predicate, the 2×2 presence/class
    * contingency table (a = class docs containing the word, b = other
    * docs containing it, c/d = the complements) scored
    * χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)).
    *
    * Cross-engine exactness: a,b,c,d are exact counts, the numerator
    * and denominator are exact DECIMAL(38,0) products (the N⁵-shaped
    * numerator overflows BIGINT at ~1e4 docs per slice — in DECIMAL the
    * exact range extends to ~6e7 docs, and an embedded raise_error
    * fires loudly beyond it instead of letting a silent overflow turn
    * the ranks into garbage), and the statistic is ONE IEEE divide of
    * the same integer VALUES either way, so engines agree bit-for-bit.
    * Presence = distinct (word, doc) — one distinct-pair aggregate, one
    * doc-class count, vocabulary-scale joins; top-k as
    * TakeOrderedAndProject on (chi2 desc, word). Degenerate words
    * (df = 0 or N — zero denominator) cannot occur: presence implies
    * 1 ≤ df, and df = N yields (a+b)(c+d) > 0 unless every doc has the
    * word AND one class is empty — guarded by a WHERE on the
    * denominator. Returns (rank, word, a, b, chi2).
    */
  def chiSquareFeatures(docs: DataFrame, classPred: Column,
      k: Int = 20): DataFrame = {
    val tagged = docs.select(col("doc_id"), col("text"),
      classPred.cast("boolean").as("cls")).localCheckpoint(true)
    val pres = tagged
      .select(col("doc_id"), col("cls"), explode(split(col("text"), " ")).as("w"))
      .distinct()
      .groupBy(col("w"))
      .agg(sum(when(col("cls"), 1L).otherwise(0L)).as("a"),
        sum(when(col("cls"), 0L).otherwise(1L)).as("b"))
    // N⁵/16 must stay inside DECIMAL(38,0) for the numerator to be
    // exact: N ≤ 6e7 docs per slice. Checked lazily on the one-row
    // totals frame so the guard costs nothing and fires in streaming
    // twins too.
    val tot = tagged.agg(
      sum(when(col("cls"), 1L).otherwise(0L)).as("np"),
      sum(when(col("cls"), 0L).otherwise(1L)).as("nn"))
      .select(
        when(col("np") + col("nn") > 60000000L,
          raise_error(concat(lit("chiSquareFeatures: "), col("np") + col("nn"),
            lit(" docs exceeds the DECIMAL(38,0) exact range (~6e7) — " +
              "shard the slice or widen the arithmetic"))).cast("long"))
          .otherwise(col("np")).as("np"),
        col("nn"))
    val scored = pres.crossJoin(broadcast(tot))
      // factor-wise zero test (the 4-way BIGINT product itself would
      // overflow at the scales the DECIMAL numerator now supports)
      .filter(col("a") + col("b") =!= 0L &&
        (col("np") - col("a")) + (col("nn") - col("b")) =!= 0L &&
        col("np") =!= 0L && col("nn") =!= 0L)
      .select(col("w").as("word"), col("a"), col("b"),
        expr("""CAST(CAST(np + nn AS DECIMAL(38,0)) *
          |CAST(a * (nn - b) - b * (np - a) AS DECIMAL(38,0)) *
          |CAST(a * (nn - b) - b * (np - a) AS DECIMAL(38,0)) AS DOUBLE) /
          |CAST(CAST((a + b) * ((np - a) + (nn - b)) AS DECIMAL(38,0)) *
          |CAST(np * nn AS DECIMAL(38,0)) AS DOUBLE)"""
          .stripMargin.replace("\n", " ")).as("chi2"))
    val ordW = org.apache.spark.sql.expressions.Window
      .orderBy(col("chi2").desc, col("word").asc)
    scored.orderBy(col("chi2").desc, col("word").asc).limit(k)
      .withColumn("rank", row_number().over(ordW).cast("long"))
      .select(col("rank"), col("word"), col("a"), col("b"), col("chi2"))
  }

  /** Character-entropy quality signal (d142) — Shannon entropy of the
    * per-document character distribution, the gibberish/encoding-noise
    * detector web-cleaning pipelines run beside the word-level rules
    * (binary blobs and key-mash score near-uniform HIGH; single-char
    * floods score near 0; prose sits in a narrow band):
    * H = ln(n) − (Σ cᵢ·ln cᵢ)/n over character counts cᵢ.
    *
    * Exactness discipline: each distinct character's ln(cᵢ) is rounded
    * to DECIMAL(28,8) once (the d45 device), the weighted terms sum as
    * exact decimals (order-independent under any combine), ln(n) gets
    * the same one-time round, and the final H is one IEEE divide + one
    * subtract — bit-identical cross-engine.
    *
    * Scale shape: one (doc, char) aggregate with map-side combine (key
    * space = corpus × alphabet) folded to one row per doc — two keyed
    * shuffles, no joins, no windows. Returns (doc_id, n_chars,
    * n_distinct_chars, entropy).
    */
  def charEntropy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      // Spark's split-by-empty-regex appends one trailing "" element
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_chars"),
        count(lit(1)).cast("long").as("n_distinct_chars"),
        // operand widths are load-bearing: DECIMAL(19,0) × DECIMAL(18,8)
        // is exactly precision 38 scale 8 — one digit wider on either
        // side and Spark's precision-loss rule silently REDUCES the
        // product's scale to 6 (measured: H("aaaa") came out 1.1e-7,
        // i.e. 11 lost quanta, instead of 0)
        sum(expr(
          """CAST(CAST(c AS DECIMAL(19,0)) *
            |CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,8)) AS DECIMAL(38,8))"""
            .stripMargin.replace("\n", " ")))
          .as("s"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        (expr("CAST(CAST(ln(CAST(n_chars AS DOUBLE)) AS DECIMAL(28,8)) AS DOUBLE)")
          - col("s").cast("double") / col("n_chars")).as("entropy"))

  /** CCNet's head/middle/tail perplexity terciles over [[bigramLm]],
    * ranked with the DISTRIBUTED global-rank device: no single-partition
    * corpus-wide window. Documents bucket by a coarse score grid
    * (`floor(avg_nll * bucketScale)`); within-bucket ranks come from a
    * window PARTITIONED by bucket, and bucket base offsets from a
    * cumulative sum over the per-bucket counts — a table bounded by the
    * grid size (hundreds of rows), where a global window is free. The
    * global rank is offset + within-rank; parallelism is bounded by
    * buckets, never 1. `avg_nll` is cross-engine exact (decimal sum,
    * one double divide), so bucket assignment and ranking are too; ties
    * break on doc_id.
    *
    * Returns (doc_id, avg_nll, rnk, tier) with tier head = lowest
    * third of avg_nll (most corpus-like), tail = highest.
    */
  def perplexityTiers(docs: DataFrame, bucketScale: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one narrow (doc_id, n_bigrams, avg_nll) row per doc, read by the
    // rank probe, the bucket counts, and the total — materialize once
    val lm = bigramLm(docs).localCheckpoint(true)
    val scored = lm.select(col("doc_id"), col("avg_nll"),
      floor(col("avg_nll") * bucketScale).cast("long").as("bkt"))
    val counts = scored.groupBy(col("bkt")).agg(count(lit(1)).as("bc"))
    val offsets = counts.select(col("bkt"),
      (sum(col("bc")).over(Window.orderBy(col("bkt"))) - col("bc")).as("off"))
    val total = lm.agg(count(lit(1)).cast("long").as("n_total"))
    val inBkt = Window.partitionBy(col("bkt")).orderBy(col("avg_nll"), col("doc_id"))
    scored.join(offsets, Seq("bkt"))
      .withColumn("rnk", (col("off") + row_number().over(inBkt)).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("avg_nll"), col("rnk"), expr(
        """CASE WHEN (rnk - 1) * 3 < n_total THEN 'head'
          |WHEN (rnk - 1) * 3 < 2 * n_total THEN 'middle'
          |ELSE 'tail' END""".stripMargin.replace("\n", " ")).as("tier"))
  }

  /** Persist a bigram LM trained on `refDocs` — the CCNet deployment
    * shape proper: the model is trained ONCE on a trusted reference
    * domain and then scores arbitrary corpora forever
    * ([[bigramLmScoreIndexed]]), instead of [[bigramLm]]'s self-scoring.
    * Three parquet tables plus the shared index manifest
    * ([[graft.sources.IndexManifest]], kind "bigram-lm", watermarked on
    * the reference corpus):
    *
    *  - `model(prev, cur, nll)` — cost of a SEEN bigram,
    *    ln((c1+V)/(c2+1));
    *  - `ctx(prev, unseen_nll)` — cost of an unseen continuation after
    *    a KNOWN context, ln(c1+V) (add-one mass with c2=0);
    *  - `consts(v, oov_nll)` — vocabulary size and the unknown-context
    *    cost ln(V) ((0+1)/(0+V) — add-one with an empty context row).
    *
    * Every nll is rounded to DECIMAL(28,8) once at build time, so any
    * engine that sums the persisted decimals reproduces scores exactly.
    */
  def saveBigramLm(refDocs: DataFrame, path: String): Unit = {
    import graft.sources.IndexManifest
    val g = bigrams(refDocs)
    val c2 = g.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
      .localCheckpoint(true)
    val vocab = c2.select(explode(array(col("prev"), col("cur"))).as("t"))
      .agg(countDistinct(col("t")).cast("long").as("v"))
    c2.join(c1, Seq("prev")).crossJoin(broadcast(vocab))
      .select(col("prev"), col("cur"), expr(
        "CAST(ln(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE)) AS DECIMAL(28,8))").as("nll"))
      .write.mode("overwrite").parquet(s"$path/model")
    c1.crossJoin(broadcast(vocab))
      .select(col("prev"), expr(
        "CAST(ln(CAST(c1 + v AS DOUBLE)) AS DECIMAL(28,8))").as("unseen_nll"))
      .write.mode("overwrite").parquet(s"$path/ctx")
    vocab.select(col("v"), expr(
        "CAST(ln(CAST(v AS DOUBLE)) AS DECIMAL(28,8))").as("oov_nll"))
      .write.mode("overwrite").parquet(s"$path/consts")
    val (rows, maxId) = IndexManifest.watermark(refDocs, "doc_id")
    IndexManifest.write(path,
      IndexManifest.Manifest("bigram-lm", Map.empty, rows, maxId))
  }

  /** Score any corpus against a persisted [[saveBigramLm]] model —
    * cross-domain perplexity, the operational half of CCNet's filter
    * (reference-domain model, crawl-scale scoring). Out-of-model mass
    * backs off in the add-one-consistent three-tier coalesce: seen
    * bigram → model cost; unseen continuation of a known context → that
    * context's `unseen_nll`; unknown context → the global `oov_nll`.
    * Same output shape as [[bigramLm]]: (doc_id, n_bigrams, avg_nll).
    *
    * Scale shape: two left equi-joins of the gram stream against
    * model-sized tables (one row per distinct reference bigram /
    * context — NOT broadcast), one decimal sum per doc; the model is
    * never retrained and the reference corpus is never re-read. The
    * single collected row is the consts pair (the driver-constant
    * device).
    */
  def bigramLmScoreIndexed(docs: DataFrame, path: String): DataFrame = {
    import graft.sources.IndexManifest
    IndexManifest.require(path, "bigram-lm")
    val spark = docs.sparkSession
    scoreWithBigramModel(docs,
      spark.read.parquet(s"$path/model"),
      spark.read.parquet(s"$path/ctx"),
      spark.read.parquet(s"$path/consts").head()
        .getDecimal(1))
  }

  /** In-memory model frames — (model(prev, cur, nll),
    * ctx(prev, unseen_nll), oov decimal) — the [[saveBigramLm]] tables
    * without the disk round trip, for operators that contrast TWO
    * models in one pass ([[dsirWeights]]). Same expressions, same
    * DECIMAL(28,8) rounding, so scores agree with the persisted path
    * bit-for-bit.
    */
  private def modelFrames(refDocs: DataFrame)
      : (DataFrame, DataFrame, java.math.BigDecimal) = {
    val g = bigrams(refDocs)
    val c2 = g.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
      .localCheckpoint(true)
    val vocab = c2.select(explode(array(col("prev"), col("cur"))).as("t"))
      .agg(countDistinct(col("t")).cast("long").as("v"))
    val model = c2.join(c1, Seq("prev")).crossJoin(broadcast(vocab))
      .select(col("prev"), col("cur"), expr(
        "CAST(ln(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE)) AS DECIMAL(28,8))").as("nll"))
    val ctx = c1.crossJoin(broadcast(vocab))
      .select(col("prev"), expr(
        "CAST(ln(CAST(c1 + v AS DOUBLE)) AS DECIMAL(28,8))").as("unseen_nll"))
    val oov = vocab.select(expr(
      "CAST(ln(CAST(v AS DOUBLE)) AS DECIMAL(28,8))")).head().getDecimal(0)
    (model, ctx, oov)
  }

  /** DSIR-style importance weights (d53) — Xie et al.'s "Data Selection
    * via Importance Resampling" reduced to its n-gram-model core: score
    * every document under a TARGET-domain model and under the
    * whole-CORPUS model, and weight by the contrast
    * `weight = avg_nll_corpus − avg_nll_target` (positive = the target
    * model likes this doc more than the corpus average does — the
    * importance-sampling log-ratio). The published method resamples
    * with probability ∝ exp(weight); the registered operator keeps the
    * weight itself plus the sign-gate verdict (`keep = weight ≥ 0`),
    * leaving the sampling step to [[graft.operators.Sampling]]'s
    * deterministic hash device — exp() is deliberately NOT computed
    * (libm vs JVM transcendental rounding is the one place the
    * cross-engine contract could silently break).
    *
    * One pass over the shared gram stream joins BOTH models (each the
    * d49 three-tier backoff: seen pair / unseen continuation / unknown
    * context); the keep verdict compares the DECIMAL sums directly, so
    * it is exact, not a rounded-double comparison. Scale shape: both
    * model sides are vocabulary-scale equi-joins (not broadcast), the
    * two oov constants are driver scalars, text is scanned three times
    * (two model passes + scoring — a production run materializes the
    * gram stream once).
    *
    * Returns (doc_id, n_bigrams, t_avg_nll, c_avg_nll, weight, keep)
    * for every doc with at least one bigram (the [[bigramLm]]
    * convention).
    */
  def dsirWeights(docs: DataFrame, targetPred: Column): DataFrame = {
    val (tm, tc, tOov) = modelFrames(docs.filter(targetPred))
    val (cm, cc, cOov) = modelFrames(docs)
    bigrams(docs)
      .join(tm.select(col("prev"), col("cur"), col("nll").as("t_nll")),
        Seq("prev", "cur"), "left_outer")
      .join(tc.select(col("prev"), col("unseen_nll").as("t_unseen")),
        Seq("prev"), "left_outer")
      .join(cm.select(col("prev"), col("cur"), col("nll").as("c_nll")),
        Seq("prev", "cur"), "left_outer")
      .join(cc.select(col("prev"), col("unseen_nll").as("c_unseen")),
        Seq("prev"), "left_outer")
      .withColumn("t_eff", coalesce(col("t_nll"), col("t_unseen"),
        lit(tOov).cast("decimal(28,8)")))
      .withColumn("c_eff", coalesce(col("c_nll"), col("c_unseen"),
        lit(cOov).cast("decimal(28,8)")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("t_eff")).as("t_sum"), sum(col("c_eff")).as("c_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("t_sum").cast("double") / col("n_bigrams")).as("t_avg_nll"),
        (col("c_sum").cast("double") / col("n_bigrams")).as("c_avg_nll"),
        // subtract at DECIMAL(37,8): Spark's (38,8)−(38,8) result would
        // need precision 39 and silently DROPS a scale digit under
        // allowPrecisionLoss (measured: a 2e-8 cross-engine mismatch);
        // at (37,8) the difference is exactly representable in (38,8).
        // Corpus nll sums are far below the 10^29 that could overflow.
        ((col("c_sum").cast("decimal(37,8)") - col("t_sum").cast("decimal(37,8)"))
          .cast("double") / col("n_bigrams")).as("weight"),
        (col("c_sum") >= col("t_sum")).as("keep"))
  }

  /** DSIR SELECTION (d54) — the resampling half of [[dsirWeights]],
    * deterministic: keep the top third of the corpus by importance
    * weight, ranked with the same DISTRIBUTED global-rank device as
    * [[perplexityTiers]] (bucket by a coarse grid of the score, rank
    * within buckets, offset by the cumulative bucket counts — no
    * single-partition corpus window; the published method's
    * probability-proportional resampling becomes a rank cut, which is
    * what production selection jobs actually run: a budget, not a
    * coin). Bucketing uses floor(−weight·scale) so ascending buckets
    * are descending weights; ties break on doc_id. `weight` doubles
    * are cross-engine exact (d53's contract), so ranks and the
    * selection boundary are too.
    *
    * Returns (doc_id, weight, rnk, selected) — rnk 1 = most
    * target-like, selected = (rnk−1)·3 < n_total.
    */
  def dsirSelect(docs: DataFrame, targetPred: Column,
      bucketScale: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = dsirWeights(docs, targetPred)
      .select(col("doc_id"), col("weight")).localCheckpoint(true)
    val scored = w.select(col("doc_id"), col("weight"),
      floor(-col("weight") * bucketScale).cast("long").as("bkt"))
    val counts = scored.groupBy(col("bkt")).agg(count(lit(1)).as("bc"))
    val offsets = counts.select(col("bkt"),
      (sum(col("bc")).over(Window.orderBy(col("bkt"))) - col("bc")).as("off"))
    val total = w.agg(count(lit(1)).cast("long").as("n_total"))
    val inBkt = Window.partitionBy(col("bkt"))
      .orderBy(col("weight").desc, col("doc_id"))
    scored.join(offsets, Seq("bkt"))
      .withColumn("rnk", (col("off") + row_number().over(inBkt)).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("weight"), col("rnk"),
        expr("(rnk - 1) * 3 < n_total").as("selected"))
  }

  /** DoReMi per-domain excess loss (d80) — the Group-DRO statistic of
    * Xie et al. 2023's domain-reweighting recipe, computed exactly over
    * the two models this engine already trains: the corpus-wide bigram
    * LM stands in for the proxy, the reference-slice LM (d49's trusted
    * domain) for the pretrained reference, and each domain's excess
    * loss is the per-token average of max(0, ℓ_proxy − ℓ_ref) — the
    * published token-level clip, taken per GRAM before any sum so a
    * domain cannot hide excess under sub-reference tokens.
    *
    * Arithmetic contract (the d53 device, one step further): both
    * effective nlls are DECIMAL(28,8); the difference is taken at
    * (37,8) where it is exactly representable (Spark's (38,8)−(38,8)
    * silently drops a scale digit — measured on d53), the clip is
    * greatest() against a decimal zero, and sums are exact decimals
    * until ONE final double divide — so per-domain λ and the rank
    * order replay bit-for-bit in the oracle. The exp(η·λ) weight
    * update itself stays outside the cross-engine contract
    * ([[doremiWeights]], spec-pinned) like every transcendental tail.
    *
    * Scale shape: per-gram scoring is the d53 pair of left equi-joins
    * (models never broadcast — vocabulary-scale); the clip/sum partial-
    * aggregates per doc, docs join their stratum label doc-scale, and
    * the final window ranks a #strata-row table (bounded by the label
    * alphabet, never the corpus). Returns one row per stratum:
    * (lang, n_grams, excess_sum, lambda, rnk), rnk 1 = most
    * excess-loss, ties on lang.
    */
  def doremiExcess(docs: DataFrame, refPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (rm, rc, rOov) = modelFrames(docs.filter(refPred))
    val (cm, cc, cOov) = modelFrames(docs)
    val zero = lit(new java.math.BigDecimal(0)).cast("decimal(37,8)")
    val perDoc = bigrams(docs)
      .join(rm.select(col("prev"), col("cur"), col("nll").as("t_nll")),
        Seq("prev", "cur"), "left_outer")
      .join(rc.select(col("prev"), col("unseen_nll").as("t_unseen")),
        Seq("prev"), "left_outer")
      .join(cm.select(col("prev"), col("cur"), col("nll").as("c_nll")),
        Seq("prev", "cur"), "left_outer")
      .join(cc.select(col("prev"), col("unseen_nll").as("c_unseen")),
        Seq("prev"), "left_outer")
      .withColumn("t_eff", coalesce(col("t_nll"), col("t_unseen"),
        lit(rOov).cast("decimal(28,8)")))
      .withColumn("c_eff", coalesce(col("c_nll"), col("c_unseen"),
        lit(cOov).cast("decimal(28,8)")))
      .withColumn("ex", greatest(zero,
        col("c_eff").cast("decimal(37,8)") - col("t_eff").cast("decimal(37,8)")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"), sum(col("ex")).as("ex_sum"))
    val strata = perDoc
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(sum(col("n_grams")).cast("long").as("n_grams"),
        sum(col("ex_sum")).as("ex_dec"))
    strata.select(col("lang"), col("n_grams"),
        col("ex_dec").cast("double").as("excess_sum"),
        (col("ex_dec").cast("double") / col("n_grams")).as("lambda"))
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("lambda").desc, col("lang"))).cast("long"))
  }

  /** The DoReMi weight update over [[doremiExcess]] — α'_k ∝
    * u_k·exp(η·λ_k) from uniform u, then the published smoothing mix
    * (1−c)·α' + c·u, driver-side over the #strata-row table (exp is a
    * transcendental, so this tail is spec-pinned rather than
    * oracle-registered — the d53/d72 convention). Returns
    * (lang, lambda, weight) with weights summing to 1.
    */
  def doremiWeights(docs: DataFrame, refPred: Column, eta: Double = 1.0,
      smoothing: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    val ex = doremiExcess(docs, refPred)
      .select(col("lang"), col("lambda")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val k = ex.length
    val raw = ex.map { case (l, lam) => (l, lam, math.exp(eta * lam)) }
    val z = raw.map(_._3).sum
    val rows = raw.map { case (l, lam, e) =>
      (l, lam, (1.0 - smoothing) * (e / z) + smoothing / k)
    }
    spark.createDataFrame(rows.toSeq).toDF("lang", "lambda", "weight")
  }

  /** Heaps-law vocabulary growth curve (d83) — distinct-word count as
    * a function of corpus size at `2^chunkBits` prefix checkpoints of
    * the engine's deterministic hash60 document order (the same
    * shuffle every packing/sharding op uses, so "prefix" here means
    * exactly what a dataloader would consume first). Checkpoint c's
    * prefix is all docs whose order-key's top `chunkBits` bits are
    * ≤ c — hash-order octiles, equal-size in expectation rather than
    * exact-count (documented; the growth LAW is about the token axis,
    * which the row carries exactly).
    *
    * Per checkpoint: cumulative docs, tokens, distinct words, and the
    * local Heaps exponent β between consecutive checkpoints —
    * Δln(vocab)/Δln(tokens), with each ln quantized to DECIMAL(28,8)
    * (the cross-engine transcendental device) so the subtraction is
    * exact and the ONE double division bit-matches the oracle.
    *
    * Scale shape: a word's FIRST checkpoint is one map-side-combined
    * min over the raw word stream (vocabulary-scale keys, never a
    * corpus-wide distinct); per-checkpoint totals partial-aggregate to
    * 2^chunkBits rows; every window (cumulatives, lag) runs over that
    * tiny table. Returns (chk, n_docs_cum, n_tokens_cum, vocab_cum,
    * beta) — beta NULL on the first checkpoint.
    */
  def heapsCurve(docs: DataFrame, chunkBits: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunkBits >= 1 && chunkBits <= 8, s"chunkBits=$chunkBits")
    val base = docs.select(col("doc_id"), col("text"),
        expr(s"shiftright(${hash60Sql("CAST(doc_id AS STRING)")}, ${60 - chunkBits})")
          .as("chk"))
      .localCheckpoint(true)
    val perChk = base.groupBy(col("chk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val firstChk = base
      .select(col("chk"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(min(col("chk")).as("fc"))
      .groupBy(col("fc")).agg(count(lit(1)).as("n_new"))
    val byChk = Window.orderBy(col("chk"))
    val cum = perChk
      .join(firstChk.withColumnRenamed("fc", "chk"), Seq("chk"), "left_outer")
      .select(col("chk").cast("long").as("chk"), col("n_docs"),
        col("n_tokens"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .select(col("chk"),
        sum(col("n_docs")).over(byChk).cast("long").as("n_docs_cum"),
        sum(col("n_tokens")).over(byChk).cast("long").as("n_tokens_cum"),
        sum(col("n_new")).over(byChk).cast("long").as("vocab_cum"))
    cum
      .withColumn("lnv", expr(
        "CAST(ln(CAST(vocab_cum AS DOUBLE)) AS DECIMAL(28,8))"))
      .withColumn("lnt", expr(
        "CAST(ln(CAST(n_tokens_cum AS DOUBLE)) AS DECIMAL(28,8))"))
      .withColumn("beta",
        ((col("lnv") - lag(col("lnv"), 1).over(byChk)).cast("double")
          / (col("lnt") - lag(col("lnt"), 1).over(byChk)).cast("double")))
      .select(col("chk"), col("n_docs_cum"), col("n_tokens_cum"),
        col("vocab_cum"), col("beta"))
  }

  /** Zipf-law fit (d98): least-squares slope of ln(freq) on ln(rank)
    * over the top-`k` words — the standard power-law diagnostic for a
    * corpus's token distribution (healthy natural text sits near
    * slope ≈ −1; template/boilerplate corpora flatten or steepen it).
    *
    * Cross-engine determinism: ranks come from the bounded top-k table
    * (frequency table cut by `orderBy(c desc, word).limit(k)` — a
    * TakeOrderedAndProject over the vocabulary-scale counts, then a
    * window over k rows, the repo's bounded-table window rule); each
    * ln is quantized at DECIMAL(18,8) (the ln device), the regression
    * moments Σx, Σy, Σxy, Σx² are summed as exact decimals (products
    * at (37,16) — no re-quantization anywhere), and the final
    * slope/intercept are a FIXED tree of double ops over those four
    * exact sums — deterministic in both engines. Returns ONE row
    * (n_words, slope, alpha, intercept); alpha = −slope is the Zipf
    * exponent.
    */
  def zipfSlope(docs: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k=$k")
    val wc = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(k)
    val ranked = wc.withColumn("rk",
      row_number().over(Window.orderBy(col("c").desc, col("word"))).cast("long"))
    val mom = ranked
      .select(
        expr("CAST(ln(CAST(rk AS DOUBLE)) AS DECIMAL(18,8))").as("x"),
        expr("CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,8))").as("y"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    mom.select(col("n_words"),
        col("sx").cast("double").as("dsx"), col("sy").cast("double").as("dsy"),
        col("sxy").cast("double").as("dsxy"), col("sxx").cast("double").as("dsxx"))
      .select(col("n_words"),
        ((col("n_words") * col("dsxy") - col("dsx") * col("dsy"))
          / (col("n_words") * col("dsxx") - col("dsx") * col("dsx"))).as("slope"))
      .select(col("n_words"), col("slope"), (-col("slope")).as("alpha"))
  }

  /** Count-Min sketch term-frequency estimation (d99 family) — Cormode
    * & Muthukrishnan 2005: `depth` hash rows × `width` counters; a
    * token increments one counter per row (bucket =
    * hash60("<r>:<term>") mod width), a query term's estimate is the
    * MIN over its `depth` counters — an overestimate by construction
    * (collisions only ever add), within εW with high probability.
    *
    * Scale shape: the sketch build is one explode(depth) +
    * map-side-combinable groupBy collapsing the token stream to AT
    * MOST depth×width cells — each executor emits a bounded partial
    * sketch regardless of corpus size (the mergeability that makes CMS
    * the streaming/distributed counter of choice). The query side is a
    * depth-row-per-term frame joined against the tiny sketch
    * (broadcast). Returns (term, est, true_cnt) — true_cnt joined in
    * for the audit; est ≥ true_cnt always (spec-pinned).
    */
  def countMinEstimate(docs: DataFrame, queryTerms: Seq[String],
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth width=$width")
    require(queryTerms.nonEmpty, "need query terms")
    val spark = docs.sparkSession
    import spark.implicits._
    def bucket: Column = pmod(Dedup.hash60(
      concat(col("r").cast("string"), lit(":"), col("term"))), lit(width.toLong))
    val tok = docs.select(explode(split(col("text"), " ")).as("term"))
    val sketch = tok
      .withColumn("r", explode(expr(s"sequence(0L, ${depth - 1}L)")))
      .withColumn("bucket", bucket)
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))
    val probes = queryTerms.toDF("term")
      .withColumn("r", explode(expr(s"sequence(0L, ${depth - 1}L)")))
      .withColumn("bucket", bucket)
    val est = probes.join(broadcast(sketch), Seq("r", "bucket"), "left_outer")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).cast("long").as("est"))
    val truth = tok.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("true_cnt"))
    est.join(truth, Seq("term"), "left_outer")
      .select(col("term"), col("est"),
        coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
  }

  /** Persist a POSITIONAL inverted index (d100): postings carry every
    * (term, doc_id, pos) occurrence — the layout phrase and proximity
    * queries need, where the tf-only [[saveBm25Index]] postings cannot
    * answer "adjacent". Same 100 TB layout devices as the BM25 store:
    * `termBuckets > 0` partitions postings by hash60(term) mod buckets
    * (a pure term function — the reader re-derives buckets driver-side,
    * nothing extra stored), so a phrase probe prunes whole bucket
    * directories (PartitionFilters) before the term filter pushes.
    * Positions are 0-based token offsets from the shared
    * whitespace-split tokenizer.
    */
  def savePositionalIndex(docs: DataFrame, path: String,
      termBuckets: Int = 0): Unit = {
    require(termBuckets >= 0, s"termBuckets=$termBuckets")
    val postings = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))
    if (termBuckets > 0) {
      postings
        .withColumn("tb",
          pmod(Dedup.hash60(col("term")), lit(termBuckets.toLong)))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$path/postings")
    } else {
      postings.write.mode("overwrite").parquet(s"$path/postings")
    }
    val (rows, maxId) = graft.sources.IndexManifest.watermark(docs, "doc_id")
    graft.sources.IndexManifest.write(path, graft.sources.IndexManifest.Manifest(
      "pos-postings", Map("term_buckets" -> termBuckets.toLong), rows, maxId))
  }

  /** Exact phrase search over the persisted positional index (d100):
    * documents containing `phrase` as ADJACENT tokens, with match
    * count and first occurrence. The plan is the classic positional-
    * postings intersection: each phrase term's postings probe is a
    * pruned/pushed scan (bucket literals + term filter — the d90
    * devices via the shared probe), term i's positions are shifted by
    * −i, and adjacency is a chain of EQUI-joins on (doc_id, pos) —
    * shuffle-partitioned by the composite key, no inequality join, no
    * broadcast of a corpus-scale side. Repeated phrase terms work
    * unchanged (each join consumes its own occurrence set).
    *
    * Returns (doc_id, n_matches, first_pos).
    */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 terms, got $phrase")
    val man = graft.sources.IndexManifest.require(path, "pos-postings")
    val termBuckets = man.params.getOrElse("term_buckets", 0L)
    val raw = spark.read.parquet(s"$path/postings")
    val scoped =
      if (termBuckets > 0L) {
        val tbs = phrase.map(t => Dedup.hash60Jvm(t) % termBuckets)
          .distinct.sorted
        raw.filter(col("tb").isin(tbs: _*))
      } else raw
    val probe = scoped.filter(col("term").isin(phrase.distinct: _*))
    def termPos(i: Int): DataFrame =
      probe.filter(col("term") === phrase(i))
        .select(col("doc_id"), (col("pos") - i).as("pos"))
    val starts = phrase.indices.tail
      .foldLeft(termPos(0))((acc, i) => acc.join(termPos(i), Seq("doc_id", "pos")))
    starts.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_matches"),
        min(col("pos")).cast("long").as("first_pos"))
  }

  /** Per-document word-level suffix array (d105) by PREFIX DOUBLING
    * (Manber & Myers 1993; the distributed formulation of Flick &
    * Aluru, SC'15) — the index structure behind suffix-based dedup
    * (Lee et al. 2022 run ExactSubstr over one): after ⌈log₂ maxlen⌉
    * rounds, `rnk` is each suffix's 1-based lexicographic rank within
    * its document.
    *
    * Round shape: suffix comparisons by the first 2k words reduce to
    * ONE self equi-join on (doc_id, pos+k) — pairing each suffix's
    * rank with its k-successor's — followed by a dense_rank over the
    * pair, windowed PER DOCUMENT (partition size = document length,
    * bounded; never a corpus-wide window). A missing successor (suffix
    * shorter than k) sorts first — the prefix rule — via
    * asc_nulls_first. Lineage is cut per round (the CC-iteration
    * device).
    *
    * The SEED rank needs only an order-consistent injective key, not a
    * dense rank: words pack into a 63-bit integer (9 × 7-bit ascii
    * codes, left-aligned, zero-padded), whose numeric order IS
    * lexicographic word order — a pure per-row expression, no vocab
    * ranking pass at all (guarded: ascii-only words of ≤ 9 chars; a
    * longer-word corpus would seed with the d46 bucketed vocab rank
    * instead). The oracle sorts each document's materialized suffix
    * strings — an independent O(n²)-work construction the DP must
    * reproduce exactly.
    *
    * Returns (doc_id, pos, rnk).
    */
  def suffixArray(docs: DataFrame): DataFrame =
    suffixLevels(docs)._1.select(col("doc_id"), col("pos"),
      col("rank").as("rnk"))

  /** The prefix-doubling rank LADDER behind [[suffixArray]] (see its
    * doc for the round shape): returns the full-width rank frame plus
    * every level `(w, rank-by-first-w-words frame)` in ascending
    * width order — the sparse table [[suffixLcp]]'s binary descent
    * reads. Equality of two suffixes' width-w ranks ⟺ their first w
    * words agree (for suffixes of DIFFERENT lengths — always the case
    * within one document — equal ranks with either side shorter than w
    * would force equal lengths, a contradiction, so equality implies
    * both carry ≥ w shared words). All frames are checkpointed.
    */
  private def suffixLevels(docs: DataFrame): (DataFrame, Seq[(Long, DataFrame)]) = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
      .localCheckpoint(true)
    val lens = toks.agg(max(length(col("word"))).as("mw"),
      count(lit(1)).as("n")).head()
    require(lens.getAs[Int]("mw") <= 9,
      s"word packing needs len<=9, got ${lens.getAs[Int]("mw")}")
    val maxDocLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    val pack = expr(
      """aggregate(transform(sequence(0, 8), i ->
        |  shiftleft(CAST(ascii(substring(word, i + 1, 1)) AS BIGINT), 7 * (8 - i))),
        |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin.replace("\n", " "))
    var ranked = toks.select(col("doc_id"), col("pos"), pack.as("rank"))
      .localCheckpoint(true)
    var levels = List((1L, ranked))
    var k = 1L
    var distinct = false
    // do-while: even a maxDocLen=1 corpus gets one dense_rank pass, so
    // the returned ranks are always dense 1..len per document (the seed
    // packing alone is order-isomorphic but not dense)
    while ((k < maxDocLen || k == 1L) && !distinct) {
      val right = ranked.select(col("doc_id"), (col("pos") - k).as("pos"),
        col("rank").as("rank2"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("rank").asc, col("rank2").asc_nulls_first)
      ranked = ranked.join(right, Seq("doc_id", "pos"), "left_outer")
        .select(col("doc_id"), col("pos"),
          dense_rank().over(w).cast("long").as("rank"))
        .localCheckpoint(true)
      levels = (k * 2, ranked) :: levels
      k *= 2
      // EARLY EXIT (standard prefix-doubling termination, Manber &
      // Myers §3): once every suffix rank is distinct within its
      // document, later rounds are the identity (dense_rank over
      // already-distinct (rank, rank2) keys preserves the order — for
      // within-document suffixes equal full ranks would force equal
      // lengths) AND every adjacent-pair LCP is < k (two suffixes
      // sharing k words would share their width-k rank), so the
      // descent's binary decomposition over the levels built so far
      // covers every realizable LCP. Output is bit-identical to the
      // full ⌈log₂ maxlen⌉ ladder (spec-pinned); the one tiny aggregate
      // per round replaces the remaining rounds' join+window+checkpoint
      // jobs — on natural text ranks separate after 2-3 words and the
      // ladder drops from ~7 rounds to ~2-3.
      if (k < maxDocLen) {
        val worst = ranked.groupBy(col("doc_id"), col("rank"))
          .agg(count(lit(1)).as("c")).agg(max(col("c"))).head()
        distinct = !worst.isNullAt(0) && worst.getLong(0) <= 1L
      }
    }
    (ranked, levels.reverse)
  }

  /** Adjacent-suffix LCP array (d106) — the companion structure that
    * turns a suffix array into a substring-repetition index (Manber &
    * Myers 1993 compute it alongside; ExactSubstr-style dedup reads
    * duplicated spans straight off it): for each suffix of rank ≥ 2,
    * the number of leading WORDS it shares with its rank-predecessor.
    *
    * Construction is the sparse-table binary descent over
    * [[suffixLevels]]'s rank ladder — NOT Kasai's O(n) walk, which is
    * inherently sequential per document: starting from l = 0, widths
    * descend 2^(m-1)…1; at width w both suffixes' rank-at-offset-l
    * rows are fetched by ONE (doc_id, pos) equi-join each and l
    * advances by w iff both exist and agree (the binary decomposition
    * of the LCP). log₂ rounds of two equi-joins over the
    * adjacent-pair frame — fully distributed, no per-document
    * sequential state; lineage cut per round.
    *
    * Returns (doc_id, rnk, pos, lcp) for rnk ≥ 2.
    */
  def suffixLcp(docs: DataFrame): DataFrame = {
    val (sa, levels) = suffixLevels(docs)
    perDocLcp(sa, levels)
  }

  private def perDocLcp(sa: DataFrame, levels: Seq[(Long, DataFrame)]): DataFrame = {
    val pred = sa.select(col("doc_id"), (col("rank") + 1).as("rank"),
      col("pos").as("pos_prev"))
    var pairs = sa.join(pred, Seq("doc_id", "rank"))
      .select(col("doc_id"), col("rank").as("rnk"), col("pos"),
        col("pos_prev"), lit(0L).as("lcp"))
      .localCheckpoint(true)
    // the full-width level can never compare equal between two distinct
    // suffixes of one document — widths 2^(m-1)..1 already cover every
    // LCP value ≤ maxDocLen-1
    for ((w, lvl) <- levels.dropRight(1).reverse) {
      pairs = pairs
        .withColumn("ka", col("pos") + col("lcp"))
        .withColumn("kb", col("pos_prev") + col("lcp"))
        .join(lvl.toDF("doc_id", "ka", "ra"), Seq("doc_id", "ka"), "left_outer")
        .join(lvl.toDF("doc_id", "kb", "rb"), Seq("doc_id", "kb"), "left_outer")
        .select(col("doc_id"), col("rnk"), col("pos"), col("pos_prev"),
          (col("lcp") + when(col("ra").isNotNull && col("ra") === col("rb"),
            lit(w)).otherwise(lit(0L))).as("lcp"))
        .localCheckpoint(true)
    }
    pairs.select(col("doc_id"), col("rnk"), col("pos"), col("lcp"))
  }

  /** Longest intra-document repeat (d107): the length in words of the
    * longest word-sequence occurring ≥ 2 times within a document —
    * max over the [[suffixLcp]] array (any repeated sequence is a
    * common prefix of two suffixes, and the maximal one is realized by
    * two RANK-ADJACENT suffixes, so the adjacent-pair max is exact) —
    * plus the self-repetition verdict `keep = max_dup_words <
    * maxDupWords`: the exact-repetition cousin of the d60 Gopher
    * heuristics, catching a doc that pastes the same passage twice.
    * Documents with a single suffix carry 0. Returns
    * (doc_id, max_dup_words, keep).
    */
  def longestRepeat(docs: DataFrame, maxDupWords: Int = 10): DataFrame =
    longestRepeatFrom(docs, suffixLcp(docs), maxDupWords)

  /** [[longestRepeat]]'s aggregation tail over an already-built LCP
    * frame — consumers holding the persisted [[saveSuffixIndex]]
    * artifact call this instead of re-running the doubling ladder.
    */
  def longestRepeatFrom(docs: DataFrame, lcpFrame: DataFrame,
      maxDupWords: Int = 10): DataFrame =
    docs.select(col("doc_id"))
      .join(lcpFrame.groupBy(col("doc_id"))
          .agg(max(col("lcp")).as("mx")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("mx"), lit(0L)).as("max_dup_words"),
        (coalesce(col("mx"), lit(0L)) < maxDupWords).as("keep"))

  /** Global DENSE rank over a distinct (r1, r2k) pair table — the d46
    * bucketed distributed-rank device at corpus scale, reused per
    * doubling round by [[globalSuffixLevels]]: pairs bucket by an
    * equal-width grid over r1's range (ties NEVER straddle buckets —
    * the bucket is a function of r1 alone and equal pairs share r1);
    * within-bucket row_numbers come from a window PARTITIONED by
    * bucket, bucket base offsets from a cumulative sum over the
    * per-bucket counts (a table bounded by the grid size, where a
    * global window is free). Input must already be DISTINCT — then
    * row_number over distinct keys IS the dense rank.
    */
  private def globalDenseRank(pairsDistinct: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mm = pairsDistinct.agg(min(col("r1")).as("lo"), max(col("r1")).as("hi")).head()
    val (lo, hi) = (mm.getAs[Long]("lo"), mm.getAs[Long]("hi"))
    val w = math.max(1L, (hi - lo) / 1024L + 1L)
    val b = pairsDistinct.withColumn("bkt",
      expr(s"CAST((r1 - ${lo}L) DIV ${w}L AS BIGINT)"))
    val counts = b.groupBy(col("bkt")).agg(count(lit(1)).as("bc"))
    val offsets = counts.select(col("bkt"),
      (sum(col("bc")).over(Window.orderBy(col("bkt"))) - col("bc")).as("off"))
    val inB = Window.partitionBy(col("bkt")).orderBy(col("r1"), col("r2k"))
    b.join(offsets, Seq("bkt"))
      .select(col("r1"), col("r2k"),
        (col("off") + row_number().over(inB)).cast("long").as("nr"))
  }

  /** The CORPUS-LEVEL prefix-doubling ladder behind
    * [[globalSuffixArray]]: like [[suffixLevels]], but ranks are dense
    * over ALL suffixes of ALL documents (a generalized suffix array —
    * suffixes still end at their document's boundary, so each round's
    * successor lookup stays a per-document (doc_id, pos+k) equi-join;
    * only the RANKING is global). The per-doc version's
    * dense_rank-per-document window becomes distinct-pairs →
    * [[globalDenseRank]] → join back on (r1, r2k) — no corpus-wide
    * window anywhere; the missing-successor prefix rule rides a −1
    * sentinel (below every packed word and every dense rank ≥ 1).
    * Unlike the per-document ladder, two suffixes from DIFFERENT
    * documents can be fully identical: they keep equal ranks through
    * every round, so the final rank is dense over distinct suffix
    * CONTENTS, and a rank class IS a set of identical suffixes.
    */
  private def globalSuffixLevels(docs: DataFrame): (DataFrame, Seq[(Long, DataFrame)]) = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
      .localCheckpoint(true)
    val mw = toks.agg(max(length(col("word"))).as("mw")).head().getAs[Int]("mw")
    require(mw <= 9, s"word packing needs len<=9, got $mw")
    val maxDocLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    val pack = expr(
      """aggregate(transform(sequence(0, 8), i ->
        |  shiftleft(CAST(ascii(substring(word, i + 1, 1)) AS BIGINT), 7 * (8 - i))),
        |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin.replace("\n", " "))
    var ranked = toks.select(col("doc_id"), col("pos"), pack.as("rank"))
      .localCheckpoint(true)
    var levels = List((1L, ranked))
    var k = 1L
    // No early exit here (contrast suffixLevels): the generalized
    // partition refines by CONTENT classes, and on a small-vocabulary
    // corpus with genuine cross-document duplication it keeps splitting
    // until deep widths (measured at sf0.1: distinct prefixes still
    // growing at width 32), so a per-round stability probe costs a
    // corpus aggregate per round and almost never fires.
    while (k < maxDocLen || k == 1L) {
      val succ = ranked.select(col("doc_id"), (col("pos") - k).as("pos"),
        col("rank").as("r2"))
      val paired = ranked.withColumnRenamed("rank", "r1")
        .join(succ, Seq("doc_id", "pos"), "left_outer")
        .withColumn("r2k", coalesce(col("r2"), lit(-1L)))
      val dr = globalDenseRank(paired.select(col("r1"), col("r2k")).distinct())
      ranked = paired.join(dr, Seq("r1", "r2k"))
        .select(col("doc_id"), col("pos"), col("nr").as("rank"))
        .localCheckpoint(true)
      levels = (k * 2, ranked) :: levels
      k *= 2
    }
    (ranked, levels.reverse)
  }

  /** Generalized (corpus-level) suffix array (d108): every suffix of
    * every document ranked in ONE lexicographic order, dense over
    * distinct suffix contents — identical suffixes from different
    * documents share a rank, which is exactly what makes the structure
    * a cross-document duplication index ([[globalSuffixLcp]],
    * [[crossDocRepeat]] read it). Built by [[globalSuffixLevels]]'s
    * prefix doubling with the bucketed distributed rank replacing the
    * per-document window. Returns (doc_id, pos, rnk).
    */
  def globalSuffixArray(docs: DataFrame): DataFrame =
    globalSuffixLevels(docs)._1.select(col("doc_id"), col("pos"),
      col("rank").as("rnk"))

  /** Adjacent-CLASS LCP over the generalized suffix array (d109): for
    * each dense rank r ≥ 2, the number of leading words class r's
    * (identical) suffixes share with class r−1's, plus the class's
    * occurrence and document counts. Same sparse-table binary descent
    * as [[suffixLcp]], run between one representative per class (the
    * (doc_id, pos)-min — representatives are interchangeable: a class
    * is an identical-content set). The descent's width argument still
    * closes cross-document: equal width-w ranks with either side
    * shorter than w would force fully identical tails, which (with the
    * first l words already matched) would make the two CLASSES
    * identical — a contradiction for distinct ranks. Returns
    * (rnk, lcp, n_occ, n_docs).
    */
  def globalSuffixLcp(docs: DataFrame): DataFrame =
    globalLcpParts(docs)._3.select(col("rnk"), col("lcp"), col("n_occ"),
      col("n_docs"))

  /** Shared internals for [[globalSuffixLcp]] / [[crossDocRepeat]]:
    * (suffix array, class frame (rank, rep doc/pos, rem, n_occ,
    * n_docs), adjacent-class LCP frame).
    */
  private def globalLcpParts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val (sa, levels) = globalSuffixLevels(docs)
    val dlen = sa.groupBy(col("doc_id")).agg(count(lit(1)).as("dlen"))
    val classes = sa.groupBy(col("rank"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("rep"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .select(col("rank"), col("rep.doc_id").as("doc_id"),
        col("rep.pos").as("pos"), col("n_occ"), col("n_docs"))
      .join(dlen, Seq("doc_id"))
      .select(col("rank"), col("doc_id"), col("pos"),
        (col("dlen") - col("pos")).as("rem"), col("n_occ"), col("n_docs"))
      .localCheckpoint(true)
    val pred = classes.select((col("rank") + 1).as("rank"),
      col("doc_id").as("doc_p"), col("pos").as("pos_p"))
    var pairs = classes.join(pred, Seq("rank"))
      .select(col("rank").as("rnk"), col("doc_id"), col("pos"),
        col("doc_p"), col("pos_p"), col("n_occ"), col("n_docs"),
        lit(0L).as("lcp"))
      .localCheckpoint(true)
    for ((w, lvl) <- levels.dropRight(1).reverse) {
      pairs = pairs
        .withColumn("ka", col("pos") + col("lcp"))
        .withColumn("kb", col("pos_p") + col("lcp"))
        .join(lvl.toDF("doc_id", "ka", "ra"), Seq("doc_id", "ka"), "left_outer")
        .join(lvl.toDF("doc_p", "kb", "rb"), Seq("doc_p", "kb"), "left_outer")
        .select(col("rnk"), col("doc_id"), col("pos"), col("doc_p"),
          col("pos_p"), col("n_occ"), col("n_docs"),
          (col("lcp") + when(col("ra").isNotNull && col("ra") === col("rb"),
            lit(w)).otherwise(lit(0L))).as("lcp"))
        .localCheckpoint(true)
    }
    (sa, classes, pairs)
  }

  /** Longest CROSS-document duplicated word sequence per document
    * (d110) — the exact-substring contamination/dedup metric of Lee et
    * al. 2022's ExactSubstr, read off the generalized suffix array:
    * for document d, the longest word sequence that also occurs in
    * some OTHER document, plus the verdict `keep = max_shared_words <
    * contamWords`.
    *
    * Exactness from rank-adjacency: let (i ∈ d, j ∉ d) realize the
    * max L. If i, j share a class, the class's full suffix length
    * contributes L via rule (a). Otherwise walk the classes from i's
    * to j's: every adjacent-class LCP on the walk is ≥ L, and the
    * FIRST class on the walk carrying any non-d document forms an
    * adjacent pair whose predecessor class contains only d (or is i's
    * own class) — rule (b) credits that pair's LCP ≥ L to d. Both
    * rules only ever credit realizable cross-document matches, so the
    * max over (a) ∪ (b) is exact. "Other class has a document ≠ d"
    * tests as n_docs ≥ 2 ∨ min_doc ≠ d — no doc-set materialization.
    *
    * Returns (doc_id, max_shared_words, keep) for every document.
    */
  def crossDocRepeat(docs: DataFrame, contamWords: Int = 13): DataFrame = {
    val (sa, _, lcpPairs) = globalLcpParts(docs)
    crossDocRepeatFrom(docs,
      sa.select(col("doc_id"), col("pos"), col("rank").as("rnk")),
      lcpPairs.select(col("rnk"), col("lcp")), contamWords)
  }

  /** [[crossDocRepeat]]'s credit/aggregate tail over an already-built
    * generalized suffix array `sa` (doc_id, pos, rnk) and its
    * adjacent-class LCP frame (rnk, lcp) — the path consumers of the
    * persisted [[saveSuffixIndex]] artifact take. Class lengths and
    * doc sets are re-derived from `sa` by one aggregation each (the
    * stored artifact keeps only the two core tables).
    */
  def crossDocRepeatFrom(docs: DataFrame, sa: DataFrame, lcps0: DataFrame,
      contamWords: Int = 13): DataFrame = {
    val dlen = sa.groupBy(col("doc_id")).agg(count(lit(1)).as("dlen"))
    // class suffix length = the representative's remaining words
    // (members are identical content, so any member's length works)
    val reps = sa.groupBy(col("rnk"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("rep"))
      .select(col("rnk"), col("rep.doc_id").as("doc_id"),
        col("rep.pos").as("pos"))
      .join(dlen, Seq("doc_id"))
      .select(col("rnk"), (col("dlen") - col("pos")).as("rem"))
    val dpc = sa.select(col("rnk"), col("doc_id")).distinct()
      .localCheckpoint(true)
    val stats = dpc.groupBy(col("rnk"))
      .agg(count(lit(1)).as("nd"), min(col("doc_id")).as("mn"))
    // (a) classes shared verbatim by ≥ 2 documents: the whole class
    // suffix counts for every member document
    val a = dpc.join(stats.filter(col("nd") >= 2), Seq("rnk"))
      .join(reps, Seq("rnk"))
      .select(col("doc_id"), col("rem").as("v"))
    val lcps = lcps0.select(col("rnk"), col("lcp"))
    // (b) adjacent-class LCPs: credited to a member of either side iff
    // the OTHER side contains some different document
    val bLeft = dpc.select((col("rnk") + 1).as("rnk"), col("doc_id"))
      .join(lcps, Seq("rnk"))
      .join(stats.toDF("rnk", "nd_o", "mn_o"), Seq("rnk"))
      .filter(col("nd_o") >= 2 || col("mn_o") =!= col("doc_id"))
      .select(col("doc_id"), col("lcp").as("v"))
    val bRight = dpc.join(lcps, Seq("rnk"))
      .join(stats.toDF("rnk0", "nd_o", "mn_o")
        .select((col("rnk0") + 1).as("rnk"), col("nd_o"), col("mn_o")),
        Seq("rnk"))
      .filter(col("nd_o") >= 2 || col("mn_o") =!= col("doc_id"))
      .select(col("doc_id"), col("lcp").as("v"))
    docs.select(col("doc_id"))
      .join(a.unionByName(bLeft).unionByName(bRight)
          .groupBy(col("doc_id")).agg(max(col("v")).as("mx")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("mx"), lit(0L)).as("max_shared_words"),
        (coalesce(col("mx"), lit(0L)) < contamWords).as("keep"))
  }

  /** Persist the suffix-array artifact (two tables: `sa` — the rank
    * order — and `lcp` — its adjacent LCP array) under the shared
    * index manifest, kind "suffix-array", param `global` selecting the
    * per-document ([[suffixArray]]/[[suffixLcp]]) or generalized
    * ([[globalSuffixArray]]/[[globalSuffixLcp]]) construction. A
    * suffix array is the canonical build-once index — ExactSubstr
    * tooling materializes SA + LCP and serves every downstream query
    * from them — so the doubling ladder and the descent run ONCE here
    * and every consumer (d105-d110) reads parquet.
    */
  def saveSuffixIndex(docs: DataFrame, path: String, global: Boolean): Unit = {
    import graft.sources.IndexManifest
    // the two table writes and the watermark agg are order-independent
    // (manifest write below is the commit point) — overlapped
    // (IndexManifest.awaitAll doc); the lcp derivation's own descent
    // jobs overlap the sa write as a bonus
    var wm: (Long, Long) = (0L, -1L)
    if (global) {
      val (sa, _, pairs) = globalLcpParts(docs)
      IndexManifest.awaitAll(Seq(
        () => sa.select(col("doc_id"), col("pos"), col("rank").as("rnk"))
          .write.mode("overwrite").parquet(s"$path/sa"),
        () => pairs.select(col("rnk"), col("lcp"), col("n_occ"), col("n_docs"))
          .write.mode("overwrite").parquet(s"$path/lcp"),
        () => wm = IndexManifest.watermark(docs, "doc_id")))
    } else {
      val (sa, levels) = suffixLevels(docs)
      IndexManifest.awaitAll(Seq(
        () => sa.select(col("doc_id"), col("pos"), col("rank").as("rnk"))
          .write.mode("overwrite").parquet(s"$path/sa"),
        () => perDocLcp(sa, levels)
          .write.mode("overwrite").parquet(s"$path/lcp"),
        () => wm = IndexManifest.watermark(docs, "doc_id")))
    }
    val (rows, maxId) = wm
    IndexManifest.write(path, IndexManifest.Manifest("suffix-array",
      Map("global" -> (if (global) 1L else 0L)), rows, maxId))
  }

  /** The (sa, lcp) frames of the suffix-array artifact at `path`,
    * building it first when missing/stale/param-mismatched (the
    * keepListCached convention) — d105-d107 share one per-directory
    * per-doc slot, d108-d110 one global slot; whichever row runs first
    * pays the ladder.
    */
  def suffixIndexCached(docs: DataFrame, path: String,
      global: Boolean): (DataFrame, DataFrame) = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val spark = docs.sparkSession
    val params = Map("global" -> (if (global) 1L else 0L))
    val hit = try {
      IndexManifest.require(path, "suffix-array", params)
      IndexManifest.isFresh(path, docs, "doc_id")
    } catch { case _: IndexManifestException => false }
    if (!hit) saveSuffixIndex(docs, path, global)
    (spark.read.parquet(s"$path/sa"), spark.read.parquet(s"$path/lcp"))
  }

  /** Append an id-monotone increment to a PER-DOCUMENT suffix-array
    * store (d114) — exact by construction: per-doc ranks and LCPs
    * involve only the document's own suffixes, so an appended
    * document's rows are bit-identical to a fresh build's (spec-pinned
    * append ≡ rebuild), history files are never rewritten, and the
    * increment pays only its own ladder. The GLOBAL variant is
    * rebuild-only BY DESIGN — corpus-level dense ranks shift under any
    * append (the d87 idf/avgdl reasoning), and
    * [[suffixIndexCached]]'s staleness check makes that loud. Same
    * crash-window discipline as every appender: id-monotone guard
    * against the watermark, orphan check before writing, manifest
    * flip last.
    */
  def appendSuffixIndex(newDocs: DataFrame, path: String): Unit = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val man = IndexManifest.require(path, "suffix-array",
      Map("global" -> 0L))
    val spark = newDocs.sparkSession
    val stats = newDocs.agg(count(lit(1)),
      min(col("doc_id").cast("long")), max(col("doc_id").cast("long"))).head()
    if (stats.getLong(0) == 0L) return
    val (rows, minId, maxId) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    if (minId <= man.corpusMaxId)
      throw new IndexManifestException(
        s"increment ids start at $minId but the index watermark is " +
          s"${man.corpusMaxId} ($path) — appends must be id-monotone")
    // BOTH tables guarded (the appends below are concurrent, so a crash
    // can commit either first), overlapped with the increment's ladder
    // — the guards are pure reads and everything completes before any
    // outcome propagates (IndexManifest.awaitAll doc)
    var res: (DataFrame, Seq[(Long, DataFrame)]) = null
    IndexManifest.awaitAll(Seq(
      () => IndexManifest.requireNoOrphans(
        spark.read.parquet(s"$path/sa"), "doc_id", man, path),
      () => IndexManifest.requireNoOrphans(
        spark.read.parquet(s"$path/lcp"), "doc_id", man, path),
      () => res = suffixLevels(newDocs)))
    val (sa, levels) = res
    IndexManifest.awaitAll(Seq(
      () => sa.select(col("doc_id"), col("pos"), col("rank").as("rnk"))
        .write.mode("append").parquet(s"$path/sa"),
      () => perDocLcp(sa, levels).write.mode("append").parquet(s"$path/lcp")))
    IndexManifest.write(path,
      man.copy(corpusRows = man.corpusRows + rows, corpusMaxId = maxId))
  }

  /** Idempotent maintenance for the per-document suffix store (the
    * e34/d79 policy): "fresh" when the corpus matches the watermark,
    * "append" when the watermark rows are an exact prefix (recovering
    * to "rebuild" on the orphan-residue named error), "rebuild"
    * otherwise (missing/param-mismatched/diverged store).
    */
  def suffixIndexSync(docs: DataFrame, path: String): String = {
    import graft.sources.{IndexManifest, IndexManifestException}
    val man = try Some(IndexManifest.require(path, "suffix-array",
      Map("global" -> 0L)))
    catch { case _: IndexManifestException => None }
    man match {
      case Some(m) =>
        val stats = docs.agg(count(lit(1)), max(col("doc_id").cast("long")),
          sum(when(col("doc_id") <= m.corpusMaxId, 1L).otherwise(0L))).head()
        val (rows, maxId) = (stats.getLong(0),
          if (stats.isNullAt(1)) -1L else stats.getLong(1))
        val prefixRows = if (stats.isNullAt(2)) 0L else stats.getLong(2)
        if (rows == m.corpusRows && maxId == m.corpusMaxId) "fresh"
        else if (prefixRows == m.corpusRows && maxId > m.corpusMaxId) {
          try {
            appendSuffixIndex(docs.filter(col("doc_id") > m.corpusMaxId), path)
            "append"
          } catch { case _: IndexManifestException =>
            saveSuffixIndex(docs, path, global = false); "rebuild"
          }
        } else { saveSuffixIndex(docs, path, global = false); "rebuild" }
      case None => saveSuffixIndex(docs, path, global = false); "rebuild"
    }
  }

  /** Overlapping token-window chunking (d112) — the retrieval/embedding
    * prep step every RAG or embedding pipeline runs before encoding:
    * fixed `chunkWords`-word windows starting every `strideWords`
    * words (stride ≤ chunk ⇒ overlap = chunk − stride words). Starts
    * are 0, S, 2S, … while < doc length; the final window is allowed
    * short (the published LangChain/retrieval convention), and every
    * word lands in ≥ 1 chunk by construction.
    *
    * Scale shape: pure scan-side higher-order expression work
    * (transform/sequence/slice, then one posexplode) — zero shuffles,
    * zero joins; the chunk stream is produced at read parallelism.
    * Returns (doc_id, chunk_id, start_tok, n_tok, chunk_text).
    */
  def chunkDocs(docs: DataFrame, chunkWords: Int = 32,
      strideWords: Int = 24): DataFrame = {
    require(chunkWords >= 1 && strideWords >= 1 && strideWords <= chunkWords,
      s"need 1 <= stride <= chunk, got chunk=$chunkWords stride=$strideWords")
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(w) - 1) DIV $strideWords),
           |  i -> slice(w, i * $strideWords + 1, $chunkWords))"""
          .stripMargin.replace("\n", " "))).as(Seq("chunk_id", "cw")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * strideWords).cast("long").as("start_tok"),
        size(col("cw")).cast("long").as("n_tok"),
        concat_ws(" ", col("cw")).as("chunk_text"))
  }

  /** Token-distribution DRIFT report (d119) — the text twin of the
    * e51 embedding-drift row: Jensen-Shannon divergence between the
    * unigram distributions of two corpus slices (`refPred` = reference
    * membership) plus the out-of-vocabulary mass in each direction —
    * the monitoring row a pipeline watches across corpus versions
    * (vocabulary drift, topical shift, a broken upstream filter).
    *
    * Exactness: the JS mixture ratio reduces to a PURE INTEGER ratio —
    * p/m = 2·ca·Nb / (ca·Nb + cb·Na) — so each word's ln argument is
    * one exact double; the ln output is quantized at DECIMAL(28,8)
    * (the d45 nll device, absorbing libm-vs-StrictMath ulps), the
    * per-word term at DECIMAL(28,12), and the sums are exact decimal
    * adds — order-independent, bit-identical cross-engine. Zero-count
    * sides contribute only the other term (the JS convention).
    *
    * Scale shape: one token-stream groupBy (map-side combine), a
    * vocabulary-scale aggregate out. Returns one row
    * (n_ref_tokens, n_new_tokens, js_div, oov_mass_new, oov_mass_ref).
    */
  def tokenDrift(docs: DataFrame, refPred: Column): DataFrame = {
    val toks = docs.select(refPred.as("grp"),
      explode(split(col("text"), " ")).as("word"))
    tokenDriftFromCounts(toks.groupBy(col("word")).agg(
      sum(when(col("grp"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("grp"), 1L).otherwise(0L)).as("cb")))
  }

  /** The [[tokenDrift]] arithmetic over an ALREADY-BUILT per-word count
    * frame (word, ca = reference count, cb = new-slice count) — the
    * seam that lets the streaming ingest gate
    * ([[graft.streaming.EventTimeOps.tokenDriftIngest]]) join each
    * micro-batch's counts against a reference vocabulary computed ONCE
    * instead of re-tokenizing the reference per batch, while running
    * the registered metric formula VERBATIM (one code path — the
    * scoreWithBigramModel convention).
    */
  def tokenDriftFromCounts(counts: DataFrame): DataFrame = {
    val c = counts.localCheckpoint(true)
    val tot = c.agg(sum(col("ca")), sum(col("cb"))).head()
    val (na, nb) = (tot.getLong(0), tot.getLong(1))
    require(na > 0 && nb > 0, s"tokenDrift: empty slice (na=$na nb=$nb)")
    def lnq(num: String, den: String) =
      s"CAST(CAST(ln(CAST($num AS DOUBLE) / CAST($den AS DOUBLE)) AS DECIMAL(28,8)) AS DOUBLE)"
    val mix = s"ca * ${nb}L + cb * ${na}L"
    val pT = when(col("ca") > 0,
      (col("ca").cast("double") / na) *
        expr(lnq(s"2 * ca * ${nb}L", mix))).otherwise(lit(0.0))
    val qT = when(col("cb") > 0,
      (col("cb").cast("double") / nb) *
        expr(lnq(s"2 * cb * ${na}L", mix))).otherwise(lit(0.0))
    c.agg(
      lit(na).as("n_ref_tokens"), lit(nb).as("n_new_tokens"),
      // the published metric is quantized ONCE at 1e-10 (the d45
      // round-at-build device): the per-term 1e-12 quanta can round
      // differently across engines by an ulp of ln — the final
      // quantization absorbs that without touching 10 significant
      // digits of the metric
      (((sum(pT.cast("decimal(28,12)")) + sum(qT.cast("decimal(28,12)")))
        .cast("double") / 2).cast("decimal(18,10)").cast("double"))
        .as("js_div"),
      (sum(when(col("ca") === 0, col("cb")).otherwise(0L)).cast("double") / nb)
        .as("oov_mass_new"),
      (sum(when(col("cb") === 0, col("ca")).otherwise(0L)).cast("double") / na)
        .as("oov_mass_ref"))
  }

  /** JVM twin of [[tokenDrift]]'s arithmetic over explicit count maps
    * — the bridge that lets the STREAMING window monitor
    * ([[graft.streaming.EventTimeOps.windowedTokenDrift]]) emit values
    * bit-equal to the batch operator (the hash60Jvm ≡ Column-hash
    * device, carried to a metric): same double tree, same HALF_UP
    * decimal quantization at the same scales (ln at 8, terms at 12,
    * the published metric at 10), same exact decimal sums. Returns
    * (js_div, oov_mass_new, oov_mass_ref).
    */
  def tokenDriftJvm(ref: Map[String, Long],
      cur: Map[String, Long]): (Double, Double, Double) = {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val na = ref.values.sum
    val nb = cur.values.sum
    require(na > 0 && nb > 0, s"tokenDriftJvm: empty slice (na=$na nb=$nb)")
    def lnq(num: Double, den: Double): Double =
      BigDecimal(math.log(num / den)).setScale(8, HALF_UP).toDouble
    var sumP = BigDecimal(0)
    var sumQ = BigDecimal(0)
    var oovNew = 0L
    var oovRef = 0L
    (ref.keySet ++ cur.keySet).foreach { w =>
      val ca = ref.getOrElse(w, 0L)
      val cb = cur.getOrElse(w, 0L)
      val mix = (ca * nb + cb * na).toDouble
      if (ca > 0)
        sumP += BigDecimal((ca.toDouble / na) * lnq(2.0 * ca * nb, mix))
          .setScale(12, HALF_UP)
      else oovNew += cb
      if (cb > 0)
        sumQ += BigDecimal((cb.toDouble / nb) * lnq(2.0 * cb * na, mix))
          .setScale(12, HALF_UP)
      else oovRef += ca
    }
    val js = BigDecimal((sumP + sumQ).toDouble / 2)
      .setScale(10, HALF_UP).toDouble
    (js, oovNew.toDouble / nb, oovRef.toDouble / na)
  }

  /** The hash60 construction as a SQL-expression string (for expr()
    * call sites composing it inside larger expressions).
    */
  private def hash60Sql(arg: String): String =
    s"CAST(conv(substring(md5($arg), 1, 15), 16, 10) AS BIGINT)"

  /** The scoring kernel behind [[bigramLmScoreIndexed]], over
    * already-loaded model frames — callers that score MANY corpora (or
    * many micro-batches: [[graft.streaming.EventTimeOps]]'s LM gate)
    * load/persist the tables once and call this per scoring pass
    * instead of re-opening the store.
    */
  def scoreWithBigramModel(docs: DataFrame, model: DataFrame,
      ctx: DataFrame, oovNll: java.math.BigDecimal): DataFrame =
    bigrams(docs)
      .join(model, Seq("prev", "cur"), "left_outer")
      .join(ctx, Seq("prev"), "left_outer")
      .withColumn("nll_eff", coalesce(col("nll"), col("unseen_nll"),
        lit(oovNll).cast("decimal(28,8)")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("nll_eff")).as("sum_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_nll").cast("double") / col("n_bigrams")).as("avg_nll"))
}
