package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Executable plan-shape guards for the 100 TB design claims that
  * PLANS_r*.md documents in prose: a refactor that silently degrades a
  * broadcast to a shuffle, drops map-side partial aggregation, or loses
  * a top-k pushdown keeps passing every VALUE-level oracle — only the
  * plan text shows the regression, so pin the load-bearing markers here.
  * (Markers are chosen to be stable across AQE: broadcast HINTS and
  * aggregate modes appear in the pre-execution formatted plan.)
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("d145: the z-ordered rectangle query prunes buckets at the file-index layer") {
    // the rectangle's overlapping z-buckets are injected driver-side as
    // literals — whole partition directories must prune before any row
    // is read, the layout's entire value proposition
    val p = plan("d145_zorder_query")
    assert("PartitionFilters: \\[[^\\]]*zbucket#\\d+ (INSET|IN )".r.findFirstIn(p).isDefined,
      "z-bucket literals must land in PartitionFilters\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("d141: the collocation top-k plans as TakeOrderedAndProject") {
    val p = plan("d141_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("e60: the JL projection is pure scan-side work — no hash exchange") {
    // each reduced coordinate is one dot against a literal sign vector;
    // the ONLY exchange allowed is the registered row's output-order
    // rangepartitioning — a hashpartitioning means the projection
    // stopped being free
    val p = plan("e60_jl_project")
    assert(!p.contains("Exchange hashpartitioning"),
      "JL projection must not hash-shuffle\n" + p.take(2000))
  }

  test("d143: the blocklist rule is scan-side — no hash exchange") {
    val p = plan("d143_blocklist")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("e64: the served component never touches the corpus — artifact scans only") {
    // the persisted spectral model is the round-12 point: e64's serve
    // path reads the dims-scale artifact tables, not embeddings.parquet
    // (before the artifact, e64/e65/e66 EACH rebuilt the covariance
    // from the corpus — the round-11 verdict's #1 cost finding)
    val p = plan("e64_pca_top")
    assert(!p.contains("embeddings.parquet"),
      "e64 serve must not rescan the corpus\n" +
        p.linesIterator.filter(_.contains("parquet")).take(6).mkString("\n"))
  }

  test("e68: the debias re-encode is pure scan-side work — no hash exchange") {
    // centering, the projection-coefficient fold and the removal are
    // all per-row expression work against literal μ/v̂₁ arrays; the only
    // exchange allowed is the registered row's output-order
    // rangepartitioning — a hashpartitioning means the re-encode
    // stopped pipelining at read parallelism
    val p = plan("e68_pca_debias")
    assert(!p.contains("Exchange hashpartitioning"),
      "debias re-encode must not hash-shuffle\n" + p.take(2000))
  }

  test("d147: the AMS counters partial-aggregate below one exchange") {
    // the sketch's entire point is O(nEst) state with map-side combine
    val p = plan("d147_ams_f2")
    assert(p.contains("partial_"), "no map-side partials in the AMS pass\n" + p.take(2000))
  }

  test("d142: the entropy aggregation runs map-side partials") {
    val p = plan("d142_char_entropy")
    assert(p.contains("partial_"), p.take(2000))
  }

  test("q02: dimension joins stay broadcast (no shuffle on nation/region)") {
    val p = plan("q02_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q01: aggregation is two-phase with map-side partials below one exchange") {
    val p = plan("q01_agg_sum")
    assert(p.contains("partial_"), "no partial (map-side) aggregation in plan\n" + p.take(2000))
  }

  test("q10: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q10_topk_order")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q11b: the KMV sketch partial-aggregates below its exchange") {
    val p = plan("q11b_distinct_kmv")
    assert(p.contains("partial_kmvsketch"), p.take(2000))
  }

  test("e02: bucketed ANN keeps the per-query top-k partial (WindowGroupLimit)") {
    val p = plan("e02_ann_topk")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("d11: bloom misses short-circuit scan-side (union branch without joins)") {
    val p = plan("d11_bloom_dedup")
    assert(p.contains("Union"), p.take(2000))
    // exactly one join operator in the whole plan (whatever physical
    // strategy the optimizer picks for it): the verified-hits leg; the
    // misses leg must reach the union from a bare filtered scan
    // formatted-mode detail lines: "(14) BroadcastHashJoin"
    val joins = """(?m)^\(\d+\) (BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|BroadcastNestedLoopJoin)""".r
      .findAllIn(p).length
    assert(joins == 1, s"expected exactly one join operator, found $joins\n" + p.take(2000))
  }

  test("e31: the REGISTERED indexed query prunes unprobed cells at the file-index layer") {
    // the registered row is the production form (cell-partitioned
    // layout + pruneScan): its scan must carry the probed-cell literal
    // in PartitionFilters, so unprobed cells never open their footers
    val p = plan("e31_ivf_sq8_indexed")
    assert("PartitionFilters: \\[[^\\]]*cell#\\d+ (INSET|IN )".r.findFirstIn(p).isDefined,
      "probed-cell literal must land in PartitionFilters on the registered query\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("d09: fingerprint normalization is one codegen'd expression over a pruned scan") {
    val p = plan("d09_fingerprint")
    assert(p.contains("normalize_text"), p.take(2000))
    assert(!p.contains("regexp_replace"), "regex chain crept back into the hot path")
  }

  test("d13: the train gram stream probes a BROADCAST eval set (corpus unshuffled)") {
    val p = plan("d13_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("d15: vocab top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("d15_vocab")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("d16: hash sampling is pure per-row expression work — zero exchanges") {
    // the operator itself (the registered query adds an orderBy for
    // oracle determinism, which legitimately range-partitions)
    val df = graft.operators.Sampling.stratified(
      graft.operators.TextAnalysis.langId(
        graft.sources.Tables.documents(spark, dir))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("pred_lang")),
      org.apache.spark.sql.functions.col("pred_lang"),
      Map("en" -> 0.5), 1.0)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), "sampling must not shuffle\n" + p.take(2000))
  }

  test("d17: bm25 stats ride a broadcast into per-row scoring") {
    val p = plan("d17_bm25")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("d14/d18: repetition signals partial-aggregate below their exchanges") {
    assert(plan("d14_repetition").contains("partial_"), "d14 lost map-side aggregation")
    assert(plan("d18_dup_spans").contains("partial_"), "d18 lost map-side aggregation")
  }

  test("d20: the running sum windows PER SHARD, not one global partition") {
    val p = plan("d20_pack_plan")
    assert(p.contains("hashpartitioning(shard"),
      "pack window lost its shard partitioning (single-partition global window)\n" + p.take(2000))
  }

  test("d21: the single-row total rides a broadcast into the share projection") {
    val p = plan("d21_mixture_stats")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("partial_"), "d21 lost map-side aggregation")
  }

  test("q21: the range join is an EQUI-join on the bin key — no nested loop") {
    val p = plan("q21_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degraded to a nested-loop/cartesian plan\n" + p.take(2000))
    assert(p.contains("Join"), "no join operator at all?\n" + p.take(2000))
  }

  test("e06: the k-NN graph keeps the per-vertex top-k partial (WindowGroupLimit)") {
    val p = plan("e06_knn_graph")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "bucketed self-join became a cartesian")
  }

  test("d23: chunking is pure per-row expression work — zero exchanges") {
    // the operator itself (the registered query adds an orderBy for
    // oracle determinism, which legitimately range-partitions)
    val df = graft.operators.Curation.chunkPlan(
      graft.sources.Tables.documents(spark, dir))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), "chunking must not shuffle\n" + p.take(2000))
  }

  test("q22: sessionize reuses the window's user_id partitioning for the roll-up — one hash exchange") {
    val p = plan("q22_sessionize")
    // exactly 2 exchanges: the user_id hash shuffle feeding BOTH windows
    // and the roll-up (HashPartitioning(user_id) satisfies the
    // (user_id, sess_idx) clustering), plus the final orderBy's range
    // exchange — a third one means the roll-up stopped reusing it
    val exchanges = "\\+- Exchange \\(\\d+\\)".r.findAllIn(p).size
    assert(exchanges == 2,
      s"expected window and session roll-up to share one shuffle (2 exchanges incl. orderBy), got $exchanges\n" + p.take(2000))
    assert("HashAggregate \\(\\d+\\)\\s*\\n\\s*\\+- HashAggregate".r.findFirstIn(p).isDefined,
      "partial and final session aggregates are no longer adjacent\n" + p.take(2000))
  }

  test("q23: the correlated subquery runs as a window, not a self-join") {
    val p = plan("q23_above_cust_avg")
    assert(!p.contains("Join"), "decorrelation should be a window over one shuffle, not a join\n" + p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("e07: k-means assignment is scan-side expression work — no join below the cell aggregate") {
    val p = plan("e07_kmeans_update")
    assert(!p.contains("Join"), "centroid assignment must be inlined literals, not a join\n" + p.take(2000))
    assert(p.contains("partial_sum"), "cell aggregate lost its map-side decimal-sum partial")
    // the mean must aggregate O(1) decimal state per (cell, dim) — a
    // member-list buffer (collect_list) is O(cell mass) and OOMs at scale
    assert(!p.contains("collect_list"), "k-means mean regressed to member-list state\n" + p.take(2000))
  }

  test("e11: PQ training aggregates O(1) decimal state per cell — partials, no member buffers") {
    val p = plan("e11_pq_train")
    assert(!p.contains("Join"), "training reads the shared assignment, not a join\n" + p.take(2000))
    assert(p.contains("partial_sum"), "mean lost its map-side decimal-sum partial")
    assert(!p.contains("collect_list"), "PQ mean regressed to member-list state\n" + p.take(2000))
  }

  test("q24: the skew join replicates the build side and joins on (key, salt)") {
    val p = plan("q24_skew_join")
    // the ×factor replication is a Generate(explode) on the build side…
    assert(p.contains("Generate") && p.contains("explode"),
      "salt replication (explode) missing from the plan\n" + p.take(2000))
    // …and the salt must survive into the join keys — a salt that is
    // projected away before the join silently degrades to a plain join
    assert(p.contains("__salt"), "join keys lost the salt column\n" + p.take(2000))
  }

  test("d29: the lexical k-NN graph keeps the per-vertex top-k partial (WindowGroupLimit)") {
    val p = plan("d29_lexical_knn")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("e09: PQ encoding is pure scan-side codebook assignment — no join, zero exchanges, codegen intact") {
    val df = graft.operators.Similarity.pqEncode(
      graft.sources.Tables.embeddings(spark, dir))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), "codebook must be a reference object, not a join\n" + p.take(2000))
    assert(!p.contains("Exchange"), "PQ encode must not shuffle\n" + p.take(2000))
    // the kernel must stay INSIDE whole-stage codegen (the unrolled
    // formulation it replaced bloated the stage — PqCodebook doc)…
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.length
    assert(spans >= 1, "PQ assignment fell out of whole-stage codegen")
    // …and must be evaluated ONCE per row: a non-outer explode guards
    // the Generate with size()/isnotnull copies of the kernel
    val evals = "pq_assign".r.findAllIn(p).length
    assert(evals == 1, s"assignment kernel evaluated $evals times per row\n" + p.take(2000))
  }

  test("e10: ADC scoring reads codes + a broadcast query side — single broadcast join") {
    val p = plan("e10_pq_adc")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    val joins = """(?m)^\(\d+\) (BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|BroadcastNestedLoopJoin)""".r
      .findAllIn(p).length
    assert(joins == 1, s"expected exactly one join operator, found $joins\n" + p.take(2000))
  }

  test("d25/d26: content-defined chunking and diversity are pure per-row array passes — zero exchanges") {
    for (df <- Seq(
        graft.operators.Curation.cdcChunks(graft.sources.Tables.documents(spark, dir)),
        graft.operators.TextAnalysis.lexicalDiversity(graft.sources.Tables.documents(spark, dir)))) {
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Exchange"), "per-row operator must not shuffle\n" + p.take(2000))
    }
  }

  test("d24: the schedule's single-row total rides a broadcast") {
    val p = plan("d24_mix_schedule")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("partial_"), "d24 lost map-side aggregation")
  }

  test("q27: per-window top-k keeps the rank-filter partial (WindowGroupLimit)") {
    val p = plan("q27_window_top_users")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("q26: unpivot plans as one Expand over the scan — melt without a self-join") {
    val p = plan("q26_unpivot")
    assert(p.contains("Expand"), p.take(2000))
    val joins = """(?m)^\(\d+\) (BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|BroadcastNestedLoopJoin)""".r
      .findAllIn(p).length
    assert(joins == 0, s"melt must not join or re-scan per measure, found $joins joins\n" + p.take(2000))
  }

  test("d31: OOV scoring is join-free — the vocab rides a scan-side InSet, one partial aggregate") {
    val p = plan("d31_oov_rate")
    // the vocabulary was collected driver-side; a membership JOIN
    // appearing here means the InSet formulation regressed
    val joins = """(?m)^\(\d+\) (BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|BroadcastNestedLoopJoin)""".r
      .findAllIn(p).length
    assert(joins == 0, s"expected a join-free scoring plan, found $joins joins\n" + p.take(2000))
    assert(p.contains("partial_"), "d31 lost map-side aggregation\n" + p.take(2000))
  }

  test("d33: winnowing selects fingerprints scan-side — no keyed shuffle before the sink sort") {
    // the operator itself (the registered query's orderBy legitimately
    // range-partitions for oracle determinism, as d16). The guard pins
    // the ALGORITHMIC claim — selection needs no hash exchange; the
    // round-robin scan-parallelism floor (ScanParallelism.widen) is an
    // input-shape adaptation, not a shuffle the algorithm requires,
    // and disappears at production split counts.
    val df = graft.operators.Dedup.winnowFingerprints(
      graft.sources.Tables.documents(spark, dir), 3, 4)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      "winnowing must not key-shuffle\n" + p.take(2000))
    val joins = """(?m)^\(\d+\) (BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|BroadcastNestedLoopJoin)""".r
      .findAllIn(p).length
    assert(joins == 0, s"selection must be join-free, found $joins joins\n" + p.take(2000))
    // the gram-hash chain must be evaluated ONCE: a plain (non-outer)
    // explode's size-guard re-evaluates it in a Filter below the
    // Generate — 14× slower, measured (winnowFingerprints doc)
    val md5s = "md5".r.findAllIn(p).length
    assert(md5s == 1, s"gram-hash chain evaluated $md5s times — explode guard regressed\n" + p.take(2000))
  }

  test("e24: SQ8 scoring is codes + a broadcast query side — single broadcast join, no shuffle") {
    val p = plan("e24_sq8_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), "SQ8 scoring fell back to a corpus shuffle\n" + p.take(2000))
  }

  test("e26: IVF+SQ8 joins candidates on the cell key only — no nested loop, no corpus shuffle") {
    val p = plan("e26_ivf_sq8_topk")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "candidate bounding lost — scoring went all-pairs\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the query-scale probe side got shuffle-joined against the corpus\n" + p.take(2000))
  }

  test("e20: the re-rank raw-vector fetch is BROADCAST-shaped (corpus never shuffled for it)") {
    val p = plan("e20_rerank_topk")
    // two broadcast joins above the shortlist: corpus × broadcast(ids),
    // then × broadcast(queries); a SortMergeJoin here means the
    // query-scale shortlist got shuffled against the corpus
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "the shortlist fetch fell back to a corpus shuffle\n" + p.take(2000))
  }

  test("d45: the scoring pass scans the corpus once — model consumers read checkpointed pair counts") {
    // first-cut d45 scanned parquet 4x (one per model consumer); the
    // localCheckpoint on c2 pins it to the single probe-side scan
    val p = plan("d45_bigram_lm")
    // formatted explain prints each node twice (tree + details): count
    // the numbered detail headers, one per physical scan
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      "scoring must scan the corpus exactly once\n" +
        p.linesIterator.filter(_.contains("Scan parquet")).mkString("\n"))
  }

  test("d46: ranking is bucket-partitioned windows over checkpointed scores — no corpus re-scan") {
    // first-cut d46 recomputed the whole LM chain 3x (12 scans); the
    // checkpointed lm plus the bucket grid leave zero parquet scans and
    // a window partitioned by the grid, never one global doc partition
    val p = plan("d46_ppl_tiers")
    assert(!p.contains("Scan parquet"),
      "tier ranking must not re-derive the LM\n" +
        p.linesIterator.filter(_.contains("Scan parquet")).mkString("\n"))
    assert(p.contains("hashpartitioning(bkt"),
      "the rank window must partition by the score-grid bucket\n" + p.take(2000))
  }

  test("d47/d48: prefix-sum windows are bucket-partitioned; text is checkpointed to four longs") {
    val p = plan("d47_token_shards")
    assert(!p.contains("Scan parquet"),
      "the totals side must not re-tokenize the corpus\n" +
        p.linesIterator.filter(_.contains("Scan parquet")).mkString("\n"))
    assert(p.contains("hashpartitioning(bkt"),
      "the running sum must window per bucket, not one global partition\n" + p.take(2000))
    val p2 = plan("d48_pack_ctx")
    assert(!p2.contains("Scan parquet") && p2.contains("hashpartitioning(bkt"),
      "packing shares the prefix-sum shape\n" + p2.take(2000))
  }

  test("d121: the length rank windows per length bucket over checkpointed longs — no corpus re-scan, no global window over docs") {
    val p = plan("d121_pair_pack")
    assert(!p.contains("Scan parquet"),
      "rank + partner join must read the checkpointed (id, len) rows\n" +
        p.linesIterator.filter(_.contains("Scan parquet")).mkString("\n"))
    assert(p.contains("hashpartitioning(n_tokens"),
      "the within-length row_number must partition by the length bucket\n" +
        p.take(2000))
  }

  test("d126: the batch rank windows per length bucket — never one global doc partition") {
    val p = plan("d126_bucket_batches")
    assert(p.contains("hashpartitioning(bkt") ||
      p.contains("hashpartitioning((n_tokens"),
      "the batch window must partition by the length bucket\n" + p.take(2000))
  }

  test("d125: near-dup exclusion is a key-keyed anti-join over ANN candidates — no nested loop anywhere") {
    val p = plan("d125_hard_negatives")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "candidate bounding lost\n" + p.take(2000))
  }

  test("d49: three-tier backoff is two equi left joins — no nested-loop fallback") {
    val p = plan("d49_bigram_lm_xdomain")
    assert(!p.contains("NestedLoop"),
      "backoff joins must stay equi-joins\n" + p.take(2000))
  }

  test("d56/d57/d60/m05: scan-side quality & fingerprint ops never key-shuffle") {
    // the guard pins the ALGORITHMIC claim (per-row expression work, no
    // hash exchange); d60 additionally carries the round-robin
    // scan-parallelism floor (ScanParallelism.widen), which is an
    // input-shape adaptation that disappears at production split counts
    val docs = graft.sources.Tables.documents(spark, dir)
    Seq(
      "d56" -> graft.operators.TextAnalysis.gopherRules(docs),
      "d57" -> graft.operators.TextAnalysis.c4LineFilter(docs),
      "d60" -> graft.operators.TextAnalysis.gopherRepetition(docs),
      "m05" -> graft.operators.Multimodal.mediaPhash(
        graft.operators.Multimodal.mediaView(docs))
    ).foreach { case (name, df) =>
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning"),
        s"$name must not key-shuffle\n" + p.take(2000))
    }
  }

  test("d58: the BPE pair top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("d58_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("d61: the encoded vocabulary rides a broadcast into the token-stream join") {
    val p = plan("d61_bpe_encode")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("m06/e45: candidate pairs come from equi-joins — no nested-loop fallback") {
    val p = plan("m06_media_neardup")
    assert(!p.contains("NestedLoop"),
      "banded Hamming candidates must hash-join on (bpos, bval)\n" + p.take(2000))
    val p2 = plan("e45_semdedup")
    assert(!p2.contains("NestedLoop"),
      "SemDeDup pairs must equi-join on the cell\n" + p2.take(2000))
  }

  test("d62: the curriculum prefix-sum windows per bucket off the composite key") {
    val p = plan("d62_curriculum_shards")
    assert(p.contains("hashpartitioning(bkt"),
      "the running sum must window per bucket, not one global partition\n" + p.take(2000))
  }

  test("d69: the classifier weight table rides a broadcast into the feature join; margins partial-aggregate") {
    val p = plan("d69_classifier_select")
    assert(p.contains("BroadcastHashJoin"),
      "the B+1-row weight table must broadcast, never shuffle the feature stream\n" + p.take(2000))
    assert(p.contains("partial_sum"),
      "the margin aggregation must map-side combine\n" + p.take(2000))
  }

  test("d70: the weighted sample plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("d70_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("d72: the gram doc-frequency join is an equi-join on the hash key — NOT broadcast (vocabulary-scale)") {
    val p = plan("d72_softdedup_weights")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "the df table is gram-vocabulary-scale and must stay a shuffled equi-join\n" + p.take(2000))
  }

  test("d81: the HLL register build partial-aggregates (map-side max) — the sketch path must never shuffle the gram stream unreduced") {
    val p = plan("d81_hll_grams")
    assert(p.contains("partial_max"),
      "register maxes must combine map-side\n" + p.take(2000))
  }

  test("m07: the multimodal prefix sum windows per bucket, not one global partition") {
    val p = plan("m07_interleaved_pack")
    assert(p.contains("hashpartitioning(bkt"),
      "the running sum must window per bucket\n" + p.take(2000))
  }

  test("d82: the per-stratum prefix sum windows by (stratum, bucket), not one global partition") {
    val p = plan("d82_unimax_select")
    assert(p.contains("hashpartitioning(stratum"),
      "the running sum must window per (stratum, bucket)\n" + p.take(2000))
  }

  test("d86: the margin rank windows per bucket, not one global partition") {
    val p = plan("d86_classifier_topcut")
    assert(p.contains("hashpartitioning(bkt"),
      "the rank must window per margin bucket\n" + p.take(2000))
  }

  test("d87: the query-term filter reaches the postings parquet scan (PushedFilters In(term))") {
    val p = plan("d87_bm25_indexed")
    assert(p.contains("PushedFilters: [In(term") ||
      p.contains("PushedFilters: [EqualTo(term"),
      "term probes must push into the postings scan — at 100 TB this is " +
        "the difference between reading three postings lists and the " +
        "whole vocabulary\n" + p.take(3000))
  }

  test("d90: the bucketed postings probe prunes unprobed term-bucket directories AND pushes the term filter") {
    val p = plan("d90_bm25_bucketed")
    assert("PartitionFilters: \\[[^\\]]*tb#".r.findFirstIn(p).isDefined,
      "the probed-bucket literal must land in PartitionFilters — at " +
        "100 TB this is the difference between opening q bucket " +
        "directories and listing the whole vocabulary's files\n" + p.take(3000))
    assert(p.contains("PushedFilters: [In(term") ||
      p.contains("PushedFilters: [EqualTo(term"),
      "the term filter must still push within the surviving buckets\n" +
        p.take(3000))
  }

  test("d89: retrieval cuts with TakeOrderedAndProject per query; term pushdown AND bucket pruning survive under the cut") {
    val p = plan("d89_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k cut must be a per-partition heap + k-row driver merge, " +
        "never a global sort of every score\n" + p.take(3000))
    assert(p.contains("PushedFilters: [In(term") ||
      p.contains("PushedFilters: [EqualTo(term"),
      "the d87 postings pushdown must survive under the retrieval cut\n" +
        p.take(3000))
    assert("PartitionFilters: \\[[^\\]]*tb#".r.findFirstIn(p).isDefined,
      "the d90 bucket pruning must survive under the retrieval cut\n" +
        p.take(3000))
  }

  test("d112: chunking is scan-side expression work — no join anywhere in the plan") {
    val p = plan("d112_chunking")
    assert(!p.contains("Join"),
      "chunking must stay per-row higher-order expression work\n" + p.take(2000))
  }

  test("d116/d117: retrieval compositions cut with TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("d116_chunk_retrieval", "d117_hybrid_rrf")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q: the top-k cut must be a heap cut\n" + p.take(2000))
    }
  }

  test("d155/d156: the shard-store snapshot read is the normal scan plus one PUSHED doc_id cut") {
    // VERSION-AS-OF's whole cost claim: no per-version metadata scans,
    // no copy-on-write — just the watermark cut answered from parquet
    // row-group stats, i.e. it must reach PushedFilters
    for (q <- Seq("d155_shard_time_travel", "d156_pack_shards_asof")) {
      val p = plan(q)
      assert("LessThanOrEqual\\(doc_id".r.findFirstIn(p).isDefined,
        s"$q: the snapshot watermark cut must be pushed to the scan\n" +
          p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    }
  }

  test("d157: the as-of LSH probe pushes the snapshot watermark into BOTH index scans") {
    val p = plan("d157_lsh_time_travel")
    assert("LessThanOrEqual\\(doc_id".r.findAllIn(p).size >= 2,
      "sig AND bands scans must each carry the pushed watermark cut\n" +
        p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("r16: the log snapshot read pushes the id cut (metadata pruning spec'd in Round13OpsSpec)") {
    val p = plan("r16_log_snapshot")
    assert("LessThanOrEqual\\(id".r.findFirstIn(p).isDefined,
      "the snapshot id cut must be pushed into the JSON scan\n" +
        p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }
}
