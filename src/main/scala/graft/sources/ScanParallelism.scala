package graft.sources

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for heavy scan-side kernels.
  *
  * The bench-scale testdata ships each table as ONE parquet file with
  * ONE row group, so every scan opens at parallelism 1 no matter how
  * small `spark.sql.files.maxPartitionBytes` is set (a byte-range split
  * that contains no row-group start yields zero rows) — and the repo's
  * scan-side-heavy kernels (decimal moment folds, dot-product scoring,
  * n-gram explodes, token packing) then run single-threaded however
  * many cores the session has. Measured before this helper: the
  * spectral moment pass spent 10.3 s in a 1-task stage on a 32-core
  * box; the exact-cosine baseline scored 1000×2000 pairs in 1 task.
  *
  * [[widen]] inserts ONE round-robin exchange of the narrow input rows,
  * gated on the observed plan parallelism AND on the input's size, so
  * heavy per-row work runs on every core. Both gates make it
  * scale-adaptive rather than a local[32] constant:
  *
  *   - file-count gate: a corpus scan with at least as many files as
  *     cores already parallelizes; the plan is untouched (no extra
  *     shuffle at 100 TB).
  *   - size gate: the repartition fires only when the input is KNOWN
  *     small (catalog/file statistics under [[maxWidenBytes]]). A
  *     production table compacted into a few multi-row-group files
  *     bigger than that gets its parallelism from the normal split
  *     machinery, not from a full-corpus round-robin shuffle (round-13
  *     advice item #1). Plans with UNKNOWN size — DSv2 sources without
  *     stats, RDD-backed frames, and in particular the per-micro-batch
  *     frames of the streaming ingest gates (round-13 verdict item #3:
  *     widen was re-shuffling every tiny increment of every batch
  *     through probeWithLshIndex → shingles) — report
  *     `defaultSizeInBytes` = Long.Max and are conservatively left
  *     alone. RDD-backed frames inside query plans are localCheckpoint
  *     results here, which inherit the (already widened or shuffled)
  *     partitioning of the plan that produced them, so skipping them
  *     also removes a provably redundant exchange.
  *
  * The size check reads `analyzed.stats` (pure stats visitor — no
  * optimizer run, no codegen; the `.rdd`-gated variant was measured
  * compiling the subtree's codegen once per call site and reverted in
  * round 13). Results are unaffected by construction — every kernel
  * downstream is order-independent (exact decimal sums, key-equi
  * joins, totally-ordered top-k).
  */
object ScanParallelism {
  /** Inputs at or below this KNOWN size are worth round-robining to the
    * core count: one tiny exchange buys full-width parallelism for the
    * heavy per-row kernels. 256 MB ≈ two default (128 MB) input splits
    * — anything larger already opens with real scan parallelism and
    * keeps growing with the data, so the floor is not needed.
    */
  val maxWidenBytes: Long = 256L << 20

  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= p) df
    else if (df.queryExecution.analyzed.stats.sizeInBytes <= maxWidenBytes)
      df.repartition(p)
    else df
  }

  /** Materialize a SHARED subtree once for multiple consumers, with a
    * size budget (round-13 verdict #9): a KNOWN-small frame is eagerly
    * `localCheckpoint`ed — one computation, lineage truncated, blocks
    * in executor memory (freed by the Bench/Verify hygiene pass, or by
    * the ContextCleaner once the frame is unreachable). A frame whose
    * size estimate exceeds [[maxWidenBytes]] — at 100 TB the capped
    * hashed-shingle streams and the curve pair tables are
    * corpus-multiple and would evict execution memory or OOM (guide
    * §5: cached data competes with execution memory) — is returned
    * UNMATERIALIZED: consumers recompute the subtree, which is
    * scan-side work that parallelizes with the data, lineage stays
    * intact, and nothing is pinned. (A `persist` arm was considered
    * and rejected: `Dataset.persist` registers the plan in the
    * CacheManager, a strong reference no ContextCleaner ever reclaims
    * — without a guaranteed unpersist, a long-lived session calling
    * these plan-builders leaks a corpus-multiple cache entry per
    * call. Recompute is the arm guide §5 prescribes when the memory
    * pressure outweighs the recompute cost.) The budget is
    * maxWidenBytes per kernel, stated here so the trade is a
    * constant, not a surprise.
    *
    * `gate`: smallness is judged on this frame instead of `df` when
    * given. Catalyst's size-only stats visitor prices an inner JOIN
    * as the PRODUCT of its children, so a join-rooted `df` would read
    * as petabytes at any scale and silently disable sharing; callers
    * whose shared frame is join-rooted pass the scan-rooted source
    * (the corpus frame) whose size actually bounds the blowup.
    */
  def shareSmall(df: DataFrame, gate: DataFrame = null): DataFrame = {
    val g = if (gate == null) df else gate
    if (g.queryExecution.analyzed.stats.sizeInBytes <= maxWidenBytes)
      df.localCheckpoint(true)
    else df
  }

  /** Writer-side layout for a `partitionBy(keys)` store write: when the
    * frame is KNOWN small (same gates as [[widen]]), hash-repartition
    * to exactly `nDirs` partitions on the layout keys so the write runs
    * one task per partition directory — one file per directory instead
    * of one task serially opening all of them (measured: the 64-dir SRP
    * block write was a 3.3 s tasks=1 stage at sf0.1/32 cores).
    *
    * The partition count is EXPLICIT (`repartition(n, keys)`), which
    * AQE never coalesces (REPARTITION_BY_NUM) — the round-13 attempt
    * used the coalescible keyed form and AQE folded the tiny shuffle
    * back to one partition, leaving the write serial while paying for
    * the exchange. At production scale the gates leave the plan
    * untouched: a corpus-sized frame keeps its natural (input-derived)
    * write parallelism rather than being squeezed into nDirs tasks.
    *
    * `gate`: same join-rooted-stats escape hatch as [[shareSmall]] —
    * a write frame built by joining text back onto an assignment
    * table reads as the product of its sides; the caller passes the
    * scan-rooted docs frame so the gate reflects the actual scale.
    */
  def layoutForWrite(df: DataFrame, nDirs: Int,
      keys: Seq[org.apache.spark.sql.Column],
      gate: DataFrame = null): DataFrame = {
    val g = if (gate == null) df else gate
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (g.inputFiles.length < p &&
        g.queryExecution.analyzed.stats.sizeInBytes <= maxWidenBytes)
      // min(p, nDirs): never more write tasks than cores — tasks beyond
      // the core count only add scheduling/commit overhead at this
      // (gated-small) scale; a task holding 2-3 directories still
      // writes one file per directory
      df.repartition(math.max(1, math.min(p, nDirs)), keys: _*)
    else df
  }
}
