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
  * gated on the observed plan parallelism, so heavy per-row work runs
  * on every core. The gate makes it scale-adaptive rather than a
  * local[32] constant: at production scale a corpus scan has thousands
  * of row-group/file splits, the condition never fires, and the plan is
  * untouched (no extra shuffle at 100 TB). Results are unaffected by
  * construction — every kernel downstream is order-independent (exact
  * decimal sums, key-equi joins, totally-ordered top-k).
  */
object ScanParallelism {
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // Gate on the FILE count under the plan, not df.rdd.getNumPartitions:
    // materializing .rdd generates and compiles the subtree's codegen a
    // second time per call site (measured: seconds of extra planning on
    // the composite rows). inputFiles only consults the file index. A
    // multi-file scan (any production table) disables the repartition;
    // a plan with no file source at all (in-memory fixture frames)
    // conservatively keeps it — such inputs are bench/test-scale by
    // construction.
    if (df.inputFiles.length < p) df.repartition(p) else df
  }
}
