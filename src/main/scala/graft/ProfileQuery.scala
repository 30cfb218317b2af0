package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiling tool: run one registered query under the bench session
  * shape with a stage listener, printing every stage over a threshold —
  * attributes a slow row to its actual stages (the Bench/Explain
  * companion; see ProfileSpectral for the phase-level spectral probe).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for { a <- si.completionTime; b <- si.submissionTime }
          yield a - b).getOrElse(-1L)
        if (ms > 100)
          System.err.println(f"[stage] $ms%6d ms  tasks=${si.numTasks}%3d  ${si.name.take(100)}")
      }
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, System.nanoTime())
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.remove(e.jobId))
        val ms = t0.map(t => (System.nanoTime() - t) / 1000000L).getOrElse(-1L)
        System.err.println(f"[job]   $ms%6d ms  id=${e.jobId}")
      }
    })
    Seq("documents", "embeddings").foreach(t =>
      graft.sources.Tables.load(spark, sfDir, t).count())
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[query] ${(System.nanoTime() - t0) / 1e9}%7.2f s  $q")
      // checkpoint-footprint readout (round-13 verdict #9): the blocks
      // still pinned when the query completes, BEFORE the hygiene pass
      val st = spark.sparkContext.getRDDStorageInfo
      System.err.println(f"[store] rdds=${st.length}%3d  " +
        f"mem=${st.map(_.memSize).sum / 1048576.0}%9.1f MiB  " +
        f"disk=${st.map(_.diskSize).sum / 1048576.0}%9.1f MiB  $q")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
