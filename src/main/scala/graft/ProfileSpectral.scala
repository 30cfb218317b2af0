package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling tool (the ProfileCuration/ProfileRecall convention):
  * per-phase wall times + per-stage breakdown for the spectral
  * maintenance rows, to attribute e67/e79's cost to actual stages.
  */
object ProfileSpectral {
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for { a <- si.completionTime; b <- si.submissionTime }
          yield a - b).getOrElse(-1L)
        if (ms > 150)
          System.err.println(f"[stage] $ms%6d ms  tasks=${si.numTasks}%3d  ${si.name.take(100)}")
      }
    })
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    emb.count()
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[phase] ${(System.nanoTime() - t0) / 1e9}%7.2f s  $name")
      r
    }
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 4
    val path = "target/graft-indexes/profile-spectral"
    phase("save(3/4)") {
      graft.operators.Similarity.saveSpectralIndex(
        emb.filter(col("vec_id") <= cut), path, 64, 3)
    }
    phase("sync#1 (append)") {
      graft.operators.Similarity.spectralIndexSync(emb, path, 64, 3)
    }
    phase("sync#2 (fresh)") {
      graft.operators.Similarity.spectralIndexSync(emb, path, 64, 3)
    }
    phase("serve") {
      graft.operators.Similarity.pcaTopComponentOf(
        graft.operators.Similarity.loadSpectralIndex(spark, path))
        .orderBy(col("dim"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("loadAt v1 + serve (e79 tail)") {
      graft.operators.Similarity.pcaTopComponentOf(
        graft.operators.Similarity.loadSpectralIndexAt(spark, path, 1))
        .orderBy(col("dim"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
