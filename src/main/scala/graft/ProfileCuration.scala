package graft

import graft.operators.{Curation, Dedup, Sampling, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-stage profiler for the d19/d12 bench drift (round-7
  * item #1): times each component of the curation keep-list and the CC
  * pipeline separately, best-of-2, same session config as Bench.
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, sfDir).count() // warm footer/codegen

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"PROF $name%-18s best=$best%7.2f  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      best
    }

    val docs = Tables.documents(spark, sfDir)
    val evalPred = col("doc_id") % 10 === 0

    time("shingles")(Dedup.hashedShingles(docs))
    time("minhash+bands")(Dedup.bandKeys(Dedup.minhash(Dedup.hashedShingles(docs), 8), 8, 4))
    time("lsh_pairs(d03)")(Dedup.lshNearDupPairs(docs, 8, 4, 0.5, 1000L, 10000L))
    time("cc(d12)")(Dedup.dedupClusters(docs,
      Dedup.lshNearDupPairs(docs, 8, 4, 0.5, 1000L, 10000L)))
    time("contam(d13)")(Dedup.contamination(docs, evalPred))
    time("repetition(d14)")(TextAnalysis.repetition(docs))
    time("sample(d16)")(Sampling.stratified(
      TextAnalysis.langId(docs).select(col("doc_id"), col("pred_lang")),
      col("pred_lang"), Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.125), 1.0))
    time("keep(d19)")(Curation.keepList(docs, evalPred,
      Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.125), 1.0,
      8, 4, 0.5, 1000L, 10000L))
    time("keep(d19)+sort")(SparkEntry.queries("d19_curation_keep")(spark, sfDir))
    time("d12 registered")(SparkEntry.queries("d12_dedup_clusters")(spark, sfDir))
    spark.stop()
  }
}
