package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (guide: one session per suite;
  * sharing across suites is safe here because tests only read).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // 8 task slots: the SSE wire suites run several concurrent 100ms-
      // trigger streaming queries (mask feeds, parity taps, checkpoint
      // WAL writes) PLUS catch-up batch jobs; with only 4 slots those
      // queue behind each other and wire tests flake on latency, not
      // correctness (observed ~25% suite flake rate at local[4])
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
