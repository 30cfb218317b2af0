package graft

import graft.api.ParamSpec
import graft.operators.RedditOps
import graft.queries._
import graft.sources.RedditView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query families:
  *  - r* : reference-parity operators (SURVEY.md §2) over the envelope view
  *  - q* : relational coverage (joins/aggs/windows/sorts/set ops)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * One full reference "connection" dataflow: type gate + whitelists +
    * attr filters + projection + emit-order sort (EP1, SURVEY.md §3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val spec = ParamSpec(
      subreddits = Seq("click", "purchase", "error"),
      over18 = Some("true"),
      filterKeys = Seq("k"))
    RedditOps(spec, RedditView(spark, "/root/testdata/sf0.001"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RedditQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RedditQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles
}
