package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with the
  * same key and right.time ≤ left.time.
  *
  * Spark has no native ASOF JOIN (the naive `l.time >= r.time` range join
  * explodes quadratically per key). This is the scalable composition:
  * tag and union both sides, then one `last(_, ignoreNulls)` running
  * window per key — a single shuffle on the key plus a per-partition
  * sort, the same cost profile as any keyed window. At equal timestamps
  * the right row sorts first, so an exactly-simultaneous right row IS
  * matched (inclusive as-of, same as DuckDB's `ON l.t >= r.t`).
  *
  * Column contract: `left` = (key, time, left payload…), `right` =
  * (key, time, `rightPayload`…); output = every left row plus
  * `asof_time` and `asof_<payload>` columns (NULL when no right row is
  * at-or-before the left row).
  */
object AsOfJoin {

  def lastEarlier(left: DataFrame, right: DataFrame, key: String,
      time: String, rightPayload: Seq[String]): DataFrame = {
    val timeType = left.schema(time).dataType
    val leftOnly = left.columns.filterNot(c => c == key || c == time).toSeq

    val lAligned = rightPayload.foldLeft(
      left.withColumn("__is_left", lit(1))
        .withColumn("__r_time", lit(null).cast(timeType))
    )((df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))

    val rBase = right.select((Seq(key, time) ++ rightPayload).map(col): _*)
      .withColumn("__is_left", lit(0))
      .withColumn("__r_time", col(time))
    val rAligned = leftOnly.foldLeft(
      rightPayload.foldLeft(rBase)((df, c) => df.withColumnRenamed(c, s"__r_$c"))
    )((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    // right rows sort before left rows on time ties → inclusive as-of
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = (("__r_time", "asof_time") +:
      rightPayload.map(c => (s"__r_$c", s"asof_$c")))
      .foldLeft(lAligned.unionByName(rAligned)) { case (df, (src, dst)) =>
        df.withColumn(dst, last(col(src), ignoreNulls = true).over(w))
      }
    filled.filter(col("__is_left") === 1)
      .drop("__is_left" +: "__r_time" +: rightPayload.map(c => s"__r_$c"): _*)
  }
}
