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
    import org.apache.spark.sql.types.{StructField, StructType}
    // The whole matched right row travels as ONE struct so a single
    // last(_, ignoreNulls) picks a consistent row — per-column fills
    // would tear rows apart whenever a payload column is NULL.
    val packType = StructType(
      StructField("t", left.schema(time).dataType) +:
        rightPayload.map(c => right.schema(c)))
    val leftOnly = left.columns.filterNot(c => c == key || c == time).toSeq

    val lAligned = left.withColumn("__is_left", lit(1))
      .withColumn("__r_pack", lit(null).cast(packType))
    val rAligned = leftOnly.foldLeft(
      right.select(col(key), col(time),
        struct(col(time).as("t") +: rightPayload.map(col): _*).as("__r_pack"))
        .withColumn("__is_left", lit(0))
    )((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    // right rows sort before left rows on time ties → inclusive as-of
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outCols = col("asof_pack.t").as("asof_time") +:
      rightPayload.map(c => col(s"asof_pack.$c").as(s"asof_$c"))
    lAligned.unionByName(rAligned)
      .withColumn("asof_pack", last(col("__r_pack"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++ outCols: _*)
  }
}
