package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §2.1 / 100 TB design).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one build-side key is so hot that even split
  * partitions overwhelm a task (e.g. joining an event log against a
  * per-subreddit dimension where one subreddit dominates).
  *
  * Mechanics: the probe (skewed) side gets a random salt in [0, factor);
  * the build side is replicated `factor` times with every salt value.
  * The shuffle key becomes (key, salt), spreading one hot key over
  * `factor` tasks. Semantics are identical to `left.join(right, key)`
  * for inner joins.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, with `left`'s hot keys
    * spread over `factor` salt buckets. `right` is replicated ×factor —
    * keep it the smaller side.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = left.withColumn("__salt", (rand(seed = 42) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
