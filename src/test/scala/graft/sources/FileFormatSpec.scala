package graft.sources

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** File-format scan/sink coverage (SURVEY.md 2.1 first row): the engine
  * round-trips the envelope through parquet, json, csv and orc
  * sinks/sources without loss.
  */
class FileFormatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("envelope round-trips through parquet, json, csv and orc") {
    val view = RedditView(spark, "/root/testdata/sf0.001").limit(200)
    val base = Files.createTempDirectory("fmt").toString
    val expected = view.orderBy("id")
      .collect().map(_.toSeq.map(Option(_).map(_.toString).orNull)).toSeq

    // parquet and json preserve the full envelope including nulls
    view.write.mode("overwrite").parquet(s"$base/p")
    view.write.mode("overwrite").json(s"$base/j")
    // csv: the default empty-string null marker is unambiguous here
    // (the envelope has no empty strings)
    view.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    view.write.mode("overwrite").orc(s"$base/o")

    val p = spark.read.parquet(s"$base/p")
    val j = spark.read.schema(view.schema).json(s"$base/j")
    val c = spark.read.schema(view.schema).option("header", "true").csv(s"$base/c")
    val o = spark.read.orc(s"$base/o")

    for ((df, fmt) <- Seq((p, "parquet"), (j, "json"), (c, "csv"), (o, "orc"))) {
      val got = df.orderBy("id")
        .collect().map(_.toSeq.map(Option(_).map(_.toString).orNull)).toSeq
      assert(got == expected, s"$fmt round-trip mismatch")
    }
  }
}
