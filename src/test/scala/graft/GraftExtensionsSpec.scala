package graft

import graft.functions.JsonKeySubset
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions hook: a session built with
  * [[GraftExtensions]] exposes the custom codegen'd expressions as SQL
  * functions — the adoption path for SQL-only clients.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions(new GraftExtensions) installs graft_* SQL functions") {
    val base = SparkTestSession.spark // ensure the shared context exists
    // a NEW session (same SparkContext) so the extensions hook actually
    // runs — getOrCreate returns the existing session otherwise
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions()).getOrCreate()
    try {
      val row = s.sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |       graft_normalize('  Héllo,  World!! 42 ') AS n,
          |       graft_json_subset('{"a":1,"b":2,"c":3}', 'b', 'c') AS j
          |""".stripMargin).collect().head
      assert(row.getDouble(0) == 11.0)
      assert(row.getString(1) == "hllo world 42")
      // byte-identical to the Column-API form of the same expression
      val viaColumn = s.range(1)
        .select(JsonKeySubset(lit("""{"a":1,"b":2,"c":3}"""), Seq("b", "c")))
        .collect().head.getString(0)
      assert(row.getString(2) == viaColumn)
      // non-literal keys are rejected loudly (the projection compiles
      // into the expression, per the reference's fixed filter list)
      val err = intercept[Exception](
        s.sql("SELECT graft_json_subset('{}', lower('B'))").collect())
      assert(err.getMessage.contains("string literals")
        || Option(err.getCause).exists(_.getMessage.contains("string literals")))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
