package graft

import graft.queries.{PipelineQueries, RedditQueries, RelationalQueries}
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract, guarded in `sbt test` (round 10): these
  * invariants were previously only observable at driver-verify time —
  * a query registered without an oracle silently downgrades to a
  * rows-only check, and a duplicate name across the three family maps
  * silently SHADOWS one implementation (`++` keeps the right-hand one)
  * while its oracle may keep pointing at the other's semantics.
  */
class ContractSpec extends AnyFunSuite {

  test("every registered query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("no query name is shadowed across the family maps") {
    val sizes = Seq(RedditQueries.queries.size, RelationalQueries.queries.size,
      PipelineQueries.queries.size)
    assert(SparkEntry.queries.size == sizes.sum,
      s"family maps overlap: ${sizes.mkString("+")} != ${SparkEntry.queries.size}")
    val oSizes = Seq(RedditQueries.oracles.size, RelationalQueries.oracles.size,
      PipelineQueries.oracles.size)
    assert(SparkEntry.oracleSql.size == oSizes.sum,
      s"oracle maps overlap: ${oSizes.mkString("+")} != ${SparkEntry.oracleSql.size}")
  }

  test("flagship entry yields rows on sf0.001 (the driver's smoke check)") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
}
