package graft.operators

import graft.SparkTestSession
import graft.api.ParamSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Spark's Encoder codegen doesn't need an outer instance. */
case class Ev(id: Long, event: String, created_utc: Long,
    author: String, subreddit: String, domain: Option[String],
    over_18: Option[String], is_self: Option[String], json: String)

/** F1-F7 / P1 / O1 / E1 / R1-R2 truth tables over the FIXTURES.md §A1
  * edge-case rows (missing domain, mixed-case booleans, ties, gaps).
  */
class RedditOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Edge cases baked in: rs without domain (id=20), mixed-case over_18 /
  // is_self, an rc/rs tie on created_utc (ids 1 and 10).
  private lazy val fixture: DataFrame = Seq(
    Ev(1, "rc", 100, "automoderator", "news", None, None, None,
      """{"author":"automoderator","body":"hi","score":3}"""),
    Ev(2, "rc", 105, "alice", "politics", None, None, None,
      """{"author":"alice","body":"x"}"""),
    Ev(3, "rc", 90, "bob", "funny", None, None, None, """{"body":"y"}"""),
    Ev(10, "rs", 100, "alice", "news", Some("Example.COM"), Some("True"), Some("false"),
      """{"title":"t1"}"""),
    Ev(20, "rs", 110, "carol", "politics", None, Some("false"), Some("False"),
      """{"title":"t2"}"""),
    Ev(30, "rs", 95, "dave", "aww", Some("imgur.com"), Some("FALSE"), Some("true"),
      """{"title":"t3"}""")
  ).toDF()

  private def ids(spec: ParamSpec): Seq[Long] =
    RedditOps(spec, fixture).select("id").as[Long].collect().toSeq

  test("F1: type gate — comments only / submissions only / bogus type") {
    assert(ids(ParamSpec(types = Set("rc"))) == Seq(3, 1, 2))
    assert(ids(ParamSpec(types = Set("rs"))) == Seq(30, 10, 20))
    assert(ids(ParamSpec(types = Set.empty)).isEmpty)
  }

  test("F2: author whitelist exact + case-sensitive") {
    assert(ids(ParamSpec(authors = Seq("alice"))) == Seq(10, 2))
    assert(ids(ParamSpec(authors = Seq("Alice"))).isEmpty)
  }

  test("F3: subreddit whitelist") {
    assert(ids(ParamSpec(subreddits = Seq("news"))) == Seq(1, 10))
  }

  test("F4: domain lowercased both sides; missing domain never matches") {
    assert(ids(ParamSpec(domains = Seq("example.com"))) == Seq(10))
    // the reference would crash / reuse stale domain on id=20 (sse.py:198
    // vs 213); we treat missing as non-matching
    assert(ids(ParamSpec(domains = Seq("nosuch.com"))).isEmpty)
  }

  test("F5: OR-combinator; ?domain=x alone drops all comments (quirk)") {
    assert(ids(ParamSpec(authors = Seq("bob"), domains = Seq("imgur.com")))
      == Seq(3, 30))
    // domain-only spec: every comment dropped even though type includes rc
    assert(ids(ParamSpec(domains = Seq("imgur.com"))) == Seq(30))
  }

  test("F6: over_18 case-insensitive equality, submissions only") {
    val s = ParamSpec(over18 = Some("false"))
    // comments unaffected; rs rows with over_18 in {false, FALSE} pass
    assert(ids(s) == Seq(3, 30, 1, 2, 20))
  }

  test("F7: is_self AND over_18 conjunction") {
    val s = ParamSpec(types = Set("rs"), over18 = Some("FALSE"), isSelf = Some("TRUE"))
    assert(ids(s) == Seq(30))
  }

  test("P1: projection keeps requested keys in payload order (sse.py:237), drops unknown") {
    val spec = ParamSpec(types = Set("rc"), filterKeys = Seq("body", "author", "nope"))
    val out = RedditOps(spec, fixture).select("json").as[String].collect()
    assert(out.contains("""{"author":"automoderator","body":"hi"}"""))
    assert(out.contains("""{"body":"y"}"""))
  }

  test("O1: emit order = created_utc, ties rc-before-rs, then id") {
    assert(ids(ParamSpec()) == Seq(3, 30, 1, 10, 2, 20))
  }

  test("E1: SSE frame bytes") {
    val f = fixture.filter($"id" === 1)
      .select(RedditOps.sseFrame($"id", $"event", $"json").as("f"))
      .as[String].head()
    assert(f == "id: 1\nevent: rc\ndata: {\"author\":\"automoderator\",\"body\":\"hi\",\"score\":3}\n\n")
  }

  test("R1/R2: backfill and start_id resume predicates") {
    val backfill = ParamSpec(commentBackfill = Some(2L))
    val withMax = fixture.withColumn("rc_max",
      max(when($"event" === "rc", $"id")).over())
      .withColumn("rs_max", max(when($"event" === "rs", $"id")).over())
    val got = withMax
      .filter(RedditOps.resumePred(backfill, $"rc_max", $"rs_max"))
      .select("id").as[Long].collect().toSet
    // last 2 comment ids; submissions get NO history (live tail) when
    // neither submission_backfill nor submission_start_id is given
    assert(got == Set(2L, 3L))

    val start = ParamSpec(commentStartId = Some(2L), submissionStartId = Some(21L))
    val got2 = fixture.filter(RedditOps.resumePred(start, lit(null), lit(null)))
      .select("id").as[Long].collect().toSet
    assert(got2 == Set(2L, 3L, 30L))
  }
}
