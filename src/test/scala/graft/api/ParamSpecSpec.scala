package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** V1/V2 validation + normalization truth tables (FIXTURES.md §A2;
  * /root/reference/sse.py:46-78).
  */
class ParamSpecSpec extends AnyFunSuite {

  private def parse(kv: (String, String)*): Either[ApiError, ParamSpec] =
    ParamSpec.parse(kv.groupBy(_._1).view.mapValues(_.map(_._2)).toMap)

  test("no params → both types, pass-all defaults") {
    val s = parse().toOption.get
    assert(s.types == Set("rc", "rs"))
    assert(!s.hasWhitelist && s.over18.isEmpty && s.filterKeys.isEmpty)
  }

  test("type scalarization accepts all reference spellings") {
    for (t <- Seq("comment", "comments", "rc"))
      assert(parse("type" -> t).toOption.get.types == Set("rc"), t)
    for (t <- Seq("submission", "submissions", "rs"))
      assert(parse("type" -> t).toOption.get.types == Set("rs"), t)
    // superset: subreddit*/rr selects the rr feed the reference documents
    // but never implemented (ParamSpec scaladoc; README.md:42-46)
    for (t <- Seq("subreddit", "subreddits", "rr"))
      assert(parse("type" -> t).toOption.get.types == Set("rr"), t)
    // unrecognized type matches neither (sse.py:56-57 semantics)
    assert(parse("type" -> "wiki").toOption.get.types.isEmpty)
  }

  test("only first type value considered (MultiDict semantics)") {
    val s = ParamSpec.parse(Map("type" -> Seq("rc", "rs"))).toOption.get
    assert(s.types == Set("rc"))
  }

  test("V1: backfill and start_id mutually exclusive per type") {
    assert(parse("comment_backfill" -> "5", "comment_start_id" -> "3").isLeft)
    assert(parse("submission_backfill" -> "5", "submission_start_id" -> "3").isLeft)
    // cross-type combination is legal
    assert(parse("comment_backfill" -> "5", "submission_start_id" -> "3").isRight)
  }

  test("V2: non-int backfill/start_id → 400") {
    for (k <- Seq("comment_backfill", "submission_backfill",
        "comment_start_id", "submission_start_id")) {
      val e = parse(k -> "xyz")
      assert(e.swap.toOption.get.status == 400, k)
    }
  }

  test("V2: backfill clamped to 100000, start_id not clamped") {
    val s = parse("comment_backfill" -> "2000000", "submission_start_id" -> "2000000")
      .toOption.get
    assert(s.commentBackfill.contains(100000L))
    assert(s.submissionStartId.contains(2000000L))
  }

  test("author/subreddit: repeated params AND comma-split (superset deviation)") {
    val s = ParamSpec.parse(Map("author" -> Seq("a,b", "c"))).toOption.get
    assert(s.authors == Seq("a", "b", "c"))
  }

  test("domain: first occurrence only, comma-split, lowercased") {
    val s = ParamSpec.parse(Map("domain" -> Seq("A.com,B.org", "ignored.net")))
      .toOption.get
    assert(s.domains == Seq("a.com", "b.org"))
  }

  test("filter keys comma-split, first occurrence") {
    val s = ParamSpec.parse(Map("filter" -> Seq("author,body", "title"))).toOption.get
    assert(s.filterKeys == Seq("author", "body"))
  }
}
