package graft.operators

import graft.SparkTestSession
import graft.api.ParamSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5.2): random param combos ×
  * random event batches. Spark jobs are expensive per case, so bounded
  * example counts.
  */
object RedditOpsPropertySpec extends Properties("RedditOps") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxSize(12)

  private val genEvent: Gen[Ev] = for {
    id <- Gen.choose(1L, 500L)
    isRs <- Gen.oneOf(true, false)
    utc <- Gen.choose(1000L, 1020L)  // narrow range → plenty of sort ties
    author <- Gen.oneOf("alice", "bob", "carol", "dave")
    sub <- Gen.oneOf("news", "funny", "aww")
    domain <- Gen.option(Gen.oneOf("a.com", "B.org"))
    o18 <- Gen.oneOf("true", "True", "FALSE", "false")
    self <- Gen.oneOf("true", "false")
  } yield Ev(id, if (isRs) "rs" else "rc", utc, author, sub,
    if (isRs) domain else None,
    if (isRs) Some(o18) else None, if (isRs) Some(self) else None,
    s"""{"author":"$author","sub":"$sub"}""")

  private val genBatch: Gen[List[Ev]] =
    Gen.nonEmptyListOf(genEvent).map(_.distinctBy(e => (e.event, e.id)))

  private val genSpec: Gen[ParamSpec] = for {
    types <- Gen.oneOf(Set("rc", "rs"), Set("rc"), Set("rs"))
    authors <- Gen.someOf("alice", "bob", "zzz").map(_.toSeq)
    subs <- Gen.someOf("news", "aww").map(_.toSeq)
    domains <- Gen.someOf("a.com", "b.org").map(_.toSeq)
    o18 <- Gen.option(Gen.oneOf("true", "FALSE"))
  } yield ParamSpec(types = types, authors = authors, subreddits = subs,
    domains = domains, over18 = o18)

  property("output ⊆ input, no duplicates") = forAll(genSpec, genBatch) {
    (spec, batch) =>
      val out = RedditOps(spec, batch.toDF())
        .select("event", "id").as[(String, Long)].collect()
      val in = batch.map(e => (e.event, e.id)).toSet
      out.toSet.subsetOf(in) && out.length == out.toSet.size
  }

  property("emitted batch sorted by (created_utc, event, id)") =
    forAll(genSpec, genBatch) { (spec, batch) =>
      val keys = RedditOps(spec, batch.toDF())
        .select("created_utc", "event", "id")
        .as[(Long, String, Long)].collect().toSeq
      keys == keys.sorted
    }

  property("predicate is idempotent") = forAll(genSpec, genBatch) {
    (spec, batch) =>
      val once = batch.toDF().filter(RedditOps.pred(spec))
      once.filter(RedditOps.pred(spec)).count() == once.count()
  }

  property("no whitelist params → pass-all") = forAll(genBatch) { batch =>
    batch.toDF().filter(RedditOps.whitelistPred(ParamSpec())).count() == batch.size
  }

  property("projection keeps only requested keys") =
    forAll(genBatch, Gen.someOf("author", "sub").suchThat(_.nonEmpty)) {
      (batch, keys) =>
        val spec = ParamSpec(filterKeys = keys.toSeq)
        val outs = RedditOps(spec, batch.toDF()).select("json").as[String].collect()
        Prop.all(outs.map { j =>
          val present = Seq("author", "sub").filter(k => j.contains("\"" + k + "\":"))
          Prop(present.forall(keys.contains)) :| s"json=$j keys=$keys"
        }.toSeq: _*)
    }
}
