package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.Properties

/** Property invariants for the distributed prefix-sum device behind
  * d47/d48: against RANDOM corpora and RANDOM bucket grids, the
  * bucketed running-sums-plus-offsets construction must equal the
  * sequential prefix sum over the hash60 order, and the context
  * packing must tile exactly. Spark jobs are expensive per case, so
  * bounded example counts (the RedditOpsPropertySpec discipline).
  */
object PackingPropertySpec extends Properties("Packing") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxSize(10)

  /** Driver-side twin of [[Dedup.hash60]]. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
  }

  private val genDoc: Gen[(Long, String)] = for {
    id <- Gen.choose(1L, 100000L)
    n <- Gen.choose(1, 25)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "ddd", "ee"))
  } yield (id, ws.mkString(" "))

  private val genCorpus: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(genDoc).map(_.distinctBy(_._1))

  property("tokenOffsets = the sequential prefix sum over the hash60 order, for any bucket grid") =
    forAll(genCorpus, Gen.choose(1, 12)) { (docs, bits) =>
      val got = Packing.tokenOffsets(docs.toDF("doc_id", "text"), bits)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      var cum = 0L
      val ok = docs
        .map { case (id, t) => (id, h60(id.toString), t.split(" ", -1).length.toLong) }
        .sortBy(d => (d._2, d._1))
        .forall { case (id, _, n) =>
          val hit = got.get(id).contains((n, cum)); cum += n; hit
        }
      ok && got.size == docs.size
    }

  property("packSequences tiles exactly: docs covered contiguously, full windows sum to ctxLen") =
    forAll(genCorpus, Gen.choose(2, 17)) { (docs, ctx) =>
      val rows = Packing.packSequences(docs.toDF("doc_id", "text"), ctx)
        .as[(Long, Long, Long, Long, Long)].collect()
      val total = docs.map(_._2.split(" ", -1).length.toLong).sum
      val lastCtx = (total - 1) / ctx
      val perCtx = rows.groupBy(_._2).view.mapValues(_.map(_._5).sum)
      val ctxOk = perCtx.toMap.forall { case (cid, s) =>
        if (cid < lastCtx) s == ctx else s == total - lastCtx * ctx
      } && perCtx.size == lastCtx + 1
      val nTok = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
      val docOk = rows.groupBy(_._1).forall { case (id, spans) =>
        val sorted = spans.sortBy(_._4)
        sorted.head._4 == 0L && sorted.map(_._5).sum == nTok(id) &&
          sorted.sliding(2).forall {
            case Array(a, b) => b._4 == a._4 + a._5
            case _           => true
          }
      }
      ctxOk && docOk
    }

  property("tokenShards: shard_id = start_token div budget, start positions consistent with offsets") =
    forAll(genCorpus, Gen.choose(3L, 64L)) { (docs, budget) =>
      val df = docs.toDF("doc_id", "text")
      val shards = Packing.tokenShards(df, budget)
        .as[(Long, Long, Long, Long)].collect()
      val offs = Packing.tokenOffsets(df)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      shards.forall { case (id, _, start, sid) =>
        offs(id) == start && sid == start / budget
      } && shards.length == docs.size
    }

  property("appendTokenShards: frozen history placement + base-offset increment placement, for any cut") =
    forAll(genCorpus, Gen.choose(4L, 64L), Gen.choose(0.0, 1.0)) { (docs, budget, frac) =>
      val ids = docs.map(_._1).sorted
      val cut = ids(((ids.size - 1) * frac).toInt)
      val history = docs.filter(_._1 <= cut)
      val incr = docs.filter(_._1 > cut)
      val path = java.nio.file.Files.createTempDirectory("pk-app-").toString
      Packing.saveTokenShards(history.toDF("doc_id", "text"), path, budget)
      Packing.appendTokenShards(incr.toDF("doc_id", "text"), path)
      val store = spark.read.parquet(s"$path/shards")
        .selectExpr("doc_id", "n_tokens", "start_token", "CAST(shard_id AS BIGINT)")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // driver-side reference: the documented two-stage placement
      def seqPlace(ds: List[(Long, String)], base: Long): Map[Long, (Long, Long)] = {
        var cum = base
        ds.map { case (id, t) => (id, h60(id.toString), t.split(" ", -1).length.toLong) }
          .sortBy(d => (d._2, d._1))
          .map { case (id, _, n) => val at = cum; cum += n; id -> ((n, at)) }.toMap
      }
      val hExp = seqPlace(history, 0L)
      val base = history.map(_._2.split(" ", -1).length.toLong).sum
      val expected = hExp ++ seqPlace(incr, base)
      store.size == docs.size && expected.forall { case (id, (n, at)) =>
        store.get(id).contains((n, at, at / budget))
      }
    }

  property("curriculumShards: tiers contiguous, within-tier hash60 order, stream tiles — for any corpus and budget") =
    forAll(genCorpus, Gen.choose(4L, 64L)) { (docs, budget) =>
      import org.apache.spark.sql.functions.col
      val df = docs.toDF("doc_id", "text")
      val rows = Packing.curriculumShards(df, budget, lmScale = 16)
        .as[(Long, String, Long, Long, Long)].collect()
      val tiers = TextAnalysis.perplexityTiers(df, 16)
        .select(col("doc_id"), col("tier")).as[(Long, String)].collect().toMap
      val byStart = rows.sortBy(_._4).toList
      var exp = 0L
      val tileOk = byStart.forall { case (_, _, n, st, sh) =>
        val ok = st == exp && sh == st / budget; exp = st + n; ok }
      val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
      val tierOk = rows.forall { case (id, t, _, _, _) =>
        t == tiers.getOrElse(id, "tail") }
      val contig = byStart.map(r => rank(r._2)).sliding(2).forall {
        case List(a, b) => a <= b; case _ => true }
      val orderOk = rows.groupBy(_._2).forall { case (_, rs) =>
        rs.sortBy(_._4).map(_._1).toSeq ==
          rs.map(_._1).sortBy(id => (h60(id.toString), id)).toSeq }
      tileOk && tierOk && contig && orderOk && rows.length == docs.size
    }

  property("pairPack = the sequential fold over (len desc, id), for any corpus and context") =
    forAll(genCorpus, Gen.choose(2, 40)) { (docs, ctx) =>
      val got = Packing.pairPack(docs.toDF("doc_id", "text"), ctx)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val ranked = docs
        .map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
        .sortBy { case (id, n) => (-n, id) }.zipWithIndex
        .map { case ((id, n), i) => (id, n, i + 1L) }
      val n = ranked.length.toLong
      val lenAt = ranked.map(d => d._3 -> d._2).toMap
      val want = ranked.map { case (id, len, rnk) =>
        val prnk = n + 1L - rnk
        val paired = rnk != prnk && len + lenAt(prnk) <= ctx
        id -> ((len, rnk, if (paired) math.min(rnk, prnk) else rnk,
          if (paired && rnk > prnk) 1L else 0L))
      }.toMap
      got == want
    }

  property("bucketBatches = per-bucket (len, id) order chopped into B bins, for any corpus/B/width") =
    forAll(genCorpus, Gen.choose(1, 7), Gen.choose(1, 9)) { (docs, b, w) =>
      val got = Packing.bucketBatches(docs.toDF("doc_id", "text"), b, w)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val want = docs
        .map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
        .groupBy { case (_, len) => len / w }
        .flatMap { case (bkt, ds) =>
          ds.sortBy { case (id, len) => (len, id) }.zipWithIndex.map {
            case ((id, len), i) => id -> ((len, bkt, i.toLong / b, i.toLong % b))
          }
        }
      got == want
    }
}
