package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d105 prefix-doubling suffix array: fixture exactness (hand-computed
  * ranks, prefix-rule ties) and the permutation property on real data.
  */
class SuffixArraySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("suffixArray: hand-checked fixture incl. prefix-rule and repeated words") {
    import spark.implicits._
    val fix = Seq(
      (1L, "b a ab a b"),
      (2L, "a a a"), // pure repetition: shorter suffix sorts first
      (3L, "x")      // singleton
    ).toDF("doc_id", "text")
    val got = TextAnalysis.suffixArray(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 suffixes sorted: "a ab a b"(1) < "a b"(3) < "ab a b"(2)
    //   < "b"(4) < "b a ab a b"(0)
    assert(got == Map(
      (1L, 0L) -> 5L, (1L, 1L) -> 1L, (1L, 2L) -> 3L, (1L, 3L) -> 2L,
      (1L, 4L) -> 4L,
      (2L, 0L) -> 3L, (2L, 1L) -> 2L, (2L, 2L) -> 1L,
      (3L, 0L) -> 1L), got.toString)
  }

  test("suffixLcp: hand-checked fixture incl. pure-repetition doc; singleton yields no rows") {
    import spark.implicits._
    val fix = Seq(
      (1L, "b a ab a b"),
      (2L, "a a a"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.suffixLcp(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // doc 1 order: "a ab a b"(1) "a b"(3) "ab a b"(2) "b"(4) "b a ab a b"(0)
    //   LCPs: ["a b" vs "a ab a b"]=1, 0, 0, ["b a.." vs "b"]=1
    // doc 2 order: "a"(2) "a a"(1) "a a a"(0); LCPs: 1, 2
    assert(got == Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 0L, (1L, 4L) -> 0L, (1L, 5L) -> 1L,
      (2L, 2L) -> 1L, (2L, 3L) -> 2L), got.toString)
  }

  test("suffixLcp: exact vs JVM brute force on a real-corpus slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 40)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = texts.flatMap { case (id, text) =>
      val w = text.split(" ")
      val sorted = w.indices.map(p => w.slice(p, w.length).toSeq -> p)
        .sortBy(_._1.mkString(" "))
      sorted.zipWithIndex.drop(1).map { case ((suf, pos), i) =>
        val prev = sorted(i - 1)._1
        val lcp = suf.zip(prev).takeWhile { case (a, b) => a == b }.size
        (id, (i + 1).toLong, pos.toLong) -> lcp.toLong
      }
    }
    val got = TextAnalysis.suffixLcp(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == want, s"sizes: got=${got.size} want=${want.size}")
  }

  test("longestRepeat: fixture verdicts; every doc present") {
    import spark.implicits._
    val fix = Seq(
      (1L, "b a ab a b"),
      (2L, "a a a"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.longestRepeat(fix, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(1L -> ((1L, true)), 2L -> ((2L, false)),
      3L -> ((0L, true))), got.toString)
  }

  test("globalSuffixArray: hand-checked fixture — identical cross-doc suffixes share a dense rank") {
    import spark.implicits._
    val fix = Seq((1L, "b a"), (2L, "a b a"), (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.globalSuffixArray(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // distinct suffixes sorted: "a"(1) < "a b a"(2) < "b a"(3)
    assert(got == Map(
      (1L, 0L) -> 3L, (1L, 1L) -> 1L,
      (2L, 0L) -> 2L, (2L, 1L) -> 3L, (2L, 2L) -> 1L,
      (3L, 0L) -> 1L), got.toString)
  }

  test("globalSuffixLcp: class stats and adjacent-class LCPs on the fixture") {
    import spark.implicits._
    val fix = Seq((1L, "b a"), (2L, "a b a"), (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.globalSuffixLcp(fix).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // class 1 "a" x3 (3 docs); class 2 "a b a"; class 3 "b a" x2 (2 docs)
    assert(got == Map(2L -> ((1L, 1L, 1L)), 3L -> ((0L, 2L, 2L))),
      got.toString)
  }

  test("crossDocRepeat: fixture verdicts match hand-derived cross-doc maxima") {
    import spark.implicits._
    val fix = Seq((1L, "b a"), (2L, "a b a"), (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.crossDocRepeat(fix, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // "b a" shared by docs 1/2 (len 2); "a" shared by all (len 1)
    assert(got == Map(1L -> ((2L, false)), 2L -> ((2L, false)),
      3L -> ((1L, true))), got.toString)
  }

  test("crossDocRepeat: exact vs JVM all-pairs brute force on a real-corpus slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 25)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    def lcp(a: Array[String], ai: Int, b: Array[String], bi: Int): Int = {
      var n = 0
      while (ai + n < a.length && bi + n < b.length && a(ai + n) == b(bi + n)) n += 1
      n
    }
    val want = texts.map { case (d, w) =>
      val best = texts.iterator.filter(_._1 != d).flatMap { case (_, v) =>
        w.indices.iterator.flatMap(i => v.indices.iterator.map(j => lcp(w, i, v, j)))
      }.foldLeft(0)(math.max)
      d -> best.toLong
    }
    val got = TextAnalysis.crossDocRepeat(docs, 13).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(5)} vs ${(want.toSet diff got.toSet).take(5)}")
  }

  test("suffixIndexCached: stored artifact ≡ direct construction; repeat call is a cache hit") {
    import spark.implicits._
    val fix = Seq((1L, "b a ab a b"), (2L, "a b a"), (3L, "a")).toDF("doc_id", "text")
    for (global <- Seq(false, true)) {
      val path = java.nio.file.Files.createTempDirectory("graft-sfx-").toString
      val (sa, lcp) = TextAnalysis.suffixIndexCached(fix, path, global)
      val (wantSa, wantLcp) =
        if (global) (TextAnalysis.globalSuffixArray(fix),
          TextAnalysis.globalSuffixLcp(fix))
        else (TextAnalysis.suffixArray(fix), TextAnalysis.suffixLcp(fix))
      assert(sa.except(wantSa).isEmpty && wantSa.except(sa).isEmpty,
        s"sa mismatch (global=$global)")
      assert(lcp.except(wantLcp).isEmpty && wantLcp.except(lcp).isEmpty,
        s"lcp mismatch (global=$global)")
      val mf = new java.io.File(s"$path/MANIFEST.json")
      val t0 = mf.lastModified()
      TextAnalysis.suffixIndexCached(fix, path, global)
      assert(mf.lastModified() == t0, "fresh artifact must not rebuild")
    }
  }

  test("exactSubstrFromSuffixIndex ≡ gram-anchored exactSubstrRemoval on a real-corpus slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 200)
    val want = Dedup.exactSubstrRemoval(docs, 8)
    val got = Dedup.exactSubstrFromSuffixIndex(docs,
      TextAnalysis.globalSuffixArray(docs),
      TextAnalysis.globalSuffixLcp(docs), 8)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "the SA-served cut must equal the gram-anchored cut row-for-row")
    // non-vacuous: the slice must actually contain duplicated runs
    assert(want.filter(col("n_removed") > 0).count() > 0)
  }

  test("appendSuffixIndex: append ≡ rebuild bit-exact; crashed-append orphans are a named error; sync recovers") {
    import graft.sources.{IndexManifest, IndexManifestException}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 80)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val (cut1, cut2) = (maxId / 2, maxId * 3 / 4)
    val path = java.nio.file.Files.createTempDirectory("graft-sfxapp-").toString
    TextAnalysis.saveSuffixIndex(docs.filter(col("doc_id") <= cut1), path,
      global = false)
    TextAnalysis.appendSuffixIndex(
      docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2), path)
    // append ≡ rebuild bit-exact (per-doc independence)
    val freshPath = java.nio.file.Files.createTempDirectory("graft-sfxfr-").toString
    TextAnalysis.saveSuffixIndex(docs.filter(col("doc_id") <= cut2), freshPath,
      global = false)
    def rows(p: String, t: String) =
      spark.read.parquet(s"$p/$t").collect().map(_.toSeq).toSet
    assert(rows(path, "sa") == rows(freshPath, "sa"))
    assert(rows(path, "lcp") == rows(freshPath, "lcp"))
    // non-monotone append fails loudly
    val e0 = intercept[IndexManifestException] {
      TextAnalysis.appendSuffixIndex(docs.filter(col("doc_id") <= cut1), path)
    }
    assert(e0.getMessage.contains("id-monotone"))
    // crashed-append window: data landed, manifest flip lost
    val stale = IndexManifest.read(path)
    TextAnalysis.appendSuffixIndex(docs.filter(col("doc_id") > cut2), path)
    IndexManifest.write(path, stale)
    val e = intercept[IndexManifestException] {
      TextAnalysis.appendSuffixIndex(docs.filter(col("doc_id") > cut2), path)
    }
    assert(e.getMessage.contains("above its manifest watermark"))
    assert(TextAnalysis.suffixIndexSync(docs, path) == "rebuild")
    assert(TextAnalysis.suffixIndexSync(docs, path) == "fresh")
    val full = java.nio.file.Files.createTempDirectory("graft-sfxfull-").toString
    TextAnalysis.saveSuffixIndex(docs, full, global = false)
    assert(rows(path, "lcp") == rows(full, "lcp"), "recovered store must equal a fresh build")
  }

  test("suffixArray: per-doc ranks are a 1..len permutation on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 100)
    val sa = TextAnalysis.suffixArray(docs)
    val bad = sa.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("rnk")).as("d"),
        min(col("rnk")).as("mn"), max(col("rnk")).as("mx"))
      .filter(col("n") =!= col("d") || col("mn") =!= 1L || col("mx") =!= col("n"))
      .count()
    assert(bad == 0L, "rnk must be a dense 1..len permutation per doc")
  }
}
