package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-6 additions: two-star connected components, the
  * k-NN graph, context-window chunking, the mixture schedule, and the
  * binned range join.
  */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  // ---- dedupClustersTwoStar ----

  test("twoStar ≡ min-label propagation on chains, cliques and singletons") {
    val docs = (1L to 30L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    // a 20-node chain (diameter 19 — exactly the shape two-star exists
    // for), a triangle, and singletons 24..30
    val pairs = ((1L to 19L).map(i => (i, i + 1)) ++
      Seq((21L, 22L), (22L, 23L), (23L, 21L))).toDF("doc_a", "doc_b")
    val viaProp = Dedup.dedupClusters(docs, pairs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val viaStar = Dedup.dedupClustersTwoStar(docs, pairs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(viaStar == viaProp)
    // and both are the true components: chain → {1..20} labeled 1
    assert(viaStar.take(20).forall { case (_, c, n) => c == 1L && n == 20L })
    assert(viaStar(29) == ((30L, 30L, 1L)))
  }

  test("twoStar: long chain converges in O(log²) rounds, not O(diameter)") {
    val n = 60L
    val docs = (1L to n).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // maxIters far below the diameter (59): propagation would truncate
    // here; two-star must fully converge
    val out = Dedup.dedupClustersTwoStar(docs, pairs, maxIters = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.forall { case (_, c, s) => c == 1L && s == n })
  }

  test("twoStar: empty pair set → all singletons; duplicate/reversed pairs collapse") {
    val docs = (1L to 5L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dedupClustersTwoStar(docs, none)
      .as[(Long, Long, Long)].collect().toSeq.sorted ==
      (1L to 5L).map(i => (i, i, 1L)))
    // the same edge in both orientations plus a self-loop must not
    // break canonicalization
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupClustersTwoStar(docs, messy)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L), (4L, 4L, 1L), (5L, 5L, 1L)))
  }

  // ---- chunkPlan ----

  test("chunkPlan: window arithmetic and digests (chunk=4, stride=3)") {
    val docs = Seq(
      (1L, "a b c"),               // 3 ≤ 4 → one short chunk
      (2L, "a b c d"),             // exactly one full chunk
      (3L, "a b c d e"),           // 2 chunks: [0,4), [3,5)
      (4L, "a b c d e f g h i j")  // 10 tokens → starts 0,3,6 (len 4,4,4)
    ).toDF("doc_id", "text")
    val out = Curation.chunkPlan(docs, chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 3L, md5hex("a b c")),
      (2L, 0L, 0L, 4L, md5hex("a b c d")),
      (3L, 0L, 0L, 4L, md5hex("a b c d")),
      (3L, 1L, 3L, 2L, md5hex("d e")),
      (4L, 0L, 0L, 4L, md5hex("a b c d")),
      (4L, 1L, 3L, 4L, md5hex("d e f g")),
      (4L, 2L, 6L, 4L, md5hex("g h i j"))))
  }

  test("chunkPlan: full coverage — last chunk always reaches the end, no empty windows") {
    val docs = (1L to 40L)
      .map(i => (i, (1L to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.chunkPlan(docs, chunkTokens = 7, strideTokens = 5)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val byDoc = out.groupBy(_._1)
    (1L to 40L).foreach { n =>
      val chunks = byDoc(n).sortBy(_._2)
      assert(chunks.head._3 == 0L)
      assert(chunks.forall(_._4 > 0), s"empty window for n=$n")
      // last chunk covers the tail exactly
      assert(chunks.last._3 + chunks.last._4 == n)
      // no window extends past the end
      assert(chunks.forall(c => c._3 + c._4 <= n))
    }
  }

  // ---- mixSchedule ----

  test("mixSchedule: budget allocation with the rate cap for scarce strata") {
    val docs = Seq.tabulate(10)(i =>
      (i.toLong, if (i < 1) "a w" else "b " + ("w " * 89).trim)).toDF("doc_id", "text")
    // stratum a: 1 doc × 2 tokens; b: 9 docs × 90 tokens = 810; total 812
    val stats = Curation.mixtureStats(docs,
      when(col("doc_id") < 1, "a").otherwise("b"))
    val out = Curation.mixSchedule(stats, Seq("a" -> 0.9, "b" -> 0.1), 0.5)
      .orderBy("stratum")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    // a is scarce: 0.5·812·0.9 = 365.4 wanted ≫ 2 held → rate caps at 1
    val rb = 0.5 * 812.0 * 0.1 / 810.0
    assert(out == Seq(
      ("a", 1L, 2L, 0.9, 1.0, 2.0),
      ("b", 9L, 810L, 0.1, rb, rb * 810.0)))
  }

  test("mixSchedule: unlisted strata get target 0 and drop out") {
    val stats = Seq(("a", 1L, 100L, 0.5), ("zz", 1L, 100L, 0.5))
      .toDF("stratum", "n_docs", "n_tokens", "token_share")
    val out = Curation.mixSchedule(stats, Seq("a" -> 1.0), 0.5)
      .orderBy("stratum")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out.head._5 == 1.0)            // a: min(1, 0.5·200·1.0/100)
    assert(out(1)._4 == 0.0 && out(1)._5 == 0.0 && out(1)._6 == 0.0)
  }

  // ---- knnGraph ----

  test("knnGraph restricted to a query set ≡ annTopK over that set") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val graph = Similarity.knnGraph(emb, k = 3, bits = 6)
      .filter(col("vec_id") % 10 === 0)
      .orderBy("vec_id", "rk").as[(Long, Long, Long, Double)].collect().toSeq
    val direct = Similarity.annTopK(emb, col("vec_id") % 10 === 0, k = 3, bits = 6)
      .orderBy("query_id", "rk").as[(Long, Long, Long, Double)].collect().toSeq
    assert(graph == direct)
    assert(graph.nonEmpty)
    // graph sanity: no self-edges, ranks contiguous from 1
    graph.groupBy(_._1).foreach { case (v, rows) =>
      assert(rows.forall(_._3 != v))
      assert(rows.map(_._2).sorted == (1L to rows.size))
    }
  }

  // ---- cdcChunks ----

  test("cdcChunks: boundary arithmetic — split AFTER each boundary token") {
    // find two tokens, one boundary and one not, under modulus 8
    def h60(s: String) = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val bTok = (1 to 1000).map(i => s"w$i").find(h60(_) % 8 == 0).get
    val pTok = (1 to 1000).map(i => s"w$i").find(h60(_) % 8 != 0).get
    val docs = Seq(
      (1L, s"$pTok $pTok $bTok $pTok $pTok"), // one interior boundary
      (2L, s"$pTok $pTok $pTok"),             // no boundary → one chunk
      (3L, s"$bTok $pTok"),                   // boundary at 0 → split after it
      (4L, s"$pTok $bTok")                    // trailing boundary → no empty chunk
    ).toDF("doc_id", "text")
    val out = Curation.cdcChunks(docs, modulus = 8)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 3L, md5hex(s"$pTok $pTok $bTok")),
      (1L, 1L, 3L, 2L, md5hex(s"$pTok $pTok")),
      (2L, 0L, 0L, 3L, md5hex(s"$pTok $pTok $pTok")),
      (3L, 0L, 0L, 1L, md5hex(bTok)),
      (3L, 1L, 1L, 1L, md5hex(pTok)),
      (4L, 0L, 0L, 2L, md5hex(s"$pTok $bTok"))))
  }

  test("cdcChunks: edits stay local — chunks after the edited one keep their digests") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50).cache()
    // prepend one token to every doc: a fixed-stride chunker would shift
    // every window; CDC must leave all chunks after the first boundary
    // byte-identical
    val edited = docs.withColumn("text", concat(lit("zqx "), col("text")))
    val before = Curation.cdcChunks(docs).as[(Long, Long, Long, Long, String)]
      .collect().groupBy(_._1)
    val after = Curation.cdcChunks(edited).as[(Long, Long, Long, Long, String)]
      .collect().groupBy(_._1)
    var preserved = 0
    before.foreach { case (id, b) =>
      val bd = b.sortBy(_._2).map(_._5); val ad = after(id).sortBy(_._2).map(_._5)
      // all chunks but the first are unchanged (suffix match), possibly
      // with the first chunk split differently
      assert(ad.drop(ad.length - (bd.length - 1)).sameElements(bd.drop(1)),
        s"doc $id: edit leaked past the first chunk")
      preserved += bd.length - 1
    }
    assert(preserved > 100, s"corpus too boundary-poor to exercise locality ($preserved)")
    docs.unpersist()
  }

  test("cdcChunks: chunks tile the doc exactly (coverage, no overlap)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val out = Curation.cdcChunks(docs).as[(Long, Long, Long, Long, String)]
      .collect().toSeq.groupBy(_._1)
    val nTok = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (id, chunks) =>
      val s = chunks.sortBy(_._2)
      assert(s.head._3 == 0L && s.map(_._4).forall(_ > 0))
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._4 == b._3, s"gap/overlap in doc $id")
        case _ =>
      }
      assert(s.last._3 + s.last._4 == nTok(id))
    }
  }

  // ---- lexicalDiversity ----

  test("lexicalDiversity: exact counts on known distributions") {
    val docs = Seq(
      (1L, "a a a a"),      // 1 type, sumsq 16, simpson 1.0
      (2L, "a b c d"),      // uniform: sumsq 4, simpson 0.25
      (3L, "a a b c"),      // sumsq 4+1+1=6
      (4L, "x")             // single token
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 1L, 16L, 0.25, 1.0),
      (2L, 4L, 4L, 4L, 1.0, 0.25),
      (3L, 4L, 3L, 6L, 0.75, 0.375),
      (4L, 1L, 1L, 1L, 1.0, 1.0)))
  }

  test("lexicalDiversity run-length pass ≡ explode+groupBy on real docs") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val viaRuns = TextAnalysis.lexicalDiversity(docs)
      .select("doc_id", "sumsq").as[(Long, Long)].collect().toMap
    val viaGroup = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(sum(col("count") * col("count")).as("sumsq"))
      .as[(Long, Long)].collect().toMap
    assert(viaRuns == viaGroup && viaRuns.nonEmpty)
  }

  // ---- kmeansUpdate ----

  test("kmeansUpdate: hand-checked means on a known assignment") {
    // centroids = vec_ids 0,1. Axis-aligned vectors make cosine
    // assignment obvious: 2,3 → cell 0; 4 → cell 1.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(2f, 0.5f, 0f, 0f)), (3L, Array(4f, 0f, 0f, 2f)),
      (4L, Array(0.5f, 3f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansUpdate(emb, nCentroids = 2)
      .orderBy("cell", "dim").as[(Long, Long, Long, Double)].collect().toSeq
    // cell 0 members (by vec_id): 0,2,3 → mean (7/3, 0.5/3, 0, 2/3)
    // cell 1 members: 1,4 → mean (0.25, 2, 0, 0)
    val c0 = Seq(1.0 + 2.0 + 4.0, 0.0 + 0.5 + 0.0, 0.0, 0.0 + 0.0 + 2.0).map(_ / 3.0)
    assert(out.size == 8)
    assert(out.take(4) == c0.zipWithIndex.map { case (v, d) => (0L, 3L, d + 1L, v) })
    assert(out.drop(4) == Seq((1L, 2L, 1L, (0.0 + 0.5) / 2.0), (1L, 2L, 2L, (1.0 + 3.0) / 2.0),
      (1L, 2L, 3L, 0.0), (1L, 2L, 4L, 0.0)))
  }

  test("kmeansUpdate: cells partition the corpus and agree with ivf assignment") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.kmeansUpdate(emb, nCentroids = 8)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val n = emb.count()
    // every (cell) emits one row per dim with a constant member count;
    // counts over distinct cells sum to the corpus
    val byCell = out.groupBy(_._1)
    assert(byCell.values.map(_.head._2).sum == n)
    byCell.foreach { case (_, rows) =>
      assert(rows.map(_._2).distinct.size == 1)
      assert(rows.map(_._3).sorted == (1L to 64L))
    }
  }

  test("kmeansIterate: one pass ≡ kmeansUpdate; two passes refit and re-partition") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val one = Similarity.kmeansIterate(emb, nCentroids = 8, iters = 1)
      .orderBy("cell", "dim").as[(Long, Long, Long, Double)].collect().toSeq
    val upd = Similarity.kmeansUpdate(emb, nCentroids = 8)
      .orderBy("cell", "dim").as[(Long, Long, Long, Double)].collect().toSeq
    assert(one == upd)
    val two = Similarity.kmeansIterate(emb, nCentroids = 8, iters = 2)
      .orderBy("cell", "dim").as[(Long, Long, Long, Double)].collect().toSeq
    // the refit must still partition the corpus and actually move
    assert(two.groupBy(_._1).values.map(_.head._2).sum == emb.count())
    assert(two != one, "second Lloyd pass changed nothing — feedback loop broken?")
  }

  // ---- RangeJoin ----

  test("pointInInterval ≡ naive BETWEEN join, across bin boundaries and widths") {
    // intervals deliberately straddle bin edges and vary in length
    // relative to binWidth (shorter, equal, 2.7× — multi-bin explode)
    val intervals = Seq(
      (1L, 1L, 5L, 15L),    // crosses the bin-10 edge
      (2L, 1L, 10L, 20L),   // starts exactly on an edge
      (3L, 2L, 7L, 34L),    // length 27 = 2.7 bins
      (4L, 1L, 40L, 40L),   // empty (half-open) → matches nothing
      (5L, 3L, 0L, 10L)     // key with no points
    ).toDF("iid", "k", "s", "e")
    val points = Seq(
      (101L, 1L, 5L), (102L, 1L, 9L), (103L, 1L, 10L), (104L, 1L, 14L),
      (105L, 1L, 15L), (106L, 1L, 19L), (107L, 1L, 40L),
      (201L, 2L, 6L), (202L, 2L, 7L), (203L, 2L, 33L), (204L, 2L, 34L)
    ).toDF("pid", "k", "t")
    val out = RangeJoin.pointInInterval(intervals, points, Seq("k"), "s", "e", "t", binWidth = 10L)
      .select("iid", "pid").as[(Long, Long)].collect().toSeq.sorted
    val naive = intervals.as("i").join(points.as("p"),
        col("i.k") === col("p.k") && col("t") >= col("s") && col("t") < col("e"))
      .select("iid", "pid").as[(Long, Long)].collect().toSeq.sorted
    assert(out == naive)
    assert(out == Seq((1L, 101L), (1L, 102L), (1L, 103L), (1L, 104L),
      (2L, 103L), (2L, 104L), (2L, 105L), (2L, 106L),
      (3L, 202L), (3L, 203L)))
  }

  test("pointInInterval: no duplicate pairs from multi-bin intervals") {
    val intervals = Seq((1L, 1L, 0L, 100L)).toDF("iid", "k", "s", "e")
    val points = (0L until 100L).map(t => (t, 1L, t)).toDF("pid", "k", "t")
    val out = RangeJoin.pointInInterval(intervals, points, Seq("k"), "s", "e", "t", binWidth = 7L)
      .select("iid", "pid").as[(Long, Long)].collect().toSeq
    assert(out.size == 100 && out.distinct.size == 100)
  }
}
