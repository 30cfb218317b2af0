package graft.sources

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Manifest + compaction behavior of the segment log (the 100 TB ingest
  * metadata story): watermark served from the manifest, segment merge
  * flips the manifest before any deletion, GC is deferred and safe.
  */
class RedditLogCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def row(i: Long): Map[String, Any] = Map(
    "id" -> i, "event" -> "rc", "created_utc" -> (1000L + i),
    "author" -> s"u$i", "subreddit" -> "news", "domain" -> null,
    "over_18" -> null, "is_self" -> null, "json" -> s"""{"n":$i}""")

  private def ids(dir: String): Seq[Long] = {
    import spark.implicits._
    spark.read.format("graft.sources.RedditLogSource").option("path", dir)
      .load().select("id").as[Long].collect().toSeq.sorted
  }

  test("writeSegment maintains a manifest; listSegments and maxId serve from it") {
    val dir = Files.createTempDirectory("rlog-mf").toString
    (0 until 10).foreach(k => RedditLog.writeSegment(dir, ((k * 20 + 1).toLong to (k * 20 + 20).toLong).map(row)))
    assert(new java.io.File(dir, "manifest.json").isFile)
    assert(RedditLog.listSegments(dir).size == 10)
    assert(RedditLog.maxId(dir) == 200L)
    assert(ids(dir) == (1L to 200L))
  }

  test("compact merges small segments; rows and watermark unchanged; old files live until gc") {
    val dir = Files.createTempDirectory("rlog-cp").toString
    (0 until 10).foreach(k => RedditLog.writeSegment(dir, ((k * 20 + 1).toLong to (k * 20 + 20).toLong).map(row)))
    val obsolete = RedditLog.compact(dir, targetRows = 100L)
    // 10×20 rows at target 100 → 2 merged segments of 100 rows
    assert(RedditLog.listSegments(dir).size == 2)
    assert(RedditLog.maxId(dir) == 200L)
    // replaced originals still on disk (readers on the old manifest
    // snapshot can still resolve them) but the new manifest excludes
    // them — no double counting despite both generations coexisting
    assert(obsolete.nonEmpty && obsolete.forall(_.isFile))
    assert(ids(dir) == (1L to 200L))
    RedditLog.gc(obsolete)
    assert(obsolete.forall(!_.isFile))
    assert(ids(dir) == (1L to 200L))
    assert(RedditLog.maxId(dir) == 200L)
  }

  test("appends after compaction keep the manifest consistent") {
    val dir = Files.createTempDirectory("rlog-ap").toString
    (0 until 4).foreach(k => RedditLog.writeSegment(dir, ((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row)))
    val obsolete = RedditLog.compact(dir, targetRows = 20L)
    RedditLog.writeSegment(dir, (41L to 45L).map(row))
    assert(RedditLog.maxId(dir) == 45L)
    assert(ids(dir) == (1L to 45L))
    RedditLog.gc(obsolete)
    assert(ids(dir) == (1L to 45L))
  }

  test("torn write (segment renamed, manifest write crashed) is repaired by the next append") {
    val dir = Files.createTempDirectory("rlog-torn").toString
    RedditLog.writeSegment(dir, (1L to 10L).map(row))
    // simulate the crash window: a segment lands on disk but the
    // manifest was never updated
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = (11L to 20L).map { i =>
      val n = mapper.createObjectNode()
      row(i).foreach {
        case (k, null)      => n.putNull(k)
        case (k, v: Long)   => n.put(k, v)
        case (k, v: String) => n.put(k, v)
        case (k, v)         => n.put(k, v.toString)
      }
      mapper.writeValueAsString(n)
    }
    Files.write(java.nio.file.Paths.get(dir, "seg-11-20.jsonl"),
      String.join("\n", lines: _*).getBytes)
    // manifest still ends at 10: the orphan is invisible...
    assert(RedditLog.maxId(dir) == 10L)
    // ...until the next append re-adopts everything past the watermark
    RedditLog.writeSegment(dir, (21L to 25L).map(row))
    assert(RedditLog.maxId(dir) == 25L)
    assert(ids(dir) == (1L to 25L))
  }

  test("compactIfNeeded: size-tiered auto-compaction with time-based deferred gc") {
    val dir = Files.createTempDirectory("rlog-auto").toString
    var compactions = 0
    (0 until 40).foreach { k =>
      RedditLog.writeSegment(dir, ((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row))
      if (RedditLog.compactIfNeeded(dir, targetRows = 100L, maxSmall = 8)) compactions += 1
    }
    assert(compactions >= 2, s"expected repeated auto-compactions, got $compactions")
    // live segment count stays bounded by the policy, far below the 40 appends
    assert(RedditLog.listSegments(dir).size < 16)
    assert(RedditLog.maxId(dir) == 400L)
    assert(ids(dir) == (1L to 400L))
    // replaced files are still on disk: all are younger than the 60s
    // default grace window (readers planned on old manifests resolve)
    val onDisk = new java.io.File(dir).listFiles().count(_.getName.startsWith("seg-"))
    assert(onDisk > RedditLog.listSegments(dir).size, "expected replaced files awaiting gc")
    // an expired grace window (0 ms) reclaims them — crash-safe, since
    // the sweep derives the dead set from disk vs manifest, not memory.
    // (plan-grace zeroed so the ids() scans above don't hold the sweep —
    // their readers are closed, only the post-plan grace would linger)
    val prevGrace = RedditLog.leasePlanGraceMillis
    RedditLog.leasePlanGraceMillis = 0L
    val swept =
      try RedditLog.gcSweep(dir, graceMillis = 0L)
      finally RedditLog.leasePlanGraceMillis = prevGrace
    assert(swept.nonEmpty)
    assert(ids(dir) == (1L to 400L))
    assert(RedditLog.maxId(dir) == 400L)
  }

  test("append: the ingest entry alone keeps the segment set bounded and the data intact") {
    val dir = Files.createTempDirectory("rlog-ingest").toString
    // a firehose of 60 small appends through ONLY the production entry —
    // no explicit compact()/gc() calls anywhere
    var merges = 0
    (0 until 60).foreach { k =>
      if (RedditLog.append(dir, ((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row),
        targetRows = 100L, maxSmall = 8)) merges += 1
    }
    assert(merges >= 3, s"expected the policy to fire repeatedly, got $merges")
    assert(RedditLog.listSegments(dir).size < 16,
      "segment count must stay bounded by the policy under continuous ingest")
    assert(RedditLog.maxId(dir) == 600L)
    assert(ids(dir) == (1L to 600L))
  }

  test("gc grace measures time-since-replacement, not segment age (mtime stamped at compaction)") {
    val dir = Files.createTempDirectory("rlog-stamp").toString
    (0 until 4).foreach(k => RedditLog.writeSegment(dir, ((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row)))
    // age the segment files by an hour: before the stamp fix, a file's
    // natural mtime (creation) made old-but-just-replaced segments
    // GC-eligible the instant the manifest flipped
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("seg-"))
      .foreach(_.setLastModified(System.currentTimeMillis() - 3600000L))
    val t0 = System.currentTimeMillis()
    val replaced = RedditLog.compact(dir, targetRows = 20L)
    assert(replaced.nonEmpty)
    assert(replaced.forall(_.lastModified() >= t0),
      "replaced files must be stamped with replacement time")
    assert(RedditLog.gcSweep(dir, graceMillis = 60000L).isEmpty,
      "files replaced milliseconds ago must survive a 60s grace")
    assert(ids(dir) == (1L to 40L))
  }

  test("reader lease blocks gc of files its manifest snapshot references") {
    val dir = Files.createTempDirectory("rlog-lease").toString
    (0 until 4).foreach(k => RedditLog.writeSegment(dir, ((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row)))
    // plan-grace zeroed: this test exercises the OPEN-READER half of
    // lease activity (the grace half is timing-based and covered by the
    // auto-compaction test's scans)
    val prevGrace = RedditLog.leasePlanGraceMillis
    RedditLog.leasePlanGraceMillis = 0L
    try {
      val lease = RedditLog.acquireLease(dir) // a slow scan plans here…
      RedditLog.listSegments(dir)             // …on this manifest snapshot
      RedditLog.leaseReaderOpened(lease, dir) // …and a reader is mid-file
      // sleep past the mtime-granularity slack so the stamped
      // replacement time is unambiguously AFTER the lease start
      Thread.sleep(2100)
      val replaced = RedditLog.compact(dir, targetRows = 20L)
      assert(replaced.nonEmpty)
      Thread.sleep(5)
      // an expired grace (0 ms) alone would delete them; the in-flight
      // lease predates the manifest flip, so the sweep must hold off —
      // this is what ties GC to reader lifetimes instead of a guess
      assert(RedditLog.gcSweep(dir, graceMillis = 0L).isEmpty)
      RedditLog.releaseLeasePartition(lease) // reader closed, scan done
      Thread.sleep(5)
      assert(RedditLog.gcSweep(dir, graceMillis = 0L).map(_.getName).toSet
        == replaced.map(_.getName).toSet)
      assert(ids(dir) == (1L to 40L))
    } finally RedditLog.leasePlanGraceMillis = prevGrace
  }

  test("shared lease store defers gc for a reader whose planning JVM is gone") {
    val dir = Files.createTempDirectory("rlog-lease-shared").toString
    (0 until 4).foreach(k => RedditLog.writeSegment(dir, ((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row)))
    val prevGrace = RedditLog.leasePlanGraceMillis
    RedditLog.leasePlanGraceMillis = 0L
    try {
      // a scan plans and a partition reader opens (its marker lands in
      // <dir>/_leases/)…
      val lease = RedditLog.acquireLease(dir)
      RedditLog.listSegments(dir)
      val handle = RedditLog.leaseReaderOpened(lease, dir).get
      // …then the PLANNING JVM's in-memory state vanishes (planner
      // restart / the sweep runs in a different process than the scan):
      // the only protection left is the file-backed store
      RedditLog.dropInMemoryLease(lease)
      Thread.sleep(2100) // clear the mtime-granularity slack
      val replaced = RedditLog.compact(dir, targetRows = 20L)
      assert(replaced.nonEmpty)
      Thread.sleep(5)
      assert(RedditLog.gcSweep(dir, graceMillis = 0L).isEmpty,
        "sweep must defer on the shared lease file + open marker alone")
      // the reader closes on its JVM: marker removed, protection lapses
      RedditLog.leaseReaderClosed(handle)
      Thread.sleep(5)
      assert(RedditLog.gcSweep(dir, graceMillis = 0L).map(_.getName).toSet
        == replaced.map(_.getName).toSet)
      assert(ids(dir) == (1L to 40L))
    } finally RedditLog.leasePlanGraceMillis = prevGrace
  }

  test("a purged lease is re-inserted on reader open, restoring gc protection") {
    val dir = Files.createTempDirectory("rlog-lease-reinsert").toString
    RedditLog.writeSegment(dir, (1L to 10L).map(row))
    val prevGrace = RedditLog.leasePlanGraceMillis
    RedditLog.leasePlanGraceMillis = 0L
    try {
      val lease = RedditLog.acquireLease(dir)
      RedditLog.listSegments(dir)
      // grace zeroed + no open readers: the next purge drops the lease
      assert(RedditLog.oldestActiveLeaseStart(dir).isEmpty)
      // a late re-execution (cached plan re-run) opens a reader anyway —
      // the open must re-insert the lease, not silently no-op
      RedditLog.leaseReaderOpened(lease, dir)
      assert(RedditLog.oldestActiveLeaseStart(dir).isDefined)
      RedditLog.releaseLeasePartition(lease)
      assert(RedditLog.oldestActiveLeaseStart(dir).isEmpty)
    } finally RedditLog.leasePlanGraceMillis = prevGrace
  }

  test("DSv2 scans acquire leases; open-reader counts drain after a collect") {
    val dir = Files.createTempDirectory("rlog-drain").toString
    RedditLog.writeSegment(dir, (1L to 10L).map(row))
    RedditLog.writeSegment(dir, (11L to 20L).map(row))
    val prevGrace = RedditLog.leasePlanGraceMillis
    RedditLog.leasePlanGraceMillis = 0L
    try {
      assert(RedditLog.oldestActiveLeaseStart(dir).isEmpty)
      assert(ids(dir) == (1L to 20L))
      // with zero plan grace, activity == open readers: all of the
      // collect's readers must have closed
      assert(RedditLog.oldestActiveLeaseStart(dir).isEmpty,
        "scan leases must go inactive when partition readers close")
    } finally RedditLog.leasePlanGraceMillis = prevGrace
  }

  test("an unlistable shared lease store defers gc instead of failing open") {
    val dir = Files.createTempDirectory("rlog-lease-unknown").toString
    (0 until 4).foreach(k => RedditLog.writeSegment(dir, ((k * 10 + 1).toLong to (k * 10 + 10).toLong).map(row)))
    val prevGrace = RedditLog.leasePlanGraceMillis
    RedditLog.leasePlanGraceMillis = 0L
    try {
      Thread.sleep(2100) // clear the mtime-granularity slack
      val replaced = RedditLog.compact(dir, targetRows = 20L)
      assert(replaced.nonEmpty)
      Thread.sleep(5)
      // simulate an I/O-erroring store scan: `_leases` exists but is a
      // regular FILE, so listFiles() returns null — indistinguishable
      // from a transient FS error, which must NOT read as "no leases"
      val storeRoot = new java.io.File(dir, "_leases")
      if (storeRoot.exists()) storeRoot.delete()
      Files.write(storeRoot.toPath, Array[Byte]('x'))
      assert(RedditLog.gcSweep(dir, graceMillis = 0L).isEmpty,
        "sweep must defer deletion while the shared store is unreadable")
      // the store heals (file gone → definitively lease-free): same
      // sweep now reclaims the replaced generation
      assert(storeRoot.delete())
      assert(RedditLog.gcSweep(dir, graceMillis = 0L).map(_.getName).toSet
        == replaced.map(_.getName).toSet)
      assert(ids(dir) == (1L to 40L))
    } finally RedditLog.leasePlanGraceMillis = prevGrace
  }

  test("deleting lease id N leaves lease id N-prefixed siblings (12 vs 123) intact") {
    val dir = Files.createTempDirectory("rlog-lease-prefix").toString
    val root = new java.io.File(dir, "_leases"); root.mkdirs()
    val now = System.currentTimeMillis().toString.getBytes
    Files.write(new java.io.File(root, "lease-12").toPath, now)
    Files.write(new java.io.File(root, "lease-12.open-a").toPath, Array.empty[Byte])
    Files.write(new java.io.File(root, "lease-123").toPath, now)
    Files.write(new java.io.File(root, "lease-123.open-b").toPath, Array.empty[Byte])
    RedditLog.deleteLeaseFile(dir, 12L)
    val left = root.listFiles().map(_.getName).toSet
    assert(left == Set("lease-123", "lease-123.open-b"),
      s"prefix match deleted another planner's live lease: $left")
  }

  test("singleton groups keep their original file (no rewrite churn)") {
    val dir = Files.createTempDirectory("rlog-sg").toString
    RedditLog.writeSegment(dir, (1L to 500L).map(row))   // already big
    RedditLog.writeSegment(dir, (501L to 505L).map(row)) // small tail
    val obsolete = RedditLog.compact(dir, targetRows = 100L)
    assert(obsolete.isEmpty) // nothing merged: big seg alone, tail alone
    assert(RedditLog.listSegments(dir).size == 2)
    assert(ids(dir) == (1L to 505L))
  }
}
