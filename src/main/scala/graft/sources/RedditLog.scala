package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** File-backed, integer-keyed append-only event log — the stand-in for the
  * reference's Redis logs (`rc:id:<n>` / `rs:id:<n>` hashes with a
  * `max_id` high-watermark — /root/reference/sse.py:86-96, 148-152).
  *
  * Layout: one directory per event type, segment files named
  * `seg-<firstId>-<lastId>.jsonl`, one JSON envelope object per line.
  * The id range in the *name* is the contract: the high-watermark (S1)
  * is the max `lastId` over the segment set — no data read needed — and
  * a range scan (S2) only opens segments overlapping the requested ids.
  * Ids may have gaps inside segments (S3 gap-skip falls out naturally:
  * a missing id is simply never emitted, and offsets advance past it).
  *
  * ==Manifest==
  * A `manifest.json` beside the segments lists the live segment set.
  * Readers prefer it over a directory listing: discovering the watermark
  * becomes ONE small-file read instead of an O(files) listing — at
  * millions of segments (the 100 TB ingest shape) per-trigger directory
  * listings are the metadata bottleneck, and on object stores LIST is
  * the expensive, weakly-consistent call while a single GET is cheap.
  * The writer maintains it incrementally (single-writer, like the
  * reference's producer owning `max_id`); segment data appears
  * atomically BEFORE the manifest references it, and each append
  * repairs a previous torn write by re-adopting on-disk segments whose
  * ids extend past the manifest's watermark (compaction-replaced
  * segments awaiting GC sit BELOW it, so they are never re-adopted).
  * Scale note honestly stated: the manifest itself is rewritten per
  * append, so its size — bounded by running [[compact]] — is the real
  * metadata unit of work; the design trades the readers' O(files)
  * LIST (unbounded, weakly consistent on object stores) for a
  * writer-side O(live segments) PUT (bounded by compaction).
  *
  * ==Compaction==
  * [[compact]] greedily merges small adjacent segments into
  * `targetRows`-sized ones and flips the manifest; the replaced
  * originals stay on disk until [[gc]] removes them, so a reader holding
  * the previous manifest snapshot still resolves every file it planned
  * (the manifest-flip-then-deferred-GC shape object-store tables use).
  * After a compaction the manifest — not the directory listing — is the
  * source of truth; the listing fallback exists only for manifest-less
  * (legacy/foreign) directories.
  */
object RedditLog {

  /** The canonical envelope schema (FIXTURES.md §A1). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("event", StringType, nullable = false),
    StructField("created_utc", LongType, nullable = false),
    StructField("author", StringType, nullable = false),
    StructField("subreddit", StringType, nullable = false),
    StructField("domain", StringType, nullable = true),
    StructField("over_18", StringType, nullable = true),
    StructField("is_self", StringType, nullable = true),
    StructField("json", StringType, nullable = false)))

  /** `rows` = line count when known (manifest-tracked so [[compact]]
    * can plan groups without reading data); -1 when unknown (raw
    * directory listing / legacy manifests).
    */
  final case class Segment(file: File, firstId: Long, lastId: Long, rows: Long = -1L)

  private val SegName = """seg-(\d+)-(\d+)\.jsonl""".r
  private val ManifestName = "manifest.json"

  // ---- metadata-read instrumentation ----
  // Listing/manifest reads per directory. Listing QPS is a first-class
  // metric for log sources (it is what a manifest exists to bound), and
  // it lets specs assert plan-level pruning ("the rs directory is never
  // touched by a comments-only fleet") without filesystem spies.
  private val metaReads = new ConcurrentHashMap[String, AtomicLong]()
  private def canon(dir: String): String = new File(dir).getAbsolutePath
  def metadataReads(dir: String): Long =
    Option(metaReads.get(canon(dir))).map(_.get()).getOrElse(0L)

  private def rawList(dir: String): Seq[Segment] = {
    val d = new File(dir)
    if (!d.isDirectory) Nil
    else d.listFiles().toSeq.flatMap { f =>
      f.getName match {
        case SegName(a, b) => Some(Segment(f, a.toLong, b.toLong))
        case _             => None
      }
    }.sortBy(_.firstId)
  }

  private def readManifest(dir: String): Option[Seq[Segment]] = {
    val mf = new File(dir, ManifestName)
    if (!mf.isFile) None
    else {
      val n = new ObjectMapper().readTree(mf)
      Some(n.get("segments").elements().asScala.map { e =>
        Segment(new File(dir, e.get("file").asText()),
          e.get("firstId").asLong(), e.get("lastId").asLong(),
          Option(e.get("rows")).map(_.asLong()).getOrElse(-1L))
      }.toSeq.sortBy(_.firstId))
    }
  }

  private def writeManifest(dir: String, segs: Seq[Segment]): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("maxId", segs.foldLeft(-1L)((m, s) => math.max(m, s.lastId)))
    val arr = root.putArray("segments")
    segs.sortBy(_.firstId).foreach { s =>
      val e = arr.addObject()
      e.put("file", s.file.getName)
      e.put("firstId", s.firstId)
      e.put("lastId", s.lastId)
      e.put("rows", s.rows)
    }
    val tmp = Files.createTempFile(Paths.get(dir), ".manifest-", ".tmp")
    Files.write(tmp, mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Live segment set: the manifest when present (one file read),
    * otherwise a directory listing (manifest-less directories only —
    * after a compaction the listing would double-count replaced
    * segments awaiting [[gc]]).
    */
  def listSegments(dir: String): Seq[Segment] = {
    metaReads.computeIfAbsent(canon(dir), _ => new AtomicLong()).incrementAndGet()
    readManifest(dir).getOrElse(rawList(dir))
  }

  // ---- reader leases ----
  // A scan acquires a lease BEFORE its manifest snapshot; [[gcSweep]]
  // never deletes a file replaced at-or-after the oldest ACTIVE lease's
  // start, so a scan planned on a previous manifest keeps resolving the
  // files it planned regardless of the time-based grace window
  // (ADVICE r2: the grace alone had nothing tying it to actual reader
  // lifetimes). A lease is ACTIVE while either holds:
  //
  //  - any of its partition readers is currently OPEN (open-reader
  //    counting, maintained by the reader factory). Counting OPEN
  //    readers -- not outstanding partitions -- lets the lease survive
  //    Spark re-executing the same memoized plan several times
  //    (foreachBatch probe + counter pass + emit pass, cache-miss
  //    recomputes): a partition-countdown drains on the first pass and
  //    leaves the later passes unprotected; or
  //  - it is younger than `leasePlanGraceMillis` -- covering the window
  //    between planning and the first (or next) reader open, and the
  //    natural expiry for plan copies that never execute (physical
  //    planning probes planInputPartitions on throwaway copies) and for
  //    data batches whose sink early-returned without running an action.
  //
  // `leaseTtlMillis` is the hard backstop for opens whose close never
  // arrives (lost executor). The in-memory map is the fast path and is
  // exact in-process; CLUSTER-WIDE exactness comes from the shared
  // file-backed store beside the segments (`_leases/`): acquire writes
  // a lease file, each reader open drops an open-marker file and each
  // close removes one, and [[oldestActiveLeaseStart]] unions both
  // stores — so a GC sweep on any JVM defers for a reader opened on any
  // other, as long as they share the log's filesystem (which they must,
  // to read segments at all). Marker files are a distributed semaphore:
  // any close may remove any of its lease's markers, only the count
  // matters. A reader that dies without closing leaves its marker until
  // the TTL backstop — the same liveness bound as the in-memory count.
  // Store I/O failures degrade loudly to in-process-only semantics
  // (the pre-shared-store behavior), never fail the read path.

  private[sources] final case class Lease(id: Long, dir: String,
      startMillis: Long, open: AtomicInteger) {
    /** Last open/close transition — the grace window measures from here,
      * not from planning, so a multi-pass execution whose passes are
      * spaced wider than the grace stays covered as long as each gap is
      * shorter than it (residual: a scan idle longer than the grace
      * between passes falls back to the caller-sized gcSweep grace).
      */
    val lastActivity = new AtomicLong(startMillis)
  }
  private val leases = new ConcurrentHashMap[Long, Lease]()
  /** Random positive ids: two planner JVMs sharing a log directory must
    * not collide in the shared store (a sequential counter restarts at
    * 1 in every JVM). Collision odds over 2⁶³ are ignorable.
    */
  private def newLeaseId(): Long =
    java.util.concurrent.ThreadLocalRandom.current().nextLong(1L, Long.MaxValue)
  /** Hard backstop: a lease is never honored past this age, even with
    * readers stuck open (lost executor, leaked iterator).
    */
  @volatile var leaseTtlMillis: Long = 15 * 60 * 1000L
  /** How long a lease with no open readers stays active after planning
    * (plan-to-read latency and the gaps between a plan's passes). Also
    * the floor on how long continuous re-planning (a busy streaming
    * source) can hold GC back.
    */
  @volatile var leasePlanGraceMillis: Long = 60 * 1000L

  private def leaseActive(l: Lease, now: Long): Boolean =
    now - l.startMillis < leaseTtlMillis &&
      (l.open.get() > 0 || now - l.lastActivity.get() < leasePlanGraceMillis)

  /** Eviction decides per key under the bin lock (computeIfPresent), so
    * it serializes with [[leaseReaderOpened]]'s compute on the same key:
    * either the purge sees the incremented open count and keeps the
    * lease, or the open lands after the removal and re-inserts a fresh
    * one. An entrySet().removeIf here would test the predicate OUTSIDE
    * the lock and could evict a lease between a reader's re-insert and
    * its increment — exactly the unprotected-read window the re-insert
    * exists to close.
    */
  private def purgeInactiveLeases(now: Long): Unit =
    leases.keySet.forEach { k =>
      leases.computeIfPresent(k, (_, l) => if (leaseActive(l, now)) l else null)
    }

  // ---- shared (file-backed) lease store: `<dir>/_leases/` ----
  // `lease-<id>` content = startMillis (TTL anchor; mtime tracks
  // lastActivity and is refreshed by opens/closes), `lease-<id>.open-*`
  // one marker per currently-open reader.
  private def leaseRoot(dir: String) = new File(canon(dir), "_leases")
  private val LeaseFileName = """lease-(\d+)""".r
  private val OpenMarkerName = """lease-(\d+)\.open-.+""".r

  private def leaseStoreWarn(what: String, e: Throwable): Unit =
    System.err.println(s"[reddit-log] WARN: shared lease store $what (${e.getMessage}) — " +
      (if (what.startsWith("scan")) "store treated as UNKNOWN; GC deferred this pass"
       else "cross-JVM GC exactness degraded to the time-based grace for this lease"))

  private def writeLeaseFile(dir: String, id: Long, startMillis: Long): Unit =
    try {
      val root = leaseRoot(dir); root.mkdirs()
      Files.write(new File(root, s"lease-$id").toPath,
        startMillis.toString.getBytes(StandardCharsets.UTF_8))
    } catch { case e: Exception => leaseStoreWarn("write failed", e) }

  private[sources] def deleteLeaseFile(dir: String, id: Long): Unit =
    try {
      val root = leaseRoot(dir)
      // exact lease name or its dot-terminated marker prefix — a bare
      // startsWith("lease-$id") would also match lease-$idX (id 12
      // deleting lease-123's live lease and markers)
      Option(root.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.getName == s"lease-$id" ||
          f.getName.startsWith(s"lease-$id."))
        .foreach(_.delete())
    } catch { case e: Exception => leaseStoreWarn("delete failed", e) }

  /** Drop one open marker; re-create the lease file if an out-of-process
    * purge raced the open (mirror of the in-memory re-insert).
    */
  private def addOpenMarker(dir: String, id: Long, now: Long): Unit =
    try {
      val root = leaseRoot(dir); root.mkdirs()
      val lf = new File(root, s"lease-$id")
      if (!lf.exists()) writeLeaseFile(dir, id, now)
      lf.setLastModified(now)
      new File(root, f"lease-$id.open-$now%x-${newLeaseId()}%x").createNewFile()
    } catch { case e: Exception => leaseStoreWarn("marker create failed", e) }

  /** Remove ONE marker of the lease (markers are interchangeable — only
    * the count is semantic). Concurrent closes may race on the same
    * marker: the loser retries on the next candidate; none left = the
    * floor-at-zero of the in-memory count.
    */
  private def removeOneOpenMarker(dir: String, id: Long, now: Long): Unit =
    try {
      val root = leaseRoot(dir)
      Option(new File(root, s"lease-$id")).filter(_.exists()).foreach(_.setLastModified(now))
      Option(root.listFiles()).getOrElse(Array.empty[File])
        .filter(_.getName.startsWith(s"lease-$id.open-"))
        .exists(_.delete())
    } catch { case e: Exception => leaseStoreWarn("marker remove failed", e) }

  /** Active lease start times in the shared store, purging dead entries
    * as it goes (every GC sweep calls this, bounding the directory).
    * A lease file is active under the same predicate as the in-memory
    * [[leaseActive]]: inside TTL of its recorded start AND (has open
    * markers OR mtime within the plan grace). Orphan markers whose
    * lease file vanished (purge racing a recreate) stay protective
    * until marker-mtime + TTL — fail-safe toward deferring GC.
    *
    * Returns `None` when the store state is UNKNOWN — the scan threw,
    * or the root exists but `listFiles` returned null (an I/O error,
    * NOT an empty directory). Callers on the deletion path must then
    * DEFER: degrading "unknown" to "no leases" would fail open and let
    * [[gcSweep]] delete replaced segments that a reader in another JVM
    * still has planned or open. A root that does not exist is
    * definitively lease-free → `Some(Seq.empty)`.
    */
  private def sharedActiveLeaseStarts(dir: String, now: Long): Option[Seq[Long]] =
    try {
      val root = leaseRoot(dir)
      if (!root.exists()) return Some(Seq.empty)
      val listed = root.listFiles()
      if (listed == null) {
        leaseStoreWarn("scan failed",
          new java.io.IOException(s"listFiles returned null on existing $root"))
        return None
      }
      val fs = listed.toSeq
      val markers = fs.groupBy(_.getName match {
        case OpenMarkerName(id) => id.toLong
        case _ => -1L
      })
      val leaseStarts = fs.flatMap { f =>
        f.getName match {
          case LeaseFileName(idStr) =>
            val id = idStr.toLong
            val start =
              try new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim.toLong
              catch { case _: Exception => f.lastModified() } // torn write → degrade to mtime
            val active = now - start < leaseTtlMillis &&
              (markers.getOrElse(id, Seq.empty).nonEmpty ||
                now - f.lastModified() < leasePlanGraceMillis)
            if (active) Some(start)
            else {
              markers.getOrElse(id, Seq.empty).foreach(_.delete()); f.delete(); None
            }
          case _ => None
        }
      }
      val known = fs.collect { case f if LeaseFileName.pattern.matcher(f.getName).matches() =>
        f.getName match { case LeaseFileName(id) => id.toLong } }.toSet
      val orphanStarts = markers.collect {
        case (id, ms) if id > 0 && !known.contains(id) =>
          val alive = ms.filter(m => now - m.lastModified() < leaseTtlMillis)
          ms.diff(alive).foreach(_.delete())
          alive.map(_.lastModified())
      }.flatten.toSeq
      Some(leaseStarts ++ orphanStarts)
    } catch { case e: Exception => leaseStoreWarn("scan failed", e); None }

  /** Register a scan over `dir`. Call BEFORE listing segments, so the
    * snapshot is provably no older than the lease. Writes the shared
    * lease file so sweeps in OTHER JVMs defer too.
    */
  private[sources] def acquireLease(dir: String): Long = {
    val id = newLeaseId()
    // amortized housekeeping: streaming sources plan one scan per
    // micro-batch, so tie BOTH stores' purges to acquisition rate (a
    // log dir that is scanned but never GC-swept must not accumulate
    // lease files forever)
    if ((id & 1023L) == 0L) {
      val now = System.currentTimeMillis()
      purgeInactiveLeases(now)
      sharedActiveLeaseStarts(dir, now)
    }
    val now = System.currentTimeMillis()
    leases.put(id, Lease(id, canon(dir), now, new AtomicInteger(0)))
    writeLeaseFile(dir, id, now)
    id
  }

  /** Zero planned partitions means nothing will ever read: drop now. */
  private[sources] def armLease(id: Long, partitions: Int): Unit =
    if (partitions <= 0) Option(leases.remove(id)).foreach(l => deleteLeaseFile(l.dir, id))

  private val openSeq = new AtomicLong()

  /** A partition reader of the lease's scan opened. A lease id that is
    * no longer in the map (purged because the plan sat idle longer than
    * the grace before a late re-execution — e.g. a cached batch plan
    * re-run much later, or an executor JVM that never saw the planning
    * insert) is RE-INSERTED under its original id rather than no-oped,
    * so the re-read regains GC protection for the rest of its lifetime.
    * Residual: files replaced while the lease was lapsed may already be
    * collected — that read fails and the task retry re-plans under a
    * fresh lease; re-insertion narrows the unprotected window to the
    * lapse itself. Unleased partitions (id < 0) stay no-ops, and the
    * amortized purge keeps executor-local maps bounded (acquireLease
    * never runs there).
    */
  private[sources] def leaseReaderOpened(id: Long, dir: String): Option[Lease] = {
    if (id < 0) return None
    if ((openSeq.incrementAndGet() & 1023L) == 0L)
      purgeInactiveLeases(System.currentTimeMillis())
    // increment INSIDE the per-key compute: atomic with the purge's
    // computeIfPresent, so the count can never land on an evicted Lease
    var opened: Lease = null
    leases.compute(id, (_, old) => {
      val l = if (old == null)
        Lease(id, canon(dir), System.currentTimeMillis(), new AtomicInteger(0))
      else old
      l.open.incrementAndGet()
      l.lastActivity.set(System.currentTimeMillis())
      opened = l
      l
    })
    // shared store: one marker per open, so sweeps in other JVMs see
    // this reader (on an executor the map insert above is local-only —
    // the marker is what actually protects the read cluster-wide)
    addOpenMarker(opened.dir, id, System.currentTimeMillis())
    Some(opened)
  }

  /** A partition reader closed. Takes the exact Lease object the open
    * incremented (returned by [[leaseReaderOpened]]), NOT the id: after
    * a TTL eviction + re-insert under the same id, an id-keyed close
    * would decrement the NEW lease for an open it never counted,
    * stripping open-reader protection from a still-open reader.
    * Closing an already-evicted object is harmless (it's off the map);
    * the floor at zero keeps a retried task's double close from going
    * negative.
    */
  private[sources] def leaseReaderClosed(l: Lease): Unit = {
    l.open.updateAndGet(n => math.max(0, n - 1))
    val now = System.currentTimeMillis()
    l.lastActivity.set(now)
    removeOneOpenMarker(l.dir, l.id, now)
  }

  /** Test/compat shim: close by id — valid only when no evict+re-insert
    * happened in between (true in specs that control time directly).
    */
  private[sources] def releaseLeasePartition(id: Long): Unit =
    Option(leases.get(id)).foreach(leaseReaderClosed)

  /** Start time of the oldest ACTIVE lease over `dir`, across BOTH
    * stores: the in-memory map (this JVM's scans) and the shared
    * `_leases/` files (scans planned or read anywhere else on the
    * cluster). Also reclaims inactive entries from both (gcSweep calls
    * this every sweep, so the map and the directory stay bounded even
    * when nothing new is being scanned).
    */
  def oldestActiveLeaseStart(dir: String): Option[Long] = {
    val now = System.currentTimeMillis()
    purgeInactiveLeases(now)
    val c = canon(dir)
    // Unknown shared store (scan failure) pins the floor at epoch 0:
    // every replaced segment's mtime is newer, so gcSweep deletes
    // nothing this pass — fail CLOSED in the deletion direction rather
    // than degrading to in-process-only semantics on a transient error.
    val shared = sharedActiveLeaseStarts(dir, now).getOrElse(Seq(0L))
    (leases.values.asScala
      .filter(l => l.dir == c && leaseActive(l, now))
      .map(_.startMillis) ++ shared).minOption
  }

  /** Test hook: forget a lease in THIS JVM's map only, leaving the
    * shared store untouched — models a planner that died (or an
    * executor-side reader whose planning JVM is elsewhere) so specs can
    * exercise the cross-JVM protection path without a second process.
    */
  private[sources] def dropInMemoryLease(id: Long): Unit = leases.remove(id)

  /** S1 — high-watermark from the segment set alone. -1 on an empty log. */
  def maxId(dir: String): Long =
    listSegments(dir).foldLeft(-1L)((m, s) => math.max(m, s.lastId))

  /** Append a segment of envelope rows (test/ingest helper). Rows are
    * (id, event, created_utc, author, subreddit, domain, over_18,
    * is_self, json); ids must be ascending within the segment.
    */
  def writeSegment(dir: String, rows: Seq[Map[String, Any]]): Unit = {
    require(rows.nonEmpty, "empty segment")
    val mapper = new ObjectMapper()
    val ids = rows.map(_("id").toString.toLong)
    val lines = rows.map { r =>
      val node = mapper.createObjectNode()
      r.foreach {
        case (k, null)       => node.putNull(k)
        case (k, v: Long)    => node.put(k, v)
        case (k, v: Int)     => node.put(k, v.toLong)
        case (k, v: String)  => node.put(k, v)
        case (k, v)          => node.put(k, v.toString)
      }
      mapper.writeValueAsString(node)
    }
    Files.createDirectories(Paths.get(dir))
    // write-then-rename: readers watermark off segment NAMES, so a
    // segment must appear atomically with all its rows present (the
    // source's S3 trailing-gap contract depends on this)
    val name = s"seg-${ids.min}-${ids.max}.jsonl"
    val tmp = Files.createTempFile(Paths.get(dir), ".seg-", ".tmp")
    Files.write(tmp, lines.asJava)
    Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
    // Manifest update AFTER the segment is visible (see class doc).
    // Torn-write repair: re-adopt on-disk segments whose ids extend
    // past the manifest watermark — a crash between segment rename and
    // manifest write left them orphaned, and because appends are
    // id-monotone they are exactly the ones above the watermark
    // (compaction-replaced files awaiting gc sit below it and stay
    // excluded). The writer-side listing this costs is the single
    // writer's to pay, not the readers'.
    val newSeg = Segment(new File(dir, name), ids.min, ids.max, lines.size.toLong)
    val prev = readManifest(dir) match {
      case None => rawList(dir).filterNot(_.file.getName == name)
      case Some(m) =>
        val watermark = m.foldLeft(-1L)((x, s) => math.max(x, s.lastId))
        m ++ rawList(dir).filter(s =>
          s.lastId > watermark && s.file.getName != name)
    }
    writeManifest(dir, prev :+ newSeg)
  }

  /** Merge runs of adjacent small segments into ~`targetRows`-row ones
    * and flip the manifest to the merged set. Returns the replaced
    * original files — still readable until [[gc]] deletes them, so
    * in-flight readers planned on the old manifest are unaffected.
    */
  def compact(dir: String, targetRows: Long = 100000L): Seq[File] =
    compactSegments(dir, targetRows, listSegments(dir))

  private def compactSegments(dir: String, targetRows: Long,
      segs: Seq[Segment]): Seq[File] = {
    // manifest-tracked row counts plan the grouping without touching
    // data; only merge-group members get read. Counting lines is the
    // fallback for legacy/raw-listed segments.
    val withRows = segs.map { s =>
      val n =
        if (s.rows >= 0) s.rows
        else new String(Files.readAllBytes(s.file.toPath), StandardCharsets.UTF_8)
          .split('\n').count(_.nonEmpty).toLong
      (s, n)
    }
    // greedy grouping in id order; singleton groups keep their original file
    val groups = withRows.foldLeft(List.empty[List[(Segment, Long)]]) { (acc, x) =>
      acc match {
        case h :: rest if h.map(_._2).sum + x._2 <= targetRows => (h :+ x) :: rest
        case _ => List(x) :: acc
      }
    }.reverse
    val obsolete = List.newBuilder[File]
    val newSegs = groups.map {
      case List((s, _)) => s
      case grp =>
        val files = grp.map(_._1)
        val first = files.map(_.firstId).min
        val last = files.map(_.lastId).max
        val merged = files.flatMap(s =>
          new String(Files.readAllBytes(s.file.toPath), StandardCharsets.UTF_8)
            .split('\n').toSeq.filter(_.nonEmpty))
        val name = s"seg-$first-$last.jsonl"
        val tmp = Files.createTempFile(Paths.get(dir), ".seg-", ".tmp")
        Files.write(tmp, merged.asJava)
        Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
        obsolete ++= files.map(_.file)
        Segment(new File(dir, name), first, last, merged.size.toLong)
    }
    val replaced = obsolete.result()
    // nothing merged → the segment set is unchanged; skip the rewrite
    if (replaced.nonEmpty) {
      writeManifest(dir, newSegs)
      // stamp the moment of REPLACEMENT onto the replaced files: the GC
      // grace must measure time-since-dead, and a file's natural mtime is
      // its creation time — a segment written long before its compaction
      // would otherwise be GC-eligible the instant the manifest flips,
      // under the feet of readers planned on the previous snapshot.
      // A failed stamp (permissions, read-only FS) is loud: the file
      // would silently inherit creation-time GC eligibility otherwise.
      val now = System.currentTimeMillis()
      replaced.foreach { f =>
        if (!f.setLastModified(now))
          System.err.println(s"[reddit-log] WARN: could not stamp replacement time on $f — " +
            "it may be GC-eligible early (creation mtime + grace)")
      }
    }
    replaced
  }

  /** Deferred deletion of compaction-replaced segments (the object-store
    * GC step — run once prior readers' plans have drained).
    */
  def gc(obsolete: Seq[File]): Unit = obsolete.foreach(_.delete())

  /** Time-based deferred GC, crash-safe: compaction-replaced files are
    * exactly the on-disk segments NOT in the manifest whose ids sit at
    * or below its watermark (above-watermark strays are torn-write
    * orphans owned by [[writeSegment]]'s repair, never deleted here).
    * A file is deleted only when BOTH hold:
    *  - its replacement (mtime — [[compact]] stamps replacement time) is
    *    older than `graceMillis`, a real time window for readers planned
    *    on a previous manifest (a cycle-count window collapses under
    *    bursty ingest), and
    *  - no in-flight reader lease predates the replacement: a scan whose
    *    lease started before the manifest flip may have planned on the
    *    old snapshot and still needs the file, however long it runs
    *    (grace alone cannot promise that — leases tie GC to actual
    *    reader lifetimes; see the lease section).
    * Because the state IS the filesystem, files replaced just before a
    * crash are still reclaimed after restart. Size `graceMillis` at call
    * sites to the longest scan expected from OUT-OF-PROCESS readers —
    * in-process ones are covered exactly by the leases.
    */
  def gcSweep(dir: String, graceMillis: Long): Seq[File] = {
    val live = listSegments(dir).map(_.file.getName).toSet
    val watermark = maxId(dir)
    // mtimeSlack: filesystem mtime granularity can be 1-2 s, so a stamp
    // written just AFTER a lease started may truncate to just BEFORE
    // it; compare against the lease floor with the granularity slack so
    // truncation can never flip "replaced after the lease" into
    // "replaced before it"
    val mtimeSlackMillis = 2000L
    val cutoff = math.min(
      System.currentTimeMillis() - graceMillis,
      oldestActiveLeaseStart(dir).map(_ - mtimeSlackMillis).getOrElse(Long.MaxValue))
    val dead = rawList(dir).filter(s =>
      !live.contains(s.file.getName) && s.lastId <= watermark &&
        s.file.lastModified() < cutoff)
    dead.foreach(_.file.delete())
    dead.map(_.file)
  }

  /** Size-tiered auto-compaction policy for the ingest path: once the
    * log accumulates ≥ `maxSmall` segments under `targetRows`
    * (unknown-size segments count as small — [[compact]] line-counts
    * them), sweep-GC the previously replaced files past their grace
    * window and run one compaction pass over the already-listed segment
    * set (one metadata read total). Call after appends — below
    * threshold it costs one manifest read. Returns true only when the
    * pass actually merged something, so a pathological set of
    * unmergeable small segments does not re-trigger forever.
    */
  def compactIfNeeded(dir: String, targetRows: Long = 100000L,
      maxSmall: Int = 16, graceMillis: Long = 60000L): Boolean = {
    val segs = listSegments(dir)
    val small = segs.count(s => s.rows < 0 || s.rows < targetRows)
    if (small < maxSmall) false
    else {
      gcSweep(dir, graceMillis)
      compactSegments(dir, targetRows, segs).nonEmpty
    }
  }

  /** The production INGEST entry — append one segment, then let the
    * size-tiered policy decide whether THIS append pays for maintenance
    * ([[compactIfNeeded]]: sweep-GC of replaced files past their grace
    * window + lease check, then one merge pass). Maintenance lives on
    * the writer path because the writer is the system's one
    * single-threaded actor (appends are id-monotone from a single
    * writer, see [[writeSegment]]); readers never compact, they only
    * hold leases. Below the small-segment threshold an append costs one
    * manifest read beyond the write itself. Returns true when this
    * append triggered a merge — callers ingesting a firehose can use it
    * to meter maintenance logging.
    */
  def append(dir: String, rows: Seq[Map[String, Any]],
      targetRows: Long = 100000L, maxSmall: Int = 16,
      graceMillis: Long = 60000L): Boolean = {
    writeSegment(dir, rows)
    compactIfNeeded(dir, targetRows, maxSmall, graceMillis)
  }

  /** BATCH read of the segment log as a DataFrame (r16) — the Spark
    * scan path beside the driver-side [[readRange]] the SSE server
    * uses: the MANIFEST's segment set becomes an explicit file list
    * (never a directory glob — the manifest is the source of truth
    * after a compaction), and a `snapshotMaxId` turns the read into a
    * TIME-TRAVEL snapshot riding the log's own id-monotone contract:
    * segments whose name-range starts above the watermark are pruned at
    * the METADATA layer (zero bytes read — the S2 name-range contract),
    * and the residual `id <= watermark` cut is one pushed filter.
    *
    * Why the watermark is a valid snapshot pin (the d153 argument on
    * the repo's oldest append-only store): appends are id-monotone, and
    * COMPACTION preserves rows exactly (merge-only, manifest-flipped),
    * so membership at or below any past watermark never changes — a
    * snapshot read taken before a compact+append equals the same read
    * after (spec-pinned). "Replay exactly the events consumer X had
    * seen as of its disconnect" is this read with X's last-event-id.
    */
  def batchRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      snapshotMaxId: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val segs = listSegments(dir)
    val live = snapshotMaxId match {
      case None => segs
      case Some(wm) => segs.filter(_.firstId <= wm)
    }
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val df = spark.read.schema(schema)
      .json(live.map(_.file.getAbsolutePath): _*)
    snapshotMaxId match {
      case None => df
      case Some(wm) => df.filter(col("id") <= wm)
    }
  }

  /** Read raw envelope lines of segments overlapping (startExclusive,
    * endInclusive], filtered to that id range.
    */
  def readRange(dir: String, startExclusive: Long, endInclusive: Long): Seq[Map[String, String]] = {
    val mapper = new ObjectMapper()
    val lease = acquireLease(dir)
    try readRangeInner(dir, startExclusive, endInclusive, mapper)
    finally leases.remove(lease)
  }

  private def readRangeInner(dir: String, startExclusive: Long,
      endInclusive: Long, mapper: ObjectMapper): Seq[Map[String, String]] = {
    listSegments(dir)
      .filter(s => s.lastId > startExclusive && s.firstId <= endInclusive)
      .flatMap { s =>
        new String(Files.readAllBytes(s.file.toPath), StandardCharsets.UTF_8)
          .split('\n').iterator.filter(_.nonEmpty).map { line =>
            val n = mapper.readTree(line)
            schema.fieldNames.toSeq.map { f =>
              val v = n.get(f)
              f -> (if (v == null || v.isNull) null else v.asText())
            }.toMap
          }.filter { m =>
            val id = m("id").toLong
            id > startExclusive && id <= endInclusive
          }
      }
  }
}
