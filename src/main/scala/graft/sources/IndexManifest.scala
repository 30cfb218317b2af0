package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Load-time mismatch between an index's manifest and what the caller
  * (or the index directory) claims — wrong index kind, wrong build
  * params, or no manifest at all. Named so callers and specs can catch
  * the contract violation specifically instead of whatever downstream
  * symptom (all-NULL distances, empty joins) it would otherwise decay
  * into.
  */
class IndexManifestException(msg: String) extends RuntimeException(msg)

/** The index was built on a different corpus version than the one
  * being served/checked — the silent-stale-neighbors failure mode made
  * loud.
  */
class StaleIndexException(msg: String) extends RuntimeException(msg)

/** Build manifest for every persisted index (gram index d44, IVF+SQ8
  * e31, IVF-PQ e32): the build params and a corpus watermark, written
  * beside the index as one small JSON file. Closes the two trust gaps
  * a bare index directory has:
  *
  *  1. PARAMS — a loader that trusts the caller's k/probes/cells/
  *     minLen silently mis-scores when they drift from what the index
  *     was built with (the PQ kernel's qe-length guard decays that to
  *     all-NULL distances at best). Savers record the params; loaders
  *     [[IndexManifest.require]] them and fail with a named error.
  *  2. STALENESS — an index built on last week's corpus happily serves
  *     stale neighbors after the corpus grows. The manifest carries
  *     (row count, max id); [[IndexManifest.requireFresh]] compares it
  *     against a current corpus in one tiny agg and throws
  *     [[StaleIndexException]] on drift. The check is a separate call,
  *     not part of the query path — a production deployment runs it
  *     per corpus publish, not per query.
  *
  * The watermark pair (rows, maxId) is what the append-only corpus
  * contract makes sufficient: ids are stable and rows are never
  * rewritten (TESTDATA.md tables; the RedditLog side has the same
  * id-monotone discipline), so growth moves both numbers and any
  * replace/compact that preserves them is content-identical.
  */
object IndexManifest {

  case class Manifest(kind: String, params: Map[String, Long],
      corpusRows: Long, corpusMaxId: Long)

  private val FILE = "MANIFEST.json"

  /** One tiny agg over the corpus: (row count, max id). */
  def watermark(corpus: DataFrame, idCol: String): (Long, Long) = {
    val r = corpus.agg(count(lit(1)), max(col(idCol).cast("long"))).head()
    (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
  }

  /** Run independent store jobs CONCURRENTLY (guide §2.6 — overlap
    * independent jobs: the driver otherwise serializes several
    * sub-second jobs per store operation, and at bench scale the
    * store-maintenance rows are job-latency-bound). Awaits EVERY job
    * before propagating the first failure in sequence order, so no
    * sibling is ever left in flight when a caller reacts to an error
    * (the writeSpectralTables discipline). Callers put only
    * ORDER-INDEPENDENT work here — guards that must precede a mutation
    * stay sequential at the call site; the manifest flip always comes
    * after.
    */
  def awaitAll(work: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val outcomes = work.map(w => Future(w()))
      .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    outcomes.collectFirst { case scala.util.Failure(e) => throw e }
    ()
  }

  /** Write `$path/MANIFEST.json` atomically (write-then-rename, same
    * discipline as the segment log's manifest flip).
    */
  def write(path: String, m: Manifest): Unit = {
    val om = new ObjectMapper()
    val node = om.createObjectNode()
    node.put("kind", m.kind)
    node.put("corpus_rows", m.corpusRows)
    node.put("corpus_max_id", m.corpusMaxId)
    val p = node.putObject("params")
    m.params.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    Files.createDirectories(Paths.get(path))
    val tmp = Files.createTempFile(Paths.get(path), ".manifest-", ".tmp")
    Files.write(tmp, om.writeValueAsBytes(node))
    Files.move(tmp, Paths.get(path, FILE), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read the manifest; a missing or unreadable one is an
    * [[IndexManifestException]] — an unmanifested index directory is
    * untrusted by definition.
    */
  def read(path: String): Manifest = {
    val f = Paths.get(path, FILE)
    if (!Files.exists(f))
      throw new IndexManifestException(
        s"no $FILE at $path — not a manifested index (rebuilt with a pre-manifest saver?)")
    val node = try new ObjectMapper().readTree(Files.readAllBytes(f))
    catch { case e: Exception =>
      throw new IndexManifestException(s"unreadable $FILE at $path: ${e.getMessage}")
    }
    val pn = node.get("params")
    val params = if (pn == null) Map.empty[String, Long] else {
      val it = pn.fieldNames()
      Iterator.continually(if (it.hasNext) Some(it.next()) else None)
        .takeWhile(_.isDefined).flatten
        .map(k => k -> pn.get(k).asLong()).toMap
    }
    Manifest(node.get("kind").asText(), params,
      node.get("corpus_rows").asLong(), node.get("corpus_max_id").asLong())
  }

  /** Read + verify: the index must be of `kind`, and every entry in
    * `expect` must match the recorded build params exactly. Returns the
    * manifest (so loaders can pull params they DON'T dictate — e.g.
    * nCells — from the index instead of the caller).
    */
  def require(path: String, kind: String,
      expect: Map[String, Long] = Map.empty): Manifest = {
    val m = read(path)
    if (m.kind != kind)
      throw new IndexManifestException(
        s"index at $path is kind '${m.kind}', expected '$kind'")
    expect.foreach { case (k, v) =>
      m.params.get(k) match {
        case Some(`v`) => ()
        case Some(got) => throw new IndexManifestException(
          s"index at $path built with $k=$got, caller expects $k=$v")
        case None => throw new IndexManifestException(
          s"index at $path has no recorded param '$k' (have: ${m.params.keys.toSeq.sorted.mkString(", ")})")
      }
    }
    m
  }

  /** Crash-recovery guard for append-only index tables: any stored row
    * whose id exceeds the manifest watermark is an ORPHAN — residue of
    * an append that crashed between its data writes and the manifest
    * flip. A retried append would pass the id-monotone guard against
    * the STALE watermark and write the same increment again — silent
    * row duplication that inflates candidate counts with no detection —
    * so appenders call this before writing and fail loudly instead;
    * the index-sync operators recover by rebuilding. The watermark < id
    * filter is answered from parquet row-group stats on id-monotone
    * stores — a pushed, payload-free scan.
    */
  def requireNoOrphans(table: DataFrame, idCol: String, man: Manifest,
      path: String): Unit = {
    val n = table.filter(col(idCol).cast("long") > man.corpusMaxId).count()
    if (n > 0L)
      throw new IndexManifestException(
        s"index at $path holds $n rows above its manifest watermark " +
          s"${man.corpusMaxId} — a previous append crashed between the data " +
          "write and the manifest flip; rebuild (index sync does this automatically)")
  }

  /** VERSIONED write — snapshot history for time-travel reads (the
    * lakehouse capability the append-only contract gives almost for
    * free): the manifest is ALSO written as `MANIFEST.v{N}.json`
    * (N = previous latest + 1) BEFORE the live `MANIFEST.json` flip.
    * Because every store under this device is id-monotone append-only
    * (rows are only ever ADDED, with ids above the old watermark), a
    * historical version IS its watermark: reading the store with
    * `id <= vN.corpusMaxId` reproduces the store as of version N
    * exactly, with no file-level snapshotting, O(1) metadata per
    * version, and the id cut answered from parquet row-group stats.
    * Crash window: a version file without the live flip is historical
    * residue only — the live manifest stays authoritative and the next
    * write takes the next free number.
    */
  def writeVersioned(path: String, m: Manifest): Int = {
    val v = versions(path).lastOption.getOrElse(0) + 1
    val om = new ObjectMapper()
    val node = om.createObjectNode()
    node.put("kind", m.kind)
    node.put("corpus_rows", m.corpusRows)
    node.put("corpus_max_id", m.corpusMaxId)
    val p = node.putObject("params")
    m.params.toSeq.sortBy(_._1).foreach { case (k, vv) => p.put(k, vv) }
    Files.createDirectories(Paths.get(path))
    val tmp = Files.createTempFile(Paths.get(path), ".manifest-", ".tmp")
    Files.write(tmp, om.writeValueAsBytes(node))
    Files.move(tmp, Paths.get(path, s"MANIFEST.v$v.json"),
      StandardCopyOption.ATOMIC_MOVE)
    write(path, m)
    v
  }

  /** The store's recorded snapshot versions, ascending. The listing
    * stream is closed explicitly (try/finally): it runs on every
    * versioned write and a leaked UnixDirectoryStream holds a real file
    * descriptor with no GC cleaner — a long-running append loop would
    * otherwise accumulate fds to the process limit (ADVICE r12).
    */
  def versions(path: String): Seq[Int] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return Seq.empty
    val re = "MANIFEST\\.v(\\d+)\\.json".r
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala
      .flatMap(p => re.findFirstMatchIn(p.getFileName.toString)
        .map(_.group(1).toInt))
      .toSeq.sorted
    finally s.close()
  }

  /** Drop all recorded snapshot versions — the OVERWRITE-SAVE reset:
    * a rebuild starts a new store lineage, and stale version files
    * would otherwise claim watermarks the rewritten data no longer
    * corresponds to. Appends never call this.
    */
  def clearVersions(path: String): Unit =
    versions(path).foreach { v =>
      Files.deleteIfExists(Paths.get(path, s"MANIFEST.v$v.json"))
    }

  /** RETENTION sweep — keep only the newest `keepLast` snapshot
    * versions (the lakehouse VACUUM for this device, and exactly as
    * cheap as the versions are: one JSON unlink per dropped version,
    * since snapshots hold no data files of their own). Returns the
    * dropped version numbers; a dropped version's as-of read becomes
    * the standard missing-version named error. Stores whose as-of
    * reads need PER-VERSION side tables (the spectral delta stats)
    * must compact those themselves before vacuuming — this sweep only
    * governs the manifest files.
    */
  def vacuumVersions(path: String, keepLast: Int): Seq[Int] = {
    Predef.require(keepLast >= 1, s"keepLast=$keepLast")
    val vs = versions(path)
    val drop = vs.dropRight(keepLast)
    drop.foreach { v =>
      Files.deleteIfExists(Paths.get(path, s"MANIFEST.v$v.json"))
    }
    drop
  }

  /** Read one historical snapshot's manifest; a missing version is a
    * named error listing what exists. The snapshot is VALIDATED against
    * the live manifest before it is trusted: on an append-only lineage
    * every version's kind matches the live one and its watermark pair
    * sits at or below the live pair, so a violation can only mean the
    * version file belongs to a DEAD lineage — the residue of a rebuild
    * that crashed between its data overwrite and its clearVersions
    * sweep. Serving such a snapshot would silently answer as-of reads
    * over data the watermark no longer describes; fail loudly instead
    * (ADVICE r12 — the read-side twin of the clear-BEFORE-overwrite
    * saver ordering).
    */
  def readVersion(path: String, v: Int): Manifest = {
    val f = Paths.get(path, s"MANIFEST.v$v.json")
    if (!Files.exists(f))
      throw new IndexManifestException(
        s"no version $v at $path (have: ${versions(path).mkString(", ")})")
    val node = new ObjectMapper().readTree(Files.readAllBytes(f))
    val pn = node.get("params")
    val params = if (pn == null) Map.empty[String, Long] else {
      val it = pn.fieldNames()
      Iterator.continually(if (it.hasNext) Some(it.next()) else None)
        .takeWhile(_.isDefined).flatten
        .map(k => k -> pn.get(k).asLong()).toMap
    }
    val snap = Manifest(node.get("kind").asText(), params,
      node.get("corpus_rows").asLong(), node.get("corpus_max_id").asLong())
    val live = read(path)
    if (snap.kind != live.kind || snap.corpusMaxId > live.corpusMaxId ||
        snap.corpusRows > live.corpusRows)
      throw new IndexManifestException(
        s"version $v at $path (kind=${snap.kind}, rows=${snap.corpusRows}, " +
          s"maxId=${snap.corpusMaxId}) is not a prefix of the live manifest " +
          s"(kind=${live.kind}, rows=${live.corpusRows}, maxId=${live.corpusMaxId}) " +
          "— stale lineage residue from a crashed rebuild; rebuild the store " +
          "to reset its versions")
    snap
  }

  /** True iff `corpus` matches the manifest's watermark. */
  def isFresh(path: String, corpus: DataFrame, idCol: String): Boolean = {
    val m = read(path)
    watermark(corpus, idCol) == ((m.corpusRows, m.corpusMaxId))
  }

  /** Loud freshness gate: throws [[StaleIndexException]] naming both
    * watermarks when the corpus has moved since the build.
    */
  def requireFresh(path: String, corpus: DataFrame, idCol: String): Unit = {
    val m = read(path)
    val (rows, maxId) = watermark(corpus, idCol)
    if ((rows, maxId) != ((m.corpusRows, m.corpusMaxId)))
      throw new StaleIndexException(
        s"index at $path built at corpus watermark (rows=${m.corpusRows}, " +
          s"maxId=${m.corpusMaxId}) but current corpus is (rows=$rows, " +
          s"maxId=$maxId) — rebuild or append before serving")
  }
}
