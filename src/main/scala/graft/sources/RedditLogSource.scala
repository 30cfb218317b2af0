package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 streaming source over a [[RedditLog]] directory — the
  * Spark-native re-expression of the reference's per-connection Redis poll
  * loop (SURVEY.md §2 rows S1-S4, R1, R2):
  *
  *  - S1 `latestOffset` = high-watermark from segment listing (the
  *    reference's `GET rc:max_id`, sse.py:86-96).
  *  - S2 range scan: `planInputPartitions(start, end]` opens only
  *    overlapping segments — one partition per segment, so read
  *    parallelism scales with the log, not with connections.
  *  - S3 gap-skip: absent ids inside the range are simply not emitted;
  *    the committed offset is the end of the *scanned* range, so holes
  *    are skipped permanently (documented at-most-once per hole,
  *    sse.py:161-162, 182-183). The reference's other half — "trailing
  *    missing ids are retried next poll" — is satisfied structurally:
  *    segments append atomically, so an id that will exist later belongs
  *    to a future segment and is never covered by the current watermark.
  *  - S4 admission control: `maxRecordsPerTrigger` caps a micro-batch
  *    (the reference's COM/SUB_BUFFER_SIZE, sse.py:101-102); Structured
  *    Streaming re-fires immediately while a backlog remains — the
  *    25 ms fast-path (sse.py:247-248) for free.
  *  - R1/R2: `backfill` / `start_id` options with the reference's V1/V2
  *    validation (mutual exclusion, int parse, 100 000 clamp,
  *    sse.py:49-78).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.RedditLogSource")
  *   .option("path", "/logs/rc").option("backfill", "1000").load()
  * }}}
  */
class RedditLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RedditLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedditLogTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class RedditLogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = Option(options.get("path"))
    .getOrElse(throw new IllegalArgumentException("reddit-log: 'path' option is required"))

  override def name(): String = s"reddit-log(`$path`)"
  override def schema(): StructType = RedditLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new RedditLogScanBuilder(path, options)
}

/** Pushes `id` lower/upper bounds down to segment pruning: a batch read
  * with `WHERE id > X` opens only segments whose name-declared range
  * overlaps (X, ∞) — the catch-up path's "type with no backfill" case
  * prunes to zero segments this way. Filters are also kept post-scan
  * (returned as residuals), so correctness never depends on the pruning.
  */
private[sources] class RedditLogScanBuilder(path: String,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var startExclusive = -1L
  private var endInclusive = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty

  /** id-range implied by a filter: (startExclusive, endInclusive), or
    * None when the filter says nothing provable about id. And =
    * intersection (an unknown side is just ignored), Or = union (BOTH
    * sides must be known, else the branch may match anything).
    */
  /** Saturating v−1: Long.MinValue−1 would wrap to Long.MaxValue and
    * prune EVERY segment — residual filters can't recover rows that were
    * never scanned. Keeping MinValue makes the bound a no-op instead
    * (a `>= MinValue` start excludes nothing; a `< MinValue` end matches
    * nothing, which is the correct empty result).
    */
  private def decSat(v: Long): Long = if (v == Long.MinValue) v else v - 1

  private def rangeOf(f: Filter): Option[(Long, Long)] = f match {
    case GreaterThan("id", v: Number)        => Some((v.longValue(), Long.MaxValue))
    case GreaterThanOrEqual("id", v: Number) => Some((decSat(v.longValue()), Long.MaxValue))
    case LessThan("id", v: Number)           => Some((-1L, decSat(v.longValue())))
    case LessThanOrEqual("id", v: Number)    => Some((-1L, v.longValue()))
    case EqualTo("id", v: Number)            => Some((decSat(v.longValue()), v.longValue()))
    case And(a, b) =>
      (rangeOf(a), rangeOf(b)) match {
        case (Some((s1, e1)), Some((s2, e2))) => Some((math.max(s1, s2), math.min(e1, e2)))
        case (one, other)                     => one.orElse(other)
      }
    case Or(a, b) =>
      for ((s1, e1) <- rangeOf(a); (s2, e2) <- rangeOf(b))
        yield (math.min(s1, s2), math.max(e1, e2))
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = filters.filter(f => rangeOf(f).isDefined)
    usable.flatMap(rangeOf).foreach { case (s, e) =>
      startExclusive = math.max(startExclusive, s)
      endInclusive = math.min(endInclusive, e)
    }
    pushed = usable
    filters // everything stays as a residual post-scan filter
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = RedditLog.schema
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new RedditLogMicroBatchStream(path, options)
    // one Batch per Scan: physical planning instantiates several plan
    // copies (supportsColumnar probes) that each call toBatch +
    // planInputPartitions — sharing the instance lets the Batch memoize
    // its partition plan so exactly ONE reader lease is taken per scan
    private lazy val batchInstance = new RedditLogBatch(path, startExclusive, endInclusive)
    override def toBatch: Batch = batchInstance
  }
}

/** Stream offset = highest id considered scanned (inclusive). */
case class RedditLogOffset(maxId: Long) extends Offset {
  override def json(): String = s"""{"maxId":$maxId}"""
}

object RedditLogOffset {
  def fromJson(json: String): RedditLogOffset = {
    val n = new ObjectMapper().readTree(json)
    RedditLogOffset(n.get("maxId").asLong())
  }
}

private[sources] class RedditLogMicroBatchStream(path: String,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Shown as the source description in StreamingQueryProgress — carries
    * the log path so consumers (SseServer restart recovery) can map a
    * dead query's committed end offsets back to their side.
    */
  override def toString: String = s"RedditLogSource[$path]"

  // ---- option validation (V1/V2, sse.py:49-78) ----
  private def longOpt(key: String): Option[Long] =
    Option(options.get(key)).map { v =>
      v.trim.toLongOption.getOrElse(
        throw new IllegalArgumentException(s"reddit-log: $key must be an integer"))
    }
  private val backfill: Option[Long] =
    longOpt("backfill").map(n => math.min(n, graft.api.ParamSpec.MaxBackfill))
  private val startId: Option[Long] = longOpt("start_id")
  if (backfill.isDefined && startId.isDefined)
    throw new IllegalArgumentException(
      "reddit-log: backfill and start_id are mutually exclusive")
  private val maxPerTrigger: Option[Long] = longOpt("max_per_trigger")

  override def initialOffset(): Offset = {
    val latest = RedditLog.maxId(path)
    val start = startId match {
      case Some(s) => s - 1                       // first emitted id = start_id (R2)
      case None => backfill match {
        case Some(n) => math.max(latest - n, -1L) // last n ids (R1)
        case None    => latest                    // live tail only
      }
    }
    RedditLogOffset(start)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(Offset, ReadLimit)")

  // Trigger.AvailableNow: pin the watermark at prepare time so the run
  // drains exactly the data present at start, in admission-sized batches.
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(RedditLog.maxId(path))

  override def reportLatestOffset(): Offset = RedditLogOffset(RedditLog.maxId(path))

  /** S1 + S4: advance to the watermark, optionally capped to `maxRows`
    * ids above the current position (ids are treated as near-dense, like
    * the reference's fixed-size id ranges — sse.py:145-152).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = start.asInstanceOf[RedditLogOffset].maxId
    val latest = availableNowCap.getOrElse(RedditLog.maxId(path))
    val capped = limit match {
      case r: ReadMaxRows => math.min(latest, cur + r.maxRows())
      case _              => latest
    }
    RedditLogOffset(math.max(capped, cur))
  }

  // Memoized plan for the current offset range: Spark's physical
  // planning calls planInputPartitions on several throwaway plan copies
  // before executing one (supportsColumnar probes); re-planning each
  // time would leak one armed reader lease per copy. Same (start, end]
  // → same partitions and ONE lease, drained by the executed copy's
  // readers. A new range plans fresh (the previous batch's lease drains
  // through its own readers).
  private var lastPlan: Option[(Long, Long, Array[InputPartition])] = None

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[RedditLogOffset].maxId
      val e = end.asInstanceOf[RedditLogOffset].maxId
      lastPlan match {
        case Some((ps, pe, parts)) if ps == s && pe == e => parts
        case _ =>
          // lease BEFORE the segment snapshot: compaction GC must not
          // delete a replaced file this plan references mid-read
          val lease = RedditLog.acquireLease(path)
          val parts = RedditLog.listSegments(path)
            .filter(seg => seg.lastId > s && seg.firstId <= e)
            .map(seg => RedditLogInputPartition(seg.file.getAbsolutePath, s, e, lease): InputPartition)
            .toArray
          RedditLog.armLease(lease, parts.length)
          lastPlan = Some((s, e, parts))
          parts
      }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new RedditLogReaderFactory

  override def deserializeOffset(json: String): Offset = RedditLogOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()  // nothing to clean up; log is immutable
  override def stop(): Unit = ()
}

/** Batch scan of the log within pushed id bounds (used by the SSE
  * server's catch-up reads and by tests). Segments entirely outside
  * (startExclusive, endInclusive] are never opened.
  */
private[sources] class RedditLogBatch(path: String,
    startExclusive: Long = -1L, endInclusive: Long = Long.MaxValue)
    extends Batch {
  // Memoized: all plan copies of one scan share this Batch (the Scan
  // caches its toBatch), so repeated planInputPartitions calls return
  // the same partitions holding ONE lease — see the streaming twin.
  private lazy val planned: Array[InputPartition] = {
    // lease BEFORE the segment snapshot (see the streaming twin above)
    val lease = RedditLog.acquireLease(path)
    val parts = RedditLog.listSegments(path)
      .filter(seg => seg.lastId > startExclusive && seg.firstId <= endInclusive)
      .map(seg => RedditLogInputPartition(seg.file.getAbsolutePath,
        startExclusive, endInclusive, lease): InputPartition)
      .toArray
    RedditLog.armLease(lease, parts.length)
    parts
  }
  override def planInputPartitions(): Array[InputPartition] = planned
  override def createReaderFactory(): PartitionReaderFactory =
    new RedditLogReaderFactory
}

/** `leaseId`: the planning-time reader lease this partition belongs to;
  * reader open/close maintain its open-reader count. A missing lease id
  * (purged after an idle lapse, or an executor JVM that never saw the
  * planning insert) is re-inserted on open so the read regains GC
  * protection (RedditLog lease section).
  */
case class RedditLogInputPartition(file: String, startExclusive: Long,
    endInclusive: Long, leaseId: Long = -1L) extends InputPartition

private[sources] class RedditLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RedditLogInputPartition]
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper()
      // Open-reader lease accounting (RedditLog lease section): the
      // lease stays active while any reader of its plan is open, across
      // however many executions Spark runs over the same partitions.
      // The file read is DEFERRED to the first next() and the increment
      // happens just before it, with `leased` balancing the close():
      // incrementing in createReader would leak the count if the eager
      // read threw, because Spark only registers the close hook after
      // createReader returns — a leaked open pins GC for the whole TTL.
      // The close targets the exact Lease OBJECT the open incremented,
      // so a TTL evict + re-insert between them cannot mis-pair counts.
      private var leased: Option[RedditLog.Lease] = None
      private var lines: Iterator[String] = _
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (lines == null) {
          // Lease keys are directory paths. p.file is absolute by
          // construction (both planning sites pass getAbsolutePath), but
          // getParent is still null for a filesystem ROOT, and
          // toAbsolutePath would resolve a relative path against the
          // EXECUTOR's CWD (≠ driver's) — fall back to the file itself
          // rather than NPE / silently re-keying the lease.
          leased = RedditLog.leaseReaderOpened(p.leaseId,
            Option(java.nio.file.Paths.get(p.file).toAbsolutePath.getParent)
              .map(_.toString).getOrElse(p.file))
          lines = new String(
            Files.readAllBytes(java.nio.file.Paths.get(p.file)), StandardCharsets.UTF_8)
            .split('\n').iterator.filter(_.nonEmpty)
        }
        while (lines.hasNext) {
          val n = mapper.readTree(lines.next())
          val id = n.get("id").asLong()
          if (id > p.startExclusive && id <= p.endInclusive) {
            def s(f: String): UTF8String = {
              val v = n.get(f)
              if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
            }
            row = InternalRow(id, s("event"), n.get("created_utc").asLong(),
              s("author"), s("subreddit"), s("domain"), s("over_18"),
              s("is_self"), s("json"))
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = {
        leased.foreach(RedditLog.leaseReaderClosed)
        leased = None
      }
    }
  }
}
