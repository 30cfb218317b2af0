package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** File-backed, integer-keyed append-only event log — the stand-in for the
  * reference's Redis logs (`rc:id:<n>` / `rs:id:<n>` hashes with a
  * `max_id` high-watermark — /root/reference/sse.py:86-96, 148-152).
  *
  * Layout: one directory per event type, segment files named
  * `seg-<firstId>-<lastId>.jsonl`, one JSON envelope object per line.
  * The id range in the *name* is the contract: the high-watermark (S1)
  * is the max `lastId` over the listing — no data read needed — and a
  * range scan (S2) only opens segments overlapping the requested ids.
  * Ids may have gaps inside segments (S3 gap-skip falls out naturally:
  * a missing id is simply never emitted, and offsets advance past it).
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

  final case class Segment(file: File, firstId: Long, lastId: Long)

  private val SegName = """seg-(\d+)-(\d+)\.jsonl""".r

  def listSegments(dir: String): Seq[Segment] = {
    val d = new File(dir)
    if (!d.isDirectory) Nil
    else d.listFiles().toSeq.flatMap { f =>
      f.getName match {
        case SegName(a, b) => Some(Segment(f, a.toLong, b.toLong))
        case _             => None
      }
    }.sortBy(_.firstId)
  }

  /** S1 — high-watermark from segment names alone. -1 on an empty log. */
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
    val tmp = Files.createTempFile(Paths.get(dir), ".seg-", ".tmp")
    Files.write(tmp, lines.asJava)
    Files.move(tmp, Paths.get(dir, s"seg-${ids.min}-${ids.max}.jsonl"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read raw envelope lines of segments overlapping (startExclusive,
    * endInclusive], filtered to that id range.
    */
  def readRange(dir: String, startExclusive: Long, endInclusive: Long): Seq[Map[String, String]] = {
    val mapper = new ObjectMapper()
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
