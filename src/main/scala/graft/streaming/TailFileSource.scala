package graft.streaming

import java.io.RandomAccessFile
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Single-growing-file tail as a native DataSource-V2 micro-batch source
  * (SURVEY.md §2.1 S1) — the literal Spark form of the reference's
  * `tailer.follow(open(file))` loop (`/root/reference/src/collector.py:45,
  * 54`): ONE file that gets appended to, not a directory of immutable
  * files (that variant is [[MvPipeline.start]]'s built-in `text` source).
  *
  * Offsets are byte positions of the end of the last COMPLETE line, so a
  * half-written line (the collector's live-append case) is never emitted
  * and is picked up once its newline lands. Offsets checkpoint through the
  * engine's WAL — restart resumes mid-file, which is strictly stronger
  * than the reference (tailer re-reads or drops on restart).
  *
  * Scale/deployment notes: a tail source is inherently single-writer —
  * the file must be visible to the cluster (DFS or single-node, matching
  * the reference's one-host collector). A backlog arrives as one
  * partition per micro-batch (the parse/aggregate stages behind it are
  * what fan out); bound first-batch size with rotation or the directory
  * source if a cold start must catch up terabytes.
  */
object TailFileSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType, nullable = false)))

  /** Byte offset just past the final '\n' (0 if none / file missing):
    * the boundary of complete-line data. Scans backward from EOF, so cost
    * is O(partial tail), not O(file). */
  def completeEnd(path: String): Long = {
    val f = new java.io.File(path)
    if (!f.isFile) return 0L
    val raf = new RandomAccessFile(f, "r")
    try {
      var pos = raf.length() - 1
      while (pos >= 0) {
        raf.seek(pos)
        if (raf.read() == '\n') return pos + 1
        pos -= 1
      }
      0L
    } finally raf.close()
  }
}

/** `spark.readStream.format(classOf[TailFileProvider].getName).load(file)`. */
class TailFileProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = TailFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TailFileTable(properties.get("path"))
}

class TailFileTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "tail source requires a file path: .load(<file>)")
  override def name(): String = s"tail:$path"
  override def schema(): StructType = TailFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = TailFileSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TailFileMicroBatchStream(path)
    }
}

/** Offset = byte position after the last complete line consumed. */
case class TailOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

case class TailRange(path: String, start: Long, end: Long) extends InputPartition

class TailFileMicroBatchStream(path: String) extends MicroBatchStream with SupportsTriggerAvailableNow {
  // AvailableNow contract: pin the end position ONCE, so the query drains
  // exactly the data present at start and stops even while appends continue
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(TailFileSource.completeEnd(path))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // clamp to the committed start: a truncated-in-place file must never
    // REGRESS the offset (Spark would commit the smaller offset and
    // re-read re-grown bytes as if new — double counting). Truncation
    // therefore reads as "no new data" until the file regrows past the
    // committed position; rotation deployments use the directory source.
    val s = start.asInstanceOf[TailOffset].pos
    TailOffset(math.max(s, availableNowTarget.getOrElse(TailFileSource.completeEnd(path))))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control latestOffset(start, limit) is used")
  override def initialOffset(): Offset = TailOffset(0L)
  override def deserializeOffset(json: String): Offset = TailOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset].pos
    val e = end.asInstanceOf[TailOffset].pos
    if (e <= s) Array.empty else Array(TailRange(path, s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory = new TailReaderFactory
}

class TailReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[TailRange]
    new PartitionReader[InternalRow] {
      private val bytes: Array[Byte] = {
        val span = r.end - r.start
        // one micro-batch materializes its range: refuse a >2GB cold-start
        // backlog loudly (bound it with rotation or the directory source)
        require(span <= Int.MaxValue - 8,
          s"tail micro-batch spans $span bytes; catch up a large backlog via the directory source")
        val raf = new RandomAccessFile(r.path, "r")
        try {
          raf.seek(r.start)
          val b = new Array[Byte](span.toInt)
          raf.readFully(b)
          b
        } finally raf.close()
      }
      private var from = 0
      private var line: Array[Byte] = _

      override def next(): Boolean = {
        if (from >= bytes.length) return false
        var nl = from
        while (nl < bytes.length && bytes(nl) != '\n') nl += 1
        // range ends on a complete-line boundary, so nl < length always;
        // strip an optional '\r' (CRLF logs)
        val to = if (nl > from && bytes(nl - 1) == '\r') nl - 1 else nl
        line = util.Arrays.copyOfRange(bytes, from, to)
        from = nl + 1
        true
      }
      override def get(): InternalRow = InternalRow(UTF8String.fromBytes(line))
      override def close(): Unit = ()
    }
  }
}
