package graft.streaming

import java.io.{BufferedInputStream, BufferedReader, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Replayable offset-tracked streaming source over an append-only
  * segment file — the Kafka SHAPE without the broker (VERDICT r15 #4):
  * numeric offsets, deterministic replay of any committed range, and
  * exactly-once resumption across a query restart from the offset the
  * checkpoint WAL recorded. The built-in socket source exercises the
  * NON-replayable contract (at-most-once, offsets index a driver
  * buffer a restart empties — StreamStages.socketSource); this source
  * is the other half of the `sc.fromStream` production-ingest mapping
  * (reference: D/ScalaSparkProgram-sparkprogram.md:32, SURVEY §2.2),
  * built on the public DataSourceV2 `MicroBatchStream` API the real
  * Kafka connector uses.
  *
  * Contract (the Kafka analogy, item by item):
  *  - the segment is an append-only newline-delimited UTF-8 file;
  *    record offset = line index, monotone, never reassigned;
  *  - the high watermark is the count of COMPLETE (newline-terminated)
  *    lines — a torn trailing line a producer is mid-append on is
  *    invisible until its newline lands, so a planned batch range
  *    [start, end) only ever covers fully-committed records;
  *  - `latestOffset` reads the watermark; `planInputPartitions(a, b)`
  *    replays records [a, b) bit-identically whenever asked (append-
  *    only ⇒ a committed range never changes) — this is what makes
  *    restart recovery EXACTLY-once where the socket source's is
  *    at-most-once: after a crash/stop, Spark re-plans the WAL's
  *    uncommitted range and gets the same rows;
  *  - `commit(end)` is where Kafka would advance a consumer-group /
  *    retention watermark; a file segment retains everything, so it is
  *    a no-op here.
  *
  * Scale posture: one segment FILE maps to one Kafka PARTITION — the
  * unit of ordering and of reader parallelism. A production topic is
  * many segment files read by many tasks (offset per segment, exactly
  * this class per segment); a single local segment is deliberately
  * planned as ONE InputPartition per micro-batch because intra-segment
  * ordering is the contract and a line-skip split of one file buys
  * re-scans, not parallelism. Schema is fixed (`offset LONG, value
  * STRING`) like Kafka's record envelope; payload parsing is the
  * query's job (the gate splits `value`, production would from_json).
  *
  * Implements [[SupportsTriggerAvailableNow]] so Trigger.AvailableNow
  * drains to the watermark captured at query start and terminates —
  * the gate/replay shape — without the AvailableNowDataStreamWrapper
  * fallback.
  */
object SegmentSource {
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** High watermark: complete ('\n'-terminated) records in the
    * segment. A missing file is an empty segment (offset 0) — the
    * producer may not have created it yet.
    */
  def completeRecords(path: String): Long = {
    val f = new java.io.File(path)
    if (!f.isFile) return 0L
    val in = new BufferedInputStream(new FileInputStream(f), 1 << 16)
    try {
      var n = 0L
      var b = in.read()
      while (b >= 0) {
        if (b == '\n') n += 1
        b = in.read()
      }
      n
    } finally in.close()
  }
}

/** Registered via `.format(classOf[SegmentSourceProvider].getName)`. */
class SegmentSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SegmentSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SegmentTable(properties.get("path"))
}

final class SegmentTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "segment source requires option 'path'")
  override def name(): String = s"segment($path)"
  override def schema(): StructType = SegmentSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SegmentSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SegmentMicroBatchStream(path)
      }
    }
}

/** Record-count offset; `json()` is the bare number — stable,
  * human-readable in the checkpoint WAL, and round-tripped by
  * [[SegmentMicroBatchStream.deserializeOffset]].
  */
final case class SegmentOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class SegmentMicroBatchStream(path: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // AvailableNow: the watermark frozen at query start — every batch in
  // the run plans against it, so the query drains to a fixed point and
  // terminates even while a producer keeps appending
  @volatile private var fixedEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    fixedEnd = Some(SegmentSource.completeRecords(path))

  override def initialOffset(): Offset = SegmentOffset(0L)

  override def latestOffset(): Offset =
    SegmentOffset(fixedEnd.getOrElse(SegmentSource.completeRecords(path)))

  /** Admission-control variant (SupportsTriggerAvailableNow extends
    * SupportsAdmissionControl): this source reads all available per
    * batch — rate limiting for a file segment is the trigger
    * interval's job, so the limit is ignored (ReadLimit.allAvailable
    * is the default this class advertises).
    */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset =
    latestOffset()

  override def reportLatestOffset(): Offset =
    SegmentOffset(SegmentSource.completeRecords(path))

  override def deserializeOffset(json: String): Offset =
    SegmentOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[SegmentOffset].n
    val b = end.asInstanceOf[SegmentOffset].n
    if (a >= b) Array.empty
    // one partition per (segment, batch): the segment is the ordering
    // unit (class doc) — parallelism comes from many segments
    else Array(SegmentSlice(path, a, b))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SegmentReaderFactory

  /** Kafka analog: consumer-group progress / retention advance — a
    * retained file segment has nothing to release.
    */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Serializable task descriptor: replay records [start, end) of the
  * segment (the executor re-opens the file — at scale the path is a
  * shared filesystem / object-store key, like a Kafka fetch).
  */
final case class SegmentSlice(path: String, start: Long, end: Long)
    extends InputPartition

final class SegmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[SegmentSlice]
    new PartitionReader[InternalRow] {
      private val reader = new BufferedReader(new InputStreamReader(
        new FileInputStream(s.path), StandardCharsets.UTF_8), 1 << 16)
      private var idx = 0L
      private var line: String = null
      // skip to the slice start: records [0, start) were prior batches'
      // (an O(offset) scan per batch — acceptable because segments
      // roll; a byte-indexed segment would seek, but record offsets
      // are the Kafka-shaped contract this source exists to prove)
      while (idx < s.start && { line = reader.readLine(); line != null }) idx += 1

      override def next(): Boolean =
        if (idx >= s.end) false
        else {
          line = reader.readLine()
          // a planned range only covers records complete at planning
          // time (append-only) — running out early means the segment
          // was truncated/rewritten, which breaks the replay contract
          if (line == null) throw new IllegalStateException(
            s"segment ${s.path} truncated: record $idx missing from " +
              s"planned range [${s.start}, ${s.end})")
          idx += 1
          true
        }

      override def get(): InternalRow =
        InternalRow(idx - 1, UTF8String.fromString(line))

      override def close(): Unit = reader.close()
    }
  }
}
