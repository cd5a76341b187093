package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Streaming face of the [[SeqSource]] connector — the MicroBatchStream
  * contract a cursor/service connector implements to participate in
  * Structured Streaming (reference analogue: the same paged cursor
  * `sdk/src/ReadOnlyTable.php` wraps, consumed incrementally instead of
  * all at once). The row domain is identical to the batch scan
  * (`id ∈ [lo, hi)`, `val = SeqSource.valOf(id)`), so a batch read over
  * the same options is the exact replay oracle for any streaming query.
  *
  * The three production contracts demonstrated:
  *
  *  - OFFSET TRACKING: an offset is just the next unread position
  *    ([[SeqOffset]], JSON round-trip for the checkpoint log); planning a
  *    batch is `[start, end)` range arithmetic, and recovery replays from
  *    whatever offset the checkpoint committed — deterministic, so a
  *    crash/restart yields identical batches.
  *  - ADMISSION CONTROL ([[SupportsAdmissionControl]]): the source honors
  *    `ReadLimit` (default `maxRows = batchRows`) — the backpressure knob
  *    that keeps one trigger from swallowing the whole backlog; at 100 TB
  *    this is what bounds executor memory per micro-batch.
  *  - AVAILABLE-NOW ([[SupportsTriggerAvailableNow]]): a bounded drain of
  *    everything present at start, still in `batchRows` slices — the
  *    batch-backfill-through-the-streaming-path mode.
  *
  * Each planned micro-batch splits into `parts` contiguous slices, so a
  * single trigger parallelizes like the batch scan.
  */
class SeqMicroBatchStream(lo: Long, hi: Long, parts: Int, batchRows: Long,
                          schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val perBatch = math.max(1L, batchRows)

  override def initialOffset(): Offset = SeqOffset(lo)

  override def deserializeOffset(json: String): Offset =
    SeqOffset(SeqOffset.parse(json))

  override def getDefaultReadLimit: ReadLimit =
    if (batchRows == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(perBatch)

  // SupportsAdmissionControl: the engine always calls the 2-arg form.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].pos
    val step = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => hi - s
    }
    SeqOffset(math.min(hi, s + math.max(1L, step)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def reportLatestOffset(): Offset = SeqOffset(hi)

  // The sequence is bounded and immutable: available-now needs no
  // snapshotting — `hi` already is the drain target.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset):
      Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].pos
    val e = end.asInstanceOf[SeqOffset].pos
    val total = math.max(0L, e - s)
    if (total == 0) Array.empty
    else {
      val per = math.max(1L, (total + parts - 1) / parts)
      (s until e by per).map(b =>
        SeqRange(b, math.min(b + per, e)): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Position offset: the next unread id. */
case class SeqOffset(pos: Long) extends Offset {
  override def json(): String = s"""{"pos":$pos}"""
}

object SeqOffset {
  def parse(json: String): Long =
    """-?\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(s"bad SeqOffset json: $json"))
}
