package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 WRITE path that exists to pin the COMMIT PROTOCOL —
  * the contract that makes distributed writes exactly-once at 100 TB:
  *
  *  1. each task buffers rows and publishes them ONLY inside its commit
  *     message (`DataWriter.commit`);
  *  2. a failed/duplicate task attempt is `abort()`ed — its buffered rows
  *     are discarded, never visible;
  *  3. the driver's `BatchWrite.commit` publishes the union of exactly
  *     one committed message per partition, atomically.
  *
  * The store is a JVM-local map (the tests run local-mode, executors
  * share the JVM), standing in for a real destination's staging+rename /
  * transaction. `flaky=true` makes the FIRST attempt of partition 0
  * throw after buffering — `WriteCommitSpec` proves the retried task's
  * rows appear exactly once and the aborted attempt's rows never do.
  */
object MemSink {
  val tables = new ConcurrentHashMap[String, Seq[(Long, Long)]]()
  val flakeArmed = new AtomicBoolean(false)
  val aborted = new java.util.concurrent.atomic.AtomicInteger(0)

  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false)))
}

class MemSinkProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemSink.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemSinkTable(properties.getOrDefault("table", "default"),
      properties.getOrDefault("flaky", "false").toBoolean)
}

class MemSinkTable(tableName: String, flaky: Boolean)
    extends Table with SupportsWrite {
  override def name(): String = s"memsink($tableName)"
  override def schema(): StructType = MemSink.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new MemBatchWrite(tableName, flaky)
      }
    }
}

/** One committed task's rows — the ONLY channel to visibility. */
case class RowsMessage(partitionId: Int, rows: Seq[(Long, Long)])
    extends WriterCommitMessage

class MemBatchWrite(tableName: String, flaky: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo):
      DataWriterFactory = new MemWriterFactory(flaky)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // driver-side atomic publish: union of exactly one message/partition
    val all = messages.collect { case RowsMessage(_, rows) => rows }
      .flatten.toSeq
    MemSink.tables.put(tableName, all)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    MemSink.tables.remove(tableName)
}

class MemWriterFactory(flaky: Boolean) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long):
      DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    override def write(record: InternalRow): Unit =
      buf += ((record.getLong(0), record.getLong(1)))
    override def commit(): WriterCommitMessage = {
      // first attempt of partition 0 dies AFTER buffering everything —
      // the exactly-once property must come from the protocol, not luck
      if (flaky && partitionId == 0 &&
          MemSink.flakeArmed.compareAndSet(true, false))
        throw new RuntimeException("injected task failure before commit")
      RowsMessage(partitionId, buf.toSeq)
    }
    override def abort(): Unit = {
      MemSink.aborted.incrementAndGet()
      buf.clear()
    }
    override def close(): Unit = ()
  }
}
