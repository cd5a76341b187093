package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 connector — the surface a reference user extends when
  * their data lives behind a cursor/service rather than files (reference:
  * `sdk/src/ReadOnlyTable.php` paged cursor reads). The source generates
  * the deterministic sequence
  *
  *   id ∈ [0, n),  val = (id * 2654435761) mod 1000000007
  *
  * and implements the two contracts that make ANY production connector
  * scale:
  *
  *  - `SupportsPushDownFilters`: range predicates on `id` narrow the scan
  *    bounds at PLANNING time, so work is proportional to the selected
  *    range, not to n (the 100 TB analogue: a service-side WHERE). Pushed
  *    filters are also RETAINED (returned as residual) because Spark
  *    semantics allow a source to be approximate; this source is exact,
  *    so it returns no residual for fully-consumed range filters.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only the
  *    projected columns (a 2-column schema here, but the mechanism is
  *    what PlanSpec pins).
  *
  * Partitioning: the [lo, hi) range splits into `parts` contiguous
  * slices — each `InputPartition` is independent, so the source
  * parallelizes like any file scan and supports the same
  * maxPartitionBytes-style sizing (here: rows per slice).
  *
  * Knuth's multiplicative constant keeps `val` uncorrelated with `id`;
  * the product stays under 2^63 for id < 3.4e9 — the supported domain
  * (documented, asserted in the builder).
  */
class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val n = properties.getOrDefault("n", "1000").toLong
    val parts = properties.getOrDefault("parts", "4").toInt
    val batchRows = properties.getOrDefault("batchRows", n.toString).toLong
    new SeqTable(n, parts, batchRows)
  }
}

object SeqSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false)))
  val MaxN: Long = 3400000000L

  def valOf(id: Long): Long = (id * 2654435761L) % 1000000007L
}

class SeqTable(n: Long, parts: Int, batchRows: Long = Long.MaxValue)
    extends Table with SupportsRead {
  require(n <= SeqSource.MaxN, s"n=$n exceeds the overflow-safe domain")
  override def name(): String = s"graftseq($n)"
  override def schema(): StructType = SeqSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, parts, batchRows)
}

class SeqScanBuilder(n: Long, parts: Int, batchRows: Long = Long.MaxValue)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = n
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.Schema
  private var countPushed = false

  // COUNT(*) over a generated range is arithmetic — COMPLETE pushdown
  // turns a 50M-row aggregation into a one-row O(1) scan (the service-
  // side `SELECT count(*)` every cursor connector should forward).
  // Filters push BEFORE aggregates, so the bounds are already narrowed.
  private def isBareCountStar(a: Aggregation): Boolean =
    a.groupByExpressions.isEmpty && a.aggregateExpressions.length == 1 &&
      a.aggregateExpressions()(0).isInstanceOf[CountStar]
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    isBareCountStar(aggregation)
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (isBareCountStar(aggregation)) { countPushed = true; true }
    else false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // v + 1 would overflow at Long.MaxValue and flip the bound; such
    // filters stay residual (Spark evaluates them row-side, still correct).
    val (taken, residual) = filters.partition {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case GreaterThan("id", v: Long) if v != Long.MaxValue =>
        lo = math.max(lo, v + 1); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) if v != Long.MaxValue =>
        hi = math.min(hi, v + 1); true
      case _ => false
    }
    accepted = taken
    residual // non-range predicates stay in the Spark-side Filter
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    if (countPushed) SeqCountScan(lo, math.max(lo, hi))
    else SeqScan(lo, math.max(lo, hi), parts, required, batchRows)
}

/** One-row result of a completely-pushed COUNT(*): the count is range
  * arithmetic, no row generation at all.
  */
case class SeqCountScan(lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count_star", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graftseq-count[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqRange(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition):
          PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow =
          new GenericInternalRow(Array[Any](hi - lo))
        override def close(): Unit = ()
      }
    }
}

case class SeqScan(lo: Long, hi: Long, parts: Int, required: StructType,
                   batchRows: Long = Long.MaxValue)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, parts, batchRows, required)
  override def description(): String = s"graftseq[$lo,$hi) cols=" +
    required.fieldNames.mkString(",")

  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    val per = math.max(1L, (total + parts - 1) / parts)
    (lo until hi by per).map(s =>
      SeqRange(s, math.min(s + per, hi)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

case class SeqRange(start: Long, end: Long) extends InputPartition

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition):
      PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SeqRange]
    val wantId = required.fieldNames.contains("id")
    val wantVal = required.fieldNames.contains("val")
    val idFirst = required.fieldNames.headOption.contains("id")
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow = {
        val vals = (wantId, wantVal) match {
          case (true, true) =>
            if (idFirst) Array[Any](cur, SeqSource.valOf(cur))
            else Array[Any](SeqSource.valOf(cur), cur)
          case (true, false) => Array[Any](cur)
          case (false, true) => Array[Any](SeqSource.valOf(cur))
          case _ => Array.empty[Any]
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
