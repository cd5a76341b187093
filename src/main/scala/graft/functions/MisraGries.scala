package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries, "Finding repeated
  * elements", 1982) as a native typed-imperative aggregate — the one-pass,
  * fixed-memory scale path for "which items dominate a 100 TB column".
  *
  * The summary keeps at most `k` (item, counter) pairs. Guarantee: for any
  * item with true frequency f over N rows, its stored counter c satisfies
  * f - N/(k+1) <= c <= f — so every item with f > N/(k+1) is PRESENT in
  * the summary, whatever the input order. Merging two summaries adds
  * counters and, when more than k survive, subtracts the (k+1)-th largest
  * counter from all and drops the non-positive ones (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) — the error bounds ADD across merges,
  * so the partial-aggregate → final-merge path Spark runs preserves the
  * guarantee with the SAME k. That mergeability is what makes this a true
  * map-side-combinable aggregate: each task summarizes its partition in
  * O(k) memory, the shuffle carries one k-entry summary per task, and no
  * exact per-item counts ever move.
  *
  * Stored counters are order-dependent (different merge trees shave
  * different amounts), so the summary is a CANDIDATE GENERATOR, not a
  * result: callers re-count the <= k candidates exactly (one cheap
  * broadcast-semi-join pass) and threshold on the exact counts — that
  * final answer is deterministic and oracle-checkable
  * (`SparkEntry.queries("a12_heavy_hitters")`). Only presence is
  * guaranteed; that is the property the recount needs.
  *
  * Null inputs are skipped (SQL aggregate convention). Output is the
  * summary as array<struct<item string, mg_count long>> sorted by item.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries capacity must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("mg_count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"misra_gries needs a string column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // Decrement-all step: every counter pays one; zeros drop out.
          // O(k) per evicting row, amortized O(1) per decremented count.
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { ky =>
            val c = buf(ky) - 1
            if (c <= 0) dead += ky else buf.update(ky, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // Keep the k largest: subtract the (k+1)-th largest counter from all
      // (the mergeable-summaries reduction — equivalent to that many
      // decrement-all steps at once).
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { ky =>
        val c = buf(ky) - cut
        if (c <= 0) dead += ky else buf.update(ky, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy(_._1).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
