package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, 2005) as a native
  * typed-imperative aggregate — fixed-memory approximate frequencies for a
  * 100 TB column: `depth × width` counters, update adds 1 to one counter
  * per row, a point query reads the MINIMUM across the `depth` rows
  * (never an underestimate; overestimate ≤ εN w.h.p. for width ≈ 2/ε).
  *
  * Unlike [[MisraGriesAgg]], whose stored counters depend on merge order,
  * CM counters are plain SUMS — the sketch is bit-identical under any
  * partitioning or merge tree, so point ESTIMATES (not just exact
  * recounts) sit under the hash-equality oracle gate: the DuckDB mirror
  * recomputes each cell as a collision-group count with the same
  * md5-based universal hash family the engine uses
  * (`(2j+1)·h + 7919j + 13 mod p mod width`, `h` = 60-bit md5 prefix mod
  * p — the [[MinHashSig]] scheme, reproducible in any engine with md5 and
  * 64-bit ints).
  *
  * Merging is elementwise addition, so the map-side combine carries one
  * `depth·width` array per task — no per-item state ever shuffles. Null
  * inputs are skipped (SQL aggregate convention). Output is the flattened
  * counter array, row-major (`row j`, `cell b` at index `j·width + b`).
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width >= 2, s"count_min width must be >= 2, got $width")
  require(depth >= 1 && depth <= 16,
    s"count_min depth must be in [1,16], got $depth")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_min needs a string column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](width * depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.base(v.asInstanceOf[UTF8String].getBytes)
      var j = 0
      while (j < depth) {
        buf(j * width + CountMin.bucketOf(h, j, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** The shared hash: callers computing point-query cells for plan-constant
  * items (driver side) use exactly the arithmetic `update` uses.
  */
object CountMin {
  final val Mod = 2147483647L // 2^31 - 1, prime

  /** 60-bit md5 prefix reduced mod p — first 15 hex digits, the
    * [[MinHashSig.compute]] / `baseHash` scheme.
    */
  def base(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v = (v << 4) | ((d(7) >> 4) & 0xfL)
    v % Mod
  }

  def bucketOf(h: Long, j: Int, width: Int): Int =
    (((2L * j + 1L) * h + 7919L * j + 13L) % Mod % width).toInt

  def bucket(item: String, j: Int, width: Int): Int =
    bucketOf(base(item.getBytes("UTF-8")), j, width)
}
