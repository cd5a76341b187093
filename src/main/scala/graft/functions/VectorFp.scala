package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Exact fixed-point dot product of two numeric arrays, as a native codegen
  * Catalyst expression — the ANN/near-dup scoring primitive.
  *
  * Semantics are IDENTICAL to the composed form
  * `aggregate(zip_with(a, b, (x,y) => round(x*y*1e12).cast("long")), 0L, _+_)`
  * (each elementwise product rounded HALF_UP at 1e-12 via
  * `BigDecimal.valueOf` — the same path Spark's `round` takes — then summed
  * as int64, so the result is order-independent exact integer arithmetic the
  * DuckDB oracle reproduces bit-for-bit). Null array, length mismatch, or a
  * null element yields null, exactly as the padded `zip_with` form does.
  *
  * Why it exists: higher-order-function lambdas evaluate INTERPRETED, one
  * virtual call per element — scoring candidate pairs dominated the
  * LSH/brute-force ANN paths. This expression is a tight generated loop
  * inside whole-stage codegen (no boxing, no lambda dispatch); swapping it
  * in cut pair scoring by roughly the lambda overhead (~3×) while keeping
  * hash parity with the oracle.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fp_dot"

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if (a == FloatType || a == DoubleType) && a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fp_dot needs two array<float> or two array<double>, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (elemIsFloat)
      VectorFp.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VectorFp.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val fn = if (elemIsFloat) "dotFloat" else "dotDouble"
    // fresh local name: several dots commonly share one codegen scope
    // (cosine = dot + two norms in a single projection)
    val tmp = ctx.freshName("graftDot")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long $tmp = graft.functions.VectorFp.$fn($a, $b);
      |if ($tmp == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $tmp.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket key as a native codegen expression: bit j of
  * the result is set when (plane_j · x) > 0, with the plane dot computed in
  * exact fixed-point (each element rounded HALF_UP at 1e-6, multiplied by a
  * deterministic ±1 sign, summed as int64) — identical values to the
  * composed HOF form and to the DuckDB oracle's SQL derivation.
  *
  * The ±1 sign matrix (parity of the first hex digit of md5(s"${j}_${i}"))
  * is a STATIC table computed once per JVM — the md5 arguments are
  * constants, so evaluating them per row (the naive HOF spelling) was pure
  * overhead, and even the literal-array spelling pays per-row slice/lambda
  * dispatch. Here the whole bucket is one generated loop.
  */
case class LshBucket(child: Expression, nPlanes: Int, planeOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nPlanes > 0 && planeOffset >= 0 &&
    planeOffset + nPlanes <= VectorFp.MaxPlanes,
    s"need 0 <= offset and offset + nPlanes <= ${VectorFp.MaxPlanes}, " +
      s"got offset=$planeOffset nPlanes=$nPlanes")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bucket"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket needs array<float> or array<double>, got " +
            other.simpleString)
    }

  override def nullSafeEval(input: Any): Any =
    if (elemIsFloat)
      VectorFp.lshBucketFloat(input.asInstanceOf[ArrayData], nPlanes,
        planeOffset)
    else
      VectorFp.lshBucketDouble(input.asInstanceOf[ArrayData], nPlanes,
        planeOffset)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val fn = if (elemIsFloat) "lshBucketFloat" else "lshBucketDouble"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorFp.$fn($c, $nPlanes, $planeOffset)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object VectorFp {
  final val Scale = 1e12
  final val MaxPlanes = 16

  /** Dimensions covered by the static sign matrix; longer vectors are
    * bucketed on their first MaxDim components.
    */
  final val MaxDim = 1024

  /** Deterministic ±1 hyperplane matrix: +1 when the first hex digit of
    * md5(s"${j}_${i}") is even — the engine-portable scheme the DuckDB
    * oracle reproduces in SQL.
    */
  lazy val signs: Array[Array[Long]] = Array.tabulate(MaxPlanes) { j =>
    Array.tabulate(MaxDim) { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${j}_${i}".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
    }
  }

  /** round at 1e-6, same HALF_UP decimal path as [[roundFp]]. */
  @inline private def roundFp6(p: Double): Long =
    java.math.BigDecimal.valueOf(p)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** A null element nulls EVERY plane dot in the composed HOF form, and
    * `when(null > 0, bit).otherwise(0)` takes the otherwise branch — so the
    * whole bucket collapses to 0. Mirrored here for exact parity.
    */
  def lshBucketFloat(a: ArrayData, nPlanes: Int, offset: Int): Long = {
    val n = math.min(a.numElements(), MaxDim)
    val fp = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L
      fp(i) = roundFp6(a.getFloat(i).toDouble * 1e6)
      i += 1
    }
    bucketOf(fp, nPlanes, offset)
  }

  def lshBucketDouble(a: ArrayData, nPlanes: Int, offset: Int): Long = {
    val n = math.min(a.numElements(), MaxDim)
    val fp = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L
      fp(i) = roundFp6(a.getDouble(i) * 1e6)
      i += 1
    }
    bucketOf(fp, nPlanes, offset)
  }

  /** Bit j (0-based within the table) is set when plane `offset + j` has a
    * positive dot — an `offset` of t*nPlanes gives table t of an ensemble
    * its own disjoint slice of the static sign matrix (independent tables,
    * one matrix, no per-table hashing).
    */
  private def bucketOf(fp: Array[Long], nPlanes: Int, offset: Int): Long = {
    var b = 0L
    var j = 0
    while (j < nPlanes) {
      val sj = signs(offset + j)
      var s = 0L
      var i = 0
      while (i < fp.length) { s += sj(i) * fp(i); i += 1 }
      if (s > 0) b |= 1L << j
      j += 1
    }
    b
  }

  /** round(p) exactly as Spark's `Round`/DuckDB `round` do for doubles:
    * decimal HALF_UP on the canonical (Double.toString) representation.
    */
  @inline private def roundFp(p: Double): Long =
    java.math.BigDecimal.valueOf(p)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def dotFloat(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null // zip_with pads → null sum
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += roundFp(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def dotDouble(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += roundFp(a.getDouble(i) * b.getDouble(i) * Scale)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

}
