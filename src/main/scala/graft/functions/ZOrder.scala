package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order interleave of two non-negative integer keys (low
  * [[ZOrder2.Bits]] bits each): bit i of `left` lands at bit 2i, bit i of
  * `right` at 2i+1 — `z_order(x, y)` as a codegen'd scalar.
  *
  * This is a DATA LAYOUT primitive, not a query operator: writing a table
  * `ORDER BY z_order(a, b)` clusters rows so every consecutive file/row
  * group covers a bounded range of BOTH keys (a row-major sort bounds only
  * the trailing key). Parquet min/max footer stats then prune scans
  * filtered on EITHER dimension — the multi-dimensional analogue of the
  * partition pruning PlanSpec pins, and at 100 TB the difference between
  * reading 1/√P of the files and all of them for a selective 2-D
  * predicate. `ZOrderSpec` pins the guarantee operationally: chunks of
  * the z-sorted order have worst-dimension span ~√(chunk area), while any
  * row-major sort leaves one dimension unbounded.
  *
  * Negative inputs are rejected at runtime (layout keys are surrogate ids
  * or bucketed/offset values; silently masking sign bits would interleave
  * garbage).
  */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_order needs (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder2.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.ZOrder2.interleave($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Bits taken from each key; 21+21 = 42-bit z-values stay well inside
    * a long and cover surrogate-id ranges to 2M.
    */
  val Bits = 21

  def interleave(x: Long, y: Long): Long = {
    require(x >= 0 && y >= 0, s"z_order needs non-negative keys, got ($x, $y)")
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
