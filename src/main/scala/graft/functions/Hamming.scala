package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType

/** `bit_count(left XOR right) <= maxDist` over two 64-bit codes — the
  * similarity-join predicate, as a native codegen expression.
  *
  * Semantically this is nothing more than the composed
  * `bit_count(l ^ r) <= d`, and it evaluates exactly like it (null if
  * either side is null). It exists as a DISTINCT expression so the plan
  * layer can recognize the intent: a join whose condition carries a
  * `HammingLE` conjunct is a similarity join, and
  * [[graft.plans.HammingJoinRewrite]] rewrites it from the O(n²)
  * nested-loop plan Spark would otherwise run into the chunked
  * equality-join plan (the declarative form of the chunk trick
  * [[graft.ops.SimHash.nearDuplicates]] spells out by hand).
  *
  * `maxDist` is a constructor parameter, not a child: the distance bound
  * shapes the rewrite (d+1 chunks), it is not per-row data.
  */
case class HammingLE(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression with Predicate {
  require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")

  override def prettyName: String = "hamming_le"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hamming_le needs two BIGINT codes, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^
      b.asInstanceOf[Long]) <= maxDist

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"(java.lang.Long.bitCount($a ^ $b) <= $maxDist)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingLE =
    copy(left = newLeft, right = newRight)
}
