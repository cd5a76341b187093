package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A learned BPE merge table applied to a symbol array as ONE native
  * codegen pass — the tokenizer-standard compiled encoder.
  *
  * Semantics are IDENTICAL to chaining the SQL fold
  * `aggregate(rep, [], (acc, x) -> IF(last(acc) = a AND x = b,
  * merge, append))` once per merge in rank order (the form
  * [[graft.ops.TextAnalysis.bpeTrain]]'s oracle replays): merge m runs
  * one left-to-right pass, joining every position where the previous
  * OUTPUT symbol is `a` and the next INPUT symbol is `b` — BPE's
  * leftmost-non-overlapping rule (so ("a","a") over "aaa" gives
  * ["aa","a"], never ["a","aa"]). Null elements never match and pass
  * through unchanged, exactly as SQL's null-propagating `=` falls to
  * the append branch.
  *
  * Why it exists (r11-verdict item 3): the chained form ran nMerges
  * SEQUENTIAL interpreted higher-order `aggregate()` folds — one plan
  * node, one lambda interpreter, and one full array copy per merge per
  * row — which dominated t20/t21. Here the table is a compile-time
  * constant (a flat (a, b, ab) UTF8String triple array shipped via a
  * codegen reference object), and all nMerges passes run over one
  * mutable buffer in generated-call Java: O(nMerges · |word|) compares
  * with zero per-pass allocation. The expression composes inside
  * whole-stage codegen via the same static-compute idiom as
  * [[WordShingles]].
  */
case class BpeMergeFold(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "bpe_merge_fold"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_fold needs array<string>, got ${other.simpleString}")
    }

  /** Flat (a, b, ab) triples; UTF8String is comparable byte-wise against
    * array elements without a decode, and `ab` is precomputed because the
    * merge site always holds exactly `a` when it fires.
    */
  @transient private lazy val table: Array[UTF8String] =
    merges.iterator.flatMap { case (a, b) =>
      Iterator(UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + b))
    }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeMergeFold.compute(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeMergeFold.compute($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMergeFold = copy(child = newChild)
}

object BpeMergeFold {

  def compute(input: ArrayData, table: Array[UTF8String]): ArrayData = {
    val n = input.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      buf(i) = if (input.isNullAt(i)) null else input.getUTF8String(i)
      i += 1
    }
    var len = n
    var m = 0
    while (m < table.length) {
      val a = table(m); val b = table(m + 1); val ab = table(m + 2)
      var k = 0
      var j = 0
      while (j < len) {
        val x = buf(j)
        if (k > 0 && x != null && buf(k - 1) != null &&
            buf(k - 1).equals(a) && x.equals(b)) {
          buf(k - 1) = ab
        } else {
          buf(k) = x
          k += 1
        }
        j += 1
      }
      len = k
      m += 3
    }
    val out = new Array[Any](len)
    var p = 0
    while (p < len) { out(p) = buf(p); p += 1 }
    new GenericArrayData(out)
  }
}
