package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Every SLIDING word k-window of a text column with its 1-based token
  * start position, as one native codegen expression — the occurrence
  * stream exact-substring dedup (Lee et al. 2021, "Deduplicating Training
  * Data Makes Language Models Better") matches on. [[WordShingles]] is
  * the DISTINCT shingle set (membership features for MinHash/Jaccard);
  * this keeps duplicates and positions because span removal needs to know
  * WHERE each repeated window sits inside the document.
  *
  * Semantics are IDENTICAL to the composed
  * `transform(sequence(1, n-k+1), i -> struct(i AS pos,
  *   concat_ws(" ", slice(tokens, i, k)) AS w))` over the lowercase `\S+`
  * token stream (empty array when fewer than k tokens), so the DuckDB
  * oracle re-derives the same strings with list_slice/array_to_string.
  * Output element: struct<pos: long, w: string>.
  */
case class WordWindowStructs(child: Expression, k: Int)
  extends UnaryExpression {
  require(k >= 1, s"window size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("w", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "word_window_structs"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_window_structs needs a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    WordWindowStructs.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordWindowStructs.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): WordWindowStructs = copy(child = newChild)
}

object WordWindowStructs {
  private val Token = java.util.regex.Pattern.compile("\\S+")

  def compute(text: UTF8String, k: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val m = Token.matcher(s)
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) toks += m.group()
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = InternalRow((i + 1).toLong, UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}
