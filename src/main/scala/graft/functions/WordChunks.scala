package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NON-OVERLAPPING fixed-size word chunks of a text column as one native
  * codegen expression — the segmenter the paragraph-dedup family
  * (d12/c7) explodes. Chunk i (0-based) is tokens [i*k, (i+1)*k) of the
  * lowercase `\S+` token stream joined by one space; the trailing partial
  * chunk is kept; fewer than one token → empty array. Token start
  * position is recoverable as `pos * k + 1` from `posexplode`.
  *
  * Semantically identical to the composed
  * `TextAnalysis.tokenChunks(TextAnalysis.tokens(text), k, 0)` chunk
  * strings — but that form runs its slice+concat lambda INTERPRETED per
  * chunk (the same cost profile WordShingles eliminated for shingles:
  * measured 7× there). One generated call tokenizes and chunks in plain
  * Java.
  */
case class WordChunks(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"chunk size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_chunks needs a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    WordChunks.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordChunks.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): WordChunks = copy(child = newChild)
}

object WordChunks {
  private val Token = java.util.regex.Pattern.compile("\\S+")

  def compute(text: UTF8String, k: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val m = Token.matcher(s)
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) toks += m.group()
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any]((n + k - 1) / k)
    val sb = new java.lang.StringBuilder()
    var c = 0
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
      i += k
    }
    new GenericArrayData(out)
  }
}
