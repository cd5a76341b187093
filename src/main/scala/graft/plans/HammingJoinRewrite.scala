package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

import graft.functions.HammingLE

/** Optimizer rule: rewrite a naive Hamming similarity join into the chunked
  * candidate equality join — the tier-(c) extension point of the engine
  * (`SparkSessionExtensions.injectOptimizerRule` via
  * [[graft.GraftExtensions]]).
  *
  * A user writes the DECLARATIVE form —
  * {{{
  *   a.join(b, hammingLE(col("code_a"), col("code_b"), 3) && ...)
  * }}}
  * — which Spark can only plan as a BroadcastNestedLoopJoin: every pair is
  * enumerated and the predicate filters them, O(n²) work that is already
  * hopeless at 10⁶ rows, never mind 100 TB. But the predicate carries
  * structure Catalyst doesn't know: by pigeonhole, two 64-bit codes within
  * Hamming distance d must agree EXACTLY on at least one of any d+1
  * disjoint bit chunks ([[graft.ops.SimHash.nearDuplicates]] hand-writes
  * this plan). This rule teaches the optimizer that fact:
  *
  *   Join(l, r, hamming_le(lc, rc, d) && rest)
  *     ==>
  *   Project(origOutput,
  *     Filter(rest && hamming_le(lc, rc, d) && firstAgreeingChunk,
  *       Join(Explode(chunks(l)), Explode(chunks(r)),
  *            l.chunkIdx = r.chunkIdx && l.chunkVal = r.chunkVal)))
  *
  * The rewritten join is a plain equality join — shuffle or broadcast hash
  * join, AQE-eligible — over (d+1)× the rows, instead of a nested loop over
  * n² pairs. `firstAgreeingChunk` keeps a surviving pair only at its FIRST
  * agreeing chunk, so each qualifying (left row, right row) pair emerges
  * exactly once: output multiplicity is identical to the naive join's (a
  * DISTINCT here would instead collapse value-equal duplicate input rows —
  * a semantic change).
  *
  * Fires only when the join would otherwise have NO equality conjunct (it
  * would be a nested loop); if a real equi-key exists, the hash join on
  * that key is already the right plan and the predicate stays a residual
  * filter. That guard also makes the rule convergent: after the rewrite
  * (or after filter-pushdown folds the residual back into the join), the
  * join has equality conjuncts and can never match again. Kill switch:
  * `spark.graft.hammingJoinRewrite=false`.
  *
  * LEFT SEMI / LEFT ANTI similarity joins (the blocklist shape — "drop
  * every document within Hamming d of a denylisted fingerprint") rewrite
  * differently: whether a left row matches depends only on its CODE, so
  * the distinct left codes chunk-join the right side once, and the
  * original join becomes an equality semi/anti join against the matched
  * code set — the preserved side's multiplicity is never touched.
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.hammingJoinRewrite"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  /** (shift, width) of d+1 disjoint chunks covering all 64 bits. */
  private def chunkBounds(nChunks: Int): Seq[(Int, Int)] = {
    val base = 64 / nChunks
    (0 until nChunks).map { k =>
      val shift = k * base
      (shift, if (k == nChunks - 1) 64 - shift else base)
    }
  }

  private def chunkExpr(code: Expression, shift: Int, width: Int): Expression = {
    val shifted =
      if (shift == 0) code else ShiftRightUnsigned(code, Literal(shift))
    if (width >= 64) shifted
    else BitwiseAnd(shifted, Literal((1L << width) - 1L))
  }

  /** An equality conjunct across the two sides means Catalyst already has a
    * hash-join key — the nested loop this rule exists to kill isn't there.
    */
  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(x, y) => acrossSides(x, y, left, right)
      case EqualNullSafe(x, y) => acrossSides(x, y, left, right)
      case _ => false
    }

  private def acrossSides(x: Expression, y: Expression, left: LogicalPlan,
                          right: LogicalPlan): Boolean =
    (x.references.subsetOf(left.outputSet) &&
      y.references.subsetOf(right.outputSet)) ||
      (x.references.subsetOf(right.outputSet) &&
        y.references.subsetOf(left.outputSet))

  /** The chunked candidate join: both sides exploded on their d+1 code
    * chunks, hash-joined on (chunk_idx, chunk_val), then filtered by
    * `residual` plus the first-agreeing-chunk dedup (each qualifying
    * (left row, right row) pair survives exactly once).
    */
  private def chunkedJoin(left: LogicalPlan, right: LogicalPlan,
                          lCode: Expression, rCode: Expression, d: Int,
                          residual: Seq[Expression],
                          hint: JoinHint): LogicalPlan = {
    val bounds = chunkBounds(d + 1)
    def explodeSide(child: LogicalPlan, code: Expression,
                    tag: String): (LogicalPlan, Attribute, Attribute) = {
      val arr = CreateArray(bounds.map { case (s, w) =>
        chunkExpr(code, s, w)
      })
      val elemNullable = arr.dataType.asInstanceOf[ArrayType].containsNull
      val pos = AttributeReference(s"__graft_${tag}_chunk_idx",
        IntegerType, nullable = false)()
      val v = AttributeReference(s"__graft_${tag}_chunk_val",
        LongType, nullable = elemNullable)()
      (Generate(PosExplode(arr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(pos, v), child = child), pos, v)
    }
    val (lG, lPos, lVal) = explodeSide(left, lCode, "l")
    val (rG, rPos, rVal) = explodeSide(right, rCode, "r")
    val newJoin = Join(lG, rG, Inner,
      Some(And(EqualTo(lPos, rPos), EqualTo(lVal, rVal))), hint)
    // index of the FIRST chunk the two codes agree on
    val firstIdx = bounds.zipWithIndex.foldRight(
      Literal(-1): Expression) { case (((s, w), k), els) =>
      If(EqualTo(chunkExpr(lCode, s, w), chunkExpr(rCode, s, w)),
        Literal(k), els)
    }
    Filter((residual :+ EqualTo(lPos, firstIdx)).reduce(And), newJoin)
  }

  /** Find the HammingLE conjunct whose sides split across the join.
    * `oriented = true` (semi/anti) requires a from left / b from right;
    * inner joins accept either orientation. d <= 15 keeps chunks >= 4
    * bits wide; beyond that the chunk join degenerates (tiny chunks
    * collide constantly) and the nested loop is honestly the better plan.
    */
  private def findHamming(conjuncts: Seq[Expression], left: LogicalPlan,
                          right: LogicalPlan, oriented: Boolean):
      Option[(Expression, Expression, Int)] =
    conjuncts.collectFirst {
      case HammingLE(a, b, d)
          if d <= 15 && a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet) &&
            a.references.nonEmpty && b.references.nonEmpty =>
        (a, b, d)
      case HammingLE(a, b, d)
          if !oriented && d <= 15 &&
            a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet) &&
            a.references.nonEmpty && b.references.nonEmpty =>
        (b, a, d)
    }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hit =
          if (hasEquiKey(conjuncts, left, right)) None
          else findHamming(conjuncts, left, right, oriented = false)
        hit match {
          case None => j
          case Some((lCode, rCode, d)) =>
            Project(j.output,
              chunkedJoin(left, right, lCode, rCode, d, conjuncts, hint))
        }

      // Semi/anti similarity joins — the blocklist shape: "keep/drop left
      // rows within Hamming d of some right row". Whether a left row
      // matches depends ONLY on its code value, so the rewrite computes
      // the DISTINCT left codes, chunk-joins that (small) code set against
      // the right side, and turns the original join into a plain equality
      // semi/anti join on the matched-code set — exploding the preserved
      // side directly would corrupt its multiplicity. Only fires when the
      // hamming predicate is the WHOLE condition: any other cross-side
      // conjunct makes matching row-dependent, and the nested loop stays.
      case j @ Join(left, right, jt @ (LeftSemi | LeftAnti), Some(cond),
          hint) =>
        splitConjunctivePredicates(cond) match {
          case Seq(h: HammingLE) =>
            findHamming(Seq(h), left, right, oriented = true) match {
              case None => j
              case Some((lCode, rCode, d)) =>
                val codeAlias = Alias(lCode, "__graft_code")()
                val codeAttr = codeAlias.toAttribute
                val lCodes = Aggregate(Seq(codeAttr), Seq(codeAttr),
                  Project(Seq(codeAlias), left))
                val matched = chunkedJoin(lCodes, right, codeAttr, rCode,
                  d, Seq(HammingLE(codeAttr, rCode, d)), JoinHint.NONE)
                val matchedCodes = Aggregate(Seq(codeAttr), Seq(codeAttr),
                  Project(Seq(codeAttr), matched))
                Join(left, matchedCodes, jt,
                  Some(EqualTo(lCode, codeAttr)), hint)
            }
          case _ => j
        }
    }
  }
}
