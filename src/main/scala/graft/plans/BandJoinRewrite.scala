package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a naive band join — `abs(a - b) <= d` across the
  * two sides of a join, the workhorse predicate of entity-resolution
  * blocking and numeric-tolerance matching — into a bucket equality join.
  * The second member of the engine's declarative-similarity-join family
  * ([[HammingJoinRewrite]] is the first; both inject through
  * [[graft.GraftExtensions]]).
  *
  * Spark plans the naive form as a BroadcastNestedLoopJoin: every pair is
  * enumerated, O(n·m). But the predicate is EXACTLY rewritable: bucket
  * both sides by integer division with width w = d+1. Integer division is
  * monotone and every bucket interval spans >= w > d values, so two values
  * within d of each other land in the same or adjacent buckets — the right
  * side explodes to its three candidate buckets {b-1, b, b+1}, the join
  * becomes an equality join on the bucket id, and the original predicate
  * refines the candidates. A (left row, right row) pair can only meet at
  * the left row's single bucket id, so — unlike the Hamming chunk join —
  * no first-agreeing-chunk dedup is needed: multiplicity is preserved by
  * construction. (This is [[graft.ops.RangeJoin]]'s bin trick, taught to
  * the optimizer; truncate-toward-zero division just makes the bucket
  * straddling zero wider — still >= w — so no floor correction is needed.)
  *
  * Fires only when the join would otherwise have NO equality conjunct: if
  * a real equi-key exists, the hash join on that key with the band as a
  * residual filter is already the right plan. The guard also makes the
  * rule convergent — the rewritten join HAS an equality conjunct and can
  * never match again. 3× replication of the right side is the entire
  * cost; the rule puts the explode on the join's right input, so put the
  * smaller relation there. Kill switch: `spark.graft.bandJoinRewrite=false`.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.bandJoinRewrite"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asLongLiteral(e: Expression): Option[Long] = e match {
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** Find `abs(x - y) <= d` (or `d >= abs(x - y)`) with x, y integral and
    * split across the join sides. Returns (leftExpr, rightExpr, d).
    */
  private def findBand(conjuncts: Seq[Expression], left: LogicalPlan,
                       right: LogicalPlan):
      Option[(Expression, Expression, Long)] = {
    def split(x: Expression, y: Expression, d: Long):
        Option[(Expression, Expression, Long)] =
      if (!isIntegral(x) || !isIntegral(y) || d < 0) None
      else if (x.references.nonEmpty &&
        x.references.subsetOf(left.outputSet) &&
        y.references.nonEmpty && y.references.subsetOf(right.outputSet))
        Some((x, y, d))
      else if (x.references.nonEmpty &&
        x.references.subsetOf(right.outputSet) &&
        y.references.nonEmpty && y.references.subsetOf(left.outputSet))
        Some((y, x, d))
      else None
    conjuncts.iterator.map {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), lim) =>
        asLongLiteral(lim).flatMap(split(x, y, _))
      case GreaterThanOrEqual(lim, Abs(Subtract(x, y, _), _)) =>
        asLongLiteral(lim).flatMap(split(x, y, _))
      case LessThan(Abs(Subtract(x, y, _), _), lim) =>
        asLongLiteral(lim).flatMap(d => split(x, y, d - 1))
      case _ => None
    }.collectFirst { case Some(hit) => hit }
  }

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

  private def bucket(e: Expression, w: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(w))

  /** The bucket candidate join as an Inner join plan: left projected with
    * its bucket id, right exploded to its three candidate buckets, joined
    * on equality, refined by `residual`.
    */
  private def bucketJoin(left: LogicalPlan, right: LogicalPlan,
                         lX: Expression, rX: Expression, d: Long,
                         residual: Seq[Expression],
                         hint: JoinHint): LogicalPlan = {
    val w = d + 1
    val lBucket = AttributeReference("__graft_band_l",
      LongType, nullable = true)()
    val lP = Project(left.output :+
      Alias(bucket(lX, w), lBucket.name)(lBucket.exprId), left)
    val rBase = bucket(rX, w)
    val cand = AttributeReference("__graft_band_r",
      LongType, nullable = true)()
    val rG = Generate(
      Explode(CreateArray(Seq(
        Subtract(rBase, Literal(1L)), rBase,
        Add(rBase, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cand), child = right)
    Filter(residual.reduce(And),
      Join(lP, rG, Inner, Some(EqualTo(lBucket, cand)), hint))
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hit =
          if (hasEquiKey(conjuncts, left, right)) None
          else findBand(conjuncts, left, right)
        hit match {
          case None => j
          case Some((lX, rX, d)) =>
            // the original conjuncts (band predicate included) refine the
            // candidates; no dedup term — each pair meets exactly once
            Project(j.output,
              bucketJoin(left, right, lX, rX, d, conjuncts, hint))
        }

      // Semi/anti band joins — the numeric blocklist shape: "keep/drop
      // left rows within d of some right value". A left row's match
      // depends only on its band value, so the DISTINCT left values
      // bucket-join the right side once, and the original join becomes a
      // plain equality semi/anti join on the matched-value set — the
      // preserved side's multiplicity untouched. Fires only when the band
      // predicate is the WHOLE condition (any other cross-side conjunct
      // makes matching row-dependent) — the same guard as the hamming
      // rule's semi/anti arm.
      case j @ Join(left, right, jt @ (LeftSemi | LeftAnti), Some(cond),
          hint) =>
        splitConjunctivePredicates(cond) match {
          case Seq(one) =>
            findBand(Seq(one), left, right) match {
              // oriented: the left expr must come from the preserved side
              case Some((lX, rX, d))
                  if lX.references.subsetOf(left.outputSet) =>
                val vAlias = Alias(lX, "__graft_band_v")()
                val vAttr = vAlias.toAttribute
                val lVals = Aggregate(Seq(vAttr), Seq(vAttr),
                  Project(Seq(vAlias), left))
                // refine with the ORIGINAL predicate, its left expression
                // substituted by the distinct-value attribute — identical
                // arithmetic, so overflow corners behave exactly as the
                // naive join would
                val refine = one.transform {
                  case e: Expression if e.semanticEquals(lX) => vAttr
                }
                val matched = bucketJoin(lVals, right, vAttr, rX, d,
                  Seq(refine), JoinHint.NONE)
                val matchedVals = Aggregate(Seq(vAttr), Seq(vAttr),
                  Project(Seq(vAttr), matched))
                Join(left, matchedVals, jt,
                  Some(EqualTo(lX, vAttr)), hint)
              case _ => j
            }
          case _ => j
        }
    }
  }
}
