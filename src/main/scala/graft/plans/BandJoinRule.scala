package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrites an inner join whose ONLY join
  * predicate is a tolerance band — `abs(a - b) <= tol` with `a` from
  * the left, `b` from the right, integer-typed — into a banded
  * equi-join. Without the rewrite Spark can only plan such a join as
  * BroadcastNestedLoopJoin (O(|L|·|R|) comparisons — a non-starter at
  * 100 TB); with it, both sides hash-partition on a band key:
  *
  *   left:  band(a)           = floorDiv(a, tol)      (one row)
  *   right: bands(b)          = {band(b)-1, band(b), band(b)+1}
  *                                                   (explode, 3 rows)
  *   join:  leftBand == rightBand AND original predicate
  *
  * Any pair with |a-b| <= tol has band(a) within one of band(b), so
  * recall is exact; the re-applied original predicate removes false
  * positives; and because the three exploded band values are distinct,
  * every surviving pair matches exactly once — no dedup needed.
  * floorDiv is computed exactly on longs ((x - pmod(x, tol)) div tol),
  * so there are no floating-point boundary effects.
  *
  * The rule skips joins that already have an equi-conjunct (Spark
  * plans those as hash/sort-merge joins natively) — which also makes
  * it self-terminating: the rewritten join carries the band equality.
  * This is the whole-plan automation of the manual
  * `graft.operators.RangeJoin.bandJoin`; injected via
  * [[graft.functions.expressions.GraftExtensions]] or
  * `spark.experimental.extraOptimizations`.
  */
object BandJoinRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def isIntish(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Exact floorDiv for longs: (x - pmod(x, tol)) div tol. */
  private def band(x: Expression, tol: Long): Expression =
    IntegralDivide(
      Subtract(asLong(x), Pmod(asLong(x), Literal(tol))), Literal(tol))

  private def tolOf(l: Literal): Option[Long] = l match {
    case Literal(v: Long, LongType) if v > 0 => Some(v)
    case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val cs = conjuncts(cond)
      val hasEqui = cs.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) &&
            a.references.subsetOf(right.outputSet))
        case _ => false
      }
      val bandParts = cs.collectFirst {
        case cmp @ (LessThanOrEqual(Abs(Subtract(_, _, _), _), _: Literal) |
                    LessThan(Abs(Subtract(_, _, _), _), _: Literal)) =>
          val (abs, lim) = cmp match {
            case LessThanOrEqual(a: Abs, l: Literal) => (a, l)
            case LessThan(a: Abs, l: Literal) => (a, l)
          }
          val Abs(Subtract(x, y, _), _) = abs: @unchecked
          (x, y, tolOf(lim))
      }.flatMap {
        case (x, y, Some(tol)) if isIntish(x) && isIntish(y) =>
          if (x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet)) Some((x, y, tol))
          else if (y.references.subsetOf(left.outputSet) &&
                   x.references.subsetOf(right.outputSet)) Some((y, x, tol))
          else None
        case _ => None
      }
      bandParts match {
        case Some((le, re, tol)) if !hasEqui =>
          val lBand = Alias(band(le, tol), "__lband")()
          val newLeft = Project(left.output :+ lBand, left)
          val rBand = band(re, tol)
          val arr = CreateArray(Seq(
            Subtract(rBand, Literal(1L)), rBand, Add(rBand, Literal(1L))))
          val rBandAttr = AttributeReference("__rband", LongType)()
          val newRight = Generate(Explode(arr), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(rBandAttr), child = right)
          val newCond = And(EqualTo(lBand.toAttribute, rBandAttr), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
