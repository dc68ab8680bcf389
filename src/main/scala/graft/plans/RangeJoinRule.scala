package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule that makes naive range joins scale: a user writes the
  * natural thing —
  *
  *   points.join(intervals, $"p" >= $"s" && $"p" < $"e")
  *
  * — and Catalyst, lacking an equi-key, would plan a
  * BroadcastNestedLoopJoin: O(|A|·|B|) compares plus a full broadcast
  * of one side, which is exactly what dies first at 100 TB. This rule
  * rewrites the join to the bucketed form of
  * [[graft.ops.Ranges.pointInIntervalJoin]] before planning: quantize
  * the domain into width-W buckets, `Generate`-replicate each interval
  * to the buckets it overlaps, tag each point with its single bucket,
  * and join on bucket EQUALITY with the original range predicate kept
  * as a residual — so the planner sees an equi-join and picks a
  * shuffled hash/sort-merge join. Library function and engine feature
  * are the same algorithm; this rule is the "user didn't know about
  * the library" safety net, the role AQE plays for skew.
  *
  * Conservative by design — fires only on an INNER join whose
  * condition is EXACTLY a half-open point-in-interval test on bare
  * LongType columns (`p >= s AND p < e`, in either operand order,
  * with p from one side and s, e both from the other), and never
  * re-fires (the rewritten join has an equality conjunct, which the
  * matcher excludes). Anything fancier stays on Spark's default path.
  *
  * Semantics are preserved exactly: a point lands in ONE bucket, so no
  * pair can match twice (no dedup needed); `Filter(e > s)` keeps empty
  * intervals out of the Generate (Sequence would reject a descending
  * range); NULL bounds produce a NULL sequence → zero generated rows,
  * matching the nested-loop's null-comparison drop; bucket arithmetic
  * is `(x − pmod(x, W)) div W` — exact floor division for negative
  * domains too. Bucket width: `spark.graft.rangeJoin.bucketWidth`
  * (default 16).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def width: Long =
    conf.getConfString(WidthKey, "16").toLong

  /** (point, bound) from a `point >= bound`-shaped conjunct. */
  private def lowerBound(e: Expression): Option[(AttributeReference, AttributeReference)] =
    e match {
      case GreaterThanOrEqual(p: AttributeReference, s: AttributeReference) => Some((p, s))
      case LessThanOrEqual(s: AttributeReference, p: AttributeReference) => Some((p, s))
      case _ => None
    }

  /** (point, bound) from a `point < bound`-shaped conjunct. */
  private def upperBound(e: Expression): Option[(AttributeReference, AttributeReference)] =
    e match {
      case LessThan(p: AttributeReference, ee: AttributeReference) => Some((p, ee))
      case GreaterThan(ee: AttributeReference, p: AttributeReference) => Some((p, ee))
      case _ => None
    }

  /** Exact floor(x / w) for any sign, in long arithmetic. */
  private def bucketOf(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  private def fromOneSide(a: AttributeReference, side: LogicalPlan): Boolean =
    a.references.subsetOf(side.outputSet)

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = for {
        _ <- Some(()).filter(_ => conjuncts.length == 2)
        (p1, s) <- lowerBound(conjuncts(0)).orElse(lowerBound(conjuncts(1)))
        (p2, e) <- upperBound(conjuncts(1)).orElse(upperBound(conjuncts(0)))
        if p1.semanticEquals(p2)
        if Seq(p1, s, e).forall(_.dataType == LongType)
        // p from one side; s and e both from the other
        (pSide, ivSide, pIsLeft) <-
          if (fromOneSide(p1, left) && fromOneSide(s, right) && fromOneSide(e, right))
            Some((left, right, true))
          else if (fromOneSide(p1, right) && fromOneSide(s, left) && fromOneSide(e, left))
            Some((right, left, false))
          else None
      } yield {
        val w = width
        val pBucket = Alias(bucketOf(p1, w), "__graft_bucket_p")()
        val pProj = Project(pSide.output :+ pBucket, pSide)
        // Sequence is TimeZoneAware — a None zone leaves it unresolved
        // even for integral sequences, and the optimizer rejects plans
        // that become unresolved
        val seq = new Sequence(
          bucketOf(s, w), bucketOf(Subtract(e, Literal(1L)), w),
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
        val ivBucket = AttributeReference("__graft_bucket_iv", LongType)()
        val ivGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(ivBucket),
          child = Filter(GreaterThan(e, s), ivSide))
        val newCond = And(EqualTo(pBucket.toAttribute, ivBucket), cond)
        val (nl, nr) =
          if (pIsLeft) (pProj, ivGen: LogicalPlan) else (ivGen: LogicalPlan, pProj)
        Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
      }
      rewritten.getOrElse(j)
  }
}
