package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

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
  * condition is EXACTLY a two-conjunct point-in-interval test on bare
  * IntegerType/LongType columns, with p from one side and s, e both
  * from the other. All four bound combinations match — `p >= s`/`p > s`
  * below, `p < e`/`p <= e` above, each in either operand order (so
  * `s < p AND p <= e` chains match too) — and the rule never re-fires
  * (the rewritten join has an equality conjunct, which the two-conjunct
  * matcher excludes). Anything fancier stays on Spark's default path.
  *
  * Semantics are preserved exactly: a point lands in ONE bucket, so no
  * pair can match twice (no dedup needed). The generated bucket range
  * is `bucketOf(s) .. bucketOf(e)` on the RAW bounds for every
  * openness variant — a superset of the buckets that can hold a
  * matching point (at most one wasted bucket per end, which the
  * residual original condition filters exactly), deliberately free of
  * any ±1 arithmetic: adjusting bounds by one would overflow on
  * Long.MIN/MAX sentinel bounds and, under ANSI mode, turn a row the
  * nested loop handles fine into a query-killing ArithmeticException.
  * `Filter(e >= s)` (raw operands, no arithmetic) keeps descending
  * ranges out of the Generate (Sequence rejects them); NULL bounds
  * null-propagate into that filter → zero generated rows, matching the
  * nested-loop's null-comparison drop. Integer columns are widened
  * with an exact `Cast` to long for the bucket math only — the
  * original condition rides along as the residual untouched. Bucket
  * arithmetic is `(x − pmod(x, W)) div W` — exact floor division for
  * negative domains too. Bucket width:
  * `spark.graft.rangeJoin.bucketWidth` (default 16).
  *
  * ASCENDING sentinel / unbounded intervals (s = Long.MIN or
  * e = Long.MAX used as "no bound") are the one shape bucket
  * replication cannot absorb: `Sequence(bucketOf(s), bucketOf(e))`
  * would generate ~2⁶⁰ rows where the nested-loop baseline runs fine.
  * The rewrite therefore SPLITS the interval side on a per-row span
  * guard: intervals spanning ≤ `spark.graft.rangeJoin.maxSpanBuckets`
  * buckets (default 65536) take the bucketed equi-join; wider ones —
  * in practice the handful of sentinel "match everything after t"
  * rows — fall back to a nested-loop join on the untouched original
  * predicate, and the two branches union. Each interval row routes to
  * exactly one branch (the guards are complements of one expression),
  * so no pair can match twice. The span guard compares the two bucket
  * ids in DOUBLE arithmetic: overflow-free for any sentinel (long
  * subtraction could wrap for width 1), and any rounding slack at the
  * cap boundary only moves a row between two CORRECT branches. The
  * fallback join's condition carries a redundant `IsNotNull(s)` third
  * conjunct — null-bound rows match nothing either way — purely so
  * this rule's exactly-two-conjunct matcher cannot re-fire on its own
  * fallback inside the fixed-point optimizer batch.
  *
  * Cost of the safety: the fallback branch is a SECOND scan of both
  * inputs (the filters differ per branch, so no exchange reuse), paid
  * even when every interval is bounded and the branch is empty at
  * runtime. That is the right default for a safety-net rule — the
  * alternative is a runtime failure on the first sentinel row — but a
  * workload that KNOWS its intervals are bounded should set
  * `spark.graft.rangeJoin.sentinelFallback=false` to restore the
  * single-branch plan (or call
  * [[graft.ops.Ranges.pointInIntervalJoin]] directly, which never
  * adds the fallback).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  val MaxSpanKey = "spark.graft.rangeJoin.maxSpanBuckets"
  val FallbackKey = "spark.graft.rangeJoin.sentinelFallback"

  private def width: Long =
    conf.getConfString(WidthKey, "16").toLong
  private def maxSpanBuckets: Long =
    conf.getConfString(MaxSpanKey, "65536").toLong
  private def sentinelFallback: Boolean =
    conf.getConfString(FallbackKey, "true").toBoolean

  private type AR = AttributeReference

  /** A bare column, possibly under the exact int→long widening cast the
    * analyzer inserts to equalize a mixed int/long comparison. */
  private object BareCol {
    def unapply(e: Expression): Option[AR] = e match {
      case a: AR => Some(a)
      case Cast(a: AR, LongType, _, _) if a.dataType == IntegerType => Some(a)
      case _ => None
    }
  }

  /** Candidate readings of a conjunct as a lower bound on a point:
    * (point, bound, closed). `GreaterThan(a, b)` is genuinely ambiguous
    * in isolation (a > b reads as "point a above open bound b" or
    * "point b below open bound a"), so parses return ALL readings and
    * the caller disambiguates by matching the point attribute across
    * the two conjuncts. */
  private def lowerParses(e: Expression): Seq[(AR, AR, Boolean)] = e match {
    case GreaterThanOrEqual(BareCol(p), BareCol(s)) => Seq((p, s, true))
    case LessThanOrEqual(BareCol(s), BareCol(p)) => Seq((p, s, true))
    case GreaterThan(BareCol(p), BareCol(s)) => Seq((p, s, false))
    case LessThan(BareCol(s), BareCol(p)) => Seq((p, s, false))
    case _ => Seq.empty
  }

  /** Candidate readings as an upper bound: (point, bound, closed). */
  private def upperParses(e: Expression): Seq[(AR, AR, Boolean)] = e match {
    case LessThan(BareCol(p), BareCol(ee)) => Seq((p, ee, false))
    case GreaterThan(BareCol(ee), BareCol(p)) => Seq((p, ee, false))
    case LessThanOrEqual(BareCol(p), BareCol(ee)) => Seq((p, ee, true))
    case GreaterThanOrEqual(BareCol(ee), BareCol(p)) => Seq((p, ee, true))
    case _ => Seq.empty
  }

  /** Exact floor(x / w) for any sign, in long arithmetic — overflow-free
    * over the FULL long domain for any w > 0: truncating divide plus a
    * remainder-sign fix-up. The previous form, `(x − pmod(x, w)) div w`,
    * wrapped for x within w of Long.MinValue under a non-power-of-two
    * width (pmod(x, w) > 0 pushes the subtract below Long.MinValue),
    * which mis-bucketed the documented descending/unbounded sentinel
    * bounds and routed them into the bucketed branch the span guard
    * exists to keep them out of. Here nothing can wrap: `x div w` only
    * hits Long.MinValue at w = 1, where the remainder is 0 and the
    * `q − 1` branch never fires; Remainder follows the dividend's sign,
    * so `r < 0` is exactly "x negative and not on a bucket boundary". */
  private def bucketOf(x: Expression, w: Long): Expression = {
    val q = IntegralDivide(x, Literal(w))
    val r = Remainder(x, Literal(w))
    If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
  }

  private def supportedType(a: AR): Boolean =
    a.dataType == LongType || a.dataType == IntegerType

  /** Exact widening to long for the bucket arithmetic. */
  private def asLong(a: AR): Expression =
    if (a.dataType == LongType) a else Cast(a, LongType)

  private def fromOneSide(a: AttributeReference, side: LogicalPlan): Boolean =
    a.references.subsetOf(side.outputSet)

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = (for {
        _ <- Iterator.single(()).filter(_ => conjuncts.length == 2)
        (li, ui) <- Iterator((0, 1), (1, 0))
        (p1, s, _) <- lowerParses(conjuncts(li)).iterator
        (p2, e, _) <- upperParses(conjuncts(ui)).iterator
        if p1.semanticEquals(p2)
        if Seq(p1, s, e).forall(supportedType)
        // p from one side; s and e both from the other
        (pSide, ivSide, pIsLeft) <-
          (if (fromOneSide(p1, left) && fromOneSide(s, right) && fromOneSide(e, right))
            Some((left, right, true))
          else if (fromOneSide(p1, right) && fromOneSide(s, left) && fromOneSide(e, left))
            Some((right, left, false))
          else None).iterator
      } yield {
        val w = width
        val pBucket = Alias(bucketOf(asLong(p1), w), "__graft_bucket_p")()
        val pProj = Project(pSide.output :+ pBucket, pSide)
        val ascending = GreaterThanOrEqual(asLong(e), asLong(s))
        // per-row span guard (object doc): double arithmetic cannot
        // overflow on sentinel bounds, and both branches filter on the
        // SAME expression, so every row lands in exactly one branch
        val spanSmall = LessThanOrEqual(
          Subtract(Cast(bucketOf(asLong(e), w), DoubleType),
            Cast(bucketOf(asLong(s), w), DoubleType)),
          Literal(maxSpanBuckets.toDouble))
        // raw-bound bucket range: superset of the matching points'
        // buckets for every openness variant (see object doc — no ±1,
        // so sentinel bounds can't overflow); the residual original
        // condition keeps row-level exactness.
        // Sequence is TimeZoneAware — a None zone leaves it unresolved
        // even for integral sequences, and the optimizer rejects plans
        // that become unresolved
        val seq = new Sequence(
          bucketOf(asLong(s), w), bucketOf(asLong(e), w),
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
        val ivBucket = AttributeReference("__graft_bucket_iv", LongType)()
        val smallGuard =
          if (sentinelFallback) And(ascending, spanSmall) else ascending
        val ivGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(ivBucket),
          child = Filter(smallGuard, ivSide))
        val newCond = And(EqualTo(pBucket.toAttribute, ivBucket), cond)
        val (nl, nr) =
          if (pIsLeft) (pProj, ivGen: LogicalPlan) else (ivGen: LogicalPlan, pProj)
        val bucketed = Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        if (!sentinelFallback) bucketed
        else {
          // sentinel/huge-span rows: nested loop on the original
          // predicate — correct for the shapes bucket replication
          // can't absorb, empty for bounded workloads. IsNotNull(s) is
          // the re-fire guard (see object doc).
          val ivBig = Filter(And(ascending, Not(spanSmall)), ivSide)
          val (fl, fr) =
            if (pIsLeft) (pSide, ivBig: LogicalPlan)
            else (ivBig: LogicalPlan, pSide)
          val fallback = Project(j.output,
            Join(fl, fr, Inner, Some(And(cond, IsNotNull(s))), hint))
          Union(bucketed, fallback)
        }
      }).nextOption()
      rewritten.getOrElse(j)
  }
}
