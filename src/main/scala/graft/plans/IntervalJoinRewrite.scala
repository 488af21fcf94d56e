package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Optimizer rule: rewrite a range-containment theta join
 *
 *   points JOIN ranges ON p >= lo AND p < hi
 *
 * — which Spark can only plan as a BroadcastNestedLoopJoin (every range
 * scanned per point) — into the bucket-decomposed EQUI join of
 * `Joins.intervalJoin`: the range side explodes to the bucket ids it
 * covers, the point side computes its single bucket id, and a hash join
 * on the bucket plus the ORIGINAL predicate as a residual filter yields
 * the identical row set (each range row's exploded buckets are distinct,
 * so a qualifying pair matches exactly once). Declarative SQL gets the
 * scalable plan automatically; `Joins.intervalJoin` stays the explicit
 * surface with a caller-chosen width.
 *
 * Trigger is deliberately conservative, so the rule is idempotent under
 * the optimizer's fixed point and cannot touch look-alike joins:
 *  - INNER join whose condition is EXACTLY `p >= lo AND p < hi`
 *    (either conjunct order);
 *  - `p` references exactly one side, `lo` and `hi` the other
 *    (a self-interval predicate like an event-time window where `hi`
 *    mentions both sides does NOT fire);
 *  - all three of int/long type (the surrogate-key + timestamp-micros
 *    hot path). Bounds within one bucket width of Long.Min/MaxValue are
 *    outside the supported domain (same as `Joins.intervalJoin`).
 *
 * Bucket width comes from `spark.graft.intervalJoin.bucketWidth`
 * (default 64); `spark.graft.intervalJoin.rewrite=false` disables the
 * rule. Null semantics are preserved: a null point buckets to null and
 * matches nothing; null-bounded or empty ranges are dropped by the
 * `hi > lo` pre-filter — exactly the rows the theta predicate could
 * never match.
 */
object IntervalJoinRewrite extends Rule[LogicalPlan] {

  val RewriteConf = "spark.graft.intervalJoin.rewrite"
  val WidthConf = "spark.graft.intervalJoin.bucketWidth"

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** True floor-division bucket id (negative-safe): (e − pmod(e, w)) div w. */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val wl = Literal(w)
    IntegralDivide(Subtract(asLong(e), Pmod(asLong(e), wl)), wl)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, lo, hi) if the condition is the exact containment shape. */
  private def containment(cond: Expression): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(GreaterThanOrEqual(p1, lo), LessThan(p2, hi))
        if p1.semanticEquals(p2) && Seq(p1, lo, hi).forall(integral) =>
        Some((p1, lo, hi))
      case And(LessThan(p2, hi), GreaterThanOrEqual(p1, lo))
        if p1.semanticEquals(p2) && Seq(p1, lo, hi).forall(integral) =>
        Some((p1, lo, hi))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(RewriteConf, "true").toBoolean) return plan
    val w = conf.getConfString(WidthConf, "64").toLong
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        containment(cond).flatMap { case (p, lo, hi) =>
          val pRefs = p.references
          val boundRefs = lo.references ++ hi.references
          val pointIsLeft = pRefs.subsetOf(left.outputSet) &&
            boundRefs.subsetOf(right.outputSet)
          val pointIsRight = pRefs.subsetOf(right.outputSet) &&
            boundRefs.subsetOf(left.outputSet)
          if (pRefs.isEmpty || boundRefs.isEmpty || !(pointIsLeft || pointIsRight)) None
          else {
            val (pointPlan, rangePlan) = if (pointIsLeft) (left, right) else (right, left)
            val pBucket = Alias(bucketOf(p, w), "__gbkt_p")()
            val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)
            // hi > lo also drops null-bounded rows, so the Sequence below
            // never sees a reversed or null range (it would throw on the
            // former); hi − 1 cannot underflow once hi > lo holds.
            val rangeFiltered = Filter(GreaterThan(asLong(hi), asLong(lo)), rangePlan)
            // Sequence is TimeZoneAwareExpression — without an explicit
            // zone it is unresolved, which the optimizer's plan-integrity
            // check rejects (integral sequences never consult it).
            val seq = Sequence(
              bucketOf(lo, w),
              bucketOf(Subtract(asLong(hi), Literal(1L)), w),
              Some(Literal(1L)),
              Some(conf.sessionLocalTimeZone))
            val rBucket = AttributeReference("__gbkt_r", LongType,
              nullable = seq.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
                .containsNull)()
            val gen = Generate(Explode(seq), Nil, outer = false, None,
              Seq(rBucket), rangeFiltered)
            val (newLeft, newRight) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
            val newCond = And(EqualTo(pBucket.toAttribute, rBucket), cond)
            Some(Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint)))
          }
        }.getOrElse(j)
    }
  }
}
