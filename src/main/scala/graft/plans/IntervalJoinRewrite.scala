package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Optimizer rule: rewrite a range-containment theta join
 *
 *   points JOIN ranges ON p >= lo AND p <  hi     (half-open)
 *   points JOIN ranges ON p BETWEEN lo AND hi     (closed — any of the
 *   four comparison orientations, strict or non-strict lower bound)
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
 *  - INNER join whose condition is EXACTLY a lower bound AND an upper
 *    bound on one common point expression (any conjunct order / operand
 *    orientation: `p >= lo`, `lo <= p`, `p > lo`, `lo < p` below;
 *    `p < hi`, `hi > p`, `p <= hi`, `hi >= p` above);
 *  - `p` references exactly one side, `lo` and `hi` the other
 *    (a self-interval predicate like an event-time window where `hi`
 *    mentions both sides does NOT fire);
 *  - all three of int/long type (the surrogate-key + timestamp-micros
 *    hot path).
 *
 * EXPLOSION GUARD: a range row covering more than
 * `spark.graft.intervalJoin.maxBuckets` buckets (default 4096) is NOT
 * decomposed — a 1-day validity window in timestamp-micros at the
 * default width would otherwise explode to ~1.35e9 sequence elements per
 * row and kill the executor where the original BNLJ merely crawled. The
 * range side is split by a per-row bucket-count predicate: narrow rows
 * take the bucket-decomposed equi join, wide rows keep the ORIGINAL
 * theta join, and the two branches union — exact in all cases, and the
 * wide branch is empty (skipped by AQE) for well-configured widths.
 * Bounds at the very edge of the long domain (within one bucket width of
 * Long.Min/MaxValue) can wrap the span arithmetic; a wrapped span lands
 * in the wide branch, so the fallback — not a wrong answer — covers them.
 *
 * Bucket width comes from `spark.graft.intervalJoin.bucketWidth`
 * (default 64); `spark.graft.intervalJoin.rewrite=false` disables the
 * rule; `maxBuckets <= 0` removes the cap (pre-guard behavior). Null
 * semantics are preserved: a null point buckets to null and matches
 * nothing; null-bounded or empty ranges are dropped by the sequence
 * pre-filter — exactly the rows the theta predicate could never match —
 * and in the wide branch by the theta predicate itself.
 */
object IntervalJoinRewrite extends Rule[LogicalPlan] {

  val RewriteConf = "spark.graft.intervalJoin.rewrite"
  val WidthConf = "spark.graft.intervalJoin.bucketWidth"
  val MaxBucketsConf = "spark.graft.intervalJoin.maxBuckets"

  /** Marks the wide-row fallback join so the fixed-point optimizer does
    * not re-decompose it (transform copies tags onto rewritten nodes). */
  private val SkipTag = TreeNodeTag[Unit]("graft.intervalJoinRewrite.skip")

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** True floor-division bucket id (negative-safe): (e − pmod(e, w)) div w. */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val wl = Literal(w)
    IntegralDivide(Subtract(asLong(e), Pmod(asLong(e), wl)), wl)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Readings of `e` as a lower bound: (point, lo). Strict bounds keep
    * `lo` as the sequence start — a superset of the qualifying buckets;
    * the residual predicate stays exact. */
  private def lowers(e: Expression): Seq[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, lo) => Seq((p, lo))
    case LessThanOrEqual(lo, p) => Seq((p, lo))
    case GreaterThan(p, lo) => Seq((p, lo))
    case LessThan(lo, p) => Seq((p, lo))
    case _ => Nil
  }

  /** Readings of `e` as an upper bound: (point, hiSeq) with hiSeq the
    * INCLUSIVE long-typed sequence end (hi − 1 for strict uppers). */
  private def uppers(e: Expression): Seq[(Expression, Expression)] = e match {
    case LessThan(p, hi) if integral(hi) =>
      Seq((p, Subtract(asLong(hi), Literal(1L))))
    case GreaterThan(hi, p) if integral(hi) =>
      Seq((p, Subtract(asLong(hi), Literal(1L))))
    case LessThanOrEqual(p, hi) if integral(hi) => Seq((p, asLong(hi)))
    case GreaterThanOrEqual(hi, p) if integral(hi) => Seq((p, asLong(hi)))
    case _ => Nil
  }

  /** (point, lo, hiSeq) if the condition is a two-conjunct containment in
    * any orientation. hiSeq is inclusive and long-typed. */
  private def containment(cond: Expression): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(c1, c2) =>
        (for {
          (a, b) <- Seq((c1, c2), (c2, c1))
          (p1, lo) <- lowers(a)
          (p2, hi) <- uppers(b)
          if p1.semanticEquals(p2) && integral(p1) && integral(lo)
        } yield (p1, lo, hi)).headOption
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(RewriteConf, "true").toBoolean) return plan
    val w = conf.getConfString(WidthConf, "64").toLong
    if (w <= 0) return plan
    val maxB0 = conf.getConfString(MaxBucketsConf, "4096").toLong
    val maxB = if (maxB0 <= 0) Long.MaxValue else maxB0
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && j.getTagValue(SkipTag).isEmpty =>
        containment(cond).flatMap { case (p, lo, hiSeq) =>
          val pRefs = p.references
          val boundRefs = lo.references ++ hiSeq.references
          val pointIsLeft = pRefs.subsetOf(left.outputSet) &&
            boundRefs.subsetOf(right.outputSet)
          val pointIsRight = pRefs.subsetOf(right.outputSet) &&
            boundRefs.subsetOf(left.outputSet)
          if (pRefs.isEmpty || boundRefs.isEmpty || !(pointIsLeft || pointIsRight)) None
          else {
            val (pointPlan, rangePlan) = if (pointIsLeft) (left, right) else (right, left)
            val pBucket = Alias(bucketOf(p, w), "__gbkt_p")()
            val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)
            val loB = bucketOf(lo, w)
            val hiB = bucketOf(hiSeq, w)
            // hiSeq >= lo guarantees a non-reversed sequence (bucketOf is
            // monotone) and drops null-bounded / empty ranges — rows the
            // containment predicate could never match.
            val okRange = GreaterThanOrEqual(hiSeq, asLong(lo))
            // Per-row bucket count (minus one); wide rows would explode.
            // okRange + monotone bucketOf guarantee hiB >= loB, so a true
            // span is always >= 0 — a NEGATIVE Subtract result can only be
            // long wraparound (bounds straddling the far ends of the long
            // domain at small widths), which would otherwise slip under
            // `<= maxB-1` and Sequence-explode in the narrow branch. The
            // `>= 0` conjunct routes exactly those rows to the wide branch.
            val span = Subtract(hiB, loB)
            val spanPred = And(GreaterThanOrEqual(span, Literal(0L)),
              LessThanOrEqual(span, Literal(maxB - 1)))
            val narrowRanges = Filter(And(okRange, spanPred), rangePlan)
            // Sequence is TimeZoneAwareExpression — without an explicit
            // zone it is unresolved, which the optimizer's plan-integrity
            // check rejects (integral sequences never consult it).
            val seq = Sequence(loB, hiB, Some(Literal(1L)),
              Some(conf.sessionLocalTimeZone))
            val rBucket = AttributeReference("__gbkt_r", LongType,
              nullable = seq.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
                .containsNull)()
            val gen = Generate(Explode(seq), Nil, outer = false, None,
              Seq(rBucket), narrowRanges)
            val (nL, nR) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
            val narrowJoin = Join(nL, nR, Inner,
              Some(And(EqualTo(pBucket.toAttribute, rBucket), cond)), hint)
            // Wide rows keep the original theta join (the pre-rewrite
            // plan, restricted to the rows the decomposition refused).
            val wideRanges = Filter(And(okRange, Not(spanPred)), rangePlan)
            val (wL, wR) = if (pointIsLeft) (pointPlan, wideRanges) else (wideRanges, pointPlan)
            val wideJoin = Join(wL, wR, Inner, Some(cond), hint)
            wideJoin.setTagValue(SkipTag, ())
            Some(Union(Seq(Project(j.output, narrowJoin), Project(j.output, wideJoin))))
          }
        }.getOrElse(j)
    }
  }
}
