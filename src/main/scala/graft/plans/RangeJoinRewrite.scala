package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule that rewrites a pure interval-containment join —
  * `point >= lo AND point < hi` with no equi-join conjunct, which Spark can
  * only plan as BroadcastNestedLoopJoin (O(|build| x |probe|) comparisons,
  * a cross product at 100 TB) — into the bucketed equi-join of
  * [[graft.ops.RangeJoin]], automatically: the user writes the natural
  * `JOIN ... ON e.ts >= w.start AND e.ts < w.end` and gets the
  * sort-merge/shuffle-hash plan the hand-bucketed form produces.
  *
  * Rewrite (bucket width W = `spark.graft.rangeJoin.binSize`, in seconds
  * for timestamps / value units for integral keys):
  *
  * {{{
  *   Join(iv, pt, Inner, p >= lo && p < hi && rest)
  * =>
  *   Project(iv.output ++ pt.output,
  *     Join(Generate(explode(sequence(bucket(lo), bucket(hi))) AS __b, iv),
  *          Project(pt.output :+ bucket(p) AS __b2, pt),
  *          Inner, __b = __b2 && <original condition>))
  * }}}
  *
  * Each matching (interval, point) pair meets in exactly one bucket — the
  * point's own — so no dedup is needed; the full original predicate rides
  * along as the non-equi part of the join condition and refines the bucket
  * candidates, so results are identical by construction (the hi bucket is
  * exploded inclusively even for a `<` bound: over-generation is filtered,
  * never missed). Guards keep the rule conservative:
  *
  *   - fires only when `spark.graft.rangeJoin.binSize` > 0;
  *   - inner joins only, both sides batch (stream-stream interval joins
  *     need their range condition intact for watermark state eviction);
  *   - skipped when ANY equi conjunct already spans the sides (Spark then
  *     hash-joins fine on its own — and this also makes the rule a no-op
  *     on its own output, so the fixed-point batch terminates);
  *   - the bound pair must reference opposite sides: point expression
  *     entirely from one side, lo/hi entirely from the other, all three of
  *     one type (timestamp or integral).
  *
  * Install with [[RangeJoinRewrite.install]] (idempotent) — uses the public
  * `spark.experimental.extraOptimizations` hook, the same mechanism a
  * `SparkSessionExtensions.injectOptimizerRule` plugin would use, but
  * attachable to a live session.
  *
  * Reference behaviour note: the reference engine has no range-join
  * operator at all (SURVEY §4 — its only pruning is registry-driven file
  * lists); this rule is part of the beyond-reference scale surface, giving
  * declarative SQL the same plan shape as the explicit
  * [[graft.ops.RangeJoin.intervalJoin]] operator.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  /** Idempotently register the rule on a live session and set the bucket
    * width. Safe to call per-query: double-install is a no-op. */
  def install(spark: SparkSession, binSize: Long): Unit = {
    spark.conf.set(BinSizeKey, binSize.toString)
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = conf.getConfString(BinSizeKey, "0").toLong
    if (bin <= 0L) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !left.isStreaming && !right.isStreaming =>
        rewrite(j, cond, bin).getOrElse(j)
    }
  }

  /** Seconds-since-epoch for timestamps (micros floorDiv 1e6 — timezone
    * free), plain long for integral keys. */
  private def seconds(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixSeconds(e)
    case ByteType | ShortType | IntegerType | LongType => Cast(e, LongType)
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  /** Floor-division bucket id. Floor(double) is exact for |sec| < 2^52 —
    * every representable timestamp; returns LongType. */
  private def bucket(e: Expression, bin: Long): Expression =
    Floor(Divide(Cast(seconds(e), DoubleType), Literal(bin.toDouble)))

  private def supported(dt: DataType): Boolean = dt match {
    case TimestampType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (point, bound) with refs on strictly opposite sides, either way round. */
  private def sidesOf(a: Expression, b: Expression,
                      l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val (ar, br) = (a.references, b.references)
    if (ar.nonEmpty && br.nonEmpty &&
        ar.subsetOf(l.outputSet) && br.subsetOf(r.outputSet)) Some(true)
    else if (ar.nonEmpty && br.nonEmpty &&
        ar.subsetOf(r.outputSet) && br.subsetOf(l.outputSet)) Some(false)
    else None
  }

  private def rewrite(j: Join, cond: Expression, bin: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    val hasEqui = conjuncts.exists {
      case Equality(a, b) => sidesOf(a, b, j.left, j.right).isDefined
      case _ => false
    }
    if (hasEqui) return None

    // (point, lo, pointOnLeft) from p >= lo / lo <= p / p > lo
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, lo) => (p, lo)
      case GreaterThan(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p) => (p, lo)
      case LessThan(lo, p) => (p, lo)
    }.flatMap { case (p, lo) =>
      sidesOf(p, lo, j.left, j.right).map(onLeft => (p, lo, onLeft))
    }
    // (point, hi, pointOnLeft) from p <= hi / p < hi / hi >= p / hi > p
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p, hi) => (p, hi)
      case LessThan(p, hi) => (p, hi)
      case GreaterThanOrEqual(hi, p) => (p, hi)
      case GreaterThan(hi, p) => (p, hi)
    }.flatMap { case (p, hi) =>
      sidesOf(p, hi, j.left, j.right).map(onLeft => (p, hi, onLeft))
    }

    val pair = lowers.flatMap { case (p, lo, pl) =>
      uppers.collectFirst {
        case (p2, hi, pl2) if pl == pl2 && p.semanticEquals(p2) &&
            supported(p.dataType) && lo.dataType == p.dataType &&
            hi.dataType == p.dataType => (p, lo, hi, pl)
      }
    }.headOption

    pair.map { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan, ivPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // interval side: explode the covered bucket range (hi inclusive —
      // over-generation is refined away by the original predicate)
      val bGen = AttributeReference("__graft_bucket", LongType, nullable = false)()
      val gen = Generate(
        // Sequence is TimeZoneAwareExpression: resolution requires an
        // explicit zone even for pure-long bounds
        Explode(new Sequence(bucket(lo, bin), bucket(hi, bin), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bGen), child = ivPlan)

      // point side: single bucket
      val bAlias = Alias(bucket(p, bin), "__graft_bucket_pt")()
      val proj = Project(pointPlan.output :+ bAlias, pointPlan)

      val (newLeft, newRight, bl, br) =
        if (pointOnLeft) (proj, gen, bAlias.toAttribute, bGen)
        else (gen, proj, bGen, bAlias.toAttribute)

      Project(j.left.output ++ j.right.output,
        Join(newLeft, newRight, Inner,
          Some(And(EqualTo(bl, br), cond)), j.hint))
    }
  }
}
