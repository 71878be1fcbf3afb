package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite large-large range-containment joins into the
  * bin-grid equi join — the logical-plan twin of
  * [[graft.operators.RangeJoin.binnedIntervalJoin]], applied
  * AUTOMATICALLY so plain SQL (`... JOIN i ON p.v >= i.lo AND p.v < i.hi`)
  * gets the scale-safe plan without calling the operator API.
  *
  * Catalyst's only native plan for a non-equi inner join is a (broadcast)
  * nested loop — O(|P|·|I|) once neither side is broadcast-sized. The
  * rewrite overlays a fixed bin grid on the join dimension: each interval
  * explodes into the bins it overlaps, each point takes its containing
  * bin, the join becomes a hash equi-join on the bin id, and the original
  * range predicate re-checks exactly (grid false positives drop; `floor`
  * on doubles is monotone, so no false negatives).
  *
  * OPT-IN: fires only when `spark.graft.rangeJoin.binWidth` is set (the
  * grid width is workload knowledge — set it near the median interval
  * span), and only when NEITHER side is broadcast-able under the current
  * `autoBroadcastJoinThreshold` (a broadcast nested loop over a dim-sized
  * side is already the right plan, and cheaper than exploding it).
  * Idempotent by construction: the rewritten join's condition is a plain
  * equality, which the pattern no longer matches.
  */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan =
    spark.conf.getOption(BinWidthKey).map(_.toDouble) match {
      case None => plan
      case Some(w) =>
        require(w > 0, s"$BinWidthKey must be positive, got $w")
        plan.transformUp {
          case j @ Join(left, right, Inner, Some(cond), hint)
              if !broadcastable(left) && !broadcastable(right) =>
            rewrite(j, left, right, cond, hint, w).getOrElse(j)
        }
    }

  private def broadcastable(p: LogicalPlan): Boolean = {
    val thr = SQLConf.get.autoBroadcastJoinThreshold
    thr >= 0 && p.stats.sizeInBytes <= thr
  }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  /** Match `p >= lo AND p < hi` (in any conjunct order, either join side
    * holding the point) with p from one side and lo/hi from the other. */
  /** The fixed-point guard: the optimizer pushes the residual re-check
    * filter back INTO the rewritten join's condition
    * (PushPredicateThroughJoin), where the range pair would match this
    * rule again — forever. A join already carrying a `__graft_bin_*`
    * equality IS the rewritten join; leave it alone. */
  private def alreadyRewritten(conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        a.name.startsWith("__graft_bin") || b.name.startsWith("__graft_bin")
      case _ => false
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (alreadyRewritten(conjuncts)) return None

    def fromOneSide(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.deterministic && numeric(e)

    // candidate (point, lo) pairs from `p >= lo` / `lo <= p`
    val geq = conjuncts.collect {
      case g @ GreaterThanOrEqual(p, lo) => (g: Expression, p, lo)
      case g @ LessThanOrEqual(lo, p)    => (g: Expression, p, lo)
    }
    // candidate (point, hi) pairs from `p < hi` / `hi > p`
    val lt = conjuncts.collect {
      case l @ LessThan(p, hi)    => (l: Expression, p, hi)
      case l @ GreaterThan(hi, p) => (l: Expression, p, hi)
    }

    val match_ = (for {
      (gConj, p1, lo) <- geq
      (lConj, p2, hi) <- lt
      if p1.semanticEquals(p2)
      // point on one side, both bounds on the other
      pointSide <- Seq(left, right).find(s => fromOneSide(p1, s))
      boundSide <- Seq(left, right).find(s =>
        (s ne pointSide) && fromOneSide(lo, s) && fromOneSide(hi, s))
    } yield (gConj, lConj, p1, lo, hi, pointSide, boundSide)).headOption

    match_.map { case (gConj, lConj, p, lo, hi, pointSide, boundSide) =>
      def bin(e: Expression): Expression =
        Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

      val pointBin = Alias(bin(p), "__graft_bin_p")()
      val pointPlan = Project(pointSide.output :+ pointBin, pointSide)

      // drop degenerate intervals BEFORE Sequence (start > stop with a
      // positive step is a runtime error, and those intervals are empty
      // under the half-open predicate anyway). Both bounds are cast to
      // double first: this rule runs in the OPTIMIZER, after the
      // analyzer's type coercion, so a mixed-type comparison it builds
      // (INT lo vs DOUBLE hi) would stay unresolved and fail planning —
      // the same cast bin() already applies
      val nonEmpty = Filter(LessThanOrEqual(
        Cast(lo, DoubleType), Cast(hi, DoubleType)), boundSide)
      // Sequence is TimeZoneAwareExpression: unresolved until a zone is
      // set (the analyzer's ResolveTimeZone already ran — this rule runs
      // in the optimizer, so it must supply the zone itself)
      val binSeq = Sequence(bin(lo), bin(hi), Some(Literal(1L)),
        Some(SQLConf.get.sessionLocalTimeZone))
      val intervalBin = AttributeReference("__graft_bin_i", LongType,
        nullable = false)()
      val expanded = Generate(Explode(binSeq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(intervalBin), child = nonEmpty)

      val (newLeft, newRight) =
        if (pointSide eq left) (pointPlan, expanded) else (expanded, pointPlan)
      val equiJoin = Join(newLeft, newRight, Inner,
        Some(EqualTo(pointBin.toAttribute, intervalBin)), hint)
      // re-check the exact range (kills grid false positives) and carry
      // every other original conjunct unchanged
      val residual = conjuncts // gConj/lConj re-checked with the rest
      val filtered = Filter(residual.reduce(And), equiJoin)
      // restore the original output (drop the two bin columns)
      Project(j.output, filtered)
    }
  }
}
