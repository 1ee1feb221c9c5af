package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite a pure interval-point range join (an
  * inner join whose condition has NO equi conjunct, only `p >= lo`-shaped
  * bounds between the sides) into the binned equi-join of
  * [[BinnedRangeJoin]] — intervals explode into `lo div w .. hi div w` bin
  * ids, points project their single bin id, and the join becomes a shuffled
  * (or broadcast) hash/merge join on the bin with the original bounds kept
  * as residual predicates. Without this, Spark's only plan for such a join
  * is BroadcastNestedLoopJoin: O(|P|·|I|) comparisons and a full broadcast
  * of one side — the classic 100 TB cliff.
  *
  * OPT-IN by session conf (there is no universally right bin width — it
  * should sit near the median interval span, a property of the data):
  * {{{ spark.conf.set("spark.graft.rangeJoin.binWidth", "3600000000") }}}
  * This mirrors the hint-driven range-join optimization of closed-source
  * Spark platforms, as an injected `Rule[LogicalPlan]` on open APIs.
  *
  * Correctness guards:
  *  - only Inner joins with integral (int/long) point and bound columns;
  *  - the rewrite keeps EVERY original conjunct as a residual predicate, so
  *    binning can only ever ADD a (provably satisfied) equi condition —
  *    strict bounds (`>`/`<`) ride along unchanged, extra conjuncts too;
  *  - rows with NULL point or bounds: dropped by the original predicate,
  *    and equally dropped binned (`null div w` is null → explode/equi-join
  *    eliminate them) — same result, per BinnedRangeJoinSpec;
  *  - a join that already has an equi conjunct is left alone (Spark plans
  *    it fine), which also makes the rule a fixed point: its own output
  *    carries the bin equi condition.
  *
  * Scope: INNER joins only, by design. An outer pure range join would need
  * unmatched-row preservation through the bin explosion (inner-bin join +
  * anti-join union) — expressible, but not a shape the fixtures exercise;
  * the rule leaves outer joins to Spark's nested loop rather than risk
  * null-extension semantics silently changing.
  */
class BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "").trim
    if (w.isEmpty) return plan
    val binWidth = w.toLong
    require(binWidth > 0, s"$ConfKey must be positive, got $binWidth")
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, binWidth).getOrElse(j)
    }
  }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** `a >= b` facts from one conjunct, both orientations normalized. */
  private def geFacts(c: Expression): Seq[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(a, b) => Seq((a, b))
    case GreaterThan(a, b)        => Seq((a, b))
    case LessThanOrEqual(a, b)    => Seq((b, a))
    case LessThan(a, b)           => Seq((b, a))
    case _                        => Seq.empty
  }

  private def rewrite(j: Join, binWidth: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left only
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(leftOut)) Some(true)
      else if (refs.subsetOf(rightOut)) Some(false)
      else None
    }

    // Bail if ANY equi conjunct connects the sides — Spark handles those.
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    // Find p >= lo and hi >= p with the same single-side integral p and
    // both bounds on the opposite side.
    val facts = conjuncts.flatMap(geFacts)
    val candidates = for {
      (p1, lo) <- facts
      (hi, p2) <- facts
      if p1.semanticEquals(p2)
      if p1.deterministic && lo.deterministic && hi.deterministic
      if isIntegral(p1) && isIntegral(lo) && isIntegral(hi)
      pSide <- sideOf(p1)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != pSide
    } yield (p1, lo, hi, pSide)
    if (candidates.isEmpty) return None
    val (p, lo, hi, pointOnLeft) = candidates.head

    def bin(e: Expression): Expression = IntegralDivide(e, Literal(binWidth))

    val pBin = Alias(bin(p), "__graft_ptbin")()
    val ivBin = AttributeReference("__graft_ivbin", LongType)()
    val (pointSide, intervalSide) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
    val projectedPoint = Project(pointSide.output :+ pBin, pointSide)
    // step stays inferred (None): an inverted interval (lo > hi) must yield
    // zero matches like the original predicate — an explicit +1 step would
    // make Sequence THROW on descending bounds instead. Inferred descending
    // bins are harmless: the residual lo<=p<=hi kills every candidate.
    val explodedIntervals = Generate(
      Explode(Sequence(bin(lo), bin(hi), None,
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ivBin), child = intervalSide)

    val newCond = (EqualTo(pBin.toAttribute, ivBin) +: conjuncts)
      .reduce(And)
    val newJoin =
      if (pointOnLeft) Join(projectedPoint, explodedIntervals, Inner, Some(newCond), j.hint)
      else Join(explodedIntervals, projectedPoint, Inner, Some(newCond), j.hint)
    Some(Project(j.output, newJoin))
  }
}
