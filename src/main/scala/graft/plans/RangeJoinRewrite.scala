package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a naive interval join into the bin-bucketed
  * EQUI-join [[graft.operators.RangeJoin]] builds by hand — the
  * (c)-tier extension point (`SparkSessionExtensions.
  * injectOptimizerRule`) for semantics Spark's planner lacks.
  *
  * A user writing the natural form
  * {{{ intervals.join(points, keys && ts >= lo && ts < hi) }}}
  * gets a BroadcastNestedLoopJoin (or a cartesian product) — the plan
  * that works at SF 0.01 and dies at 100 TB. With this rule installed
  * ([[graft.GraftExtensions]]) and `spark.graft.rangeJoin.binWidth`
  * set, the SAME query plans as: explode each interval to the fixed-
  * width bins it overlaps, compute each point's single bin scan-side,
  * hash-join on (keys…, bin), and re-apply the exact range predicates
  * as a post-join filter. Results are identical by construction (the
  * bin equality is implied by containment — truncating division is
  * monotone, so `ts ∈ [lo, hi]` ⇒ `ts div w ∈ [lo div w, hi div w]` —
  * and the original predicates still run), only the join STRATEGY
  * changes: candidate volume Σ per-bin |I|·|P| instead of |I|·|P|,
  * partitioned by (keys, bin).
  *
  * Scope (deliberately conservative — this is an optimization, so
  * bail-out = correct-but-slow, never wrong):
  *  - INNER joins whose condition is a conjunction containing a lower
  *    bound (`ts >= lo` / `ts > lo`) and an upper bound (`ts < hi` /
  *    `ts <= hi`) on the same integral-typed `ts` from one side, with
  *    both bounds' expressions from the other side;
  *  - remaining equi-conjuncts ride along as join keys; any other
  *    leftover conjuncts move to the post-join filter;
  *  - fires only when `spark.graft.rangeJoin.binWidth` > 0 (bin width
  *    is a data-dependent choice — ≈ the typical interval length);
  *  - skips joins already keyed on a `__bin`-prefixed column: the
  *    containment filter gets pushed back INTO the rewritten join's
  *    condition on the next fixpoint iteration, which would otherwise
  *    re-match and bin forever (also keeps hands off
  *    [[graft.operators.RangeJoin]]'s hand-built plans).
  *
  * A `ts > lo` strict lower bound widens to the `lo div w` bin — one
  * extra candidate bin, removed by the exact filter.
  *
  * Degenerate data: inverted intervals (lo > hi) bin to an EMPTY
  * sequence (their predicates are unsatisfiable — zero join work), and
  * an interval spanning more than [[MaxBinsKey]] bins fails fast with a
  * remediation-pointing error (see [[MaxBinsKey]] for why no correct
  * clamp exists).
  */
case class RangeJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  /** Per-interval bin-count ceiling (degenerate-data guard). An interval
    * spanning more bins than this at the configured width means the
    * width is wildly mis-sized for the data; enumerating the bins would
    * OOM or hit Sequence's 2³¹ element error deep in codegen. There is
    * no one-sided CORRECT clamp (dropping bins drops matches), so the
    * guard fails fast with a configuration-pointing error instead — a
    * documented refinement of the bail-out contract for data the
    * rewrite cannot serve.
    */
  val MaxBinsKey = "spark.graft.rangeJoin.maxBins"

  private def binWidth: Long =
    try session.conf.get(ConfKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def maxBins: Long =
    try math.max(1L, session.conf.get(MaxBinsKey, "1048576").toLong)
    catch { case _: NumberFormatException => 1048576L }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if cond.deterministic =>
        rewrite(j, cond, w).getOrElse(j)
    }
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (ts, bound, tsFromLeft) for a conjunct that bounds a ts from one
    * side by an expression from the other; `lower` selects which
    * direction counts as the lower bound.
    */
  private def asBound(c: Expression, left: LogicalPlan, right: LogicalPlan,
      lower: Boolean): Option[(Expression, Expression, Boolean)] = {
    def sides(ts: Expression, bound: Expression): Option[(Expression, Expression, Boolean)] = {
      if (!isIntegral(ts) || !isIntegral(bound)) return None
      val (lo, ro) = (left.outputSet, right.outputSet)
      if (ts.references.nonEmpty && bound.references.nonEmpty &&
        ts.references.subsetOf(lo) && bound.references.subsetOf(ro))
        Some((ts, bound, true))
      else if (ts.references.nonEmpty && bound.references.nonEmpty &&
        ts.references.subsetOf(ro) && bound.references.subsetOf(lo))
        Some((ts, bound, false))
      else None
    }
    c match {
      case GreaterThanOrEqual(a, b) => if (lower) sides(a, b) else sides(b, a)
      case GreaterThan(a, b)        => if (lower) sides(a, b) else sides(b, a)
      case LessThanOrEqual(a, b)    => if (lower) sides(b, a) else sides(a, b)
      case LessThan(a, b)           => if (lower) sides(b, a) else sides(a, b)
      case _ => None
    }
  }

  private def rewrite(j: Join, cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // idempotence / hands-off guard (see scaladoc)
    val equis = conjuncts.collect { case e @ EqualTo(_, _) => e }
    if (equis.exists(_.references.exists(a =>
        a.name.startsWith("__bin") || a.name.startsWith("__graft_bin")))) return None

    val lowers = conjuncts.flatMap(c => asBound(c, j.left, j.right, lower = true).map(c -> _))
    val uppers = conjuncts.flatMap(c => asBound(c, j.left, j.right, lower = false).map(c -> _))
    // one (ts, lo, hi) triple with a shared ts and bounds from one side
    val pair = (for {
      (lc, (lts, lo, ltsLeft)) <- lowers
      (uc, (uts, hi, utsLeft)) <- uppers
      if ltsLeft == utsLeft && lts.semanticEquals(uts)
    } yield (lc, uc, lts, lo, hi, ltsLeft)).headOption
    pair.flatMap { case (lc, uc, ts, lo, hi, tsOnLeft) =>
      // TimeZoneAwareExpressions (Cast, Sequence) resolve only with a
      // timezone attached — the analyzer normally stamps it, but this
      // runs post-analysis, so stamp it ourselves or the optimizer
      // rejects the plan as newly-unresolved
      val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
      val div = (e: Expression) => IntegralDivide(Cast(e, LongType, tz), Literal(w))
      val binI = AttributeReference("__graft_bin_i", LongType)()
      // Degenerate-interval guards on the explode (see [[MaxBinsKey]]):
      //  - inverted (lo > hi → loBin > hiBin): the range predicates are
      //    unsatisfiable, so emit NO bins — Sequence would otherwise
      //    auto-step -1 and generate descending bins that only waste
      //    join work before the exact filter kills them;
      //  - span > maxBins: fail fast with a remediation-pointing error
      //    instead of Sequence's opaque 2³¹ failure mode.
      val loBin = div(lo)
      val hiBin = div(hi)
      val mb = maxBins
      val hiGuarded = If(
        GreaterThan(Subtract(hiBin, loBin), Literal(mb)),
        Cast(RaiseError(Literal(
          s"graft range-join rewrite: an interval spans more than $mb bins at " +
            s"$ConfKey=$w — raise $ConfKey (bin width should approximate the " +
            s"typical interval length) or $MaxBinsKey")), LongType),
        hiBin)
      val emptyBins = Literal.create(Seq.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))
      val bins = If(GreaterThan(loBin, hiBin), emptyBins,
        new Sequence(loBin, hiGuarded, None, tz))
      val expand = (iSide: LogicalPlan) => Generate(
        Explode(bins),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binI), child = iSide)
      val binP = Alias(div(ts), "__graft_bin_p")()
      val project = (pSide: LogicalPlan) => Project(pSide.output :+ binP, pSide)
      val others = conjuncts.filterNot(c => c.eq(lc) || c.eq(uc) || equis.exists(_.eq(c)))
      val newCond = (equis :+ EqualTo(binI, binP.toAttribute))
        .reduceLeft[Expression](And(_, _))
      // preserve the original left/right roles: bin-project the ts side,
      // bin-explode the interval side
      val joined =
        if (tsOnLeft) Join(project(j.left), expand(j.right), Inner, Some(newCond), j.hint)
        else Join(expand(j.left), project(j.right), Inner, Some(newCond), j.hint)
      val filtered = Filter((Seq(lc, uc) ++ others).reduceLeft[Expression](And(_, _)), joined)
      Some(Project(j.output, filtered))
    }
  }
}
