package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType
import graft.functions.JaccardSim

/** Optimizer rule: similarity theta-join → inverted-index equi-join.
  *
  * A user writing dedup declaratively produces an all-pairs join:
  *
  * {{{
  *   a.join(b, jaccard_sim($"a.sh", $"b.sh") >= 0.4 && ...)
  * }}}
  *
  * which Spark can only execute as a nested-loop cartesian — O(|a|·|b|)
  * similarity evaluations, hopeless at corpus scale. But a Jaccard
  * lower bound t > 0 implies the pair shares at least one element, so
  * the qualifying pairs are a subset of the pairs produced by an
  * inverted-index equi-join on the array elements — the standard
  * blocking shape (`Dedup.ngramJaccard`) that shuffles each row once
  * per shingle instead of comparing all pairs. This rule performs that
  * rewrite automatically:
  *
  * {{{
  *   Join(L, R, Inner, jaccard_sim(ls, rs) >= t && rest)
  *     ⇒
  *   Project(L.output ++ R.output,
  *     Filter(hl = array_min(array_intersect(ls, rs)) && <original cond>,
  *       Join(Generate(explode(ls), L)  as … hl,
  *            Generate(explode(rs), R) as … hr,
  *            Inner, hl = hr)))
  * }}}
  *
  * Equivalence: the exploded equi-join emits one copy of each
  * element-sharing row pair *per shared element*; the canonical-witness
  * filter `hl = array_min(array_intersect(ls, rs))` keeps exactly the
  * copy joined on the smallest shared element — one copy per pair, no
  * Distinct, so row multiplicities are preserved even when the inputs
  * contain duplicate rows. The original condition is then re-applied
  * verbatim. Any pair passing `jaccard_sim >= t` (t > 0) shares an
  * element and therefore survives candidate generation — no false
  * negatives.
  *
  * Non-goals / guards: fires only on Inner joins whose condition has a
  * conjunct `jaccard_sim(ls, rs) >= t` (or `>`, or the symmetric `<=`/`<`
  * forms) with constant t > 0, ls strictly from the left side, rs
  * strictly from the right (either order), array-typed inputs. The
  * rewritten join's condition carries no `jaccard_sim` conjunct with
  * side-split children, and the generated columns are tagged by name, so
  * the rule cannot re-fire on its own output (it runs inside fixed-point
  * optimizer batches).
  *
  * Distinct-element gate: `jaccard_sim` ASSUMES distinct elements per
  * array (the ShingleHashes contract) but does not enforce it, and for
  * duplicate-bearing inputs both the canonical witness (one copy per
  * shared VALUE, not per duplicate) and the PPJoin size bound (raw
  * lengths) would change results relative to the un-rewritten
  * theta-join. The rule therefore fires only when both anchored arrays
  * are PROVABLY duplicate-free — produced by `ShingleHashes` or wrapped
  * in `array_distinct`, chased through intervening Project aliases.
  * Anything else keeps the user's declared plan untouched (correct,
  * merely unblocked); wrapping the join keys in `array_distinct(...)`
  * opts such a query into the rewrite.
  */
object JaccardJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val GenPrefix = "__graft_shingle_"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _)
        if j.resolved && !bearsGeneratedCols(left) && !bearsGeneratedCols(right) =>
      anchor(cond, left, right) match {
        case Some((ls, rs, t))
            if distinctByConstruction(ls, left) &&
              distinctByConstruction(rs, right) =>
          rewrite(j, left, right, cond, ls, rs, t)
        case _ => j
      }
  }

  private def bearsGeneratedCols(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith(GenPrefix))

  /** True iff the array expression is duplicate-free by construction:
    * a ShingleHashes (hash-distinct contract) or array_distinct result,
    * chased through Project/Aggregate aliases in the join side's subtree.
    */
  @annotation.tailrec
  private def distinctByConstruction(e: Expression, side: LogicalPlan): Boolean =
    e match {
      case _: graft.functions.ShingleHashes => true
      case _: ArrayDistinct                 => true
      case a: AttributeReference =>
        val defs = side.collect {
          case p: Project   => p.projectList
          case g: Aggregate => g.aggregateExpressions
        }.flatten
        defs.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child
        } match {
          case Some(c) => distinctByConstruction(c, side)
          case None    => false
        }
      case _ => false
    }

  /** Find a conjunct bounding JaccardSim(ls, rs) from below by a
    * positive constant, with ls/rs cleanly split across the join sides.
    * Returns (leftSideArray, rightSideArray).
    */
  private def anchor(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def bound(e: Expression): Option[(Expression, Expression, Double)] = e match {
      case GreaterThanOrEqual(JaccardSim(a, b), Literal(t: Double, _)) if t > 0 =>
        Some((a, b, t))
      case GreaterThan(JaccardSim(a, b), Literal(t: Double, _)) if t >= 0 =>
        Some((a, b, t))
      case LessThanOrEqual(Literal(t: Double, _), JaccardSim(a, b)) if t > 0 =>
        Some((a, b, t))
      case LessThan(Literal(t: Double, _), JaccardSim(a, b)) if t >= 0 =>
        Some((a, b, t))
      case _ => None
    }
    splitConjunctivePredicates(cond).iterator.flatMap(bound).collectFirst {
      case (a, b, t)
          if a.dataType.isInstanceOf[ArrayType] &&
            a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet) =>
        (a, b, t)
      case (a, b, t)
          if b.dataType.isInstanceOf[ArrayType] &&
            b.references.subsetOf(left.outputSet) &&
            a.references.subsetOf(right.outputSet) =>
        (b, a, t)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, ls: Expression, rs: Expression, t: Double): LogicalPlan = {
    val ArrayType(let, lcn) = ls.dataType: @unchecked
    val ArrayType(ret, rcn) = rs.dataType: @unchecked
    val hl = AttributeReference(GenPrefix + "l", let, nullable = lcn)()
    val hr = AttributeReference(GenPrefix + "r", ret, nullable = rcn)()
    val genL =
      Generate(Explode(ls), Nil, outer = false, None, Seq(hl), left)
    val genR =
      Generate(Explode(rs), Nil, outer = false, None, Seq(hr), right)
    val candidates =
      Join(genL, genR, Inner, Some(EqualTo(hl, hr)), JoinHint.NONE)
    val canonicalWitness = EqualTo(hl, ArrayMin(ArrayIntersect(ls, rs)))
    // derived size bound (PPJoin length filter): jaccard >= t implies
    // t*|ls| <= |rs| <= |ls|/t — two O(1) comparisons that reject
    // size-incompatible candidates before anything touches the arrays
    def dbl(e: Expression) = Cast(e, org.apache.spark.sql.types.DoubleType)
    val tl = Literal(t)
    val sizeBound = And(
      GreaterThanOrEqual(dbl(Size(rs)), Multiply(tl, dbl(Size(ls)))),
      GreaterThanOrEqual(dbl(Size(ls)), Multiply(tl, dbl(Size(rs)))))
    // evaluation order cheap -> expensive: O(1) size bound, then the
    // native jaccard_sim predicate, then the generic ArrayIntersect
    // witness only on rows that actually qualify
    Project(j.output, Filter(And(sizeBound, And(cond, canonicalWitness)),
      candidates))
  }
}
