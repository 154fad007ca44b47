package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Coalesce, EqualNullSafe, EqualTo, Expression, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** OR-of-equalities join expansion — the optional rewrite sketched in
  * SURVEY §7.4 for the reference's banded-join idiom
  * (/root/reference/README.md:150-164), generalized.
  *
  * An inner join whose condition is a pure disjunction of cross-side
  * equalities —
  * `a JOIN b ON a.sig[0] = b.sig[0] OR a.sig[1] = b.sig[1] OR ...` —
  * has no equi-join conjunct, so Spark plans it as a broadcast
  * nested-loop / cartesian product: O(|a|·|b|) comparisons, a
  * cluster-killer at any real scale. The classic OR-expansion makes each
  * disjunct an equi-join and unions the DISJOINT pieces:
  *
  * `J(c1 ∨ c2 ∨ c3)  =  J(c1)  ∪all  J(c2 ∧ ¬c1)  ∪all  J(c3 ∧ ¬c1 ∧ ¬c2)`
  *
  * Each piece hash-partitions on its own disjunct's keys (the earlier
  * disjuncts' negations ride along as post-match filters), so the plan is
  * k shuffle joins instead of one quadratic loop. Exact-multiplicity
  * equivalence: a row pair satisfies piece k iff ck is TRUE and every
  * earlier cj is not TRUE, so each matching pair appears in exactly one
  * piece — duplicates in the inputs are preserved, never multiplied. SQL
  * three-valued logic is the trap: `cj` can evaluate to NULL (a null key
  * never equi-matches), and `¬NULL = NULL` would drop a pair whose later
  * disjunct matched, so the negations are `NOT(coalesce(cj, false))`.
  *
  * Fires on an inner join whose deterministic condition has NO equi-join
  * conjunct (with one, Spark already hash-joins and evaluates the OR as a
  * residual filter) but has a conjunct that is a disjunction (≥ 2) of
  * single-equality terms, each strictly referencing both and only the two
  * sides — the shape pushed-down `WHERE` residuals produce, e.g.
  * `ON (bands OR'd) ... WHERE a.id < b.id`. The first such conjunct is
  * expanded; the remaining conjuncts ride along in every piece. Disjunct
  * count is capped (plan size grows linearly per disjunct) by
  * `graft.rewrite.orJoinMaxDisjuncts`, default 16; set it to 0 to disable
  * the rule.
  */
object OrEquiJoinExpansion extends Rule[LogicalPlan] {

  private def maxDisjuncts: Int =
    scala.util.Try(conf.getConfString("graft.rewrite.orJoinMaxDisjuncts"))
      .toOption.flatMap(_.toIntOption).getOrElse(16)

  private def splitOr(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => splitOr(l) ++ splitOr(r)
    case x => Seq(x)
  }

  /** A deterministic equality with one side entirely from `left` and the
    * other entirely from `right` (either orientation). */
  private def sidedEquality(e: Expression, left: AttributeSet,
                            right: AttributeSet): Boolean = {
    def sided(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left) && b.references.subsetOf(right)) ||
          (a.references.subsetOf(right) && b.references.subsetOf(left)))
    e match {
      case eq @ EqualTo(a, b) => eq.deterministic && sided(a, b)
      case eq @ EqualNullSafe(a, b) => eq.deterministic && sided(a, b)
      case _ => false
    }
  }

  /** `cj` is not TRUE — null-safe negation (`¬NULL` must admit, not drop). */
  private def notTrue(cj: Expression): Expression =
    Not(Coalesce(Seq(cj, Literal(false))))

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case x => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) if cond.deterministic =>
      val (l, r) = (left.outputSet, right.outputSet)
      val conjuncts = splitAnd(cond)
      val hasEquiKey = conjuncts.exists(sidedEquality(_, l, r))
      val cap = maxDisjuncts
      val expandable = if (hasEquiKey) None else
        conjuncts.zipWithIndex.iterator.map { case (c, i) => (splitOr(c), i) }
          .collectFirst {
            case (ds, i) if ds.length >= 2 && ds.length <= cap &&
              ds.forall(sidedEquality(_, l, r)) => (ds, conjuncts.patch(i, Nil, 1))
          }
      expandable match {
        case Some((disjuncts, rest)) =>
          val pieces = disjuncts.zipWithIndex.map { case (ck, k) =>
            val guards = disjuncts.take(k).map(notTrue)
            Join(left, right, Inner, Some((ck +: (guards ++ rest)).reduce(And)), hint)
          }
          Union(pieces)
        case None => j
      }
  }
}
