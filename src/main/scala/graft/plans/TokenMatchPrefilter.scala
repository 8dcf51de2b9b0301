package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Token-match prefiltering: a term query over analyzed text —
  *
  *   `array_contains(regexp_extract_all(x, pat, 0), 'w')`
  *
  * — implies the far cheaper `contains(x, 'w')`, because every
  * extracted token is by construction a literal substring of `x`. The
  * rule conjoins that necessary condition IN FRONT of the original
  * predicate inside `Filter`s, so the vectorized substring scan
  * short-circuits the regexp automaton on every non-matching row.
  * Selective term queries at 100 TB spend almost all their scan CPU
  * tokenizing rows that cannot match; the prefilter turns that into a
  * memcmp-speed reject (the same move Lucene makes by consulting the
  * term dictionary before ever scoring a document — here expressed
  * purely at the optimizer level, no index required).
  *
  * Soundness (value-equivalence of `contains(x,w) AND p` with `p`):
  *  - `p` true  ⇒ `w` is an extracted token ⇒ `w` substring of `x`
  *    ⇒ the added conjunct is true and drops out;
  *  - `p` false with `x` non-null ⇒ either conjunct order yields false;
  *  - `x` null ⇒ both `p` and the conjunct are null ⇒ AND stays null.
  *  So the rewrite never changes a filter's verdict, only its cost.
  *
  * Necessary conditions propagate structurally: through `AND` (either
  * side's necessary condition is necessary for the whole) and through
  * `OR` (the disjunction of both sides' necessary conditions — this is
  * what lets a parsed `query_string` boolean like
  * `(a AND b) OR (c AND d)` gain the prefilter
  * `contains(x,a) OR contains(x,c)`). Only top-level conjuncts of the
  * filter condition are strengthened — a naked `OR` arm must never
  * donate a global conjunct — and conjuncts already present (checked
  * by `semanticEquals`) are not re-added, which makes the rule a
  * fixed point of itself. Registered cluster-wide by
  * [[graft.GraftExtensions]] alongside [[CollectStrengthReduction]].
  */
object TokenMatchPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** A cheap condition implied by `e` being true, if one is derivable. */
  private def necessary(e: Expression): Option[Expression] = e match {
    case ArrayContains(RegExpExtractAll(x, Literal(_, StringType), Literal(_, _)),
                       l @ Literal(w: UTF8String, StringType))
        if w != null && w.numChars() > 0 && x.deterministic =>
      Some(Contains(x, l))
    case And(l, r) => necessary(l).orElse(necessary(r))
    case Or(l, r) =>
      for { a <- necessary(l); b <- necessary(r) } yield Or(a, b)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap(necessary)
        .filterNot(n => conjuncts.exists(_.semanticEquals(n)))
        .foldLeft(Seq.empty[Expression]) { (acc, n) => // semantic dedup
          if (acc.exists(_.semanticEquals(n))) acc else acc :+ n
        }
      if (extra.isEmpty) f
      else Filter((extra ++ conjuncts).reduce(And), child)
  }
}
