package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** Aggregation strength reduction: rewrite scalar consumers of
  * `collect_list`/`collect_set` into constant-memory aggregates, so
  * the unbounded per-group array buffer — and with it the
  * non-codegen `ObjectHashAggregate` — disappears whenever the array
  * itself is never needed:
  *
  *   - `size(collect_list(e))`            → `count(e)`
  *   - `size(collect_set(e))`             → `count(DISTINCT e)`
  *   - `array_min/array_max(collect_*(e))`→ `min(e)` / `max(e)`
  *   - `array_contains(collect_*(e), v)`  → `max(coalesce(e = v, false))`
  *     (null-guarded on `v`: `array_contains(_, NULL)` answers NULL)
  *   - `Filter(exists(collected, λ), Aggregate)` → a boolean
  *     `max(coalesce(λ(e), false))` flag aggregated alongside, the
  *     filter re-pointed at the flag (null ≡ false in filter context),
  *     original output restored by a `Project`. When the array was
  *     only consumed by the `exists`, `ColumnPruning` then deletes the
  *     collect itself — the naive "build the nested doc, filter on its
  *     array" plan loses its array build entirely.
  *
  * Wrappers that don't change the element multiset are seen through:
  * `sort_array` (order is irrelevant to size/contains/min/max/exists)
  * and `transform` (the lambda composes into the element expression
  * for min/max/contains/exists; `size` counts the PRE-transform
  * element, because `transform` preserves length but not nulls or
  * injectivity — see [[Collected]]).
  *
  * Equivalences used: collect_list/collect_set drop NULL inputs, so
  * `count(e)` (non-null count) matches `size`; min/max/contains/exists
  * are multiset-insensitive to both order and (for their semantics
  * here) set-dedup; `exists` three-valued logic collapses under a
  * Filter, where NULL and FALSE both drop the row.
  *
  * At 100 TB the difference is structural, not incremental: a
  * collect-based plan shuffles every child row's payload and holds the
  * largest group's array in one executor buffer; the reduced plan
  * shuffles one partial aggregate per group per mapper and never
  * leaves whole-stage codegen. Registered cluster-wide by
  * [[graft.GraftExtensions]] (`injectOptimizerRule`, so column pruning
  * runs after it in the same fixed point); attachable to a live
  * session via `spark.experimental.extraOptimizations`.
  */
object CollectStrengthReduction extends Rule[LogicalPlan] {

  /** What `e` collects, seen through wrappers. Carries everything the
    * individual rewrites need to stay SOUND:
    *  - `ae`: the AggregateExpression to copy mode/filter from;
    *  - `raw`: the collect's own child — the LENGTH carrier. `size`
    *    must count this, never the transformed element: `transform`
    *    is length-preserving but its lambda may be non-injective or
    *    null-producing, and both `count` (skips nulls) and
    *    `count(DISTINCT)` (post-dedup) would diverge from `size` if
    *    the lambda were composed in;
    *  - `el`: the element AFTER composing any `transform` lambdas —
    *    what min/max/contains/exists actually see;
    *  - `isSet`: collect_set (dedup before any transform). */
  private case class Collected(ae: AggregateExpression, raw: Expression,
                               el: Expression, isSet: Boolean,
                               transformed: Boolean = false)

  private def collected(e: Expression): Option[Collected] = e match {
    case ae @ AggregateExpression(cl: CollectList, _, false, _, _) =>
      Some(Collected(ae, cl.child, cl.child, isSet = false))
    case ae @ AggregateExpression(cs: CollectSet, _, false, _, _) =>
      Some(Collected(ae, cs.child, cs.child, isSet = true))
    case SortArray(inner, _) => collected(inner)
    case ArrayTransform(inner, LambdaFunction(body, Seq(lv: NamedLambdaVariable), _)) =>
      collected(inner).map { c =>
        body match {
          // identity lambda — the shape NullPropagation leaves behind
          // after simplifying a null-handling lambda against the
          // non-null element of a collect output (containsNull=false).
          // A pass-through, not a transform: keeps contains/exists
          // rewrites available on nullable inputs
          case v: NamedLambdaVariable if v.exprId == lv.exprId => c
          case _ => c.copy(el = body.transformUp {
            case v: NamedLambdaVariable if v.exprId == lv.exprId => c.el
          }, transformed = true)
        }
      }
    case _ => None
  }

  private def fresh(ae: AggregateExpression, f: AggregateFunction,
                    distinct: Boolean): AggregateExpression =
    ae.copy(aggregateFunction = f, isDistinct = distinct,
      resultId = NamedExpression.newExprId)

  /** max(coalesce(pred, false)) — TRUE iff some element satisfies
    * pred, with the element-level NULL pinned to false. The predicate
    * is evaluated over EVERY group row, but collect_list/collect_set
    * drop NULL inputs before the array is built — a row whose raw
    * element is NULL has no counterpart array element, so it must
    * contribute nothing. `IsNotNull(raw)` is conjoined to enforce
    * that (without it, `exists(xs, e => e.isNull)` — always false on
    * a real collected array — would flag true whenever any input was
    * null, and a null-defaulting transform lambda would resurrect
    * dropped rows). */
  private def anyMatch(cc: Collected, pred: Expression): Expression = {
    val guarded = if (cc.raw.nullable) And(IsNotNull(cc.raw), pred) else pred
    fresh(cc.ae, Max(Coalesce(Seq(guarded, Literal(false)))), distinct = false)
  }

  /** The element as min/max must see it: rows dropped by the collect
    * (null raw) contribute NULL, which aggregate Min/Max skip — the
    * same skip a real array_min/array_max does on elements that were
    * never collected. Only needed under a transform: untransformed,
    * `el` IS `raw` and Min/Max already skip its nulls. */
  private def droppedAsNull(cc: Collected): Expression =
    if (cc.transformed && cc.raw.nullable)
      If(IsNotNull(cc.raw), cc.el, Literal.create(null, cc.el.dataType))
    else cc.el

  private def reduceScalars(ne: NamedExpression): NamedExpression =
    ne.transformUp {
      case s @ Size(c, _) => collected(c) match {
        // count the RAW element (see Collected.raw): count(e) for
        // collect_list, count(DISTINCT e) for collect_set
        case Some(cc) =>
          Cast(fresh(cc.ae, Count(Seq(cc.raw)), distinct = cc.isSet),
            IntegerType)
        case None => s
      }
      case m @ ArrayMax(c) => collected(c) match {
        // aggregate Min/Max ignore nulls exactly like array_min/max
        // ignore null elements, so a null-producing transform is fine
        case Some(cc) => fresh(cc.ae, Max(droppedAsNull(cc)), distinct = false)
        case None => m
      }
      case m @ ArrayMin(c) => collected(c) match {
        case Some(cc) => fresh(cc.ae, Min(droppedAsNull(cc)), distinct = false)
        case None => m
      }
      case ac @ ArrayContains(c, v)
          if v.deterministic && !AggregateExpression.containsAggregate(v) =>
        collected(c) match {
          // Sound for the raw collect (null INPUTS are dropped before
          // they ever reach the array, so they contribute false to
          // the flag exactly as they contribute nothing to the
          // array). A composed transform lambda, though, can inject
          // nulls INTO the array — real array_contains then answers
          // NULL on miss where the flag would answer false — so a
          // transformed, still-nullable element is not rewritten.
          case Some(cc) if !cc.transformed || !cc.el.nullable =>
            val flag = anyMatch(cc, EqualTo(cc.el, v))
            // array_contains(_, NULL) is NULL, not false
            if (v.nullable) If(IsNull(v), Literal.create(null, BooleanType), flag)
            else flag
          case _ => ac
        }
    }.asInstanceOf[NamedExpression]

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // exists over a collected array, directly above the aggregation
    // that builds it: aggregate the predicate as a flag instead of
    // re-walking the built array (and unlock pruning the build)
    case f @ Filter(cond, agg: Aggregate) =>
      val aliased = agg.aggregateExpressions.collect {
        case a: Alias => a.toAttribute -> a.child
      }.toMap
      val extra = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
      val newCond = cond.transformUp {
        case ex @ ArrayExists(attr: Attribute,
            LambdaFunction(body, Seq(lv: NamedLambdaVariable), _), _)
            if aliased.contains(attr) =>
          collected(aliased(attr)) match {
            case Some(cc) =>
              val pred = body.transformUp {
                case v: NamedLambdaVariable if v.exprId == lv.exprId => cc.el
              }
              // pred must close over the aggregate's CHILD scope only —
              // a reference to another agg output can't move inside
              if (pred.references.subsetOf(agg.child.outputSet)) {
                val alias = Alias(anyMatch(cc, pred), s"__exists_${extra.size}")()
                extra += alias
                EqualTo(alias.toAttribute, Literal(true))
              } else ex
            case None => ex
          }
      }
      if (extra.isEmpty) f
      else Project(agg.output, Filter(newCond,
        agg.copy(aggregateExpressions = agg.aggregateExpressions ++ extra)))

    case agg: Aggregate =>
      val reduced = agg.aggregateExpressions.map(reduceScalars)
      if (reduced == agg.aggregateExpressions) agg
      else agg.copy(aggregateExpressions = reduced)
  }
}
