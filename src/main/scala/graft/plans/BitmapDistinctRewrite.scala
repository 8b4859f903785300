package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Injected optimizer rule ([[graft.GraftExtensions]]): rewrite an
  * integer `COUNT(DISTINCT x)` aggregate into the two-level EXACT bitmap
  * form —
  *
  * {{{
  *   Aggregate(g, count(distinct x))
  *     ⇒ Aggregate(g, coalesce(sum(bitmap_count(bm)), 0))
  *         over Aggregate(g ∪ bitmap_bucket_number(x),
  *                        bm = bitmap_construct_agg(bitmap_bit_position(x)))
  * }}}
  *
  * Why: Spark plans a distinct aggregate as a per-(group, value)
  * de-duplicating Exchange — the shuffle carries every distinct VALUE.
  * The bitmap form shuffles one ≤4 KiB bitmap per (group, 32768-id
  * bucket) with partial `bitmap_construct_agg` combining map-side, so
  * for dense integer id spaces (user/account ids — the audience case)
  * the shuffle volume drops from O(distinct values) rows to
  * O(occupied buckets) fixed-size payloads, and stays EXACT (buckets
  * partition the id space; per-bucket counts add; see the probe-verified
  * semantics: negative ids, nulls ignored, all-null groups → 0 via the
  * COALESCE).
  *
  * Scope is deliberately conservative — the rewrite fires only when ALL
  * of:
  *   - the aggregate's only aggregate function is one unfiltered
  *     `COUNT(DISTINCT x)` with integral `x` (every other output column
  *     is a grouping pass-through);
  *   - the plan is batch (streaming state layout must not change);
  *   - `spark.graft.bitmapCountDistinct.enabled` (default true for
  *     extension sessions) is not set false.
  * Mixed distinct/non-distinct aggregates keep Spark's Expand planning.
  * Output attribute ids are preserved, so parent plans re-resolve
  * nothing. `agg_bitmap_distinct` ([[graft.ops.Audience]]) is the same
  * idea as an explicit, persistable pre-aggregate; this rule applies it
  * transparently to ad-hoc queries.
  */
object BitmapDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.bitmapCountDistinct.enabled"

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The single unfiltered COUNT(DISTINCT integral) in this aggregate,
    * if and only if it is the aggregate's ONLY aggregate function.
    */
  private def soleCountDistinct(agg: Aggregate): Option[AggregateExpression] = {
    val aggFns = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    aggFns match {
      case Seq(ae @ AggregateExpression(Count(Seq(x)), _, true, None, _))
          if isIntegral(x.dataType) && x.deterministic => Some(ae)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transformUp {
      case agg: Aggregate if !agg.isStreaming && soleCountDistinct(agg).isDefined =>
        rewrite(agg, soleCountDistinct(agg).get)
    }
  }

  /** The bitmap scalar expressions are RuntimeReplaceable, and the
    * optimizer's ReplaceExpressions pass (Finish Analysis batch) has
    * already run by the time injected operator-optimization rules fire —
    * so inject their `replacement` trees directly or they reach
    * execution unevaluable.
    */
  private def strip(e: Expression): Expression = e match {
    case r: RuntimeReplaceable => strip(r.replacement)
    case other => other
  }

  private def rewrite(agg: Aggregate, countExpr: AggregateExpression): LogicalPlan = {
    // the bitmap expressions take LONG input, and an optimizer-stage
    // rewrite gets no re-analysis pass to insert implicit casts — widen
    // narrower integral ids explicitly (distinctness is preserved)
    val x0 = countExpr.aggregateFunction.children.head
    val x = if (x0.dataType == LongType) x0
      else Cast(x0, LongType)
    // grouping expressions surfaced through the inner aggregate: plain
    // attributes pass through as themselves; computed groupings get a
    // named slot the outer level re-references
    val groupingOut: Seq[(Expression, NamedExpression)] = agg.groupingExpressions.map {
      case a: Attribute => (a, a)
      case g => (g, Alias(g, "__graft_grp")())
    }
    val bm = Alias(
      AggregateExpression(
        BitmapConstructAgg(strip(BitmapBitPosition(x))), Complete, isDistinct = false),
      "__graft_bm")()
    val inner = Aggregate(
      agg.groupingExpressions :+ strip(BitmapBucketNumber(x)),
      groupingOut.map(_._2) :+ bm,
      agg.child)
    val sumCounts = Coalesce(Seq(
      AggregateExpression(Sum(strip(BitmapCount(bm.toAttribute))), Complete, isDistinct = false),
      Literal(0L)))
    // keep every original output NamedExpression (and its exprId):
    // swap the count-distinct for the bitmap sum, and re-point computed
    // grouping expressions at the inner aggregate's named slots
    val outerAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformDown {
        case ae: AggregateExpression if ae eq countExpr => sumCounts
        case e if groupingOut.exists(g =>
            !g._1.isInstanceOf[Attribute] && g._1.semanticEquals(e)) =>
          groupingOut.find(_._1.semanticEquals(e)).get._2.toAttribute
      }.asInstanceOf[NamedExpression]
    }
    Aggregate(groupingOut.map(_._2.toAttribute), outerAggExprs, inner)
  }
}
