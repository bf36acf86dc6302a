package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Pass-through marker a query author wraps around a grouping key to
  * declare it SKEWED — the opt-in signal [[SaltedAggRewrite]] fires on
  * (the C40 `key_skew` profile / `Audit.skewProfile` is how you LEARN a
  * key is skewed; this hint is how you tell the planner). Evaluates to
  * its child byte-for-byte, so a plan that bails out of the rewrite
  * (or a session without the rule installed) still computes the exact
  * same result — the hint can never change semantics, only plans. */
case class SkewHint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): SkewHint = copy(child = newChild)
  override def sql: String = s"graft_skew_hint(${child.sql})"
}

/** Optimizer rule: rewrite a hint-tagged hash aggregation over a
  * skewed key into the salted two-phase form the C11/C11b queries
  * prove by hand. By the time extraOptimizations run, the main
  * optimizer's PullOutGroupingExpressions has normalized every
  * non-attribute grouping key into `_groupingexpression` aliases in a
  * Project directly under the Aggregate — so the matched shape is
  *
  *   Aggregate(gAttrs, [keys..., agg_1 ... agg_n],
  *     Project([... skew_hint-tagged alias ...], child))
  *
  * and the rewrite emits
  *
  *   Aggregate(gAttrs,
  *             [keys..., merge_1(p_1) ... merge_n(p_n)],
  *     Aggregate(gAttrs :+ _graft_salt, [gAttrs..., p_1 ... p_n],
  *       Project(stripped list :+ spark_partition_id() AS _graft_salt,
  *               child)))
  *
  * Why a logical rewrite when hash aggregation already combines
  * map-side: partial aggregation bounds what each MAP task ships, but
  * every map task's partial row for a hot key still converges on ONE
  * reducer; when the aggregation state is not O(1) per key, or the
  * aggregate feeds further stages AQE can't re-split, that reducer is
  * the straggler. The salted form makes the spread explicit in the
  * PLAN: the hot key's partials meet at one reducer per (key, input
  * partition) first, and the closing merge handles a
  * partitions-per-key-sized frame, never a data-sized one. This closes
  * the loop on the C40 skew profile: measure skew with `key_skew`, tag
  * the key with [[SkewHint]], and the optimizer emits the plan C11b
  * hand-builds.
  *
  * Safety (the TopKRewrite discipline — bail out unless the salted
  * form is provably the same function):
  *  - every aggregate is Count / Sum / Min / Max, non-DISTINCT, no
  *    FILTER clause: the four exactly-decomposable merges (count→sum,
  *    sum→sum, min→min, max→max). avg/collect/first/UDAFs keep their
  *    plan (avg's sum/count split changes the result type lattice;
  *    DISTINCT under salting would double-count across salt groups).
  *  - every grouping expression is already an attribute (the
  *    PullOutGroupingExpressions invariant) — anything else bails.
  *  - every output column is a grouping key (bare or renamed) or a
  *    direct aggregate alias — composite expressions over aggregates
  *    bail.
  *  - DecimalType sums bail entirely (r14 ADVICE: a non-ANSI partial
  *    overflowing to null would be silently SKIPPED by the outer Sum —
  *    non-null wrong total where single-phase returns null); integral/
  *    floating sums merge with the result cast back to the
  *    single-phase type; Count's sum-of-partials is coalesced to 0 so
  *    the output stays non-nullable.
  * Whether the rewrite fires or bails, every [[SkewHint]] marker is
  * stripped before physical planning (it is a pass-through, so the
  * single-phase plan runs untouched on bail-out).
  */
object SaltedAggRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transform {
      case agg @ Aggregate(_, _, proj: Project, _)
          if proj.projectList.exists(
            _.exists(_.isInstanceOf[SkewHint])) =>
        rewrite(agg, proj).getOrElse(agg)
    }
    // strip every remaining marker (bail-outs, hints outside the
    // matched shape): SkewHint is a pass-through, so this is always a
    // semantic no-op — no marker reaches physical planning
    rewritten.transformAllExpressions { case SkewHint(c) => c }
  }

  private def strip(ne: NamedExpression): NamedExpression =
    ne.transform { case SkewHint(c) => c }.asInstanceOf[NamedExpression]

  private def supported(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && ae.mode == Complete &&
      (ae.aggregateFunction match {
        // Decimal Sum bails (r14 ADVICE): in non-ANSI mode a
        // per-(key,salt) partial that overflows the widened precision
        // becomes null, and the outer Sum SKIPS nulls — a silently
        // wrong non-null total where the single-phase plan returns
        // null. Long sums wrap associatively (identical either way)
        // and ANSI throws in both plans, but the rewrite must be safe
        // under every conf, so DecimalType keeps its single-phase plan.
        case s: Sum => !s.dataType.isInstanceOf[DecimalType]
        case _: Count | _: Min | _: Max => true
        case _ => false
      })

  private def rewrite(agg: Aggregate, proj: Project): Option[LogicalPlan] = {
    val groupAttrs: Seq[Attribute] = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val groupIds = groupAttrs.map(_.exprId).toSet

    // classify outputs: key passthroughs stay verbatim; direct agg
    // aliases get a partial/merge pair; anything else bails
    val aggAliases: Seq[(Alias, AggregateExpression)] =
      agg.aggregateExpressions.flatMap {
        case a: AttributeReference if groupIds(a.exprId) => None
        case Alias(a: AttributeReference, _) if groupIds(a.exprId) => None
        case al @ Alias(ae: AggregateExpression, _) if supported(ae) =>
          Some((al, ae))
        case _ => return None
      }
    if (aggAliases.isEmpty) return None

    // salt: one value per input partition, computed in the (stripped)
    // pulled-out Project the aggregate already owns
    val saltAlias = Alias(SparkPartitionID(), "_graft_salt")()
    val proj2 = Project(proj.projectList.map(strip) :+ saltAlias,
      proj.child)

    // inner: the SAME aggregate functions per (keys, salt) — each is
    // exactly the single-phase plan's per-map-task partial state
    val partials = aggAliases.zipWithIndex.map { case ((_, ae), i) =>
      Alias(ae, s"_graft_p$i")()
    }
    val inner = Aggregate(
      (groupAttrs :+ saltAlias.toAttribute).asInstanceOf[Seq[Expression]],
      groupAttrs ++ partials, proj2)

    // outer: merge per key, rebuilding every aggregate output under
    // its ORIGINAL exprId and name so parent operators are untouched;
    // key outputs (bare or renamed) pass through verbatim — they
    // reference grouping attrs the inner aggregate re-emits unchanged
    val mergeOf: Map[ExprId, NamedExpression] =
      aggAliases.zip(partials).map { case ((al, ae), p) =>
        val pAttr = p.toAttribute
        val merged: Expression = ae.aggregateFunction match {
          case _: Count =>
            Coalesce(Seq(Sum(pAttr).toAggregateExpression(),
              Literal(0L)))
          case _: Sum =>
            val m = Sum(pAttr).toAggregateExpression()
            if (m.dataType == al.dataType) m else Cast(m, al.dataType)
          case _: Min => Min(pAttr).toAggregateExpression()
          case _: Max => Max(pAttr).toAggregateExpression()
          case _ => return None // unreachable: vetted by supported()
        }
        al.exprId -> Alias(merged, al.name)(exprId = al.exprId)
      }.toMap
    val outerExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      ne => mergeOf.getOrElse(ne.exprId, ne)
    }
    Some(Aggregate(groupAttrs.asInstanceOf[Seq[Expression]],
      outerExprs, inner))
  }
}
