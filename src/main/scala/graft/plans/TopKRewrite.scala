package graft.plans

import graft.functions.TopKStruct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the top-N-per-group window pattern
  *
  *   Filter(rn <= k, [Project(attrs | renaming aliases)]
  *          Window(rn := row_number() over (partition p order o), child))
  *
  * into a bounded-heap aggregation
  *
  *   Project(child cols + rn := pos+1,
  *     Generate(posexplode(top),
  *       Aggregate(p, top_k(struct(o', child cols), k), child)))
  *
  * The window form shuffles and fully sorts EVERY row of every group;
  * the rewrite ships at most k rows per group per map task (partial
  * aggregation) and replaces the per-partition sort with a k-row heap —
  * at 100 TB the difference between sorting the table and a
  * metadata-sized exchange. (Spark's own InferWindowGroupLimit bounds
  * the shuffle similarly but keeps the sort-based window on the
  * survivors; the heap aggregate eliminates it.)
  *
  * rank()/dense_rank() <= k are DELIBERATELY left alone: the heap
  * cannot answer them (boundary ties can push qualifying rows past k
  * ROWS), and Spark 4's native InferWindowGroupLimit already inserts a
  * map-side WindowGroupLimit for all three rank-like functions — a
  * single-scan, pre-shuffle bound of k+ties rows per group per input
  * partition. Any sound rewrite here (e.g. a top-k-distinct-keys
  * LeftSemi prefilter) needs a second scan of the child to re-probe it,
  * which is strictly worse than the built-in. PlanSpec asserts the
  * native WindowGroupLimit fires on the rank pattern instead.
  *
  * Safety: fires only when the ordering maps losslessly onto the
  * keep-largest heap — every sort key DESC (nulls-smallest ordering ==
  * NULLS LAST, the DESC default), or ASC on a non-nullable numeric
  * (negated overflow-safely). Anything else keeps the window plan.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private val MaxK = 10000 // above this a heap per group stops paying off

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      rewrite(f, cond, child).getOrElse(f)
  }

  private def rewrite(f: Filter, cond: Expression,
      below: LogicalPlan): Option[LogicalPlan] = {
    // peel a Project of plain attributes / renaming aliases of
    // attributes between Filter and Window
    def passthrough(e: NamedExpression): Boolean = e match {
      case _: AttributeReference => true
      case Alias(_: AttributeReference, _) => true
      case _ => false
    }
    val (projected, w) = below match {
      case p @ Project(pl, win: Window) if pl.forall(passthrough) =>
        (Some(p), win)
      case win: Window => (None, win)
      case _ => return None
    }
    val Window(winExprs, parts, order, wChild, _) = w
    if (winExprs.length != 1 || order.isEmpty) return None
    if (!parts.forall(_.isInstanceOf[AttributeReference])) return None

    val (rnAttr, rnName, rnId) = winExprs.head match {
      case a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _, _)), name) =>
        (a.toAttribute, name, a.exprId)
      case _ => return None
    }

    val k = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
          if a.exprId == rnId => v
      case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
          if a.exprId == rnId => v - 1
      case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
          if a.exprId == rnId && v == 1 => 1
      case _ => return None
    }
    if (k <= 0 || k > MaxK) return None

    // map each sort key onto the keep-largest heap, or bail. ASC
    // negation excludes float/double: -NaN == NaN would move NaN rows
    // from sorts-last (Spark treats NaN as greatest) to ranked first;
    // integral/decimal negation is exact and overflow-safe via widening.
    val sortKeys: Seq[Expression] = order.map { so =>
      val e = so.child
      so.direction match {
        case Descending if !e.nullable || so.nullOrdering == NullsLast => e
        case Ascending if !e.nullable =>
          e.dataType match {
            case IntegerType | ShortType | ByteType =>
              UnaryMinus(Cast(e, LongType)) // widen: no overflow under ANSI
            case LongType => UnaryMinus(Cast(e, DecimalType(20, 0)))
            case dt: DecimalType if dt.precision < 38 =>
              UnaryMinus(Cast(e, DecimalType(dt.precision + 1, dt.scale)))
            case _ => return None
          }
        case _ => return None
      }
    }

    // payload columns that ARE a (non-negated) sort key are not stored
    // twice: their struct slot is the sort-key slot
    val keyIdOf: Map[ExprId, Int] = sortKeys.zipWithIndex.collect {
      case (a: AttributeReference, i) => a.exprId -> i
    }.toMap
    val payload = wChild.output.filterNot(a => keyIdOf.contains(a.exprId))
    // the heap compares the whole struct — every packed column must be
    // orderable (a map-typed payload would crash the interpreted
    // ordering at runtime)
    if (!(sortKeys.map(_.dataType) ++ payload.map(_.dataType))
        .forall(RowOrdering.isOrderable)) return None
    val structExpr = CreateStruct(sortKeys ++ payload)
    val topAlias = Alias(
      TopKStruct(structExpr, k).toAggregateExpression(), "_graft_top")()
    val agg = Aggregate(parts,
      parts.map(_.asInstanceOf[NamedExpression]) :+ topAlias, wChild)

    val structType = structExpr.dataType.asInstanceOf[StructType]
    val posAttr = AttributeReference("_graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("_graft_row", structType, nullable = false)()
    val gen = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), child = agg)

    // rebuild the original output under the ORIGINAL output exprIds —
    // for a renaming Project the output id is the ALIAS id and the
    // source id is the underlying attribute's
    val partIds = parts.map(_.asInstanceOf[AttributeReference].exprId).toSet
    val sources: Seq[(ExprId, String, ExprId)] = projected match {
      case Some(p) => p.projectList.map {
        case a: AttributeReference => (a.exprId, a.name, a.exprId)
        case al @ Alias(ar: AttributeReference, name) => (ar.exprId, name, al.exprId)
        case _ => return None // unreachable: passthrough() vetted
      }
      case None => w.output.map(a => (a.exprId, a.name, a.exprId))
    }
    val out: Seq[NamedExpression] = sources.map { case (srcId, name, outId) =>
      if (srcId == rnId)
        Alias(Cast(Add(posAttr, Literal(1)), IntegerType), name)(exprId = outId)
      else if (partIds.contains(srcId)) {
        val attr = parts.collectFirst {
          case a: AttributeReference if a.exprId == srcId => a
        }.get
        if (outId == srcId) attr else Alias(attr, name)(exprId = outId)
      } else {
        val idx = keyIdOf.getOrElse(srcId, {
          val p = payload.indexWhere(_.exprId == srcId)
          if (p < 0) return None // not a child column
          sortKeys.length + p
        })
        Alias(GetStructField(rowAttr, idx, Some(name)), name)(exprId = outId)
      }
    }
    Some(Project(out, gen))
  }
}
