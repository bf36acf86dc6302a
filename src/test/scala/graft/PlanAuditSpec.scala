package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{ExpandExec, GenerateExec, LocalLimitExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Physical-plan audit for the two silent-scale-killer classes the
  * window audit doesn't see (r9, from the r8 verdict):
  *
  *  1. CARTESIAN products — a `crossJoin` whose sides are both
  *     non-broadcast plans as `CartesianProductExec`: |L|·|R| work,
  *     instant death at corpus scale. Every documented metadata
  *     crossJoin in the suite broadcasts its k-row side, which plans
  *     as BroadcastNestedLoopJoin instead and never hits this audit.
  *  2. SINGLE-PARTITION shuffles — an `Exchange SinglePartition` whose
  *     child is not a partial aggregate (partial agg emits one row per
  *     upstream task, so its funnel is task-count-sized) or a local
  *     limit (k rows per task): anything else serializes a
  *     potentially corpus-proportional frame through one task.
  *
  * Plans are built with `autoBroadcastJoinThreshold = -1`: at test SF
  * every table is under the default 10 MB threshold, so Spark's
  * size-based auto-broadcast would hide exactly the joins that stop
  * broadcasting at 100 TB. Disabling it plans every join the way a
  * 1000-executor cluster over big inputs would — only EXPLICIT
  * `F.broadcast` hints (author-asserted bounded frames) survive as
  * broadcasts, which is the honest shape to audit.
  *
  * Like WindowAuditSpec, the allowlist carries the documented bound per
  * query and a staleness check keeps it honest in both directions.
  */
class PlanAuditSpec extends SparkSpec {

  /** query -> why its cartesian product is bounded at any scale. */
  private val boundedCartesians: Map[String, String] = Map.empty

  /** query -> why its single-partition exchange's input is bounded. */
  private val boundedFunnels: Map[String, String] = Map.empty

  /** Structural ≤1-row proof: an ungrouped (global) aggregate emits
    * exactly one row; cardinality-preserving/reducing nodes keep the
    * bound; row-EXPANDING nodes (generate/expand) and joins other than
    * a 1×1 cartesian void it. A cartesian with a proved 1-row side is
    * a scalar join — |other side| output rows, safe at any scale (the
    * suite's documented metadata crossJoins all have this shape). */
  private def maxOneRow(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec    => a.groupingExpressions.isEmpty
    case c: CartesianProductExec => maxOneRow(c.left) && maxOneRow(c.right)
    case _: GenerateExec         => false
    case _: ExpandExec           => false
    case u: UnaryExecNode        => maxOneRow(u.child)
    case _                       => false
  }

  private def audit(p: SparkPlan): (Seq[String], Seq[String]) = {
    val carts = scala.collection.mutable.ArrayBuffer.empty[String]
    val funnels = scala.collection.mutable.ArrayBuffer.empty[String]
    p.foreachUp {
      case c: CartesianProductExec
          if !maxOneRow(c.left) && !maxOneRow(c.right) =>
        carts += s"${c.left.nodeName} x ${c.right.nodeName}"
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        e.child match {
          case _: BaseAggregateExec => () // partial agg: 1 row per task
          case _: LocalLimitExec    => () // k rows per task
          case c                    => funnels += c.nodeName
        }
      case _ =>
    }
    (carts.toSeq, funnels.toSeq)
  }

  test("no undocumented cartesian or single-partition funnel in any batch plan") {
    // a derived session so the conf tweak cannot leak into other suites
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val results = SparkEntry.allQueries
      .filterNot(_.name.startsWith("stream_"))
      .map { q =>
        val (c, f) =
          try audit(q.fn(s, sf).queryExecution.sparkPlan)
          catch {
            case e: Throwable =>
              (Seq(s"PLAN ERROR: ${e.getMessage}"), Seq.empty[String])
          }
        (q.name, c, f)
      }
    graft.operators.CacheScope.release(s)

    val cartOffenders = results.collect { case (n, c, _) if c.nonEmpty => n -> c }.toMap
    val undocCarts = cartOffenders.keySet -- boundedCartesians.keySet
    assert(undocCarts.isEmpty,
      "\ncartesian products without a documented bound (broadcast the " +
        "small side explicitly, or document why both sides are bounded):\n" +
        undocCarts.toSeq.sorted.map(n =>
          s"  $n: ${cartOffenders(n).mkString(" | ")}").mkString("\n"))
    val staleCarts = boundedCartesians.keySet -- cartOffenders.keySet
    assert(staleCarts.isEmpty,
      s"stale cartesian allowlist entries (remove): " +
        staleCarts.toSeq.sorted.mkString(", "))

    val funnelOffenders = results.collect { case (n, _, f) if f.nonEmpty => n -> f }.toMap
    val undocFunnels = funnelOffenders.keySet -- boundedFunnels.keySet
    assert(undocFunnels.isEmpty,
      "\nsingle-partition exchanges with a non-aggregate, non-limit " +
        "child (repartition the work or document the bound):\n" +
        undocFunnels.toSeq.sorted.map(n =>
          s"  $n: ${funnelOffenders(n).mkString(" | ")}").mkString("\n"))
    val staleFunnels = boundedFunnels.keySet -- funnelOffenders.keySet
    assert(staleFunnels.isEmpty,
      s"stale funnel allowlist entries (remove): " +
        staleFunnels.toSeq.sorted.mkString(", "))
  }
}
