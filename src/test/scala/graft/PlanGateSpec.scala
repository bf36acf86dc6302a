package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExpandExec, GenerateExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{CartesianProductExec, SortMergeJoinExec}

/** Pinned plan gate for the suite's HEAVY TEN (r15, verdict item 7 —
  * tools/PlanAudit existed as a harness; this makes the audit a spec
  * that fails a regression instead of printing one):
  *
  *  - no unbounded CartesianProduct in any of the ten plans;
  *  - no SortMergeJoin with a sub-10MB side — a small side must
  *    BROADCAST (hint or auto), because the SMJ plans both sides'
  *    shuffle + sort and at 100× the dim is still broadcastable while
  *    the shuffle is 100× bigger;
  *  - the declared window rewrites actually fire (TopKRewrite's
  *    aggregate on `window_topn`, Spark's InferWindowGroupLimit on the
  *    rank-ties shape).
  *
  * The teeth test proves the gate DETECTS regressions: disabling
  * auto-broadcast re-plans the unhinted small-dim joins as SMJ and the
  * checker must flag them (if it stayed green there, the gate would be
  * decorative).
  *
  * The list is the r14 committed bench's ten most expensive queries —
  * the plans whose regressions cost the most wall-clock. Membership is
  * pinned; re-derive from bench_out.json when the ranking shifts.
  */
class PlanGateSpec extends SparkSpec {

  private val heavyTen = Seq(
    "community_converge", "ktruss_peel", "community_coarsen",
    "hits_scores", "mmr_rerank", "dedup_capture", "ivfpq_residual",
    "frame_scene_cuts", "rrf_fusion", "fk_check")

  private val SMALL = BigInt(10L * 1024 * 1024)

  /** Structural ≤1-row proof (the PlanAuditSpec rule): an ungrouped
    * aggregate emits one row; a cartesian with a 1-row side is a
    * scalar join, safe at any scale. */
  private def maxOneRow(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec    => a.groupingExpressions.isEmpty
    case c: CartesianProductExec => maxOneRow(c.left) && maxOneRow(c.right)
    case _: GenerateExec         => false
    case _: ExpandExec           => false
    case u: UnaryExecNode        => maxOneRow(u.child)
    case _                       => false
  }

  /** Catalyst's size estimate for a physical subtree, from the nearest
    * logical link (None when no link survives planning). */
  private def estSize(p: SparkPlan): Option[BigInt] =
    p.collectFirst {
      case n if n.logicalLink.isDefined =>
        n.logicalLink.get.stats.sizeInBytes
    }

  private def violations(p: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    p.foreachUp {
      case c: CartesianProductExec
          if !maxOneRow(c.left) && !maxOneRow(c.right) =>
        out += s"cartesian ${c.left.nodeName} x ${c.right.nodeName}"
      case j: SortMergeJoinExec =>
        // only flag a small side that could LEGALLY broadcast for this
        // join type (an outer join's preserved side cannot build)
        import org.apache.spark.sql.catalyst.plans._
        val canBuildLeft = j.joinType match {
          case Inner | Cross | RightOuter => true
          case _ => false
        }
        val canBuildRight = j.joinType match {
          case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
          case _: ExistenceJoin => true
          case _ => false
        }
        val small = Seq(
          if (canBuildLeft) estSize(j.left).filter(_ < SMALL) else None,
          if (canBuildRight) estSize(j.right).filter(_ < SMALL) else None)
          .flatten
        if (small.nonEmpty)
          out += s"${j.joinType} SMJ with a ${small.min}-byte " +
            "broadcastable side"
      case _ =>
    }
    out.toSeq
  }

  private def plansOf(s: SparkSession): Seq[(String, Seq[String])] =
    heavyTen.map { n =>
      n -> (try violations(
        SparkEntry.queries(n)(s, sf).queryExecution.sparkPlan)
      catch { case e: Throwable => Seq(s"PLAN ERROR: ${e.getMessage}") })
    }

  test("heavy ten: no cartesian, no small-side SortMergeJoin") {
    val offenders = plansOf(spark).filter(_._2.nonEmpty)
    assert(offenders.isEmpty, offenders.map { case (n, v) =>
      s"\n  $n: ${v.mkString(" | ")}"
    }.mkString)
  }

  test("the gate has teeth: disabling auto-broadcast induces " +
    "small-side SMJ violations it must flag") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val flagged = plansOf(s).filter(_._2.exists(_.contains("SMJ")))
    graft.operators.CacheScope.release(s)
    assert(flagged.nonEmpty,
      "killing auto-broadcast must surface SMJ-small violations — " +
        "an always-green gate is decorative")
  }

  test("declared window rewrites fire on the heavy-plan shapes") {
    // TopKRewrite: the bounded-heap aggregate replaces the full
    // per-partition window sort in the all-DESC top-N shape
    val topn = SparkEntry.queries("window_topn_rewrite")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(topn.contains("top_k") && !topn.contains("windowspecdefinition"),
      s"TopKRewrite must fire on window_topn_rewrite:\n$topn")
    // InferWindowGroupLimit: the ties-preserving rank shape keeps its
    // window but gets the map-side group limit
    val ties = SparkEntry.queries("window_rank_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(ties.contains("WindowGroupLimit"),
      s"native WindowGroupLimit expected on window_rank_topk:\n$ties")
  }
}
