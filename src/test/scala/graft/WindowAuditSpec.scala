package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window, WindowGroupLimit}

/** Automated unpartitioned-window audit (r8, from the r7 verdict): every
  * round so far found one hand-audited `Window.orderBy(...)` with NO
  * partition spec funneling a corpus-proportional frame through a single
  * task (r6: drift_psi/stream_psi/rfm quintiles; r7: id_gaps' cross-block
  * summary). This spec walks the OPTIMIZED logical plan of every batch
  * query and fails if a global (empty-partition) window appears in a
  * query that is not on the documented allowlist below — so the next one
  * cannot land silently.
  *
  * The allowlist is not a free pass: each entry names the BOUND that
  * keeps the window's input frame metadata-sized at any corpus scale
  * (calendar days, score domain ≤1001, k-row top-k slices, per-block
  * second-level summaries, …). An entry whose query no longer has a
  * global window fails the companion staleness check, keeping the list
  * honest in both directions.
  */
class WindowAuditSpec extends SparkSpec {

  /** query -> why its global window's input is bounded (not corpus-
    * proportional) at any SF. */
  private val bounded: Map[String, String] = Map(
    "conformal_threshold" -> ("nonconformity frame grouped by score: " +
      "per-mille domain, <= 1001 rows"),
    "domain_mix" -> ("cumulative share over the distinct-source frame " +
      "(domain-bounded; sources do not grow with corpus rows)"),
    "domain_temperature" -> "same distinct-source frame as domain_mix",
    "embed_dim_profile" -> "window over the 64-row dimension profile",
    "embed_outliers" -> ("row_number<=20: native WindowGroupLimit " +
      "bounds the final window's input to k rows per upstream partition"),
    "eval_auc" -> "score-grouped counts: per-mille domain, <= 1001 rows",
    "fdr_bh" -> ("rank over the <= 25-cell priority x segment " +
      "contingency family (catalog-bounded, never corpus-sized)"),
    "eval_lift" -> "score-grouped counts, <= 1001 rows",
    "eval_pr_auc" -> "score-grouped counts, <= 1001 rows",
    "eval_pr_curve" -> "score-grouped counts, <= 1001 rows",
    "id_gaps" -> ("lead over the per-SUPERBLOCK summary - one row per " +
      "2^20 keys (the second blocking level; recursion admits a third)"),
    "ks_drift" -> ("value-grouped (cents-domain) count frame: price " +
      "domain is fixed by the schema, not corpus size"),
    "open_pipeline_timeline" -> "calendar-day frame",
    "rec_coverage" -> ("exposure frame bounded by n_probes*k; " +
      "row_number<=10 additionally WindowGroupLimit-bounded"),
    "rolling_corr" -> "calendar-month frame",
    "rolling_median" -> "calendar-day frame",
    "seasonal_decompose" -> "calendar-day frame",
    "running_distinct" -> "calendar-day frame",
    "t_closeness" -> ("cumulative dist over the 5-row order-priority " +
      "category frame"),
    "vocab_build" -> "row_number AFTER limit(100): 100-row input",
    "zipf_slope" -> "rides vocab_build's limit(100) frame")

  private def globalWindows(p: LogicalPlan): Seq[String] = {
    val hits = scala.collection.mutable.ArrayBuffer.empty[String]
    p.foreachWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty =>
        hits += w.orderSpec.map(_.sql).mkString(", ")
      case w: WindowGroupLimit if w.partitionSpec.isEmpty =>
        hits += "grouplimit: " + w.orderSpec.map(_.sql).mkString(", ")
      case _ =>
    }
    hits.toSeq
  }

  test("no undocumented global (unpartitioned) window in any batch plan") {
    val offenders = SparkEntry.allQueries
      .filterNot(_.name.startsWith("stream_"))
      .flatMap { q =>
        val wins =
          try globalWindows(q.fn(spark, sf).queryExecution.optimizedPlan)
          catch { case e: Throwable => Seq(s"PLAN ERROR: ${e.getMessage}") }
        if (wins.nonEmpty) Some(q.name -> wins) else None
      }.toMap
    val undocumented = offenders.keySet -- bounded.keySet
    assert(undocumented.isEmpty,
      s"\nglobal windows without a documented bound:\n" +
        undocumented.toSeq.sorted.map(n =>
          s"  $n: ${offenders(n).mkString(" | ")}").mkString("\n") +
        "\nEither repartition the window (DistRank / second blocking " +
        "level) or add the query to `bounded` with the reason its " +
        "input frame is metadata-sized at any scale.")
    val stale = bounded.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"allowlist entries whose query no longer has a global window " +
        s"(remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
