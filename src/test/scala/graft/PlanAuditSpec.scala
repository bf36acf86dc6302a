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

  // ------------------------------------------------ SaltedAggRewrite
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.plans.logical.Aggregate
  import org.apache.spark.sql.functions.{col, count, countDistinct, lit,
    avg, expr, max, min, sum}
  import graft.operators.Skew
  import graft.plans.SkewHint

  /** (n aggregates, salt present, a SkewHint survived) — the three
    * plan facts the salted-agg tests assert on. */
  private def saltShape(df: DataFrame): (Int, Boolean, Boolean) = {
    val opt = df.queryExecution.optimizedPlan
    val aggs = opt.collect { case a: Aggregate => a }
    val salted = aggs.exists(_.groupingExpressions.exists(
      _.exists { case a: org.apache.spark.sql.catalyst.expressions
        .AttributeReference => a.name == "_graft_salt"; case _ => false }))
    val hintLeft = opt.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[SkewHint])))
    (aggs.size, salted, hintLeft)
  }

  private def ensureRule(): Unit =
    graft.queries.Tables.t(spark, sf, "region") // registers the rule

  test("SaltedAggRewrite fires on the hinted salted_count shape and " +
    "matches the plain plan's rows") {
    val df = SparkEntry.queries("salted_count")(spark, sf)
    val (nAggs, salted, hintLeft) = saltShape(df)
    assert(nAggs == 2, "expected the two-phase salted aggregate pair")
    assert(salted, "inner aggregate must group by _graft_salt")
    assert(!hintLeft, "no SkewHint marker may survive optimization")
    val plain = graft.queries.Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  test("SaltedAggRewrite handles all four merges, multi-key and " +
    "expression keys, preserving schema and values") {
    ensureRule()
    val src = spark.range(0, 20000).select(
      (col("id") % 7).as("k"), (col("id") % 3).as("k2"),
      col("id").as("v"))
    def aggs(g: org.apache.spark.sql.RelationalGroupedDataset) =
      g.agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("v").as("mn"), max("v").as("mx"))
    val hinted = aggs(src.groupBy(
        Skew.skewHint(col("k") * 2).as("kk"), col("k2")))
      .orderBy("kk", "k2")
    val plain = aggs(src.groupBy((col("k") * 2).as("kk"), col("k2")))
      .orderBy("kk", "k2")
    val (nAggs, salted, hintLeft) = saltShape(hinted)
    assert(nAggs == 2 && salted && !hintLeft)
    // exprIds/names/types must survive the rewrite bit-for-bit
    assert(hinted.schema == plain.schema,
      s"\n${hinted.schema}\nvs\n${plain.schema}")
    assert(hinted.collect().toSeq == plain.collect().toSeq)
  }

  test("SaltedAggRewrite bails out (hint stripped, single-phase plan, " +
    "same rows) on unsupported shapes") {
    ensureRule()
    val src = spark.range(0, 5000).select(
      (col("id") % 5).as("k"), col("id").as("v"))
    val g = () => src.groupBy(Skew.skewHint(col("k")).as("k"))
    val gp = () => src.groupBy(col("k"))
    val cases: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("avg", g().agg(avg("v").as("a")), gp().agg(avg("v").as("a"))),
      ("count distinct",
        g().agg(countDistinct(col("v") % 10).as("nd")),
        gp().agg(countDistinct(col("v") % 10).as("nd"))),
      ("composite output",
        g().agg((sum("v") + count(lit(1))).as("c")),
        gp().agg((sum("v") + count(lit(1))).as("c"))),
      ("filter clause",
        g().agg(expr("count(1) FILTER (WHERE v % 2 = 0)").as("f")),
        gp().agg(expr("count(1) FILTER (WHERE v % 2 = 0)").as("f"))),
      // r15 (r14 ADVICE): a decimal partial overflowing to null in
      // non-ANSI mode would be skipped by the outer Sum — the rewrite
      // must leave decimal sums single-phase
      ("decimal sum",
        g().agg(sum(col("v").cast("decimal(18,4)")).as("sd")),
        gp().agg(sum(col("v").cast("decimal(18,4)")).as("sd"))))
    for ((name, hinted, plain) <- cases) {
      val (_, salted, hintLeft) = saltShape(hinted)
      assert(!salted, s"$name: rule must NOT fire")
      assert(!hintLeft, s"$name: hint must be stripped on bail-out")
      assert(hinted.orderBy("k").collect().toSeq ==
        plain.orderBy("k").collect().toSeq, s"$name: rows differ")
    }
  }

  import graft.plans.SkewJoinHint

  /** (dim-side explode present, salt equi-conjunct present, a
    * SkewJoinHint survived) — the plan facts the salted-join tests
    * assert on. */
  private def saltJoinShape(df: DataFrame): (Boolean, Boolean, Boolean) = {
    val opt = df.queryExecution.optimizedPlan
    val exploded = opt.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
        if g.generatorOutput.exists(_.name == "_graft_dsalt") => g
    }.nonEmpty
    val saltCond = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.exists {
          case a: org.apache.spark.sql.catalyst.expressions
            .AttributeReference => a.name == "_graft_fsalt"
          case _ => false
        }) => j
    }.nonEmpty
    val hintLeft = opt.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[SkewJoinHint])))
    (exploded, saltCond, hintLeft)
  }

  test("SaltedJoinRewrite fires on the hinted join_salted shape and " +
    "matches the plain join's rows") {
    val df = SparkEntry.queries("join_salted")(spark, sf)
    val (exploded, saltCond, hintLeft) = saltJoinShape(df)
    assert(exploded, "dim side must be replicated via explode")
    assert(saltCond, "join condition must gain the salt equi-conjunct")
    assert(!hintLeft, "no SkewJoinHint marker may survive optimization")
    val li = graft.queries.Tables.t(spark, sf, "lineitem")
    val supp = graft.queries.Tables.t(spark, sf, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = li.join(supp, Seq("l_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .cast("string").cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
      .orderBy("s_name")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  test("SaltedJoinRewrite preserves multiset semantics on NON-unique " +
    "dim keys and composes with extra join conjuncts") {
    ensureRule()
    val fact = spark.range(0, 10000).select(
      (col("id") % 5).as("k"), col("id").as("fv"))
    // duplicate dim keys: every fact row must match BOTH dim rows once
    val dim = spark.range(0, 10).select(
      (col("id") % 5).as("k"), (col("id") % 2).as("side"),
      (col("id") * 100).as("dv"))
    val hinted = fact.join(dim,
        Skew.skewJoinHint(fact("k"), salts = 4) === dim("k") &&
          col("fv") % 2 === col("side"))
      .groupBy(dim("k").as("k"), col("side"))
      .agg(count(lit(1)).as("n"), sum("dv").as("sd"))
      .orderBy("k", "side")
    val plain = fact.join(dim,
        fact("k") === dim("k") && col("fv") % 2 === col("side"))
      .groupBy(dim("k").as("k"), col("side"))
      .agg(count(lit(1)).as("n"), sum("dv").as("sd"))
      .orderBy("k", "side")
    val (exploded, saltCond, hintLeft) = saltJoinShape(hinted)
    assert(exploded && saltCond && !hintLeft)
    assert(hinted.schema == plain.schema)
    assert(hinted.collect().toSeq == plain.collect().toSeq)
  }

  test("SaltedJoinRewrite bails out (hint stripped, plain plan, same " +
    "rows) on unsupported shapes") {
    ensureRule()
    val fact = spark.range(0, 5000).select(
      (col("id") % 7).as("k"), col("id").as("fv"))
    val dim = spark.range(0, 7).select(
      col("id").as("k"), (col("id") * 10).as("dv"))
    val cases: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("left outer",
        fact.join(dim, Skew.skewJoinHint(fact("k")) === dim("k"),
          "left_outer"),
        fact.join(dim, fact("k") === dim("k"), "left_outer")),
      ("non-equi",
        fact.join(dim, Skew.skewJoinHint(fact("k")) < dim("k")),
        fact.join(dim, fact("k") < dim("k"))),
      ("double hint",
        fact.join(dim, Skew.skewJoinHint(fact("k")) ===
          Skew.skewJoinHint(dim("k"))),
        fact.join(dim, fact("k") === dim("k"))),
      // k % 4 stays an expression post-optimizer (k + 0 would
      // constant-fold to a bare attribute and legitimately fire)
      ("expression key",
        fact.join(dim, Skew.skewJoinHint(fact("k") % 4) === dim("k")),
        fact.join(dim, fact("k") % 4 === dim("k"))))
    for ((name, hinted, plain) <- cases) {
      val (exploded, saltCond, hintLeft) = saltJoinShape(hinted)
      assert(!exploded && !saltCond, s"$name: rule must NOT fire")
      assert(!hintLeft, s"$name: hint must be stripped on bail-out")
      assert(hinted.orderBy("fv", "dv").collect().toSeq ==
        plain.orderBy("fv", "dv").collect().toSeq, s"$name: rows differ")
    }
  }

  test("skewJoinHint is a pass-through when the rule is not installed") {
    val s = spark.newSession() // fresh session: no extraOptimizations
    val fact = s.range(0, 1000).select((col("id") % 4).as("k"),
      col("id").as("fv"))
    val dim = s.range(0, 4).select(col("id").as("k"),
      (col("id") * 10).as("dv"))
    val df = fact.join(dim, Skew.skewJoinHint(fact("k")) === dim("k"))
      .groupBy(dim("k").as("k")).agg(count(lit(1)).as("n")).orderBy("k")
    val (exploded, _, _) = saltJoinShape(df)
    assert(!exploded)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      fact.join(dim, fact("k") === dim("k"))
        .groupBy(dim("k").as("k")).agg(count(lit(1)).as("n")).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("skewHint is a pass-through when the rule is not installed") {
    val s = spark.newSession() // fresh session: no extraOptimizations
    val src = s.range(0, 1000).select((col("id") % 4).as("k"),
      col("id").as("v"))
    val df = src.groupBy(Skew.skewHint(col("k")).as("k"))
      .agg(sum("v").as("sv")).orderBy("k")
    val (nAggs, salted, _) = saltShape(df)
    assert(nAggs == 1 && !salted)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      src.groupBy(col("k")).agg(sum("v").as("sv")).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
