package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** TopKRewrite optimizer rule: plan shape + result equivalence +
  * safety bail-outs. */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    // query-path session setup (functions + TopKRewrite optimizer rule)
    graft.queries.Tables.t(s, "/root/testdata/sf0.001", "orders")
    s
  }
  import spark.implicits._

  private def df = {
    graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "orders")
  }

  private def topn(orderCols: Seq[org.apache.spark.sql.Column], k: Int = 3) = {
    val w = Window.partitionBy("o_orderpriority").orderBy(orderCols: _*)
    df.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= k)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
  }

  test("all-DESC ordering is rewritten to the top_k aggregate") {
    val q = topn(Seq(F.col("o_totalprice").desc, F.col("o_orderkey").desc))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("top_k"), s"expected rewrite, got:\n$plan")
    // the Window node must be gone (Spark's WindowGroupLimit pre-pruning
    // below the aggregate is fine and still mentions row_number())
    assert(!plan.contains("windowspecdefinition"), s"window survived:\n$plan")
  }

  test("rewritten results equal the window form") {
    val desc = Seq(F.col("o_totalprice").desc, F.col("o_orderkey").desc)
    val rewritten = topn(desc).orderBy("o_orderpriority", "rn").collect()
    // genuine window plan: no Filter node at all (filtered driver-side)
    val windowForm = {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").desc)
      df.withColumn("rn", F.row_number().over(w))
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn").collect()
        .filter(_.getInt(1) <= 3)
    }
    assert(rewritten.toSeq == windowForm.toSeq)
  }

  test("ASC non-nullable numeric keys negate and rewrite") {
    val base = spark.range(100).select(
      (F.col("id") % 5).as("g"), F.col("id").as("v"))
    val w = Window.partitionBy("g").orderBy(F.col("v").asc)
    val q = base.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 2).select("g", "v", "rn")
    assert(q.queryExecution.optimizedPlan.toString.contains("top_k"))
    val got = q.orderBy("g", "rn").as[(Long, Long, Int)].collect().toSeq
    val exp = (0L until 5L).flatMap(g => Seq((g, g, 1), (g, g + 5, 2)))
    assert(got == exp)
  }

  test("nullable ASC tie-break bails out (window plan kept)") {
    val q = topn(Seq(F.col("o_totalprice").desc, F.col("o_orderkey").asc))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("top_k"), "must not rewrite nullable ASC keys")
  }

  test("string sort key bails out") {
    val w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_orderstatus").asc)
    val q = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 1)
    assert(!q.queryExecution.optimizedPlan.toString.contains("top_k"))
  }

  test("property: rewrite equals driver-computed top-k on random data") {
    val rnd = new scala.util.Random(42)
    for (k <- Seq(1, 3, 7)) {
      // unique sort key per group → deterministic row_number
      val rows = (0 until 8).flatMap { g =>
        rnd.shuffle((0 until 40).toList).zipWithIndex.map {
          case (v, i) => (g, v, s"p$g-$i")
        }
      }
      val df = rows.toDF("g", "v", "p")
      for (asc <- Seq(true, false)) {
        val ord = if (asc) F.col("v").asc else F.col("v").desc
        val w = Window.partitionBy("g").orderBy(ord)
        val q = df.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= k).select("g", "v", "p", "rn")
        assert(q.queryExecution.optimizedPlan.toString.contains("top_k"),
          s"rule must fire (asc=$asc)")
        val got = q.as[(Int, Int, String, Int)].collect().toSet
        val exp = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
          val sorted = if (asc) rs.sortBy(_._2) else rs.sortBy(-_._2)
          sorted.take(k).zipWithIndex.map { case ((g, v, p), i) => (g, v, p, i + 1) }
        }.toSet
        assert(got == exp, s"k=$k asc=$asc")
      }
    }
  }

  test("global top-k (no partitionBy) rewrites to a global aggregate") {
    val w = Window.orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").desc)
    val q = df.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 5)
      .select("rn", "o_orderkey", "o_totalprice")
    assert(q.queryExecution.optimizedPlan.toString.contains("top_k"))
    val got = q.orderBy("rn").collect().map(r => (r.getInt(0), r.getLong(1)))
    val exp = df.select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (k, p) => (-p, -k) }.take(5)
      .zipWithIndex.map { case ((k, _), i) => (i + 1, k) }
    assert(got.toSeq == exp.toSeq)
  }

  test("rn < k and rn === 1 comparison forms rewrite") {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").desc)
    val lt = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") < 4)
    assert(lt.queryExecution.optimizedPlan.toString.contains("top_k"))
    assert(lt.count() == 15) // 3 per priority

    val eq = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") === 1)
    assert(eq.queryExecution.optimizedPlan.toString.contains("top_k"))
    assert(eq.count() == 5)
  }

  test("ASC double sort key bails out (-NaN == NaN would rank NaN first)") {
    val base = spark.range(10).select(
      (F.col("id") % 2).as("g"), F.col("id").cast("double").as("v"))
    val w = Window.partitionBy("g").orderBy(F.col("v").asc)
    val q = base.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    assert(!q.queryExecution.optimizedPlan.toString.contains("top_k"))
  }

  test("map-typed payload column bails out (heap ordering would crash)") {
    val base = spark.range(10).select(
      (F.col("id") % 2).as("g"), F.col("id").as("v"),
      F.map_from_arrays(F.array(F.lit("k")), F.array(F.col("id"))).as("m"))
    val w = Window.partitionBy("g").orderBy(F.col("v").desc)
    val q = base.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    assert(!q.queryExecution.optimizedPlan.toString.contains("top_k"))
    assert(q.count() == 4) // window plan still works
  }

  test("renaming Project between Filter and Window still rewrites") {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").desc)
    val q = df.withColumn("rn", F.row_number().over(w))
      .select(F.col("o_orderpriority").as("prio"), F.col("rn"),
        F.col("o_orderkey").as("okey"), F.col("o_totalprice"))
      .filter(F.col("rn") <= 3)
    assert(q.queryExecution.optimizedPlan.toString.contains("top_k"),
      s"alias project must not block the rewrite:\n${q.queryExecution.optimizedPlan}")
    val got = q.orderBy("prio", "rn").collect()
    assert(got.length == 15 && got.head.schema.fieldNames.toSeq ==
      Seq("prio", "rn", "okey", "o_totalprice"))
  }

  test("rank() <= k bails out of the heap rewrite — native WindowGroupLimit covers it") {
    val w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_custkey").desc)
    val q = df.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 3)
    val plan = q.queryExecution.optimizedPlan.toString
    // our rule must NOT fire (heap cannot represent boundary ties) …
    assert(!plan.contains("top_k("), s"heap rewrite unsound for rank:\n$plan")
    // … and Spark's InferWindowGroupLimit must bound the window
    // map-side instead (single scan ≤ k+ties rows per input partition —
    // the reason a second-scan semi-join prefilter would be a loss)
    assert(plan.contains("WindowGroupLimit"), s"native group limit expected:\n$plan")
    assert(plan.contains("windowspecdefinition"), s"window must survive:\n$plan")
  }

  test("rank/dense_rank window results honor ties (vs driver-computed)") {
    val w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_custkey").desc)
    val got = df.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_custkey")
      .orderBy("o_orderpriority", "rnk", "o_custkey").collect().toSeq
    // ties can push the emitted row count past 3 rows per group; never below
    assert(got.size >= 15)
    val exp = df.select("o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .groupBy(_._1).toSeq.flatMap { case (prio, rows) =>
        val sortedKeys = rows.map(_._2).sorted(Ordering[Long].reverse)
        rows.map { case (_, ck) =>
          (prio, 1 + sortedKeys.count(_ > ck), ck)
        }.filter(_._2 <= 3)
      }.sortBy(t => (t._1, t._2, t._3))
    assert(got.map(r => (r.getString(0), r.getInt(1), r.getLong(2))) == exp)
  }

  test("top_k_distinct keeps k largest distinct values with O(k) state") {
    import graft.functions.TopKFunctions
    val base = spark.range(1000).select(
      (F.col("id") % 4).as("g"), (F.col("id") % 25).as("v")) // 25 distinct per group
    val got = base.groupBy("g")
      .agg(TopKFunctions.topKDistinct(F.struct(F.col("v")), 3).as("top"))
      .select(F.col("g"), F.col("top.v").as("vs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    got.values.foreach(vs => assert(vs == Seq(24L, 23L, 22L))) // descending, distinct
  }

  test("top_k_distinct via SQL registry") {
    spark.range(100).select((F.col("id") % 10).as("v"))
      .createOrReplaceTempView("tkd_in")
    val rows = spark.sql(
      "SELECT top_k_distinct(struct(v), 2) AS t FROM tkd_in")
      .select(F.col("t.v")).as[Seq[Long]].head()
    assert(rows == Seq(9L, 8L))
  }
}
