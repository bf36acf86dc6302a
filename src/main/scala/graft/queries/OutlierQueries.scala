package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-34 inventory (r6): outlier/SLA closers — the per-vector
  * distance-to-centroid audit (the "is this embedding mislabeled or
  * corrupt" screen run before trusting labels for SemDeDup-style
  * blocking) and the ship-delay SLA percentile report (the operations
  * twin of the C14 percentile ladder, keyed by order priority). */
object OutlierQueries {

  // ---------------------------------------------------------------- D36
  /** Embedding outlier audit: squared L2 distance from each vector to
    * its LABEL's centroid, exact in micro² (values quantized to integer
    * micros at the scan; centroid components as exact micro means —
    * sum div n — so both engines subtract identical integers), top-20
    * by distance with deterministic tie-break. A big distance means a
    * mislabeled or corrupt vector — checked before k-means/SemDeDup
    * blocking trusts the labels. One explode + one 64·labels-group
    * aggregate + a broadcast join back; never a pairwise computation. */
  private val embedOutliers = QueryDef(
    "embed_outliers",
    (s, d) => {
      val q = t(s, d, "embeddings")
        .select(F.col("vec_id"), F.col("label"),
          F.posexplode(F.col("embedding")).as(Seq("i", "v")))
        .select(F.col("vec_id"), F.col("label"),
          F.expr("CAST(i AS BIGINT)").as("dim"),
          F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)")
            .as("qm"))
      val cent = q.groupBy("label", "dim")
        .agg(F.expr("sum(qm) div count(*)").as("cm"))
      val dist = q.join(F.broadcast(cent), Seq("label", "dim"))
        .groupBy("vec_id", "label")
        .agg(F.expr("CAST(sum(CAST(qm - cm AS DECIMAL(38,0)) * " +
          "(qm - cm)) AS DECIMAL(38,0))").as("d2"))
      dist
        .withColumn("rk", F.row_number().over(
          Window.orderBy(F.col("d2").desc, F.col("vec_id"))))
        .where(F.col("rk") <= 20)
        .select(F.col("vec_id"), F.col("label"),
          F.expr("CAST(d2 div 1000000 AS BIGINT)").as("d2_micro"),
          F.col("rk").cast("long").as("rk"))
        .orderBy("rk")
    },
    Some("""
      WITH q AS (
        SELECT vec_id, label, CAST(i AS BIGINT) AS dim,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS qm
        FROM embeddings, generate_series(1, 64) AS t(i)),
      cent AS (
        SELECT label, dim, CAST(sum(qm) // count(*) AS BIGINT) AS cm
        FROM q GROUP BY 1, 2),
      dist AS (
        SELECT vec_id, q.label,
               sum(CAST(qm - cm AS HUGEINT) * (qm - cm)) AS d2
        FROM q JOIN cent ON q.label = cent.label AND q.dim = cent.dim
        GROUP BY 1, 2),
      rk AS (
        SELECT vec_id, label, d2,
               row_number() OVER (ORDER BY d2 DESC, vec_id) AS rk
        FROM dist)
      SELECT vec_id, label, CAST(d2 // 1000000 AS BIGINT) AS d2_micro,
             CAST(rk AS BIGINT) AS rk
      FROM rk WHERE rk <= 20 ORDER BY rk"""))

  // ---------------------------------------------------------------- C82
  /** Ship-delay SLA report per order priority: days from order to each
    * line's ship date, PERCENTILE_DISC p50/p90/p99 via the C56
    * value-grouped cumulative pick (the delay frame is calendar-
    * bounded), plus the share beyond a 90-day SLA in ppm. The order⋈
    * line join co-partitions once on the order key. */
  private val slaShipdelay = QueryDef(
    "sla_shipdelay",
    (s, d) => {
      val j = t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          F.col("l_orderkey") === F.col("o_orderkey"))
        .select(F.col("o_orderpriority").as("priority"),
          F.datediff(F.to_date(F.col("l_shipdate")),
            F.to_date(F.col("o_orderdate"))).cast("long").as("delay"))
      val g = j.groupBy("priority", "delay").agg(F.count(F.lit(1)).as("c"))
      val cum = g
        .withColumn("cum", F.sum("c").over(
          Window.partitionBy("priority").orderBy("delay")))
        .withColumn("n", F.sum("c").over(Window.partitionBy("priority")))
      cum.groupBy("priority").agg(
        F.max("n").as("n_lines"),
        F.min(F.when(F.expr("2 * cum >= n"), F.col("delay"))).as("p50_days"),
        F.min(F.when(F.expr("10 * cum >= 9 * n"), F.col("delay")))
          .as("p90_days"),
        F.min(F.when(F.expr("100 * cum >= 99 * n"), F.col("delay")))
          .as("p99_days"),
        F.expr("sum(CASE WHEN delay > 90 THEN c ELSE 0L END) " +
          "* 1000000 div max(n)").as("breach_ppm"))
        .orderBy("priority")
    },
    Some("""
      WITH j AS (
        SELECT o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT)
                 AS delay
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      g AS (SELECT priority, delay, CAST(count(*) AS BIGINT) AS c
            FROM j GROUP BY 1, 2),
      cu AS (
        SELECT priority, delay, c,
               sum(c) OVER (PARTITION BY priority ORDER BY delay
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY priority) AS n
        FROM g)
      SELECT priority, CAST(max(n) AS BIGINT) AS n_lines,
             CAST(min(CASE WHEN 2 * cum >= n THEN delay END) AS BIGINT)
               AS p50_days,
             CAST(min(CASE WHEN 10 * cum >= 9 * n THEN delay END)
                  AS BIGINT) AS p90_days,
             CAST(min(CASE WHEN 100 * cum >= 99 * n THEN delay END)
                  AS BIGINT) AS p99_days,
             CAST(sum(CASE WHEN delay > 90 THEN c ELSE 0 END) * 1000000
                  // max(n) AS BIGINT) AS breach_ppm
      FROM cu GROUP BY priority ORDER BY priority"""))

  val all: Seq[QueryDef] = Seq(embedOutliers, slaShipdelay)
}
