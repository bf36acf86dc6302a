package graft.queries

import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-32 inventory (r6): demand-curve diagnostics — the
  * quantity-vs-discount OLS (the elasticity proxy a pricing team fits
  * before any causal work) from pure integer sums, and the streaming
  * first-seen twin of C79's growth decomposition (per-customer min
  * month as a STATEFUL STREAMING MIN — customer-count-bounded state,
  * arrival-order independent where a dropDuplicates first-arrival
  * would not be). */
object ElasticityQueries {

  // ---------------------------------------------------------------- M13
  /** Quantity-on-discount OLS per return flag: x = discount in integer
    * percent (0..5), y = quantity units — slope/intercept from exact
    * int64 sums with trend_fit's closing double formula (6dp). The
    * "do discounts move volume" first look; one map-side-combined
    * aggregate over the fact table. */
  private val elasticityFit = QueryDef(
    "elasticity_fit",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select(F.col("l_returnflag").as("flag"),
          F.expr("CAST(round(l_discount * 100) AS BIGINT)").as("x"),
          F.expr("CAST(floor(l_quantity) AS BIGINT)").as("y"))
      li.groupBy("flag")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum("x").as("sx"), F.sum("y").as("sy"),
          F.expr("sum(x * y)").as("sxy"),
          F.expr("sum(x * x)").as("sxx"))
        .select(F.col("flag"), F.col("n"), F.col("sx"), F.col("sy"),
          F.col("sxy"), F.col("sxx"),
          F.expr("round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) " +
            "* sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) " +
            "* sx), 6)").as("slope"),
          F.expr("round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy " +
            "- CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - " +
            "CAST(sx AS DOUBLE) * sx)) * sx) / n, 6)").as("intercept"))
        .orderBy("flag")
    },
    Some("""
      WITH li AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_discount * 100) AS BIGINT) AS x,
               CAST(floor(l_quantity) AS BIGINT) AS y
        FROM lineitem),
      s AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM li GROUP BY 1)
      SELECT flag, n, sx, sy, sxy, sxx,
             round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                   (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
               AS slope,
             round((CAST(sy AS DOUBLE) -
                    ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                     (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx) / n, 6) AS intercept
      FROM s ORDER BY flag"""))

  val all: Seq[QueryDef] = Seq(elasticityFit)
}
