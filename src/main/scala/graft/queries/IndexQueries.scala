package graft.queries

import graft.operators.Ivf
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-41 inventory (r7): incremental ANN index maintenance — the D33
  * (incremental minhash) discipline applied to the IVF index: a NEW
  * vector batch is assigned against the EXISTING centroids with NO
  * retraining (O(batch·k) work per run), and a per-list drift gate
  * (D30's exact-integer centroid distance, here between each list's
  * index-time centroid and the mean of the batch vectors routed to it)
  * decides when a retrain is actually warranted. At 100 TB the index is
  * weeks of corpus; retraining nightly because new vectors arrived is
  * exactly the waste this pattern avoids. */
object IndexQueries {

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def cosSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  // ---------------------------------------------------------------- D39
  /** Incremental IVF assignment + retrain gate. The "existing index" is
    * built from the standing corpus (vec_id ≢ 7 mod 10); "tonight's
    * batch" (vec_id ≡ 7 mod 10) is assigned by cosine against the
    * BROADCAST index centroids — a narrow map over the batch, the
    * corpus is never rescanned. Per centroid list the report carries:
    * standing/new counts, the batch's summed assignment cosine in exact
    * micros, the squared centroid-vs-batch-mean distance in exact
    * integer micros² (D30's cross-multiplied form — per-(list,dim)
    * BIGINT sums, squares in DECIMAL(38,0)/HUGEINT, ONE integral
    * division after the dim sum), and the retrain flag (drift above
    * gate). Scale shape: one batch·k broadcast score, two
    * map-side-combined dim aggregates (standing corpus read once),
    * output one row per centroid list. */
  private val ivfIncremental = QueryDef(
    "ivf_incremental",
    (s, d) => {
      val e = t(s, d, "embeddings")
      val old = e.where(F.expr("vec_id % 10 != 7"))
      val batch = e.where(F.expr("vec_id % 10 = 7"))
      val cents = Ivf.centroidsByKey(old, "label", "embedding")
      val asg = Ivf.assign(batch, cents, "vec_id", "embedding")
      val oldDim = old
        .select(F.col("label").as("centroid_label"),
          F.posexplode(F.col("embedding")).as(Seq("dim", "x")))
        .select(F.col("centroid_label"), F.col("dim"),
          F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)")
            .as("xm"))
        .groupBy("centroid_label", "dim")
        .agg(F.sum("xm").as("s_old"), F.count(F.lit(1)).as("n_old"))
      val newDim = asg.select("vec_id", "centroid_label")
        .join(batch.select("vec_id", "embedding"), "vec_id")
        .select(F.col("centroid_label"),
          F.posexplode(F.col("embedding")).as(Seq("dim", "x")))
        .select(F.col("centroid_label"), F.col("dim"),
          F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)")
            .as("xm"))
        .groupBy("centroid_label", "dim")
        .agg(F.sum("xm").as("s_new"), F.count(F.lit(1)).as("n_new"))
      val drift = oldDim
        .join(newDim, Seq("centroid_label", "dim"))
        .groupBy("centroid_label")
        .agg(F.max("n_old").as("n_old"), F.max("n_new").as("n_new"),
          // operands widened BEFORE multiplying: s·n products and
          // (n_old·n_new)² overflow int64 once a list's n_old·n_new
          // passes ~3e9 — which the 100 TB framing implies
          F.sum(F.expr(
            "(CAST(s_old AS DECIMAL(38,0))*n_new - " +
              "CAST(s_new AS DECIMAL(38,0))*n_old) * " +
              "(CAST(s_old AS DECIMAL(38,0))*n_new - " +
              "CAST(s_new AS DECIMAL(38,0))*n_old)"))
            .as("_num"))
        .select(F.col("centroid_label").cast("long").as("centroid_label"),
          F.col("n_old"), F.col("n_new"),
          F.expr(
            "CAST(_num div ((CAST(n_old AS DECIMAL(38,0))*n_new) * " +
              "(CAST(n_old AS DECIMAL(38,0))*n_new)) " +
              "AS BIGINT)").as("drift_micros2"))
      val cosAgg = asg.groupBy(
        F.col("centroid_label").cast("long").as("centroid_label"))
        .agg(F.sum(F.expr("CAST(round(cos * 1000000) AS BIGINT)"))
          .as("sum_cos_micro"))
      drift.join(cosAgg, "centroid_label")
        .select(F.col("centroid_label"), F.col("n_old"), F.col("n_new"),
          F.col("sum_cos_micro"), F.col("drift_micros2"),
          // gate at 0.2 in real squared-distance units (2e11 micros²):
          // tiny batches sit above it from sampling noise alone; as the
          // batch grows the mean converges onto the index centroid and
          // the flag drops — exactly the behavior a nightly gate wants
          F.expr("CAST(CASE WHEN drift_micros2 > 200000000000 THEN 1 " +
            "ELSE 0 END AS BIGINT)").as("retrain"))
        .orderBy("centroid_label")
    },
    Some(s"""
      WITH old AS (SELECT * FROM embeddings WHERE vec_id % 10 != 7),
      batch AS (SELECT * FROM embeddings WHERE vec_id % 10 = 7),
      cent AS (
        SELECT label AS ckey, i, avg(CAST(embedding[i] AS DOUBLE)) AS cv
        FROM old, generate_series(1, 64) AS t(i) GROUP BY 1, 2),
      cvec AS (
        SELECT ckey, list_transform(list(cv ORDER BY i),
                 x -> CAST(x AS REAL)) AS centroid
        FROM cent GROUP BY ckey),
      asg AS (
        SELECT vec_id, ckey AS centroid_label, cos FROM (
          SELECT vec_id, ckey, cos,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT b.vec_id, ckey,
                       ${cosSql("b.embedding", "centroid")} AS cos
                FROM batch b, cvec)) WHERE rn = 1),
      od AS (
        SELECT label AS centroid_label, i - 1 AS dim,
               sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                   AS BIGINT)) AS s_old,
               CAST(count(*) AS BIGINT) AS n_old
        FROM old, generate_series(1, 64) AS t(i) GROUP BY 1, 2),
      nd AS (
        SELECT a.centroid_label, i - 1 AS dim,
               sum(CAST(floor(CAST(b.embedding[i] AS DOUBLE) * 1000000)
                   AS BIGINT)) AS s_new,
               CAST(count(*) AS BIGINT) AS n_new
        FROM asg a JOIN batch b USING (vec_id),
             generate_series(1, 64) AS t(i)
        GROUP BY 1, 2),
      dr AS (
        SELECT od.centroid_label,
               max(n_old) AS n_old, max(n_new) AS n_new,
               sum((CAST(s_old AS HUGEINT)*n_new
                    - CAST(s_new AS HUGEINT)*n_old)
                   * (CAST(s_old AS HUGEINT)*n_new
                      - CAST(s_new AS HUGEINT)*n_old)) AS num
        FROM od JOIN nd ON od.centroid_label = nd.centroid_label
                       AND od.dim = nd.dim
        GROUP BY 1),
      ca AS (
        SELECT centroid_label,
               CAST(sum(CAST(round(cos * 1000000) AS BIGINT)) AS BIGINT)
                 AS sum_cos_micro
        FROM asg GROUP BY 1)
      SELECT CAST(dr.centroid_label AS BIGINT) AS centroid_label,
             n_old, n_new, sum_cos_micro,
             CAST(num // ((CAST(n_old AS HUGEINT)*n_new) * (CAST(n_old AS HUGEINT)*n_new))
                  AS BIGINT) AS drift_micros2,
             CAST(CASE WHEN num // ((CAST(n_old AS HUGEINT)*n_new) * (CAST(n_old AS HUGEINT)*n_new))
                        > 200000000000 THEN 1 ELSE 0 END AS BIGINT)
               AS retrain
      FROM dr JOIN ca ON dr.centroid_label = ca.centroid_label
      ORDER BY centroid_label"""))

  val all: Seq[QueryDef] = Seq(ivfIncremental)
}
