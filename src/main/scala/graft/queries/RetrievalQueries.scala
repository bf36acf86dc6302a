package graft.queries

import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-44 inventory (r7): retrieval-quality summary for the ANN stack.
  * D34 (`embed_ivf_recall`) publishes per-query recall; production index
  * tuning wants the ONE-ROW ranking summary — MRR, precision@k, hit
  * rate — computed against the brute-force truth in exact rational
  * arithmetic (reciprocal ranks are rational, so the whole metric stays
  * integer-exact: per-query rr_micro = 10⁶ div first_hit_rank, the mean
  * is one closing integral division — no floats anywhere). */
object RetrievalQueries {

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def cosSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  /** Pre-rounded integer nDCG discounts: round(10⁶ / log2(rank+1)) for
    * ranks 1..5 — ONE Seq drives the Spark CASE, the DuckDB CASE and
    * the ideal-DCG constant, so the metric needs no runtime log2 and
    * both engines do identical integer arithmetic (M30). */
  private val NDCG_DISC = Seq(1000000L, 630930L, 500000L, 430677L, 386853L)

  /** Ideal DCG for graded relevance 5..1 at the ideal order:
    * Σ (6−i)·disc(i) — every query has a full exact top-5. */
  private val NDCG_IDCG: Long = NDCG_DISC.zipWithIndex
    .map { case (dc, i) => (5L - i) * dc }.sum

  private val centroidCtes = s"""cent AS (
        SELECT label AS ckey, i, avg(CAST(embedding[i] AS DOUBLE)) AS cv
        FROM embeddings, generate_series(1, 64) AS t(i)
        GROUP BY 1, 2),
      cvec AS (
        SELECT ckey, list_transform(list(cv ORDER BY i), x -> CAST(x AS REAL)) AS centroid
        FROM cent GROUP BY ckey)"""

  // ---------------------------------------------------------------- M17
  /** MRR / precision@5 / hit-rate of IVF(nprobe=2) search against the
    * exact top-5 truth over a deterministic ~2% query slice (vec_id ≡ 3
    * mod 50 — the query set grows with the corpus, unlike D34's fixed 3
    * probes). Queries the ANN missed entirely (no candidate in any
    * probed list) still count in every denominator via the left join
    * from the query set. Scale shape: the truth pass is the documented
    * tune-before-run exact audit (queries broadcast, corpus scanned
    * once); the IVF side is the production plan. */
  private val searchMrr = QueryDef(
    "search_mrr",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(F.expr("vec_id % 50 = 3"))
      val exact = Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5)
        .select(F.col("query_id").as("eq"), F.col("match_id").as("em"))
      val approx = Ivf.searchAssigned(emb, Staged.ivfAssignments(s, d),
        Staged.ivfCentroids(s, d),
        qs, "vec_id", "embedding", k = 5, nprobe = 2)
        .select(F.col("query_id"), F.col("rank"), F.col("match_id"))
      val perq = qs.select(F.col("vec_id").as("query_id"))
        .join(approx, Seq("query_id"), "left")
        .join(exact,
          F.col("query_id") === F.col("eq") &&
            F.col("match_id") === F.col("em"), "left")
        .groupBy("query_id")
        .agg(
          F.min(F.when(F.col("em").isNotNull, F.col("rank"))).as("fr"),
          F.sum(F.when(F.col("em").isNotNull, 1L).otherwise(0L)).as("nh"))
      perq.agg(F.count(F.lit(1)).as("n_queries"),
        F.sum(F.expr(
          "CASE WHEN fr IS NULL THEN 0L ELSE 1000000L div fr END"))
          .as("_srr"),
        F.sum("nh").as("_snh"),
        F.sum(F.expr("CASE WHEN fr IS NOT NULL THEN 1L ELSE 0L END"))
          .as("_nhit"))
        .select(F.col("n_queries"),
          F.expr("_srr div n_queries").as("mrr_micro"),
          F.expr("_snh * 1000000L div (5 * n_queries)").as("prec_ppm"),
          F.expr("_nhit * 1000000L div n_queries").as("hit_ppm"))
    },
    Some(s"""
      WITH $centroidCtes,
      assigned AS (
        SELECT vec_id AS match_id, ckey AS centroid_label FROM (
          SELECT vec_id, ckey,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT vec_id, ckey, ${cosSql("embedding", "centroid")} AS cos
                FROM embeddings, cvec)) WHERE rn = 1),
      probes AS (
        SELECT query_id, centroid_label FROM (
          SELECT query_id, ckey AS centroid_label,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT e.vec_id AS query_id, ckey,
                       ${cosSql("e.embedding", "centroid")} AS cos
                FROM embeddings e, cvec WHERE e.vec_id % 50 = 3)) WHERE rn <= 2),
      approx AS (
        SELECT query_id, match_id, rank FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT p.query_id, a.match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM probes p
                     JOIN assigned a ON p.centroid_label = a.centroid_label
                     JOIN embeddings q ON q.vec_id = p.query_id
                     JOIN embeddings c ON c.vec_id = a.match_id
                WHERE p.query_id != a.match_id))
        WHERE rank <= 5),
      exact AS (
        SELECT query_id, match_id FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM embeddings q, embeddings c
                WHERE q.vec_id % 50 = 3 AND q.vec_id != c.vec_id))
        WHERE rank <= 5),
      qs AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 50 = 3),
      perq AS (
        SELECT q.query_id,
               min(CASE WHEN e.match_id IS NOT NULL THEN a.rank END) AS fr,
               CAST(sum(CASE WHEN e.match_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS nh
        FROM qs q
             LEFT JOIN approx a ON a.query_id = q.query_id
             LEFT JOIN exact e ON e.query_id = a.query_id
                  AND e.match_id = a.match_id
        GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(sum(CASE WHEN fr IS NULL THEN 0
                      ELSE 1000000 // fr END) // count(*) AS BIGINT)
               AS mrr_micro,
             CAST(sum(nh) * 1000000 // (5 * count(*)) AS BIGINT)
               AS prec_ppm,
             CAST(sum(CASE WHEN fr IS NOT NULL THEN 1 ELSE 0 END)
                  * 1000000 // count(*) AS BIGINT) AS hit_ppm
      FROM perq"""))

  // ---------------------------------------------------------------- M30
  /** nDCG@5 of IVF(nprobe=2) search against the exact truth — the
    * graded-relevance companion to M17's MRR (binary hit): the true
    * top-5 carries graded relevance 5..1 (rel = 6 − exact rank), the
    * ANN ranking is scored with the standard log2 position discount,
    * and nDCG = DCG / ideal-DCG. Exactness discipline: the five
    * discounts 10⁶/log2(rank+1) are PRE-ROUNDED INTEGER constants
    * (one Scala Seq drives both engines' CASE and the ideal-DCG sum),
    * so the whole metric is integer arithmetic — no runtime log2, no
    * float drift. Queries the index missed entirely score 0 but stay
    * in the frame via the left join from the query set. Scale shape
    * identical to M17: truth pass is the documented tune-before-run
    * audit; the scored side is the production IVF plan; the metric
    * join is n_queries·k rows. */
  private val searchNdcg = QueryDef(
    "search_ndcg",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(F.expr("vec_id % 50 = 3"))
      val exact = Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5)
        .select(F.col("query_id").as("eq"), F.col("match_id").as("em"),
          (F.lit(6) - F.col("rank")).cast("long").as("rel"))
      val approx = Ivf.searchAssigned(emb, Staged.ivfAssignments(s, d),
        Staged.ivfCentroids(s, d),
        qs, "vec_id", "embedding", k = 5, nprobe = 2)
        .select(F.col("query_id"), F.col("rank"), F.col("match_id"))
      val discCase = NDCG_DISC.zipWithIndex
        .map { case (dc, i) => s"WHEN rank = ${i + 1} THEN ${dc}L" }
        .mkString("CASE ", " ", " ELSE 0L END")
      qs.select(F.col("vec_id").as("query_id"))
        .join(approx, Seq("query_id"), "left")
        .join(exact,
          F.col("query_id") === F.col("eq") &&
            F.col("match_id") === F.col("em"), "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(
          F.expr(discCase) * F.coalesce(F.col("rel"), F.lit(0L)),
          F.lit(0L))).as("dcg_micro"))
        .select(F.col("query_id"), F.col("dcg_micro"),
          F.expr(s"dcg_micro * 1000000L div $NDCG_IDCG").as("ndcg_ppm"))
        .orderBy("query_id")
    },
    Some {
      val discCase = NDCG_DISC.zipWithIndex
        .map { case (dc, i) => s"WHEN a.rank = ${i + 1} THEN $dc" }
        .mkString("CASE ", " ", " ELSE 0 END")
      s"""
      WITH $centroidCtes,
      assigned AS (
        SELECT vec_id AS match_id, ckey AS centroid_label FROM (
          SELECT vec_id, ckey,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT vec_id, ckey, ${cosSql("embedding", "centroid")} AS cos
                FROM embeddings, cvec)) WHERE rn = 1),
      probes AS (
        SELECT query_id, centroid_label FROM (
          SELECT query_id, ckey AS centroid_label,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT e.vec_id AS query_id, ckey,
                       ${cosSql("e.embedding", "centroid")} AS cos
                FROM embeddings e, cvec WHERE e.vec_id % 50 = 3)) WHERE rn <= 2),
      approx AS (
        SELECT query_id, match_id, rank FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT p.query_id, a.match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM probes p
                     JOIN assigned a ON p.centroid_label = a.centroid_label
                     JOIN embeddings q ON q.vec_id = p.query_id
                     JOIN embeddings c ON c.vec_id = a.match_id
                WHERE p.query_id != a.match_id))
        WHERE rank <= 5),
      exact AS (
        SELECT query_id, match_id, 6 - rank AS rel FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM embeddings q, embeddings c
                WHERE q.vec_id % 50 = 3 AND q.vec_id != c.vec_id))
        WHERE rank <= 5),
      qs AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 50 = 3)
      SELECT q.query_id,
             CAST(coalesce(sum(($discCase) * coalesce(e.rel, 0)), 0)
                  AS BIGINT) AS dcg_micro,
             CAST(coalesce(sum(($discCase) * coalesce(e.rel, 0)), 0)
                  * 1000000 // $NDCG_IDCG AS BIGINT) AS ndcg_ppm
      FROM qs q
           LEFT JOIN approx a ON a.query_id = q.query_id
           LEFT JOIN exact e ON e.query_id = a.query_id
                AND e.match_id = a.match_id
      GROUP BY q.query_id ORDER BY q.query_id"""
    })

  // ---------------------------------------------------------------- D44
  /** IVF nprobe tuning sweep (the D35 threshold-sweep discipline applied
    * to the ANN index): recall@5 against the exact truth at nprobe ∈
    * {1,2,4} side by side — the recall-vs-cost curve an index owner
    * reads before fixing the production probe count. Each sweep point
    * reuses the SAME staged centroids (persisted k-row frame) and the
    * SAME truth pass; only the probe fan-out varies. Query set is D34's
    * fixed small slice (vec_id < 5): the sweep is a tune-before-run
    * audit, its cost deliberately bounded by #queries · nprobe_max. */
  private val ivfNprobeSweep = QueryDef(
    "ivf_nprobe_sweep",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(F.col("vec_id") < 5)
      val cents = Staged.ivfCentroids(s, d)
      val asg = Staged.ivfAssignments(s, d)
      val exact = Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5)
        .select(F.col("query_id").as("eq"), F.col("match_id").as("em"))
      val sweeps = Seq(1, 2, 4).map { np =>
        Ivf.searchAssigned(emb, asg, cents, qs, "vec_id", "embedding",
          k = 5, nprobe = np)
          .select(F.lit(np.toLong).as("nprobe"), F.col("query_id"),
            F.col("match_id"))
      }.reduce(_ unionByName _)
      val nq = qs.agg(F.count(F.lit(1)).as("n_queries"))
      sweeps
        .join(exact, F.col("query_id") === F.col("eq") &&
          F.col("match_id") === F.col("em"), "left")
        .groupBy("nprobe")
        .agg(F.sum(F.when(F.col("em").isNotNull, 1L).otherwise(0L))
          .as("n_hits"))
        .crossJoin(F.broadcast(nq))
        .select(F.col("nprobe"), F.col("n_queries"), F.col("n_hits"),
          F.expr("n_hits * 1000000L div (5 * n_queries)")
            .as("recall_ppm"))
        .orderBy("nprobe")
    },
    Some(s"""
      WITH $centroidCtes,
      assigned AS (
        SELECT vec_id AS match_id, ckey AS centroid_label FROM (
          SELECT vec_id, ckey,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT vec_id, ckey, ${cosSql("embedding", "centroid")} AS cos
                FROM embeddings, cvec)) WHERE rn = 1),
      probes AS (
        SELECT query_id, centroid_label, rn AS pr FROM (
          SELECT query_id, ckey AS centroid_label,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT e.vec_id AS query_id, ckey,
                       ${cosSql("e.embedding", "centroid")} AS cos
                FROM embeddings e, cvec WHERE e.vec_id < 5)) WHERE rn <= 4),
      approx AS (
        SELECT np, query_id, match_id FROM (
          SELECT np, query_id, match_id,
                 row_number() OVER (PARTITION BY np, query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT v.np, p.query_id, a.match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM probes p
                     JOIN (VALUES (1), (2), (4)) v(np) ON p.pr <= v.np
                     JOIN assigned a ON p.centroid_label = a.centroid_label
                     JOIN embeddings q ON q.vec_id = p.query_id
                     JOIN embeddings c ON c.vec_id = a.match_id
                WHERE p.query_id != a.match_id))
        WHERE rank <= 5),
      exact AS (
        SELECT query_id, match_id FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 5 AND q.vec_id != c.vec_id))
        WHERE rank <= 5),
      nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries
             FROM embeddings WHERE vec_id < 5)
      SELECT CAST(a.np AS BIGINT) AS nprobe, nq.n_queries,
             CAST(sum(CASE WHEN e.match_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits,
             CAST(sum(CASE WHEN e.match_id IS NOT NULL THEN 1 ELSE 0 END)
                  * 1000000 // (5 * nq.n_queries) AS BIGINT) AS recall_ppm
      FROM approx a
           LEFT JOIN exact e ON e.query_id = a.query_id
                AND e.match_id = a.match_id, nq
      GROUP BY a.np, nq.n_queries ORDER BY nprobe"""))

  // ---------------------------------------------------------------- D46
  /** ColBERT-style late interaction [Khattab & Zaharia 2020]: each
    * vector is treated as 4 token-vectors (16-dim chunks — the PQ
    * slicing), MaxSim score = Σ_i max_j dot(q_i, d_j), top-5 per probe.
    * Exactness discipline: each chunk dot rounds to INTEGER MICROS
    * before the max (selection over integers), the 4 maxes sum as
    * integers — the whole score is hash-portable where a float MaxSim
    * would drift. Scale shape: the chunk join multiplies the standard
    * truth-pass by a CONSTANT 16 (4 query × 4 doc chunks); probes
    * broadcast; per-(probe, doc, chunk) state collapses map-side. */
  private val lateInteraction = QueryDef(
    "late_interaction",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      def chunked(df: org.apache.spark.sql.DataFrame, idName: String,
          posName: String, vecName: String) =
        df.select(F.col("vec_id").as(idName),
          F.posexplode(F.array((0 until 4).map(i =>
            F.slice(F.col("embedding"), i * 16 + 1, 16)): _*))
            .as(Seq(posName, vecName)))
      val qc = chunked(emb.filter(F.expr("vec_id % 25 = 1")),
        "query_id", "qi", "qv")
      val cc = chunked(emb, "match_id", "di", "dv")
      val scored = cc.join(F.broadcast(qc),
        F.col("query_id") =!= F.col("match_id"))
        .select(F.col("query_id"), F.col("match_id"), F.col("qi"),
          F.round(Similarity.dot(F.col("qv"), F.col("dv")) * 1000000)
            .cast("long").as("dm"))
        .groupBy("query_id", "match_id", "qi")
        .agg(F.max("dm").as("mx"))
        .groupBy("query_id", "match_id")
        .agg(F.sum("mx").as("score_micro"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(F.col("score_micro").desc, F.col("match_id"))
      scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "match_id", "score_micro")
        .orderBy("query_id", "rank")
    },
    Some("""
      WITH qc AS (
        SELECT vec_id AS query_id, i AS qi,
               list_slice(embedding, (i-1)*16 + 1, i*16) AS qv
        FROM embeddings, generate_series(1, 4) AS t(i)
        WHERE vec_id % 25 = 1),
      cc AS (
        SELECT vec_id AS match_id, i AS di,
               list_slice(embedding, (i-1)*16 + 1, i*16) AS dv
        FROM embeddings, generate_series(1, 4) AS t(i)),
      dm AS (
        SELECT query_id, match_id, qi,
               CAST(round(list_sum(list_transform(generate_series(1, 16),
                 k -> CAST(qv[k] AS DOUBLE) * CAST(dv[k] AS DOUBLE)))
                 * 1000000) AS BIGINT) AS dmv
        FROM qc, cc WHERE query_id != match_id),
      mx AS (SELECT query_id, match_id, qi, max(dmv) AS mx
             FROM dm GROUP BY 1, 2, 3),
      sc AS (SELECT query_id, match_id, CAST(sum(mx) AS BIGINT)
               AS score_micro
             FROM mx GROUP BY 1, 2)
      SELECT query_id, rank, match_id, score_micro FROM (
        SELECT query_id, match_id, score_micro,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY score_micro DESC, match_id) AS INTEGER) AS rank
        FROM sc) WHERE rank <= 5 ORDER BY query_id, rank"""))

  // ---------------------------------------------------------------- D47
  /** Reciprocal-rank fusion [Cormack et al. 2009] of two genuinely
    * different scorers over the same probes — full-vector cosine and
    * D46's MaxSim: rrf_micro = Σ_lists 10⁶ div (60 + rank) over each
    * list's top-10 (absent from a list ⇒ no contribution) — all
    * integer, hash-portable, the standard hybrid-search merge that
    * needs no score calibration between lists. Both input rankings are
    * metadata-sized (n_probes·10); the fusion is a tiny full-outer
    * join. */
  private val rrfFusion = QueryDef(
    "rrf_fusion",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(F.expr("vec_id % 25 = 1"))
      val cosL = Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 10)
        .select(F.col("query_id"), F.col("match_id"),
          F.col("rank").as("r_cos"))
      def chunked(df: org.apache.spark.sql.DataFrame, idName: String,
          posName: String, vecName: String) =
        df.select(F.col("vec_id").as(idName),
          F.posexplode(F.array((0 until 4).map(i =>
            F.slice(F.col("embedding"), i * 16 + 1, 16)): _*))
            .as(Seq(posName, vecName)))
      val qc = chunked(qs, "query_id", "qi", "qv")
      val cc = chunked(emb, "match_id", "di", "dv")
      val ms = cc.join(F.broadcast(qc),
        F.col("query_id") =!= F.col("match_id"))
        .select(F.col("query_id"), F.col("match_id"), F.col("qi"),
          F.round(Similarity.dot(F.col("qv"), F.col("dv")) * 1000000)
            .cast("long").as("dm"))
        .groupBy("query_id", "match_id", "qi")
        .agg(F.max("dm").as("mx"))
        .groupBy("query_id", "match_id")
        .agg(F.sum("mx").as("score_micro"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(F.col("score_micro").desc, F.col("match_id"))
      val maxL = ms.withColumn("r_max", F.row_number().over(w))
        .filter(F.col("r_max") <= 10)
        .select("query_id", "match_id", "r_max")
      val fused = cosL.join(maxL, Seq("query_id", "match_id"), "full_outer")
        .select(F.col("query_id"), F.col("match_id"),
          F.expr("coalesce(CASE WHEN r_cos IS NOT NULL THEN " +
            "1000000L div (60 + r_cos) END, 0L) + " +
            "coalesce(CASE WHEN r_max IS NOT NULL THEN " +
            "1000000L div (60 + r_max) END, 0L)").as("rrf_micro"),
          F.expr("CAST(r_cos AS BIGINT)").as("r_cos"),
          F.expr("CAST(r_max AS BIGINT)").as("r_max"))
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(F.col("rrf_micro").desc, F.col("match_id"))
      fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "match_id", "rrf_micro",
          "r_cos", "r_max")
        .orderBy("query_id", "rank")
    },
    Some(s"""
      WITH cosl AS (
        SELECT query_id, match_id, rank AS r_cos FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM embeddings q, embeddings c
                WHERE q.vec_id % 25 = 1 AND q.vec_id != c.vec_id))
        WHERE rank <= 10),
      qc AS (
        SELECT vec_id AS query_id, i AS qi,
               list_slice(embedding, (i-1)*16 + 1, i*16) AS qv
        FROM embeddings, generate_series(1, 4) AS t(i)
        WHERE vec_id % 25 = 1),
      cc AS (
        SELECT vec_id AS match_id, i AS di,
               list_slice(embedding, (i-1)*16 + 1, i*16) AS dv
        FROM embeddings, generate_series(1, 4) AS t(i)),
      dm AS (
        SELECT query_id, match_id, qi,
               CAST(round(list_sum(list_transform(generate_series(1, 16),
                 k -> CAST(qv[k] AS DOUBLE) * CAST(dv[k] AS DOUBLE)))
                 * 1000000) AS BIGINT) AS dmv
        FROM qc, cc WHERE query_id != match_id),
      mx AS (SELECT query_id, match_id, qi, max(dmv) AS mx
             FROM dm GROUP BY 1, 2, 3),
      sc AS (SELECT query_id, match_id, CAST(sum(mx) AS BIGINT)
               AS score_micro
             FROM mx GROUP BY 1, 2),
      maxl AS (
        SELECT query_id, match_id, r_max FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score_micro DESC, match_id) AS r_max
          FROM sc) WHERE r_max <= 10),
      fused AS (
        SELECT coalesce(c.query_id, m.query_id) AS query_id,
               coalesce(c.match_id, m.match_id) AS match_id,
               coalesce(CASE WHEN c.r_cos IS NOT NULL
                 THEN 1000000 // (60 + c.r_cos) END, 0)
               + coalesce(CASE WHEN m.r_max IS NOT NULL
                 THEN 1000000 // (60 + m.r_max) END, 0) AS rrf_micro,
               CAST(c.r_cos AS BIGINT) AS r_cos,
               CAST(m.r_max AS BIGINT) AS r_max
        FROM cosl c FULL OUTER JOIN maxl m
          ON c.query_id = m.query_id AND c.match_id = m.match_id)
      SELECT query_id, rank, match_id,
             CAST(rrf_micro AS BIGINT) AS rrf_micro, r_cos, r_max
      FROM (
        SELECT query_id, match_id, rrf_micro, r_cos, r_max,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_micro DESC, match_id) AS INTEGER) AS rank
        FROM fused) WHERE rank <= 5
      ORDER BY query_id, rank"""))

  // ---------------------------------------------------------------- D49
  /** Retrieval exposure / catalog-coverage audit: over the probe
    * slice's exact top-5 lists — how much of the catalog is ever
    * surfaced (coverage ppm), how concentrated exposure is (max
    * appearances, top-10-item share of all exposures in exact ppm).
    * The recommender-health numbers that catch popularity collapse
    * before users do. The exposure frame is bounded by n_probes·k;
    * the only corpus-sized input is the catalog count. */
  private val recCoverage = QueryDef(
    "rec_coverage",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(F.expr("vec_id % 25 = 1"))
      val exp = Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5)
        .groupBy("match_id").agg(F.count(F.lit(1)).as("nexp"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(F.col("nexp").desc, F.col("match_id"))
      val top10 = exp.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .agg(F.sum("nexp").as("top10_exp"))
      val sums = exp.agg(F.count(F.lit(1)).as("n_exposed"),
        F.sum("nexp").as("total_exp"), F.max("nexp").as("max_exposure"))
      val cat = emb.agg(F.count(F.lit(1)).as("n_catalog"))
      val nq = qs.agg(F.count(F.lit(1)).as("n_queries"))
      sums.crossJoin(F.broadcast(cat)).crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(top10))
        .select(F.col("n_catalog"), F.col("n_queries"),
          F.col("n_exposed"),
          F.expr("n_exposed * 1000000L div n_catalog").as("coverage_ppm"),
          F.col("max_exposure"),
          F.expr("top10_exp * 1000000L div total_exp")
            .as("top10_share_ppm"))
    },
    Some(s"""
      WITH nb AS (
        SELECT query_id, match_id FROM (
          SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, match_id) AS rank
          FROM (SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                       ${cosSql("q.embedding", "c.embedding")} AS cos
                FROM embeddings q, embeddings c
                WHERE q.vec_id % 25 = 1 AND q.vec_id != c.vec_id))
        WHERE rank <= 5),
      exp AS (SELECT match_id, CAST(count(*) AS BIGINT) AS nexp
              FROM nb GROUP BY 1),
      t10 AS (SELECT CAST(sum(nexp) AS BIGINT) AS top10_exp FROM (
                SELECT nexp FROM exp
                ORDER BY nexp DESC, match_id LIMIT 10)),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n_exposed,
                   CAST(sum(nexp) AS BIGINT) AS total_exp,
                   CAST(max(nexp) AS BIGINT) AS max_exposure
            FROM exp),
      cat AS (SELECT CAST(count(*) AS BIGINT) AS n_catalog
              FROM embeddings),
      nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries
             FROM embeddings WHERE vec_id % 25 = 1)
      SELECT n_catalog, n_queries, n_exposed,
             CAST(n_exposed * 1000000 // n_catalog AS BIGINT)
               AS coverage_ppm,
             max_exposure,
             CAST(top10_exp * 1000000 // total_exp AS BIGINT)
               AS top10_share_ppm
      FROM s, cat, nq, t10"""))

  /** D78 MMR weights in micros: λ = 0.7 (relevance) vs 1−λ = 0.3
    * (diversity penalty), and the shortlist/pick budgets. */
  val MMR_LAMBDA_MICRO = 700000L
  val MMR_SHORT = 8
  val MMR_PICK = 4

  // ---------------------------------------------------------------- D78
  /** Maximal-marginal-relevance re-ranking [Carbonell-Goldstein 1998]
    * — the diversity pass every RAG retriever runs between ANN
    * shortlist and prompt assembly: from each query's brute-force
    * top-[[MMR_SHORT]] shortlist, greedily pick [[MMR_PICK]] documents
    * maximizing λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s). All
    * scoring is EXACT integers over the 6dp-rounded cosines
    * (rel_micro/sim_micro longs; the pick score is the λ-weighted
    * integer mmr_pico = 700000·rel_micro − 300000·maxsim_micro, zero
    * maxsim for the first pick), so the greedy argmax — ties broken
    * by match_id — is bit-deterministic in both engines. Publishes
    * (query, mmr_rank, match, rel_micro, mmr_pico): the re-ranked,
    * de-redundified context list.
    *
    * Scale shape: the corpus is touched ONCE by the shortlist pass
    * (the D6 broadcast-queries scan); everything after — candidate
    * vectors, the 8×7 per-query sim matrix, four greedy rounds — is
    * queries×shortlist metadata (≤ 24 rows here), iterated in
    * UNROLLED bounded rounds, never a corpus-sized loop. */
  private val mmrRerank = QueryDef(
    "mmr_rerank",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, d, "embeddings")
      // persisted (r15, §2.4): the shortlist frame is queries×MMR_SHORT
      // rows but its lineage is the FULL brute-force corpus scan, and it
      // is referenced by round 1's seed pick plus every greedy round's
      // anti-join — unpersisted, the bench plan re-ran the corpus
      // scan+topK once per MMR round (5 scans per execution; AQE does
      // not reuse exchanges across separate action subtrees)
      val short = graft.operators.CacheScope.persist(
        Similarity.bruteForceTopK(emb,
          emb.filter(F.col("vec_id") < 3), "vec_id", "embedding",
          k = MMR_SHORT)
        .withColumn("rel_micro",
          F.expr("CAST(round(cos * 1000000) AS BIGINT)"))
        .select("query_id", "match_id", "rel_micro"))
      val shortV = graft.operators.CacheScope.persist(
        emb.select(F.col("vec_id").as("match_id"), F.col("embedding"))
          .join(F.broadcast(short), "match_id"))
      val sims = graft.operators.CacheScope.persist(
        shortV.select(F.col("query_id"), F.col("match_id").as("a"),
            F.col("embedding").as("va"))
          .join(shortV.select(F.col("query_id"),
            F.col("match_id").as("b"), F.col("embedding").as("vb")),
            "query_id")
          .where(F.col("a") =!= F.col("b"))
          // fresh-alias the query key: the round-r pick joins sims
          // against frames sharing `short`'s lineage, and an expression
          // condition on the SAME exprId would be an ambiguous self-join
          .select(F.col("query_id").as("sq"), F.col("a"), F.col("b"),
            F.expr("CAST(round(round(" +
              "float_dot(va, vb) / (sqrt(float_dot(va, va)) * " +
              "sqrt(float_dot(vb, vb))), 6) * 1000000) AS BIGINT)")
              .as("sim_micro")))
      val w = Window.partitionBy("query_id")
        .orderBy(F.col("_pico").desc, F.col("match_id"))
      // each round's pick (and the seed) is PERSISTED (r15, §2.4/§3.3):
      // round r+1 references `selected` three times (anti-join, the
      // candidate join, and through the growing union), so the
      // unpersisted plan tree grew ~3× per round — 427 Exchange nodes
      // for 4 picks, with the same tiny window aggregates re-planned
      // and re-executed dozens of times. Picks are queries×1 rows.
      var selected = graft.operators.CacheScope.persist(short
        .withColumn("_pico",
          F.expr(s"$MMR_LAMBDA_MICRO * rel_micro"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") === 1)
        .select(F.col("query_id"), F.col("match_id"),
          F.lit(1L).as("mmr_rank"), F.col("rel_micro"),
          F.col("_pico").as("mmr_pico")))
      for (r <- 2 to MMR_PICK) {
        val rem = short.join(
          selected.select("query_id", "match_id"),
          Seq("query_id", "match_id"), "left_anti")
        val pick = rem
          .join(selected.select(F.col("query_id"),
            F.col("match_id").as("_sel")), "query_id")
          .join(sims,
            sims("sq") === rem("query_id") &&
              sims("a") === rem("match_id") &&
              sims("b") === F.col("_sel"))
          .groupBy(rem("query_id").as("query_id"),
            rem("match_id").as("match_id"), F.col("rel_micro"))
          .agg(F.max("sim_micro").as("_maxsim"))
          .withColumn("_pico", F.expr(s"$MMR_LAMBDA_MICRO * rel_micro" +
            s" - ${1000000L - MMR_LAMBDA_MICRO} * _maxsim"))
          .withColumn("_rn", F.row_number().over(w))
          .where(F.col("_rn") === 1)
          .select(F.col("query_id"), F.col("match_id"),
            F.lit(r.toLong).as("mmr_rank"), F.col("rel_micro"),
            F.col("_pico").as("mmr_pico"))
        selected = graft.operators.CacheScope.persist(
          selected.unionByName(pick))
      }
      selected.orderBy("query_id", "mmr_rank")
    },
    Some {
      val lam = MMR_LAMBDA_MICRO
      val oneMinus = 1000000L - MMR_LAMBDA_MICRO
      val rounds = (2 to MMR_PICK).map { r =>
        s"""rem$r AS (
           |  SELECT rel.* FROM rel WHERE NOT EXISTS (
           |    SELECT 1 FROM selu${r - 1} s
           |    WHERE s.query_id = rel.query_id
           |      AND s.match_id = rel.match_id)),
           |ms$r AS (
           |  SELECT rem$r.query_id, rem$r.match_id, rem$r.rel_micro,
           |         max(sims.sim_micro) AS maxsim
           |  FROM rem$r JOIN selu${r - 1} sel
           |         ON sel.query_id = rem$r.query_id
           |       JOIN sims ON sims.query_id = rem$r.query_id
           |         AND sims.a = rem$r.match_id
           |         AND sims.b = sel.match_id
           |  GROUP BY 1, 2, 3),
           |sel$r AS MATERIALIZED (
           |  SELECT query_id, match_id, CAST($r AS BIGINT) AS mmr_rank,
           |         rel_micro, pico AS mmr_pico
           |  FROM (SELECT *, $lam * rel_micro - $oneMinus * maxsim
           |          AS pico,
           |          row_number() OVER (PARTITION BY query_id ORDER BY
           |            $lam * rel_micro - $oneMinus * maxsim DESC,
           |            match_id) AS rn
           |        FROM ms$r) WHERE rn = 1),
           |selu$r AS MATERIALIZED (
           |  SELECT * FROM selu${r - 1} UNION ALL SELECT * FROM sel$r)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id AS match_id, embedding AS cv
         |      FROM embeddings),
         |scored AS (
         |  SELECT query_id, match_id, ${cosSql("qv", "cv")} AS cos
         |  FROM q, c WHERE query_id != match_id),
         |short AS MATERIALIZED (
         |  SELECT query_id, match_id,
         |         CAST(round(cos * 1000000) AS BIGINT) AS rel_micro
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY cos DESC, match_id) AS rnk FROM scored)
         |  WHERE rnk <= $MMR_SHORT),
         |sv AS MATERIALIZED (
         |  SELECT short.query_id, short.match_id, short.rel_micro,
         |         c.cv AS v
         |  FROM short JOIN c ON c.match_id = short.match_id),
         |sims AS MATERIALIZED (
         |  SELECT s1.query_id, s1.match_id AS a, s2.match_id AS b,
         |         CAST(round(round(${dotSql("s1.v", "s2.v")}
         |           / (sqrt(${dotSql("s1.v", "s1.v")})
         |              * sqrt(${dotSql("s2.v", "s2.v")})), 6)
         |           * 1000000) AS BIGINT) AS sim_micro
         |  FROM sv s1 JOIN sv s2 ON s1.query_id = s2.query_id
         |    AND s1.match_id <> s2.match_id),
         |rel AS MATERIALIZED (
         |  SELECT query_id, match_id, rel_micro FROM short),
         |sel1 AS MATERIALIZED (
         |  SELECT query_id, match_id, CAST(1 AS BIGINT) AS mmr_rank,
         |         rel_micro, $lam * rel_micro AS mmr_pico
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY rel_micro DESC, match_id) AS rn FROM rel)
         |  WHERE rn = 1),
         |selu1 AS MATERIALIZED (SELECT * FROM sel1),
         |$rounds
         |SELECT query_id, mmr_rank, match_id, rel_micro, mmr_pico
         |FROM selu$MMR_PICK ORDER BY query_id, mmr_rank""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(searchMrr, searchNdcg, ivfNprobeSweep,
    lateInteraction, rrfFusion, recCoverage, mmrRerank)
}
