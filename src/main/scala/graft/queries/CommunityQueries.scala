package graft.queries

import org.apache.spark.sql.{functions => F}

/** Wave-57 inventory (r8): community DETECTION over the staged
  * co-purchase graph — the r7 verdict's gap: D48 scored the modularity
  * of a GIVEN partition (brands); the graph suite had BFS / k-core /
  * triangles / connected components but no algorithm that FINDS
  * communities. [[Graph.labelPropagation]] (deterministic synchronous
  * LPA, fixed rounds, C28's min(struct(−count, label)) argmax) fills
  * it, and D51 feeds the DETECTED partition into D48's exact-integer
  * modularity so the score finally has a non-trivial subject.
  *
  * Reference analog: flycatcher has no graph code (it is a schema
  * layer, src/flycatcher/generators/polars.py); these extend graft's
  * pipeline surface the way a dedup/recommendation pipeline actually
  * clusters beyond connected components.
  */
object CommunityQueries {

  /** LPA round count, shared with [[Staged.communityLabels]] so the
    * staged artifact and the oracle CTE unroll can never drift. */
  private[queries] val lpaIters = 4
  private def iters = lpaIters

  /** Shared unrolled-LPA CTE chain: e0 (deduped co-purchase edges),
    * both-direction edges, l0..l4 label frames. The per-round argmax is
    * row_number over (count DESC, label ASC) — exactly
    * min(struct(−count, label)) on the Spark side. */
  private val lpaCtesSql: String = {
    val rounds = (1 to iters).map { r =>
      s"""l$r AS (SELECT v, lbl FROM (
         |  SELECT e.src AS v, l.lbl, count(*) AS c,
         |         row_number() OVER (PARTITION BY e.src
         |           ORDER BY count(*) DESC, l.lbl) AS rn
         |  FROM edges e JOIN l${r - 1} l ON l.v = e.dst
         |  GROUP BY e.src, l.lbl) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""e0 AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       |       FROM lineitem a JOIN lineitem b
       |         ON a.l_orderkey = b.l_orderkey
       |        AND a.l_partkey < b.l_partkey),
       |edges AS (SELECT pa AS src, pb AS dst FROM e0
       |          UNION ALL SELECT pb, pa FROM e0),
       |l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM edges),
       |$rounds""".stripMargin
  }

  // ---------------------------------------------------------------- D50
  /** Label-propagation communities on the co-purchase part graph:
    * 4 synchronous rounds from singleton labels, neighbor-majority
    * adoption with the smallest-label tie-break (fully deterministic —
    * no async sweep order, no RNG). One edges⋈labels shuffle + two
    * map-side-combined aggregates per round over the STAGED deduped
    * edge list ([[Staged.coPurchaseEdges]]); labels eagerly
    * checkpointed per round like D15's pagerank, and the DETECTED
    * partition is itself staged ([[Staged.communityLabels]]) so D51
    * scores it instead of re-propagating — this query pays the build.
    * Output: every part with its detected community id (= the
    * propagated minimum-ish hub label). */
  private val communityLpa = QueryDef(
    "community_lpa",
    (s, d) => Staged.communityLabels(s, d).orderBy("v"),
    Some(s"""
      WITH $lpaCtesSql
      SELECT v, lbl AS community FROM l$iters ORDER BY v"""))

  // ---------------------------------------------------------------- D51
  /** Global Newman modularity of the DETECTED partition (D50's labels
    * feeding D48's exact-integer per-community term):
    * Q = Σ_c [e_in_c/m − (d_c/2m)²], computed as the integer
    * numerator Σ_c (4·m·e_in_c − d_c²) over DECIMAL(38,0)/HUGEINT and
    * ONE integral division by 4m² at the end — bit-exact in both
    * engines. Edges are re-joined to the final labels on each endpoint
    * (two node-keyed shuffles — labels are node-sized, NOT broadcast
    * at 100 TB), per-community terms are two map-side-combined
    * aggregates to a community-bounded frame. One summary row:
    * n_nodes, n_communities, m, Q in micros. */
  private val communityModularity = QueryDef(
    "community_modularity",
    (s, d) => {
      val edges = Staged.coPurchaseEdges(s, d)
      val comm = Staged.communityLabels(s, d)
      val lbl = edges
        .join(comm.select(F.col("v").as("pa"), F.col("community").as("ca")),
          "pa")
        .join(comm.select(F.col("v").as("pb"), F.col("community").as("cb")),
          "pb")
      val m = lbl.agg(F.count(F.lit(1)).as("m"))
      val eIn = lbl.where(F.col("ca") === F.col("cb"))
        .groupBy(F.col("ca").as("community"))
        .agg(F.count(F.lit(1)).as("e_in"))
      val deg = lbl.select(F.col("ca").as("community"))
        .unionAll(lbl.select(F.col("cb").as("community")))
        .groupBy("community").agg(F.count(F.lit(1)).as("d_c"))
      val nums = deg.join(eIn, Seq("community"), "left")
        .na.fill(0L, Seq("e_in"))
        .crossJoin(F.broadcast(m))
        .agg(F.count(F.lit(1)).as("n_communities"),
          F.sum(F.expr("4 * CAST(m AS DECIMAL(38,0)) * e_in - " +
            "CAST(d_c AS DECIMAL(38,0)) * d_c")).as("_num"))
      comm.agg(F.count(F.lit(1)).as("n_nodes"))
        .crossJoin(F.broadcast(nums))
        .crossJoin(F.broadcast(m))
        .select(F.col("n_nodes"), F.col("n_communities"), F.col("m"),
          // degenerate guard: a corpus with no multi-item orders has
          // m = 0 edges — modularity of the empty graph is defined 0
          // here rather than a division-by-zero null/error
          F.expr("CAST(IF(m = 0, 0, _num * 1000000 div " +
            "(4 * CAST(m AS DECIMAL(38,0)) * m)) AS BIGINT)")
            .as("q_micro"))
    },
    Some(s"""
      WITH $lpaCtesSql,
      lbl AS (
        SELECT e.pa, e.pb, x.lbl AS ca, y.lbl AS cb
        FROM e0 e JOIN l$iters x ON x.v = e.pa
             JOIN l$iters y ON y.v = e.pb),
      mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lbl),
      ein AS (SELECT ca AS community, CAST(count(*) AS BIGINT) AS e_in
              FROM lbl WHERE ca = cb GROUP BY 1),
      deg AS (
        SELECT community, CAST(count(*) AS BIGINT) AS d_c
        FROM (SELECT ca AS community FROM lbl
              UNION ALL SELECT cb FROM lbl)
        GROUP BY 1),
      ag AS (
        SELECT CAST(count(*) AS BIGINT) AS n_communities,
               sum(4 * CAST(m AS HUGEINT) * coalesce(e.e_in, 0)
                   - CAST(d.d_c AS HUGEINT) * d.d_c) AS num
        FROM deg d LEFT JOIN ein e ON d.community = e.community, mm)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM l$iters) AS n_nodes,
             n_communities, m,
             CAST(CASE WHEN m = 0 THEN 0
                  ELSE num * 1000000 // (4 * CAST(m AS HUGEINT) * m)
                  END AS BIGINT) AS q_micro
      FROM ag, mm"""))

  val all: Seq[QueryDef] = Seq(communityLpa, communityModularity)
}
