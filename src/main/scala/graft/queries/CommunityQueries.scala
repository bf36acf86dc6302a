package graft.queries

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.operators.Graph

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

  /** One-row exact-integer Newman modularity of a labeled partition:
    * Q = Σ_c [e_in_c/m − (d_c/2m)²] as the integer numerator
    * Σ_c (4·m·e_in_c − d_c²) over DECIMAL(38,0) with ONE integral
    * division by 4m² at the end — bit-exact against the HUGEINT
    * oracle. Edges joined to labels on each endpoint (two node-keyed
    * shuffles — labels are node-sized, NOT broadcast at 100 TB);
    * per-community terms are two map-side-combined aggregates to a
    * community-bounded frame. Returns (n_communities, m, q_micro);
    * shared by D51 (the detected partition) and D53 (before/after the
    * refinement move). */
  private[graft] def modularityCore(edges: DataFrame, comm: DataFrame): DataFrame = {
    // persisted: FOUR consumers read the labeled edge list (the m
    // broadcast, e_in, the two degree-union branches) — unpersisted,
    // the two endpoint joins re-execute per branch (profiled ~3× the
    // query cost at sf0.1); released per query by the driver
    val lbl = graft.operators.CacheScope.persist(edges
      .join(comm.select(F.col("v").as("pa"), F.col("community").as("ca")),
        "pa")
      .join(comm.select(F.col("v").as("pb"), F.col("community").as("cb")),
        "pb"))
    val m = lbl.agg(F.count(F.lit(1)).as("m"))
    val eIn = lbl.where(F.col("ca") === F.col("cb"))
      .groupBy(F.col("ca").as("community"))
      .agg(F.count(F.lit(1)).as("e_in"))
    val deg = lbl.select(F.col("ca").as("community"))
      .unionAll(lbl.select(F.col("cb").as("community")))
      .groupBy("community").agg(F.count(F.lit(1)).as("d_c"))
    deg.join(eIn, Seq("community"), "left")
      .na.fill(0L, Seq("e_in"))
      .crossJoin(F.broadcast(m))
      .agg(F.count(F.lit(1)).as("n_communities"),
        F.sum(F.expr("4 * CAST(m AS DECIMAL(38,0)) * e_in - " +
          "CAST(d_c AS DECIMAL(38,0)) * d_c")).as("_num"))
      .crossJoin(F.broadcast(m))
      .select(F.col("n_communities"), F.col("m"),
        // degenerate guard: a corpus with no multi-item orders has
        // m = 0 edges — modularity of the empty graph is defined 0
        // here rather than a division-by-zero null/error
        F.expr("CAST(IF(m = 0, 0, _num * 1000000 div " +
          "(4 * CAST(m AS DECIMAL(38,0)) * m)) AS BIGINT)")
          .as("q_micro"))
  }

  /** Oracle CTE block computing the modularity aggregate of the label
    * CTE `lblCte` (columns v, lbl), suffixed `p` so two instances can
    * coexist in one query (D53 scores before AND after). Mirrors
    * [[modularityCore]] term for term. */
  private def qCtesSql(lblCte: String, p: String): String =
    s"""lbl$p AS (SELECT e.pa, e.pb, x.lbl AS ca, y.lbl AS cb
       |          FROM e0 e JOIN $lblCte x ON x.v = e.pa
       |               JOIN $lblCte y ON y.v = e.pb),
       |mm$p AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lbl$p),
       |ein$p AS (SELECT ca AS community, CAST(count(*) AS BIGINT) AS e_in
       |          FROM lbl$p WHERE ca = cb GROUP BY 1),
       |deg$p AS (SELECT community, CAST(count(*) AS BIGINT) AS d_c
       |          FROM (SELECT ca AS community FROM lbl$p
       |                UNION ALL SELECT cb FROM lbl$p) GROUP BY 1),
       |ag$p AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
       |                sum(4 * CAST(m AS HUGEINT) * coalesce(e.e_in, 0)
       |                    - CAST(d.d_c AS HUGEINT) * d.d_c) AS num
       |         FROM deg$p d LEFT JOIN ein$p e
       |           ON d.community = e.community, mm$p)""".stripMargin

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
      comm.agg(F.count(F.lit(1)).as("n_nodes"))
        .crossJoin(F.broadcast(modularityCore(edges, comm)))
        .select("n_nodes", "n_communities", "m", "q_micro")
    },
    Some(s"""
      WITH $lpaCtesSql,
      ${qCtesSql(s"l$iters", "q")}
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM l$iters) AS n_nodes,
             n_communities, m,
             CAST(CASE WHEN m = 0 THEN 0
                  ELSE num * 1000000 // (4 * CAST(m AS HUGEINT) * m)
                  END AS BIGINT) AS q_micro
      FROM agq, mmq"""))

  // ---------------------------------------------------------------- D53
  /** One Louvain-style local-move refinement round over the DETECTED
    * partition ([[Graph.louvainMoveRound]] on [[Staged.communityLabels]]):
    * each part evaluates the exact integer-arithmetic modularity gain
    * of joining a neighbor community and takes the best strictly-
    * positive move (ties → smallest target label), all moves applied
    * synchronously. LPA under-merges on bridge-heavy graphs — this is
    * the bounded refinement that closes the community ladder, and the
    * published BEFORE/AFTER modularity (recomputed exactly from the
    * moved labels, NOT summed per-move gains — synchronized moves can
    * interfere) is the honest judge of whether the round helped.
    * Summary row: n_nodes, n_moved, n_communities (after), m,
    * q_before_micro, q_after_micro. */
  private val communityRefine = QueryDef(
    "community_refine",
    (s, d) => {
      val edges = Staged.coPurchaseEdges(s, d)
      val before = Staged.communityLabels(s, d)
      // persisted: the moved partition feeds TWO consumers (the n_moved
      // comparison and the after-modularity) — unpersisted, the whole
      // move-round join pipeline executes twice (measured 5.7 s → ~3 s
      // at sf0.1)
      val after = graft.operators.CacheScope.persist(
        Graph.louvainMoveRound(edges, "pa", "pb", before))
      val nNodes = before.agg(F.count(F.lit(1)).as("n_nodes"))
      val nMoved = before.select(F.col("v"), F.col("community").as("_cb"))
        .join(after.select(F.col("v"), F.col("community").as("_ca")), "v")
        .agg(F.sum(F.when(F.col("_cb") =!= F.col("_ca"), 1L).otherwise(0L))
          .as("n_moved"))
      val qb = modularityCore(edges, before)
        .select(F.col("q_micro").as("q_before_micro"))
      val qa = modularityCore(edges, after)
        .select(F.col("n_communities"), F.col("m"),
          F.col("q_micro").as("q_after_micro"))
      nNodes.crossJoin(F.broadcast(nMoved))
        .crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(qb))
        .select(F.col("n_nodes"), F.col("n_moved"), F.col("n_communities"),
          F.col("m"), F.col("q_before_micro"), F.col("q_after_micro"))
    },
    Some(s"""
      WITH $lpaCtesSql,
      degv AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS k
               FROM edges GROUP BY 1),
      kvc AS (SELECT e.src AS v, l.lbl AS c, CAST(count(*) AS BIGINT) AS kv
              FROM edges e JOIN l$iters l ON l.v = e.dst GROUP BY 1, 2),
      dtot AS (SELECT l.lbl AS c, CAST(sum(d.k) AS BIGINT) AS dt
               FROM l$iters l JOIN degv d ON d.v = l.v GROUP BY 1),
      m0 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
      basev AS (SELECT l.v, l.lbl AS a, d.k, coalesce(ka.kv, 0) AS kva,
                       da.dt AS dta
                FROM l$iters l JOIN degv d ON d.v = l.v
                LEFT JOIN kvc ka ON ka.v = l.v AND ka.c = l.lbl
                JOIN dtot da ON da.c = l.lbl),
      cand AS (SELECT b.v, kc.c,
                      2 * CAST(m AS HUGEINT) * (kc.kv - b.kva)
                      - CAST(b.k AS HUGEINT) * (dt.dt - b.dta + b.k) AS gain
               FROM basev b JOIN kvc kc ON kc.v = b.v AND kc.c <> b.a
                    JOIN dtot dt ON dt.c = kc.c, m0),
      best AS (SELECT v, c, gain,
                      row_number() OVER (PARTITION BY v
                        ORDER BY gain DESC, c) AS rn
               FROM cand),
      lr AS (SELECT b.v,
                    CASE WHEN bs.gain > 0 THEN bs.c ELSE b.a END AS lbl
             FROM basev b LEFT JOIN best bs ON bs.v = b.v AND bs.rn = 1),
      ${qCtesSql(s"l$iters", "b")},
      ${qCtesSql("lr", "a")}
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM l$iters) AS n_nodes,
             (SELECT CAST(sum(CASE WHEN r.lbl <> l.lbl THEN 1 ELSE 0 END)
                      AS BIGINT)
              FROM lr r JOIN l$iters l ON l.v = r.v) AS n_moved,
             aga.n_communities, mmb.m,
             CAST(CASE WHEN mmb.m = 0 THEN 0
                  ELSE agb.num * 1000000
                       // (4 * CAST(mmb.m AS HUGEINT) * mmb.m)
                  END AS BIGINT) AS q_before_micro,
             CAST(CASE WHEN mma.m = 0 THEN 0
                  ELSE aga.num * 1000000
                       // (4 * CAST(mma.m AS HUGEINT) * mma.m)
                  END AS BIGINT) AS q_after_micro
      FROM agb, mmb, aga, mma"""))

  val all: Seq[QueryDef] =
    Seq(communityLpa, communityModularity, communityRefine)
}
