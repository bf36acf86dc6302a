package graft.queries

import graft.operators.{Dedup, Hashing}
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-7 inventory (r5): corpus-dedup and mixture recipes from the
  * LLM-data literature that were still missing from §2 —
  * substring-window duplication (Lee et al. 2022, arXiv:2107.06499),
  * semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540),
  * bigram-LM surprisal scoring, and temperature-flattened domain
  * mixtures. Oracle SQL mirrors the Spark plans step for step (same
  * hashes, same rounding discipline, same tie-breaks) so the results
  * hash-match. */
object SemanticQueries {

  private val toksSql = "regexp_split_to_array(lower(text), ' +')"

  /** DuckDB n-gram list over a token-array column `t` (ALL positions). */
  private def gramsSql(n: Int): String = {
    val parts = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, greatest(len(t)-${n - 1}, 0)), i -> $parts)"
  }

  // ---------------------------------------------------------------- D17
  /** w=5 so the sf0.01 corpus (planted exact + near duplicates) yields
    * a non-trivial duplicated fraction; the paper uses 50-token spans
    * on web-scale text. */
  private val dedupSubstring = QueryDef(
    "dedup_substring",
    (s, d) => Dedup.substringDupStats(t(s, d, "documents"), "doc_id", "text",
      w = 5)
      .orderBy("doc_id"),
    Some(s"""
      WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
      w AS (SELECT doc_id, unnest(${gramsSql(5)}) AS win FROM tk),
      h AS (SELECT doc_id, ${Hashing.hash60Sql("win")} AS wh FROM w),
      l AS (SELECT doc_id, wh, count(*) AS k_local FROM h GROUP BY 1, 2),
      g AS (SELECT wh, CAST(sum(k_local) AS BIGINT) AS k_global
            FROM l GROUP BY 1)
      SELECT doc_id,
             CAST(sum(k_local) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN k_global >= 2 THEN k_local ELSE 0 END)
                  AS BIGINT) AS n_dup_windows,
             round(sum(CASE WHEN k_global >= 2 THEN k_local ELSE 0 END) * 1.0
                   / sum(k_local), 6) AS dup_frac
      FROM l JOIN g USING (wh)
      GROUP BY doc_id ORDER BY doc_id"""))

  // ---------------------------------------------------------------- D81
  /** Longest-duplicated-span ladder (r15, the cut-vs-drop half of Lee
    * et al. D17 stops short of): [[Dedup.spanLadder]] at
    * w ∈ {5, 10, 20, 40} over the 10–99-token synthetic docs (the
    * paper's 50-token threshold scaled to corpus span lengths),
    * drop at max_dup_w ≥ 20. The oracle rebuilds the identical ladder
    * in SQL — same hash, same (w, doc, hash) collapse, same CASE
    * chains — so the decision column is hash-compared end to end. */
  private val LADDER_WS = Seq(5, 10, 20, 40)
  private val LADDER_DROP_W = 20
  private val dedupSpanLadder = QueryDef(
    "dedup_span_ladder",
    (s, d) => Dedup.spanLadder(t(s, d, "documents"), "doc_id", "text",
      LADDER_WS, LADDER_DROP_W)
      .orderBy("doc_id"),
    Some {
      val winCtes = LADDER_WS.map(w =>
        s"SELECT doc_id, $w AS w, unnest(${gramsSql(w)}) AS win FROM tk")
        .mkString("\n      UNION ALL ")
      val dupCols = LADDER_WS.map(w =>
        s"CAST(coalesce(sum(CASE WHEN w = $w THEN n_dup END), 0) " +
          s"AS BIGINT) AS dup_w$w").mkString(",\n             ")
      val desc = LADDER_WS.reverse
      val maxCase = desc.map(w => s"WHEN dup_w$w > 0 THEN $w")
        .mkString("CASE ", " ", " ELSE 0 END")
      val atMaxCase = desc.map(w => s"WHEN dup_w$w > 0 THEN dup_w$w")
        .mkString("CASE ", " ", " ELSE 0 END")
      s"""
      WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
      w AS ($winCtes),
      h AS (SELECT doc_id, w, ${Hashing.hash60Sql("win")} AS wh FROM w),
      l AS (SELECT doc_id, w, wh, count(*) AS k_local
            FROM h GROUP BY 1, 2, 3),
      g AS (SELECT w, wh, CAST(sum(k_local) AS BIGINT) AS k_global
            FROM l GROUP BY 1, 2),
      pw AS (SELECT doc_id, w,
                    CAST(sum(k_local) AS BIGINT) AS n_windows,
                    CAST(sum(CASE WHEN k_global >= 2 THEN k_local
                             ELSE 0 END) AS BIGINT) AS n_dup
             FROM l JOIN g USING (w, wh) GROUP BY 1, 2),
      pd AS (SELECT doc_id,
             CAST(coalesce(sum(CASE WHEN w = ${LADDER_WS.head}
                  THEN n_windows END), 0) AS BIGINT)
               AS n_w${LADDER_WS.head},
             $dupCols
             FROM pw GROUP BY doc_id)
      SELECT doc_id, n_w${LADDER_WS.head},
             ${LADDER_WS.map(w => s"dup_w$w").mkString(", ")},
             CAST($maxCase AS INTEGER) AS max_dup_w,
             CAST($atMaxCase AS BIGINT) AS dup_at_max,
             CASE WHEN $maxCase >= $LADDER_DROP_W THEN 'drop'
                  WHEN $maxCase > 0 THEN 'cut'
                  ELSE 'keep' END AS decision
      FROM pd ORDER BY doc_id"""
    })

  // ---------------------------------------------------------------- D18
  /** Same k-means configuration as `embed_kmeans` (k=4, 2 iterations)
    * and the same cosine threshold as `embed_neardup` (0.35), so the
    * oracle reuses the shared a3 CTE chain and the planted near-dup
    * vectors actually produce semantic drops at sf0.01. */
  private val semanticDedup = QueryDef(
    "semantic_dedup",
    (s, d) => Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
      k = 4, iters = 2, minCosine = 0.35)
      .orderBy("vec_id"),
    Some {
      val cos = ExtendedQueries.cosSql("ea.embedding", "eb.embedding")
      s"""WITH RECURSIVE ${ExtendedQueries.kmeansA3Ctes},
         |pr AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM a3 a JOIN a3 b ON a.ck = b.ck AND a.vec_id < b.vec_id
         |       JOIN embeddings ea ON ea.vec_id = a.vec_id
         |       JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE $cos >= 0.35),
         |edges AS (SELECT vec_a AS a, vec_b AS b FROM pr
         |          UNION SELECT vec_b, vec_a FROM pr),
         |reach AS (SELECT a, b FROM edges
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |          WHERE e.b <> r.a),
         |clusters AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id
         |             FROM reach GROUP BY a)
         |SELECT a3.vec_id, CAST(a3.ck AS INTEGER) AS centroid_label,
         |       CAST(CASE WHEN c.cluster_id IS NULL
         |                      OR c.cluster_id = a3.vec_id
         |                 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM a3 LEFT JOIN clusters c ON a3.vec_id = c.vec_id
         |ORDER BY a3.vec_id""".stripMargin
    })

  // ---------------------------------------------------------------- E33
  private val surprisalBigram = QueryDef(
    "surprisal_bigram",
    (s, d) => graft.operators.TextOps.surprisalBigram(
      t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some(s"""
      WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
      b AS (SELECT doc_id, unnest(${gramsSql(2)}) AS bigram FROM tk),
      tf AS (SELECT doc_id, bigram, count(*) AS tf FROM b GROUP BY 1, 2),
      c2 AS (SELECT bigram, CAST(sum(tf) AS BIGINT) AS c2 FROM tf GROUP BY 1),
      cx AS (SELECT split_part(bigram, ' ', 1) AS u,
                    CAST(sum(c2) AS BIGINT) AS cctx
             FROM c2 GROUP BY 1)
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             round(CAST(sum(tf * ((length(bin(cctx)) - 1)
                                  - (length(bin(c2)) - 1))) AS DOUBLE)
                   / sum(tf), 6) AS mean_surprisal2
      FROM tf JOIN c2 USING (bigram)
           JOIN cx ON split_part(bigram, ' ', 1) = cx.u
      GROUP BY doc_id ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E34
  /** T = 2: one correctly-rounded sqrt — see Curation.domainTemperature
    * for why the temperature is restricted to powers of two. */
  private val domainTemperature = QueryDef(
    "domain_temperature",
    (s, d) => graft.operators.Curation.domainTemperature(
      t(s, d, "documents").select(
        F.col("lang"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").as("est_tokens")),
      "lang", "est_tokens", temperature = 2.0)
      .orderBy("lang"),
    Some("""
      WITH dt AS (
        SELECT lang,
               CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
                 AS domain_tokens
        FROM documents GROUP BY 1),
      t AS (SELECT CAST(sum(domain_tokens) AS BIGINT) AS total FROM dt),
      m AS (SELECT lang, domain_tokens, total,
                   CAST(floor(sqrt(CAST(domain_tokens AS DOUBLE) / total)
                              * 1e6) AS BIGINT) AS flat_micro
            FROM dt, t),
      z AS (SELECT CAST(sum(flat_micro) AS BIGINT) AS z FROM m)
      SELECT lang, domain_tokens,
             round(CAST(domain_tokens AS DOUBLE) / total, 6) AS share,
             flat_micro,
             round(CAST(flat_micro AS DOUBLE) / z, 6) AS weight,
             round(least(1.0, CAST(flat_micro AS DOUBLE) / z * total
                              / domain_tokens), 6) AS sample_rate
      FROM m, z ORDER BY lang"""))

  // ---------------------------------------------------------------- E35
  /** Target domain = lang 'en'; 1024 feature buckets (the paper uses
    * 10k hashed unigram+bigram buckets at web scale — bucket count only
    * shifts the smoothing mass, the plan shape is identical). */
  private val dsirWeights = QueryDef(
    "dsir_weights",
    (s, d) => graft.operators.Curation.dsirWeights(
      t(s, d, "documents"), "doc_id", "text",
      targetCol = F.col("lang") === "en", buckets = 1024)
      .orderBy("doc_id"),
    Some(s"""
      WITH tk AS (SELECT doc_id, lang = 'en' AS tgt, $toksSql AS t
                  FROM documents),
      g AS (SELECT doc_id, tgt, unnest(${gramsSql(2)}) AS gram FROM tk),
      f AS (SELECT doc_id, tgt, ${Hashing.hash60Sql("gram")} % 1024 AS b,
                   count(*) AS n
            FROM g GROUP BY 1, 2, 3),
      raw AS (SELECT b, CAST(sum(n) AS BIGINT) AS craw FROM f GROUP BY 1),
      tg AS (SELECT b, CAST(sum(n) AS BIGINT) AS ctgt FROM f WHERE tgt GROUP BY 1),
      tot AS (SELECT CAST(sum(craw) AS BIGINT) AS traw,
                     (SELECT CAST(coalesce(sum(ctgt), 0) AS BIGINT) FROM tg)
                       AS ttgt
              FROM raw),
      sc AS (SELECT f.doc_id, f.n,
                    (length(bin(coalesce(ctgt, 0) + 1)) - 1)
                      - (length(bin(craw + 1)) - 1) AS sb
             FROM f JOIN raw USING (b) LEFT JOIN tg USING (b)),
      agg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
                     CAST(sum(n * sb) AS BIGINT) AS sw
              FROM sc GROUP BY 1)
      SELECT doc_id, n_feats,
             CAST(sw - n_feats * ((length(bin(ttgt + 1024)) - 1)
                                  - (length(bin(traw + 1024)) - 1))
                  AS BIGINT) AS log2_weight,
             round(CAST(sw - n_feats * ((length(bin(ttgt + 1024)) - 1)
                                        - (length(bin(traw + 1024)) - 1))
                        AS DOUBLE) / n_feats, 6) AS avg_log2
      FROM agg, tot ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E36
  /** Round-0 pair counts (the per-round counting step of BPE training;
    * multi-round merge application is deterministic-tie-break `Bpe.train`,
    * spec-verified on a hand-computed corpus). Top 20 by (count DESC,
    * pair ASC) — a bounded TakeOrderedAndProject, never a full sort. */
  private val bpePairs = QueryDef(
    "bpe_pairs",
    (s, d) => graft.operators.Bpe.pairCounts(
      graft.operators.Bpe.wordFreq(t(s, d, "documents"), "text"), Nil)
      .orderBy(F.desc("cnt"), F.asc("pair")).limit(20)
      .orderBy(F.desc("cnt"), F.asc("pair")),
    Some(s"""
      WITH tk AS (SELECT $toksSql AS t FROM documents),
      w AS (SELECT unnest(t) AS word FROM tk),
      wf AS (SELECT word, count(*) AS freq FROM w
             WHERE length(word) > 0 GROUP BY 1),
      p AS (SELECT freq,
                   unnest(list_transform(generate_series(1, length(word) - 1),
                     i -> substr(word, i, 1) || ' ' || substr(word, i + 1, 1)))
                     AS pair
            FROM wf)
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
      FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20"""))

  // ---------------------------------------------------------------- E37
  /** Count-min-sketch heavy hitters: estimate the top-20 exact term
    * frequencies through a 4×256 CMS and report the (always ≥ 0)
    * overcount. Everything is integer — cells are sums of exact longs,
    * the estimate a min — so the sketch ESTIMATE itself hash-matches
    * the oracle (the same discipline as KMV/E20 and the C27
    * histogram). Sketch built from the vocab table, not the corpus;
    * estimates via one broadcast join of 20·4 probe cells. */
  private val heavyHittersCms = QueryDef(
    "heavy_hitters_cms",
    (s, d) => {
      import graft.operators.{Bpe, CacheScope, Sketch}
      val tc = CacheScope.persist(Bpe.wordFreq(t(s, d, "documents"), "text"))
      val sketch = Sketch.cmsSketch(tc, "word", "freq", depth = 4, width = 256)
      val top = tc.orderBy(F.desc("freq"), F.asc("word")).limit(20)
      Sketch.cmsEstimate(sketch, top, "word", depth = 4, width = 256)
        .join(top, "word")
        .select(F.col("word").as("term"), F.col("freq").as("exact_cnt"),
          F.col("est_cnt"), (F.col("est_cnt") - F.col("freq")).as("overcount"))
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
    },
    Some(s"""
      WITH tk AS (SELECT $toksSql AS t FROM documents),
      w AS (SELECT unnest(t) AS word FROM tk),
      tc AS (SELECT word, count(*) AS freq FROM w
             WHERE length(word) > 0 GROUP BY 1),
      cells AS (SELECT r,
                       ${Hashing.hash60Sql(
                         "'cms' || CAST(r AS VARCHAR) || ':' || word")} % 256
                         AS b,
                       freq
                FROM tc, unnest([0, 1, 2, 3]) AS u(r)),
      sk AS (SELECT r, b, CAST(sum(freq) AS BIGINT) AS total
             FROM cells GROUP BY 1, 2),
      top AS (SELECT word, freq FROM tc ORDER BY freq DESC, word LIMIT 20),
      pc AS (SELECT word,
                    r,
                    ${Hashing.hash60Sql(
                      "'cms' || CAST(r AS VARCHAR) || ':' || word")} % 256 AS b
             FROM top, unnest([0, 1, 2, 3]) AS u(r)),
      est AS (SELECT word, CAST(min(total) AS BIGINT) AS est_cnt
              FROM pc JOIN sk USING (r, b) GROUP BY 1)
      SELECT top.word AS term, CAST(freq AS BIGINT) AS exact_cnt, est_cnt,
             CAST(est_cnt - freq AS BIGINT) AS overcount
      FROM top JOIN est USING (word)
      ORDER BY exact_cnt DESC, term"""))

  // ---------------------------------------------------------------- E38
  /** KMV set algebra between the even- and odd-numbered source cohorts
    * (crawl-overlap estimation): distinct text-hash KMV sketches per
    * cohort, merged union sketch, Jaccard ρ = shared-in-union / k,
    * intersection ≈ ρ·|union| [Beyer et al. 2007]. k=64 < cohort
    * cardinality so the estimator genuinely estimates at every SF; the
    * oracle recomputes the identical bottom-k sets in SQL. */
  private val sketchSetOps = QueryDef(
    "sketch_set_ops",
    (s, d) => graft.operators.Sketch.kmvSetOps(
      t(s, d, "documents"),
      cohortCol = F.pmod(F.substring(F.col("source"), 4, 10).cast("long"),
        F.lit(2L)),
      valueCol = "text", k = 64),
    Some {
      val k = 64
      val maxH = 1152921504606846976.0 // 2^60
      val num = (k - 1).toDouble * maxH
      s"""
      WITH hsh AS (SELECT DISTINCT
                     CAST(substr(source, 4, 10) AS BIGINT) % 2 AS c,
                     ${Hashing.hash60Sql("text")} AS h
                   FROM documents),
      ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
             FROM hsh WHERE c = 0),
      rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
             FROM hsh WHERE c = 1),
      ka AS (SELECT h FROM ra WHERE rn <= $k),
      kb AS (SELECT h FROM rb WHERE rn <= $k),
      ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
             FROM (SELECT h FROM ka UNION SELECT h FROM kb)),
      uk AS (SELECT h FROM ur WHERE rn <= $k),
      m AS (SELECT
              (SELECT CAST(count(*) AS BIGINT) FROM ka) AS na,
              (SELECT max(h) FROM ka) AS ma,
              (SELECT CAST(count(*) AS BIGINT) FROM kb) AS nb,
              (SELECT max(h) FROM kb) AS mb,
              (SELECT CAST(count(*) AS BIGINT) FROM uk) AS nu,
              (SELECT max(h) FROM uk) AS mu,
              (SELECT CAST(count(*) AS BIGINT) FROM uk
               WHERE h IN (SELECT h FROM ka)
                 AND h IN (SELECT h FROM kb)) AS sh)
      SELECT na AS kept_a, nb AS kept_b,
             round(CASE WHEN na = $k THEN $num / ma
                        ELSE CAST(na AS DOUBLE) END, 6) AS est_a,
             round(CASE WHEN nb = $k THEN $num / mb
                        ELSE CAST(nb AS DOUBLE) END, 6) AS est_b,
             round(CASE WHEN nu = $k THEN $num / mu
                        ELSE CAST(nu AS DOUBLE) END, 6) AS est_union,
             sh AS n_shared,
             round(CAST(sh AS DOUBLE) /
                   (CASE WHEN nu = $k THEN ${k.toDouble}
                         ELSE CAST(nu AS DOUBLE) END), 6) AS jaccard,
             round(CASE WHEN nu = $k
                        THEN CAST(sh AS DOUBLE) / $k * ($num / mu)
                        ELSE CAST(sh AS DOUBLE) END, 6) AS est_intersection
      FROM m"""
    })

  // ---------------------------------------------------------------- E55
  /** CCNet-style perplexity-bucket partitioning [Wenzek et al. 2020,
    * arXiv:1911.00359]: score each doc by a transcendental-free
    * perplexity proxy — the mean INVERSE unigram probability in exact
    * integer milli-units, Σ tf·(total·1000 div c) div ntok (rarer
    * tokens ⇒ larger score, the same ordering an LM perplexity induces
    * under a unigram model; E22's bitlen-log2 surprisal is too coarse
    * to cut quantiles on — integer bits collapse most docs onto one
    * value) — then cut each LANGUAGE into head/middle/tail terciles,
    * CCNet's recipe for ranking fluent text without an LM in the loop
    * (head = lowest score). The tercile cut runs over the (lang, score)
    * GROUPED frame and assigns every doc in a score group the group-END
    * bucket ((cum−1)·3 div tot), the same tie-indivisible rule as M3's
    * deciles. Corpus-sized work is two map-side-combined aggregates
    * (doc-term tf, term counts) and one term join. */
  private val ccnetBuckets = QueryDef(
    "ccnet_buckets",
    (s, d) => {
      val tf = t(s, d, "documents")
        .select(F.col("doc_id"), F.col("lang"),
          F.explode(graft.operators.TextOps.tokens(F.col("text"))).as("term"))
        .groupBy("doc_id", "lang", "term").agg(F.count(F.lit(1)).as("tf"))
      val tc = tf.groupBy("term").agg(F.sum("tf").as("c"))
      val tot = tc.agg(F.sum("c").as("total"))
      val sc = tf.join(tc, "term").crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
          F.sum(F.expr("tf * (total * 1000L div c)")).as("sw"),
          F.sum("tf").as("ntok"))
        .select(F.col("lang"), F.expr("sw div ntok").as("score_mip"))
      val g = sc.groupBy("lang", "score_mip").agg(F.count(F.lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("score_mip")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cum = g.withColumn("cum", F.sum("cnt").over(w))
      val tots = cum.groupBy("lang").agg(F.max("cum").as("tot"))
      cum.join(F.broadcast(tots), "lang")
        .groupBy(F.col("lang"), F.expr("(cum - 1) * 3 div tot").as("bucket"))
        .agg(F.sum("cnt").as("n_docs"),
          F.min("score_mip").as("min_score_mip"),
          F.max("score_mip").as("max_score_mip"))
        .orderBy("lang", "bucket")
    },
    Some(s"""
      WITH tf AS (
        SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, lang, unnest($toksSql) AS term FROM documents)
        GROUP BY 1, 2, 3),
      tc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tc),
      sc AS (SELECT doc_id, lang,
                    CAST(sum(tf * (total * 1000 // c)) // sum(tf) AS BIGINT)
                      AS score_mip
             FROM tf JOIN tc USING (term), n GROUP BY 1, 2),
      g AS (SELECT lang, score_mip, CAST(count(*) AS BIGINT) AS cnt
            FROM sc GROUP BY 1, 2),
      c AS (SELECT lang, score_mip, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY score_mip)
                     AS BIGINT) AS cum
            FROM g),
      t2 AS (SELECT lang, max(cum) AS tot FROM c GROUP BY 1)
      SELECT c.lang, CAST((cum - 1) * 3 // tot AS BIGINT) AS bucket,
             CAST(sum(cnt) AS BIGINT) AS n_docs,
             min(score_mip) AS min_score_mip,
             max(score_mip) AS max_score_mip
      FROM c JOIN t2 USING (lang) GROUP BY 1, 2 ORDER BY lang, bucket"""))

  // ---------------------------------------------------------------- E56
  /** Pairwise source-vocabulary overlap — the "are these two crawls the
    * same site" audit, run on 3-gram shingle vocabularies (unigrams
    * saturate on any corpus; trigram space is sparse enough to carry
    * signal). Exact Jaccard per source pair in integer micros:
    * |A∩B| via a self-join of the DISTINCT (source, gram) table on
    * gram — fan-out per gram is bounded by the SOURCE COUNT squared
    * (20² here), never corpus size — and |A∪B| = na + nb − |A∩B| from
    * a broadcast 20-row size table. The E38 KMV sketch is the
    * estimated cousin; this is the exact form, affordable because
    * the pair space is sources², not docs². */
  private val vocabOverlap = QueryDef(
    "vocab_overlap",
    (s, d) => {
      // Tokens materialize in their own projection BELOW the Generate
      // (shingleDocs' trick — inlined, the per-element re-split costs
      // 8.6 s alone at sf0.1); persisted because three consumers (sizes
      // + both sides of the pair join) would re-run the explode+distinct
      val sv = graft.operators.CacheScope.persist(
        t(s, d, "documents")
          .select(F.col("source"),
            graft.operators.TextOps.tokens(F.col("text")).as("_toks"))
          .select(F.col("source"),
            F.explode(graft.operators.TextOps
              .shinglesOf(F.col("_toks"), 3)).as("gram"))
          .distinct())
      val sizes = sv.groupBy("source").agg(F.count(F.lit(1)).as("nv"))
      val inter = sv.select(F.col("source").as("sa"), F.col("gram"))
        .join(sv.select(F.col("source").as("sb"), F.col("gram")), "gram")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb").agg(F.count(F.lit(1)).as("n_common"))
      inter
        .join(F.broadcast(sizes.select(F.col("source").as("sa"),
          F.col("nv").as("na"))), "sa")
        .join(F.broadcast(sizes.select(F.col("source").as("sb"),
          F.col("nv").as("nb"))), "sb")
        .withColumn("jaccard_micros",
          F.expr("1000000L * n_common div (na + nb - n_common)"))
        .select("sa", "sb", "n_common", "na", "nb", "jaccard_micros")
        .orderBy("sa", "sb")
    },
    Some(s"""
      WITH sv AS (
        SELECT DISTINCT source, gram
        FROM (SELECT source, unnest(${gramsSql(3)}) AS gram
              FROM (SELECT source, $toksSql AS t FROM documents))),
      sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
                FROM sv GROUP BY 1),
      inter AS (
        SELECT a.source AS sa, b.source AS sb,
               CAST(count(*) AS BIGINT) AS n_common
        FROM sv a JOIN sv b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2)
      SELECT i.sa, i.sb, i.n_common, za.nv AS na, zb.nv AS nb,
             CAST(1000000 * i.n_common
                  // (za.nv + zb.nv - i.n_common) AS BIGINT)
               AS jaccard_micros
      FROM inter i
      JOIN sizes za ON i.sa = za.source
      JOIN sizes zb ON i.sb = zb.source
      ORDER BY sa, sb"""))

  // ---------------------------------------------------------------- E77
  /** Per-source Jensen-Shannon divergence between the source's token
    * distribution and the CORPUS distribution — the datacard number
    * that ranks domains by distributional skew before reweighting
    * (E34's temperature and E35's DSIR decide HOW MUCH to sample; this
    * says which domains are far from the mixture at all). JS is summed
    * portably via the E1/C87 log2-micro discipline: every per-term
    * contribution reduces to log2 of a RATIO OF INTEGERS —
    * p/m = 2aC/(aC+cA), q/m = 2cA/(aC+cA) with a = term count in the
    * source, A = source tokens, c/C the corpus pair — the BOUNDED
    * log2(ratio) is rounded to integer micros per term and THEN
    * multiplied by the exact integer count (libm ulp differences are
    * absorbed by rounding a ≤~40-magnitude value; rounding count·log2
    * would put ~1e11 magnitudes against the micro boundary), so the
    * cross-term sum is exact integer arithmetic and the two closing
    * divisions are integral (÷2A, ÷2C).
    *
    * Scale shape: one tokenize+explode pass (map-side combined to
    * (source, term) counts); the scoring grid is |sources| × |vocab| —
    * built by broadcasting the |sources|-row totals over the corpus
    * term frame, never a corpus-row join — because absent terms
    * (a = 0, q/m = 2) still contribute to the q-side sum. */
  private val jsDivergence = QueryDef(
    "js_divergence",
    (s, d) => {
      val st = t(s, d, "documents")
        .select(F.col("source"),
          F.explode(graft.operators.TextOps.tokens(F.col("text")))
            .as("term"))
        .where(F.length(F.col("term")) > 0)
        .groupBy("source", "term").agg(F.count(F.lit(1)).as("a"))
      val ct = st.groupBy("term").agg(F.sum("a").cast("long").as("c"))
      val stot = st.groupBy("source").agg(F.sum("a").cast("long").as("atot"))
      val ctot = ct.agg(F.sum("c").cast("long").as("ctot"))
      ct.crossJoin(F.broadcast(stot))
        .join(st, Seq("source", "term"), "left").na.fill(0L, Seq("a"))
        .crossJoin(F.broadcast(ctot))
        // a·ctot scales as tokens²: widen through DECIMAL(38,0) (§5
        // wide-product rule — int64 wraps silently on Spark, errors on
        // DuckDB); the log2 ARGUMENT can stay a double ratio
        .withColumn("_den", F.expr(
          "CAST(a AS DECIMAL(38,0)) * ctot + CAST(c AS DECIMAL(38,0)) * atot"))
        // round the BOUNDED log2 ratio to micros FIRST, then multiply
        // by the exact integer count: rounding count·log2·1e6 (up to
        // ~1e11) would let libm's per-engine log2 ulp cross a rounding
        // boundary; the ratio's log2 is ≤ ~40 in magnitude, so its
        // micro rounding has ~1e-9 boundary exposure per term
        .withColumn("_t1", F.expr(
          """CASE WHEN a = 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE
            |CAST(a AS DECIMAL(38,0))
            |* CAST(round(log2(CAST(2 AS DOUBLE) * a * ctot / _den) * 1000000)
            |       AS BIGINT) END""".stripMargin))
        .withColumn("_t2", F.expr(
          """CAST(c AS DECIMAL(38,0))
            |* CAST(round(log2(CAST(2 AS DOUBLE) * c * atot / _den) * 1000000)
            |       AS BIGINT)""".stripMargin))
        .groupBy("source")
        .agg(F.max("atot").as("n_tokens"),
          F.sum(F.expr("CASE WHEN a > 0 THEN 1L ELSE 0L END")).as("n_terms"),
          F.max("ctot").as("_ct"),
          F.sum("_t1").as("_s1"), F.sum("_t2").as("_s2"))
        // the micro-rounded KL sums are only nonnegative up to per-term
        // rounding noise; clamp at 0 so Spark's truncating `div` and
        // DuckDB's flooring `//` agree on a slightly-negative sum (and
        // because JS itself is nonnegative — the noise is not signal)
        .withColumn("_c1", F.expr("greatest(_s1, CAST(0 AS DECIMAL(38,0)))"))
        .withColumn("_c2", F.expr("greatest(_s2, CAST(0 AS DECIMAL(38,0)))"))
        .select(F.col("source"), F.col("n_tokens"), F.col("n_terms"),
          F.expr("_c1 div (2 * n_tokens) + _c2 div (2 * _ct)")
            .as("js_micro"),
          F.expr("CAST(_c1 div (2 * n_tokens) + _c2 div (2 * _ct)" +
            " AS DOUBLE) / 1000000.0").as("js"))
        .orderBy("source")
    },
    Some("""
      WITH tok AS (
        SELECT source,
               unnest(regexp_split_to_array(lower(text), ' +')) AS term
        FROM documents),
      st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS a
             FROM tok WHERE length(term) > 0 GROUP BY 1, 2),
      ct AS (SELECT term, CAST(sum(a) AS BIGINT) AS c FROM st GROUP BY 1),
      stot AS (SELECT source, CAST(sum(a) AS BIGINT) AS atot
               FROM st GROUP BY 1),
      ctot AS (SELECT CAST(sum(c) AS BIGINT) AS ctot FROM ct),
      grid AS (SELECT s.source, s.atot, t.term, t.c, ctot.ctot,
                      coalesce(x.a, 0) AS a
               FROM stot s CROSS JOIN ct t CROSS JOIN ctot
               LEFT JOIN st x ON x.source = s.source AND x.term = t.term),
      terms AS (SELECT source, atot, ctot, a, c,
                       CAST(a AS HUGEINT) * ctot
                         + CAST(c AS HUGEINT) * atot AS den
                FROM grid),
      m AS (SELECT source,
                   CAST(max(atot) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_terms,
                   CAST(max(ctot) AS BIGINT) AS ct2,
                   sum(CASE WHEN a = 0 THEN CAST(0 AS HUGEINT) ELSE
                     CAST(a AS HUGEINT)
                     * CAST(round(log2(CAST(2 AS DOUBLE) * a * ctot / den)
                                  * 1000000) AS BIGINT) END) AS s1,
                   sum(CAST(c AS HUGEINT)
                       * CAST(round(log2(CAST(2 AS DOUBLE) * c * atot / den)
                                    * 1000000) AS BIGINT)) AS s2
            FROM terms GROUP BY 1),
      cl AS (SELECT source, n_tokens, n_terms, ct2,
                    greatest(s1, CAST(0 AS HUGEINT)) AS c1,
                    greatest(s2, CAST(0 AS HUGEINT)) AS c2
             FROM m)
      SELECT source, n_tokens, n_terms,
             CAST(c1 // (2 * n_tokens) + c2 // (2 * ct2) AS BIGINT)
               AS js_micro,
             CAST(c1 // (2 * n_tokens) + c2 // (2 * ct2) AS DOUBLE)
               / 1000000.0 AS js
      FROM cl ORDER BY source"""))

  // ---------------------------------------------------------------- E78
  /** Epoch plan under a fixed token budget — the data-constrained
    * pre-training datacard [Muennighoff et al. 2023: repeating data up
    * to ~4 epochs is near-free; beyond that returns decay]: given
    * budget T = 3× the corpus and E34's temperature-flattened target
    * shares, each domain's repeat factor is epochs = (share-weighted
    * T)/d_i CAPPED at 4; the plan publishes per-domain target tokens,
    * the capped epoch factor (exact integer micros — one floor division
    * per domain), the planned tokens it actually yields, and the cap
    * flag. The single-pass form: freed budget from capped domains is
    * REPORTED as plan shortfall (Σ planned < T), not silently
    * redistributed — rebalancing is a policy decision the datacard
    * surfaces, not one it takes. One corpus aggregate to a
    * domain-sized frame; everything downstream is metadata arithmetic
    * on exact integers. */
  private val epochPlan = QueryDef(
    "epoch_plan",
    (s, d) => {
      val dt = t(s, d, "documents")
        .groupBy("lang")
        .agg(F.sum(F.expr("CAST(ceil(n_chars / 4.0) AS BIGINT)"))
          .cast("long").as("d_tokens"))
      val tot = dt.agg(F.sum("d_tokens").cast("long").as("total"))
      val m = dt.crossJoin(F.broadcast(tot))
        .withColumn("_flat", F.expr(
          "CAST(floor(sqrt(CAST(d_tokens AS DOUBLE) / total) * 1e6)" +
            " AS BIGINT)"))
      val z = m.agg(F.sum("_flat").cast("long").as("z"))
      m.crossJoin(F.broadcast(z))
        .withColumn("_target", F.expr("3 * total * _flat div z"))
        .withColumn("_em",
          F.expr("least((_target * 1000000) div d_tokens, 4000000L)"))
        .select(F.col("lang"), F.col("d_tokens"),
          F.col("_target").as("target_tokens"),
          F.expr("CAST(_em AS DOUBLE) / 1000000.0").as("epochs"),
          F.expr("CASE WHEN (_target * 1000000) div d_tokens > 4000000" +
            " THEN 1L ELSE 0L END").as("capped"),
          F.expr("d_tokens * _em div 1000000").as("planned_tokens"))
        .orderBy("lang")
    },
    Some("""
      WITH dt AS (
        SELECT lang,
               CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
                 AS d_tokens
        FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(d_tokens) AS BIGINT) AS total FROM dt),
      m AS (SELECT lang, d_tokens, total,
                   CAST(floor(sqrt(CAST(d_tokens AS DOUBLE) / total) * 1e6)
                        AS BIGINT) AS flat
            FROM dt, tot),
      z AS (SELECT CAST(sum(flat) AS BIGINT) AS z FROM m),
      p AS (SELECT lang, d_tokens,
                   CAST(3 * total * flat // z AS BIGINT) AS target_tokens,
                   CAST(least((3 * total * flat // z) * 1000000 // d_tokens,
                              4000000) AS BIGINT) AS em,
                   CASE WHEN (3 * total * flat // z) * 1000000 // d_tokens
                             > 4000000 THEN 1 ELSE 0 END AS capped
            FROM m, z)
      SELECT lang, d_tokens, target_tokens,
             CAST(em AS DOUBLE) / 1000000.0 AS epochs,
             CAST(capped AS BIGINT) AS capped,
             CAST(d_tokens * em // 1000000 AS BIGINT) AS planned_tokens
      FROM p ORDER BY lang"""))

  def all: Seq[QueryDef] = Seq(
    dedupSubstring, dedupSpanLadder, semanticDedup, surprisalBigram,
    domainTemperature,
    dsirWeights, bpePairs, heavyHittersCms, sketchSetOps, ccnetBuckets,
    vocabOverlap, jsDivergence, epochPlan)
}
