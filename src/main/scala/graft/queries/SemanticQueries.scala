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

  def all: Seq[QueryDef] = Seq(
    dedupSubstring, semanticDedup, surprisalBigram, domainTemperature,
    dsirWeights, bpePairs)
}
