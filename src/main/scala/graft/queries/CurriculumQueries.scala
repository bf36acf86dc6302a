package graft.queries

import graft.operators.{DistRank, TextOps}
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-42 inventory (r7): training-run shaping — the list-balance
  * audit that calibrates IVF nprobe, curriculum bucketing by quality
  * rank (the first DistRank consumer that ranks the CORPUS, not a
  * dimension), and sentence-shape stats for readability-style gating.
  */
object CurriculumQueries {

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def cosSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  // ---------------------------------------------------------------- D40
  /** IVF list-balance audit: after assigning the corpus to its nearest
    * centroid, report each list's size, corpus share, and imbalance vs
    * the ideal even split (n·k/total in ppm — 1 000 000 = perfectly
    * balanced). Skewed lists are why a fixed nprobe under-recalls: the
    * number this query publishes is what decides between re-training
    * with more centroids and raising nprobe. One broadcast assign +
    * one k-row aggregate. */
  private val ivfBalance = QueryDef(
    "ivf_balance",
    (s, d) => {
      val asg = Staged.ivfAssignments(s, d)
      val per = asg.groupBy(
        F.col("centroid_label").cast("long").as("centroid_label"))
        .agg(F.count(F.lit(1)).as("n_vectors"))
      val tot = per.agg(F.sum("n_vectors").as("t"),
        F.count(F.lit(1)).as("k"))
      per.crossJoin(F.broadcast(tot))
        .select(F.col("centroid_label"), F.col("n_vectors"),
          F.expr("n_vectors * 1000000L div t").as("share_ppm"),
          F.expr("CAST(CAST(n_vectors AS DECIMAL(38,0)) * k * 1000000 div " +
            "t AS BIGINT)").as("imbalance_ppm"))
        .orderBy("centroid_label")
    },
    Some(s"""
      WITH cent AS (
        SELECT label AS ckey, i, avg(CAST(embedding[i] AS DOUBLE)) AS cv
        FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY 1, 2),
      cvec AS (
        SELECT ckey, list_transform(list(cv ORDER BY i),
                 x -> CAST(x AS REAL)) AS centroid
        FROM cent GROUP BY ckey),
      asg AS (
        SELECT vec_id, ckey AS centroid_label FROM (
          SELECT vec_id, ckey,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, ckey) AS rn
          FROM (SELECT e.vec_id, ckey,
                       ${cosSql("e.embedding", "centroid")} AS cos
                FROM embeddings e, cvec)) WHERE rn = 1),
      per AS (
        SELECT CAST(centroid_label AS BIGINT) AS centroid_label,
               CAST(count(*) AS BIGINT) AS n_vectors
        FROM asg GROUP BY 1),
      tt AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS t,
                    CAST(count(*) AS BIGINT) AS k FROM per)
      SELECT centroid_label, n_vectors,
             CAST(n_vectors * 1000000 // t AS BIGINT) AS share_ppm,
             CAST(CAST(n_vectors AS HUGEINT) * k * 1000000 // t AS BIGINT)
               AS imbalance_ppm
      FROM per, tt ORDER BY centroid_label"""))

  // ---------------------------------------------------------------- E69
  /** Curriculum bucketing: rank the WHOLE corpus by the E2 quality
    * score (tie-broken by doc id) and cut into 10 curriculum deciles —
    * the easy→hard ordering a staged training run consumes. The rank is
    * the DistRank distributed exact rank over the corpus (this is the
    * operator's first corpus-sized consumer — rfm/gini rank
    * dimensions); the decile is the exact ntile arithmetic, so the
    * oracle is plain ntile(10). Per decile: doc count, quality range,
    * token volume. */
  private val curriculumBuckets = QueryDef(
    "curriculum_buckets",
    (s, d) => {
      val cols = TextOps.qualityColumns(F.col("text")).toMap
      val scored = t(s, d, "documents")
        .select(F.col("doc_id"), cols("quality").as("q"),
          cols("n_tokens").as("n_toks"))
      val nC = scored.agg(F.count(F.lit(1)).as("nc"))
      DistRank.globalRowNumber(
        scored.crossJoin(F.broadcast(nC)),
        "_rn", F.col("q"), F.col("doc_id"))
        .withColumn("bucket",
          DistRank.ntileExpr("_rn", "nc", 10).cast("long"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.min("q").as("q_lo"), F.max("q").as("q_hi"),
          F.sum("n_toks").as("sum_tokens"))
        .orderBy("bucket")
    },
    Some {
      val stop = TextOps.stopwords.map(m => s"x = '$m'").mkString(" OR ")
      val toksSql = "regexp_split_to_array(lower(text), ' +')"
      s"""
      WITH f AS (
        SELECT doc_id,
               CAST(len($toksSql) AS BIGINT) AS n_toks,
               len(list_filter($toksSql, x -> $stop)) AS n_stop,
               CAST(len(regexp_extract_all(text, '[.,!?;]')) AS BIGINT)
                 AS n_punct,
               CAST(length(text) AS BIGINT) AS n_chars_len
        FROM documents),
      q AS (
        SELECT doc_id, n_toks,
               round((n_stop * 1.0 / n_toks) * 0.5
                     + (n_punct * 1.0 / n_chars_len) * 0.3
                     + least(n_toks / 100.0, 1.0) * 0.2, 6) AS q
        FROM f),
      b AS (
        SELECT doc_id, q, n_toks,
               CAST(ntile(10) OVER (ORDER BY q, doc_id) AS BIGINT)
                 AS bucket
        FROM q)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             min(q) AS q_lo, max(q) AS q_hi,
             CAST(sum(n_toks) AS BIGINT) AS sum_tokens
      FROM b GROUP BY bucket ORDER BY bucket"""
    })

  // ---------------------------------------------------------------- E70
  /** Sentence-shape stats per language: sentence-terminator runs
    * ([.!?]+, counted with regexp_count — identical non-overlapping
    * match semantics on both engines), sentences-per-doc and
    * chars-per-sentence in exact floor micros. The sentence-length
    * signal readability gates (E61) build on, here corpus-aggregated.
    * One narrow regexp map + one lang-bounded aggregate. */
  private val sentenceStats = QueryDef(
    "sentence_stats",
    (s, d) => t(s, d, "documents")
      .select(F.col("lang"),
        F.expr("CAST(regexp_count(text, '[.!?]+') AS BIGINT)").as("ns"),
        F.col("n_chars").cast("long").as("nch"))
      .groupBy("lang")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum("ns").as("n_sentences"),
        F.sum("nch").as("n_chars"))
      .select(F.col("lang"), F.col("n_docs"), F.col("n_sentences"),
        F.expr("n_sentences * 1000000L div n_docs")
          .as("sent_per_doc_micro"),
        F.expr("CASE WHEN n_sentences > 0 " +
          "THEN n_chars * 1000000L div n_sentences END")
          .as("chars_per_sent_micro"))
      .orderBy("lang"),
    Some("""
      WITH e AS (
        SELECT lang,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
                 AS ns,
               CAST(n_chars AS BIGINT) AS nch
        FROM documents),
      g AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ns) AS BIGINT) AS n_sentences,
               CAST(sum(nch) AS BIGINT) AS n_chars
        FROM e GROUP BY lang)
      SELECT lang, n_docs, n_sentences,
             CAST(n_sentences * 1000000 // n_docs AS BIGINT)
               AS sent_per_doc_micro,
             CAST(CASE WHEN n_sentences > 0
                  THEN n_chars * 1000000 // n_sentences END AS BIGINT)
               AS chars_per_sent_micro
      FROM g ORDER BY lang"""))

  val all: Seq[QueryDef] =
    Seq(ivfBalance, curriculumBuckets, sentenceStats)
}
