package graft.queries

import graft.operators.{Curation, Hashing}
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-4 inventory: corpus-curation operators (SURVEY §2 E12–E16) —
  * quality-rule gates, repetition metrics, benchmark contamination,
  * token-budget packing and domain-mixture rebalancing. Oracle SQL is
  * generated from the same thresholds as the Spark implementation so
  * the two can never drift. */
object CurationQueries {

  private val toksSql = "regexp_split_to_array(lower(text), ' +')"

  /** DuckDB n-gram list over a token-array column `t`. */
  private def gramsSql(n: Int): String = {
    val parts = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, greatest(len(t)-${n - 1}, 0)), i -> $parts)"
  }

  // ---------------------------------------------------------------- E12
  /** Shared with the streaming twin `stream_quality` (G5) — the same
    * oracle checks the batch plan and its incremental execution. */
  private[queries] val qualityRulesSql: String = {
    val stop = graft.operators.TextOps.stopwords.map(m => s"x = '$m'").mkString(" OR ")
    s"""SELECT doc_id, n_words, mean_word_len, alpha_ratio, n_stop,
         |       rule_words, rule_mean_len, rule_alpha, rule_stop,
         |       rule_words * rule_mean_len * rule_alpha * rule_stop AS keep
         |FROM (
         |  SELECT doc_id, n_words, mean_word_len, alpha_ratio, n_stop,
         |         CAST(CASE WHEN n_words >= 20 AND n_words <= 1000 THEN 1 ELSE 0 END AS BIGINT) AS rule_words,
         |         CAST(CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 THEN 1 ELSE 0 END AS BIGINT) AS rule_mean_len,
         |         CAST(CASE WHEN alpha_ratio >= 0.7 THEN 1 ELSE 0 END AS BIGINT) AS rule_alpha,
         |         CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS rule_stop
         |  FROM (
         |    SELECT doc_id,
         |           len(t) AS n_words,
         |           round(list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t), 6) AS mean_word_len,
         |           round(len(regexp_extract_all(text, '[a-z]')) * 1.0 / length(text), 6) AS alpha_ratio,
         |           len(list_filter(t, x -> $stop)) AS n_stop
         |    FROM (SELECT doc_id, text, $toksSql AS t FROM documents)))
         |ORDER BY doc_id""".stripMargin
  }

  private val qualityRules = QueryDef(
    "quality_rules",
    (s, d) => Curation.qualityRules(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some(qualityRulesSql))

  // ---------------------------------------------------------------- E13
  private val textRepetition = QueryDef(
    "text_repetition",
    (s, d) => Curation.repetitionStats(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some(s"""
      WITH d AS (
        SELECT doc_id, t, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct
        FROM (SELECT doc_id, $toksSql AS t FROM documents)),
      g AS (
        SELECT doc_id, unnest(${gramsSql(2)}) AS gram FROM d),
      gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      ga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
                    max(c) AS max_gram_freq
             FROM gc GROUP BY 1)
      SELECT doc_id, n_tokens, dup_token_frac, n_grams, max_gram_freq,
             top_gram_frac,
             CAST(CASE WHEN dup_token_frac <= 0.55 AND top_gram_frac <= 0.10
                  THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM (
        SELECT d.doc_id, d.n_tokens,
               round(1.0 - n_distinct * 1.0 / n_tokens, 6) AS dup_token_frac,
               coalesce(n_grams, 0) AS n_grams,
               coalesce(max_gram_freq, 0) AS max_gram_freq,
               CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
                    ELSE round(max_gram_freq * 1.0 / n_grams, 6) END AS top_gram_frac
        FROM d LEFT JOIN ga ON d.doc_id = ga.doc_id)
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E14
  /** Benchmark = the `src0` slice (stands in for an eval suite);
    * corpus = everything else. */
  private val contamination = QueryDef(
    "contamination",
    (s, d) => {
      val docs = t(s, d, "documents")
      Curation.contamination(
        docs.where(F.col("source") =!= "src0"),
        docs.where(F.col("source") === "src0"),
        "doc_id", "text", n = 3)
        .orderBy("doc_id")
    },
    Some(contaminationOracleSql))

  /** E14 oracle SQL — shared with the G21 streaming twin. */
  private[queries] def contaminationOracleSql: String = s"""
      WITH bg AS (
        SELECT DISTINCT unnest(${gramsSql(3)}) AS shingle
        FROM (SELECT $toksSql AS t FROM documents WHERE source = 'src0')),
      cg AS (
        SELECT DISTINCT doc_id, shingle FROM (
          SELECT doc_id, unnest(${gramsSql(3)}) AS shingle
          FROM (SELECT doc_id, $toksSql AS t
                FROM documents WHERE source <> 'src0')))
      SELECT doc_id, count(*) AS n_grams,
             count(bg.shingle) AS n_hit,
             round(count(bg.shingle) * 1.0 / count(*), 6) AS contam_frac,
             CAST(CASE WHEN count(bg.shingle) * 1.0 / count(*) >= 0.5
                  THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      FROM cg LEFT JOIN bg ON cg.shingle = bg.shingle
      GROUP BY doc_id ORDER BY doc_id"""

  // ---------------------------------------------------------------- E15
  private val packBins = QueryDef(
    "pack_bins",
    (s, d) => Curation.packBins(
      t(s, d, "documents").select(
        F.col("doc_id"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").as("est_tokens")),
      "doc_id", "est_tokens", buckets = 8, budget = 500L)
      .orderBy("bucket", "bin"),
    Some(s"""
      WITH d AS (
        SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS tok,
               ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS bucket
        FROM documents),
      c AS (
        SELECT doc_id, tok, bucket,
               CAST(sum(tok) OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) AS cum
        FROM d)
      SELECT bucket, bin, count(*) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS bin_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM (SELECT bucket, (cum - 1) // 500 AS bin, tok, doc_id FROM c)
      GROUP BY 1, 2 ORDER BY bucket, bin"""))

  // ---------------------------------------------------------------- E16
  private val mixTargets: Seq[(String, Double)] =
    Seq("en" -> 0.40, "fr" -> 0.15, "de" -> 0.15, "es" -> 0.15, "zh" -> 0.15)

  private val domainMix = QueryDef(
    "domain_mix",
    (s, d) => Curation.domainMix(
      t(s, d, "documents").select(
        F.col("doc_id"), F.col("lang"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").as("est_tokens")),
      "doc_id", "lang", "est_tokens", mixTargets.toMap)
      .orderBy("lang"),
    Some {
      val cases = mixTargets.map { case (l, v) => s"WHEN '$l' THEN $v" }.mkString(" ")
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST(ceil(n_chars / 4.0) AS BIGINT) AS tok
         |  FROM documents),
         |dt AS (SELECT lang, CAST(sum(tok) AS BIGINT) AS domain_tokens,
         |              count(*) AS n_total
         |       FROM d GROUP BY 1),
         |tt AS (SELECT CAST(sum(domain_tokens) AS BIGINT) AS total FROM dt),
         |r AS (SELECT lang, domain_tokens, n_total,
         |             round(least(1.0, (CASE lang $cases ELSE 0.0 END) * total
         |                   / domain_tokens), 6) AS rate
         |      FROM dt, tt),
         |k AS (SELECT d.lang, count(*) AS n_kept,
         |             CAST(sum(tok) AS BIGINT) AS kept_tokens
         |      FROM d JOIN r USING (lang)
         |      WHERE ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")} % 1000000
         |            < CAST(floor(rate * 1e6) AS BIGINT)
         |      GROUP BY 1)
         |SELECT r.lang, domain_tokens, n_total, rate,
         |       coalesce(n_kept, 0) AS n_kept,
         |       coalesce(kept_tokens, 0) AS kept_tokens
         |FROM r LEFT JOIN k ON r.lang = k.lang
         |ORDER BY r.lang""".stripMargin
    })

  // ---------------------------------------------------------------- E17
  private val keywordTfidf = QueryDef(
    "keyword_tfidf",
    // Keywords joined on the unit-separator control char U+001F (the
    // tokenizer strips whitespace/control chars, so the delimiter cannot
    // collide) — the driver's pandas comparison cannot sort/hash array
    // cells (r4 verdict #1).
    (s, d) => graft.operators.TextOps.keywordsTfIdf(
      t(s, d, "documents"), "doc_id", "text", k = 5)
      .select(F.col("doc_id"),
        F.array_join(F.col("keywords"), "\u001f").as("keywords_str"),
        F.col("top_score"))
      .orderBy("doc_id"),
    Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest($toksSql) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, term,
               round(tf * ((n_docs - df + 0.5) / (df + 0.5)), 6) AS score
        FROM tf JOIN df USING (term), n),
      ranked AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term DESC) AS rn
        FROM scored)
      SELECT doc_id,
             array_to_string(list(term ORDER BY rn) FILTER (WHERE rn <= 5),
                             chr(31)) AS keywords_str,
             max(score) AS top_score
      FROM ranked GROUP BY doc_id ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E57
  /** Term burstiness [Church & Gale 1995]: variance-to-mean ratio of
    * per-document term counts over ALL docs (zeros included — the
    * N-docs denominator, not just docs containing the term). VMR ≈ 1
    * marks Poisson "function-word" behavior; VMR ≫ 1 marks topical /
    * keyword-stuffed terms — the signal quality filters use to separate
    * content from boilerplate. Exact integer pipeline: per-term
    * (df, S=Σtf, SS=Σtf²) from one exploded map-side-combined
    * aggregate, N from a 1-row broadcast, then
    * VMR_micros = (N·SS − S²)·10⁶ div (S·(N−1)) — the textbook
    * formula cross-multiplied so no division happens early; gated on
    * S ≥ 50 so the ratio is meaningful. Output is vocabulary-sized. */
  private val termBurstiness = QueryDef(
    "term_burstiness",
    (s, d) => {
      val tf = t(s, d, "documents")
        .select(F.col("doc_id"),
          F.explode(graft.operators.TextOps.tokens(F.col("text")))
            .as("term"))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("tf"))
      val n = t(s, d, "documents").agg(F.count(F.lit(1)).as("n_docs"))
      tf.groupBy("term").agg(
        F.count(F.lit(1)).as("df"),
        F.sum("tf").as("s"),
        F.sum(F.expr("tf * tf")).as("ss"))
        .where(F.col("s") >= 50)
        .crossJoin(F.broadcast(n))
        .withColumn("vmr_micros", F.expr(
          "CAST((CAST(n_docs AS DECIMAL(38,0)) * ss - " +
            "CAST(s AS DECIMAL(38,0)) * s) * 1000000 div " +
            "(CAST(s AS DECIMAL(38,0)) * (n_docs - 1)) AS BIGINT)"))
        .select("term", "df", "s", "ss", "n_docs", "vmr_micros")
        .orderBy("term")
    },
    Some(s"""
      WITH tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
        GROUP BY 1, 2),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      g AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(tf) AS BIGINT) AS s,
                   CAST(sum(tf * tf) AS BIGINT) AS ss
            FROM tf GROUP BY 1)
      SELECT term, df, s, ss, n_docs,
             CAST((CAST(n_docs AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
                  * 1000000 // (CAST(s AS HUGEINT) * (n_docs - 1))
               AS BIGINT) AS vmr_micros
      FROM g, n WHERE s >= 50 ORDER BY term"""))

  // ---------------------------------------------------------------- E63
  /** Decontamination n-gram-size sweep: the E14 exact screen run at
    * n ∈ {2, 3, 5} side by side — corpus-level summary per n (docs
    * flagged, hit-gram ppm), the policy table behind "which n does our
    * decontamination contract use" (small n over-flags common phrases,
    * large n misses reworded leakage). Three bounded passes unioned —
    * each is the production single-n plan, not a combined re-scan. */
  private val contaminationSweep = QueryDef(
    "contamination_sweep",
    (s, d) => {
      val docs = t(s, d, "documents")
      val corpus = docs.where(F.col("source") =!= "src0")
      val bench = docs.where(F.col("source") === "src0")
      Seq(2, 3, 5).map { n =>
        graft.operators.Curation
          .contamination(corpus, bench, "doc_id", "text", n)
          .agg(F.count(F.lit(1)).as("n_docs"),
            F.sum("n_grams").as("total_grams"),
            F.sum("n_hit").as("hit_grams"),
            F.sum("contaminated").as("n_flagged"))
          .withColumn("n", F.lit(n.toLong))
      }.reduce(_ unionByName _)
        .select(F.col("n"), F.col("n_docs"), F.col("total_grams"),
          F.col("hit_grams"), F.col("n_flagged"),
          F.expr("CAST(CAST(hit_grams AS DECIMAL(38,0)) * 1000000 div " +
            "total_grams AS BIGINT)").as("hit_ppm"))
        .orderBy("n")
    },
    Some {
      def one(n: Int) = s"""
        SELECT CAST($n AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_grams) AS BIGINT) AS total_grams,
               CAST(sum(n_hit) AS BIGINT) AS hit_grams,
               CAST(sum(flg) AS BIGINT) AS n_flagged,
               CAST(CAST(sum(n_hit) AS HUGEINT) * 1000000
                    // sum(n_grams) AS BIGINT) AS hit_ppm
        FROM (
          SELECT doc_id, count(*) AS n_grams, count(bg.shingle) AS n_hit,
                 CASE WHEN count(bg.shingle) * 1.0 / count(*) >= 0.5
                      THEN 1 ELSE 0 END AS flg
          FROM (
            SELECT DISTINCT doc_id, shingle FROM (
              SELECT doc_id, unnest(${gramsSql(n)}) AS shingle
              FROM (SELECT doc_id, $toksSql AS t
                    FROM documents WHERE source <> 'src0'))) cg
          LEFT JOIN (
            SELECT DISTINCT unnest(${gramsSql(n)}) AS shingle
            FROM (SELECT $toksSql AS t
                  FROM documents WHERE source = 'src0')) bg
            ON cg.shingle = bg.shingle
          GROUP BY doc_id)"""
      Seq(2, 3, 5).map(one).mkString("", "\nUNION ALL\n",
        "\nORDER BY n")
    })

  // ---------------------------------------------------------------- E64
  /** Quality-score drift between crawl cohorts (doc_id parity — this
    * crawl vs last): the E2 quality score binned into 10 FIXED bins
    * (both engines bin the bit-identical 6dp-rounded double, so the
    * boundary behavior matches by construction), per-bin shares and
    * C45-discipline PSI terms — the "did our quality distribution
    * move" monitor a curation pipeline alarms on. */
  private val qualityDrift = QueryDef(
    "quality_drift",
    (s, d) => {
      val cols = graft.operators.TextOps.qualityColumns(F.col("text"))
      val quality = cols.find(_._1 == "quality").get._2
      val q = t(s, d, "documents")
        .select(F.expr("doc_id % 2 = 0").as("is_a"), quality.as("q"))
        .select(F.col("is_a"),
          F.expr("CAST(least(CAST(floor(q * 10) AS BIGINT), 9L) " +
            "AS BIGINT)").as("bin"))
      val counts = q.groupBy("bin").agg(
        F.sum(F.when(F.col("is_a"), 1L).otherwise(0L)).as("n_a"),
        F.sum(F.when(!F.col("is_a"), 1L).otherwise(0L)).as("n_b"))
      val totals = counts.agg(F.sum("n_a").cast("long").as("ta"),
        F.sum("n_b").cast("long").as("tb"))
      counts.crossJoin(F.broadcast(totals))
        .select(F.col("bin"), F.col("n_a"), F.col("n_b"),
          F.expr("n_a * 1000000L div ta").as("share_a_micro"),
          F.expr("n_b * 1000000L div tb").as("share_b_micro"),
          F.when(F.col("n_a") > 0 && F.col("n_b") > 0,
            F.round((F.col("n_a").cast("double") / F.col("ta") -
                F.col("n_b").cast("double") / F.col("tb")) *
              F.log(F.col("n_a").cast("double") * F.col("tb") /
                (F.col("n_b").cast("double") * F.col("ta"))), 6))
            .as("psi_term"))
        .orderBy("bin")
    },
    Some {
      val stop = graft.operators.TextOps.stopwords
        .map(m => s"x = '$m'").mkString(" OR ")
      s"""
      WITH qd AS (
        SELECT doc_id % 2 = 0 AS is_a,
               round((n_stop * 1.0 / n_tokens) * 0.5
                     + (n_punct * 1.0 / n_chars_len) * 0.3
                     + least(n_tokens / 100.0, 1.0) * 0.2, 6) AS q
        FROM (
          SELECT doc_id,
                 len($toksSql) AS n_tokens,
                 len(list_filter($toksSql, x -> $stop)) AS n_stop,
                 CAST(len(regexp_extract_all(text, '[.,!?;]')) AS BIGINT)
                   AS n_punct,
                 CAST(length(text) AS BIGINT) AS n_chars_len
          FROM documents)),
      b AS (
        SELECT is_a,
               CAST(least(CAST(floor(q * 10) AS BIGINT), 9) AS BIGINT)
                 AS bin
        FROM qd),
      c AS (SELECT bin,
                   CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_a,
                   CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_b
            FROM b GROUP BY bin),
      tt AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                    CAST(sum(n_b) AS BIGINT) AS tb FROM c)
      SELECT bin, n_a, n_b,
             CAST(n_a * 1000000 // ta AS BIGINT) AS share_a_micro,
             CAST(n_b * 1000000 // tb AS BIGINT) AS share_b_micro,
             CASE WHEN n_a > 0 AND n_b > 0 THEN
               round((CAST(n_a AS DOUBLE) / ta -
                      CAST(n_b AS DOUBLE) / tb) *
                     ln(CAST(n_a AS DOUBLE) * tb /
                        (CAST(n_b AS DOUBLE) * ta)), 6)
             END AS psi_term
      FROM c, tt ORDER BY bin"""
    })

  // ---------------------------------------------------------------- E79
  /** Heaps-law vocabulary growth curve (r13) — V(N) at ten corpus-prefix
    * checkpoints, the dedup/diversity health read E11's single global
    * TTR can't give (a template-spammed corpus flattens early; a
    * healthy crawl keeps V(N) ≈ K·N^β growing): docs ranked by doc_id
    * ([[graft.operators.DistRank.globalRowNumber]] — the ingest order a
    * production corpus has anyway), decile buckets via the exact
    * ntile arithmetic ([[graft.operators.DistRank.ntileExpr]]), per
    * decile the CUMULATIVE docs, token volume, vocabulary (terms whose
    * FIRST occurrence rank falls at or before the checkpoint — one
    * map-side-combined min per term, never a distinct per prefix) and
    * exact-ppm type-token ratio.
    *
    * Scale shape: one rank pass, one token explode, one min-per-term
    * aggregate — all corpus-linear; buckets/cumulation are 10-row
    * metadata (broadcast non-equi join). Publishes exact integers
    * only. */
  private val vocabGrowth = QueryDef(
    "vocab_growth",
    (s, d) => {
      import graft.operators.DistRank
      val docs = t(s, d, "documents")
      val rk = DistRank.globalRowNumber(
        docs.select("doc_id"), "rn", F.col("doc_id").asc)
      val tot = rk.agg(F.count(F.lit(1)).as("dd"))
      val bk = rk.crossJoin(F.broadcast(tot))
        .select(F.col("doc_id"), F.col("rn"),
          DistRank.ntileExpr("rn", "dd", 10).as("bucket"))
      val tok = docs.select(F.col("doc_id"),
        F.explode(graft.operators.TextOps.tokens(F.col("text"))).as("term"))
      val dtok = tok.groupBy("doc_id").agg(F.count(F.lit(1)).as("nt"))
        .join(bk.select("doc_id", "bucket"), "doc_id")
        .groupBy("bucket").agg(F.sum("nt").as("n_toks"))
      val ddocs = bk.groupBy("bucket").agg(F.count(F.lit(1)).as("n_docs"))
      val tvocab = tok.join(bk.select("doc_id", "rn"), "doc_id")
        .groupBy("term").agg(F.min("rn").as("frn"))
        .crossJoin(F.broadcast(tot))
        .select(DistRank.ntileExpr("frn", "dd", 10).as("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).as("n_new"))
      val perBucket = ddocs
        .join(dtok, Seq("bucket"), "full")
        .join(tvocab, Seq("bucket"), "full")
        .na.fill(0L, Seq("n_docs", "n_toks", "n_new"))
      s.range(1, 11).select(F.col("id").as("decile"))
        .join(F.broadcast(perBucket), F.col("bucket") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("n_docs").as("n_docs_cum"),
          F.sum("n_toks").as("n_tokens_cum"),
          F.sum("n_new").as("vocab_cum"))
        .select(F.col("decile"), F.col("n_docs_cum"),
          F.col("n_tokens_cum"), F.col("vocab_cum"),
          F.expr("""CASE WHEN n_tokens_cum = 0 THEN 0L
            |ELSE vocab_cum * 1000000L div n_tokens_cum END"""
            .stripMargin).as("ttr_ppm"))
        .orderBy("decile")
    },
    Some {
      // exact ntile(10) arithmetic over (rank rn, total dd) — the SQL
      // mirror of DistRank.ntileExpr with `div` → `//`
      def ntileSql(rn: String): String =
        s"""CASE WHEN $rn <= (dd % 10) * (dd // 10 + 1)
           |THEN ($rn - 1) // (dd // 10 + 1) + 1
           |ELSE (dd % 10) +
           |  ($rn - (dd % 10) * (dd // 10 + 1) - 1) // (dd // 10) + 1
           |END""".stripMargin
      s"""WITH rk AS (SELECT doc_id,
           |             row_number() OVER (ORDER BY doc_id) AS rn
           |           FROM documents),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS dd FROM documents),
         |bk AS (SELECT doc_id, rn, ${ntileSql("rn")} AS bucket
         |       FROM rk, tot),
         |tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |dtok AS (SELECT b.bucket, CAST(count(*) AS BIGINT) AS n_toks
         |         FROM tok JOIN bk b USING (doc_id) GROUP BY 1),
         |ddocs AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs
         |          FROM bk GROUP BY 1),
         |tfirst AS (SELECT term, min(rn) AS frn
         |           FROM tok JOIN rk USING (doc_id) GROUP BY 1),
         |tvocab AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new
         |           FROM (SELECT ${ntileSql("frn")} AS bucket
         |                 FROM tfirst, tot) GROUP BY 1),
         |pb AS (SELECT coalesce(d.bucket, t2.bucket, v.bucket) AS bucket,
         |              coalesce(n_docs, 0) AS n_docs,
         |              coalesce(n_toks, 0) AS n_toks,
         |              coalesce(n_new, 0) AS n_new
         |       FROM ddocs d
         |       FULL JOIN dtok t2 ON d.bucket = t2.bucket
         |       FULL JOIN tvocab v ON coalesce(d.bucket, t2.bucket)
         |                             = v.bucket)
         |SELECT CAST(g.decile AS BIGINT) AS decile,
         |       CAST(sum(n_docs) AS BIGINT) AS n_docs_cum,
         |       CAST(sum(n_toks) AS BIGINT) AS n_tokens_cum,
         |       CAST(sum(n_new) AS BIGINT) AS vocab_cum,
         |       CASE WHEN sum(n_toks) = 0 THEN 0
         |            ELSE CAST(sum(n_new) * 1000000 // sum(n_toks)
         |                      AS BIGINT) END AS ttr_ppm
         |FROM generate_series(1, 10) AS g(decile)
         |JOIN pb ON pb.bucket <= g.decile
         |GROUP BY 1 ORDER BY 1""".stripMargin
    })

  def all: Seq[QueryDef] = Seq(
    qualityRules, textRepetition, contamination, packBins, domainMix,
    keywordTfidf, termBurstiness, contaminationSweep, qualityDrift,
    vocabGrowth)
}
