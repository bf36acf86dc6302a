package graft.queries

import graft.operators.{Curation, Dedup, Hashing, Privacy, Sketch, TextOps}
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-5 inventory: training-data prep hardening (SURVEY §2 E18–E23) —
  * PII scrubbing, sliding-window chunking, KMV cardinality sketching,
  * incremental (batch-vs-store) dedup, unigram-surprisal quality
  * scoring and train/holdout leakage auditing. Oracle SQL shares the
  * pattern/threshold constants with the Spark side so the two cannot
  * drift. */
object PrepQueries {

  private val toksSql = "regexp_split_to_array(lower(text), ' +')"
  private val fpSql =
    s"md5(array_to_string(list_sort(list_distinct($toksSql)), ' '))"

  // ---------------------------------------------------------------- E18
  /** The synthetic corpus carries no PII, so the query plants
    * deterministic pseudo-PII derived from real columns (doc_id/source)
    * on BOTH sides — the regex engines are exercised on text that
    * varies per document, and the redacted output hash-checks every
    * replacement. Shared with the streaming twin `stream_pii` (G6). */
  private[queries] def augText: org.apache.spark.sql.Column = F.concat(
    F.col("text"),
    F.when(F.pmod(F.col("doc_id"), F.lit(3)) > 0,
      F.concat(F.lit(" "), F.col("source"), F.lit("@example.com")))
      .otherwise(F.lit("")),
    F.when(F.pmod(F.col("doc_id"), F.lit(4)) > 0,
      F.concat(F.lit(" 10.0."), F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".7"))).otherwise(F.lit("")),
    F.when(F.pmod(F.col("doc_id"), F.lit(5)) > 0,
      F.concat(F.lit(" 555-"),
        (F.pmod(F.col("doc_id"), F.lit(9000)) + 1000).cast("string"),
        F.lit("-1234"))).otherwise(F.lit("")))

  private[queries] val piiRedactSql: String = {
    val pats = Privacy.defaultPatterns
    val augSql =
      """text
        | || CASE WHEN doc_id % 3 > 0 THEN ' ' || source || '@example.com' ELSE '' END
        | || CASE WHEN doc_id % 4 > 0 THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
        | || CASE WHEN doc_id % 5 > 0 THEN ' 555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || '-1234' ELSE '' END"""
        .stripMargin.replace("\n", "")
    val redacted = pats.foldLeft("text") { case (c, (_, pat, repl)) =>
      s"regexp_replace($c, '$pat', '$repl', 'g')"
    }
    val counts = pats.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(", ")
    val totalSql = pats.map { case (name, _, _) => s"n_$name" }.mkString(" + ")
    s"""WITH a AS (SELECT doc_id, $augSql AS text FROM documents),
       |r AS (SELECT doc_id, $redacted AS clean_text, $counts FROM a)
       |SELECT doc_id, clean_text,
       |       ${pats.map { case (n, _, _) => s"n_$n" }.mkString(", ")},
       |       CAST($totalSql AS BIGINT) AS n_pii
       |FROM r ORDER BY doc_id""".stripMargin
  }

  private val piiRedact = QueryDef(
    "pii_redact",
    (s, d) => Privacy.redactPii(
      t(s, d, "documents").select(F.col("doc_id"), augText.as("text")),
      "doc_id", "text")
      .orderBy("doc_id"),
    Some(piiRedactSql))

  // ---------------------------------------------------------------- E19
  private val chunkDocs = QueryDef(
    "chunk_docs",
    (s, d) => Curation.chunkDocs(t(s, d, "documents"), "doc_id", "text",
      chunkSize = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx"),
    Some(s"""
      WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
      s AS (SELECT doc_id, t, unnest(generate_series(1, len(t), 48)) AS st FROM d)
      SELECT doc_id, CAST((st - 1) // 48 AS BIGINT) AS chunk_idx,
             CAST(len(ch) AS BIGINT) AS n_tokens,
             array_to_string(ch, ' ') AS chunk_text
      FROM (SELECT doc_id, st, list_slice(t, st, st + 63) AS ch FROM s)
      ORDER BY doc_id, chunk_idx"""))

  // ---------------------------------------------------------------- E20
  private val kmvK = 64

  private val approxDistinctKmv = QueryDef(
    "approx_distinct_kmv",
    (s, d) => Sketch.kmvDistinct(
      t(s, d, "documents").select(
        F.col("source"),
        F.explode(TextOps.tokens(F.col("text"))).as("term")),
      Seq("source"), "term", k = kmvK)
      .orderBy("source"),
    Some(s"""
      WITH toks AS (
        SELECT source, unnest($toksSql) AS term FROM documents),
      h AS (SELECT DISTINCT source, ${Hashing.hash60Sql("term")} AS h FROM toks),
      r AS (SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM h)
      SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
             CASE WHEN count(*) >= $kmvK THEN max(h) END AS kth_min,
             ${Sketch.kmvEstimateSql(kmvK)} AS est_distinct
      FROM r WHERE rn <= $kmvK
      GROUP BY source ORDER BY source"""))

  // ---------------------------------------------------------------- E21
  /** Batch = the hash60(doc_id)%10==0 slice (a daily ingest stand-in);
    * store = fingerprints of everything else. */
  private val dedupIncremental = QueryDef(
    "dedup_incremental",
    (s, d) => {
      val docs = t(s, d, "documents")
      val isBatch =
        F.pmod(Hashing.hash60(F.col("doc_id").cast("string")), F.lit(10L)) === 0L
      Dedup.incrementalDedup(
        docs.where(isBatch),
        docs.where(!isBatch).select(
          Dedup.fingerprint(F.col("text")).as("fingerprint")),
        "doc_id", "text", "fingerprint")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH f AS (
        SELECT doc_id, $fpSql AS fingerprint,
               ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")} % 10 = 0 AS is_batch
        FROM documents),
      b AS (SELECT doc_id, fingerprint FROM f WHERE is_batch),
      st AS (SELECT DISTINCT fingerprint FROM f WHERE NOT is_batch),
      w AS (SELECT fingerprint, min(doc_id) AS keep_id FROM b GROUP BY 1)
      SELECT b.doc_id, b.fingerprint,
             CASE WHEN st.fingerprint IS NOT NULL THEN 'dup_store'
                  WHEN b.doc_id <> w.keep_id THEN 'dup_batch'
                  ELSE 'new' END AS status
      FROM b LEFT JOIN st USING (fingerprint) JOIN w USING (fingerprint)
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E22
  private val surprisalProxy = QueryDef(
    "surprisal_proxy",
    (s, d) => TextOps.surprisalProxy(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some(s"""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
        GROUP BY 1, 2),
      tc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tc)
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             round(CAST(sum(tf * ((length(bin(total)) - 1)
                                  - (length(bin(c)) - 1))) AS DOUBLE)
                   / sum(tf), 6) AS mean_surprisal
      FROM tf JOIN tc USING (term), n
      GROUP BY doc_id ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E23
  private val splitLeakage = QueryDef(
    "split_leakage",
    (s, d) => Dedup.splitLeakage(t(s, d, "documents"), "doc_id", "text",
      splits = 10, holdoutBucket = 9),
    Some(s"""
      WITH f AS (
        SELECT $fpSql AS fingerprint,
               CASE WHEN ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")} % 10 = 9
                    THEN 1 ELSE 0 END AS h
        FROM documents),
      p AS (SELECT fingerprint,
                   CAST(sum(1 - h) AS BIGINT) AS tc,
                   CAST(sum(h) AS BIGINT) AS hc
            FROM f GROUP BY 1)
      SELECT CAST(sum(tc) AS BIGINT) AS n_train,
             CAST(sum(hc) AS BIGINT) AS n_holdout,
             CAST(sum(CASE WHEN tc > 0 THEN hc ELSE 0 END) AS BIGINT) AS n_leaked,
             round(CAST(sum(CASE WHEN tc > 0 THEN hc ELSE 0 END) AS DOUBLE)
                   / greatest(sum(hc), 1), 6) AS leak_frac
      FROM p"""))

  // ---------------------------------------------------------------- E24
  private val vocabBuild = QueryDef(
    "vocab_build",
    (s, d) => TextOps.vocabBuild(t(s, d, "documents"), "text", size = 100)
      .orderBy("token_id"),
    Some(s"""
      WITH counts AS (
        SELECT term, count(*) AS freq
        FROM (SELECT unnest($toksSql) AS term FROM documents)
        GROUP BY 1)
      SELECT CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
               AS token_id,
             term, freq
      FROM counts
      ORDER BY freq DESC, term LIMIT 100"""))

  // ---------------------------------------------------------------- E25
  private val srcPriorities: Map[String, Int] =
    Map("src0" -> 9, "src1" -> 8, "src2" -> 7, "src3" -> 6)

  private val dedupPriority = QueryDef(
    "dedup_priority",
    (s, d) => Dedup.priorityDedup(t(s, d, "documents"), "doc_id", "text",
      "source", srcPriorities)
      .orderBy("fingerprint"),
    Some {
      val cases = srcPriorities.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
      s"""WITH f AS (
         |  SELECT doc_id, source, $fpSql AS fingerprint,
         |         CASE source $cases ELSE 0 END AS prio
         |  FROM documents),
         |r AS (
         |  SELECT fingerprint, doc_id, source,
         |         row_number() OVER (PARTITION BY fingerprint
         |                            ORDER BY prio DESC, doc_id) AS rn,
         |         count(*) OVER (PARTITION BY fingerprint) AS n_members
         |  FROM f)
         |SELECT fingerprint, doc_id AS keep_id, source AS keep_source,
         |       CAST(n_members AS BIGINT) AS n_members
         |FROM r WHERE rn = 1 ORDER BY fingerprint""".stripMargin
    })

  // ---------------------------------------------------------------- E26
  private val epochTargets: Seq[(String, Double)] =
    Seq("en" -> 2.5, "fr" -> 1.0, "de" -> 0.5, "es" -> 1.5, "zh" -> 0.25)

  private val domainUpsample = QueryDef(
    "domain_upsample",
    (s, d) => Curation.domainUpsample(t(s, d, "documents"), "doc_id", "lang",
      epochTargets.toMap)
      .orderBy("doc_id", "copy_idx"),
    Some {
      val cases = epochTargets.map { case (k, v) => s"WHEN '$k' THEN $v" }
        .mkString(" ")
      s"""WITH d AS (
         |  SELECT doc_id, lang, CASE lang $cases ELSE 1.0 END AS e
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang,
         |         CAST(floor(e) AS BIGINT)
         |         + CASE WHEN ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")}
         |                     % 1000000
         |                     < CAST(floor((e - floor(e)) * 1e6) AS BIGINT)
         |                THEN 1 ELSE 0 END AS n_copies
         |  FROM d)
         |SELECT doc_id, lang, n_copies,
         |       unnest(generate_series(1, n_copies)) AS copy_idx
         |FROM c WHERE n_copies > 0
         |ORDER BY doc_id, copy_idx""".stripMargin
    })

  // ---------------------------------------------------------------- D38
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private val embedNormalize = QueryDef(
    "embed_normalize",
    // The operator returns the unit vector as a float array; the oracle
    // projection serializes it through a portable scalar image — each
    // 6dp component scaled to an exact micro-integer and comma-joined —
    // because the driver's pandas comparison cannot sort/hash ndarray
    // cells (r4 verdict #1). Integer strings are bit-portable; raw
    // double-to-string formatting is not.
    (s, d) => graft.operators.Similarity.l2Normalize(
      t(s, d, "embeddings"), "vec_id", "embedding")
      .select(F.col("vec_id"), F.col("l2_norm"),
        F.array_join(
          F.transform(F.col("unit"),
            x => F.coalesce(F.round(x * 1e6).cast("long").cast("string"),
              F.lit("null"))), ",").as("unit_micro"))
      .orderBy("vec_id"),
    Some(s"""
      SELECT vec_id,
             round(sqrt(${dotSql("embedding", "embedding")}), 6) AS l2_norm,
             array_to_string(list_transform(generate_series(1, 64), i ->
               coalesce(CAST(CAST(round(
                 round(CAST(embedding[i] AS DOUBLE)
                       / sqrt(${dotSql("embedding", "embedding")}), 6)
                 * 1e6) AS BIGINT) AS VARCHAR), 'null')), ',') AS unit_micro
      FROM embeddings ORDER BY vec_id"""))

  // ---------------------------------------------------------------- D12
  private val embedQuantize = QueryDef(
    "embed_quantize",
    // int8 codes are exact integers — comma-joined they compare
    // byte-identically in any engine (driver cannot hash array cells).
    (s, d) => graft.operators.Similarity.quantizeInt8(
      t(s, d, "embeddings"), "vec_id", "embedding")
      .select(F.col("vec_id"),
        F.array_join(F.transform(F.col("q"), _.cast("string")), ",")
          .as("q_codes"))
      .orderBy("vec_id"),
    Some(s"""
      WITH s AS (
        SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
               max(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY i),
      a AS (SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
            FROM s)
      SELECT vec_id,
             array_to_string(list_transform(generate_series(1, 64), i ->
               CAST(CASE WHEN maxs[i] = mins[i] THEN 0
                    ELSE CAST(least(255, greatest(0,
                      floor((CAST(embedding[i] AS DOUBLE) - mins[i]) * 255.0
                            / (maxs[i] - mins[i])))) AS BIGINT)
               END - 128 AS VARCHAR)), ',') AS q_codes
      FROM embeddings, a ORDER BY vec_id"""))

  // ---------------------------------------------------------------- D13
  /** Quantize → integer-dot shortlist: the whole pipeline stays in the
    * plan (no materialized intermediate), and integer scores need no
    * rounding discipline at all. */
  private val quantizeSql = s"""
      WITH qs AS (
        SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
               max(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY i),
      qa AS (SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
             FROM qs),
      qv AS (
        SELECT vec_id,
               list_transform(generate_series(1, 64), i ->
                 CASE WHEN maxs[i] = mins[i] THEN 0
                      ELSE CAST(least(255, greatest(0,
                        floor((CAST(embedding[i] AS DOUBLE) - mins[i]) * 255.0
                              / (maxs[i] - mins[i])))) AS BIGINT)
                 END - 128) AS q
        FROM embeddings, qa)"""

  private val embedQuantizedTopk = QueryDef(
    "embed_quantized_topk",
    (s, d) => {
      val q = graft.operators.Similarity.quantizeInt8(
        t(s, d, "embeddings"), "vec_id", "embedding")
      graft.operators.Similarity.quantizedTopK(
        q, q.where(F.col("vec_id") < 5), "vec_id", "q", k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""$quantizeSql,
      scored AS (
        SELECT l.vec_id AS query_id, r.vec_id AS match_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                 i -> l.q[i] * r.q[i])) AS BIGINT) AS score
        FROM qv l JOIN qv r ON l.vec_id < 5 AND r.vec_id <> l.vec_id),
      ranked AS (
        SELECT query_id, match_id, score,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, match_id) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, rank, match_id, score
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  // ---------------------------------------------------------------- E27
  private val textPretokenize = QueryDef(
    "text_pretokenize",
    // Head pretokens joined on the unit-separator control char U+001F
    // (the synthetic corpus is printable ASCII, so the delimiter cannot
    // collide) — the driver's pandas comparison needs scalar cells,
    // not arrays (r4 verdict #1).
    (s, d) => TextOps.pretokenize(t(s, d, "documents"), "doc_id", "text")
      .select(F.col("doc_id"), F.col("n_pretokens"), F.col("n_ws_tokens"),
        F.array_join(F.col("head_pretokens"), "\u001f").as("head_joined"))
      .orderBy("doc_id"),
    Some {
      val p = TextOps.pretokenPattern
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$p')) AS BIGINT)
         |         AS n_pretokens,
         |       len(regexp_split_to_array(lower(text), ' +')) AS n_ws_tokens,
         |       array_to_string(regexp_extract_all(text, '$p')[1:10], chr(31))
         |         AS head_joined
         |FROM documents ORDER BY doc_id""".stripMargin
    })

  def all: Seq[QueryDef] = Seq(
    piiRedact, chunkDocs, approxDistinctKmv, dedupIncremental,
    surprisalProxy, splitLeakage, vocabBuild, dedupPriority, domainUpsample,
    embedNormalize, embedQuantize, embedQuantizedTopk, textPretokenize)
}
