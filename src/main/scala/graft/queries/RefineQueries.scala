package graft.queries

import graft.operators.{Curation, Dedup, Hashing, TextOps}
import org.apache.spark.sql.{Column, functions => F}
import Tables.t

/** Wave-6 inventory: corpus refinement (SURVEY §2 E28–E32) — line-level
  * boilerplate dedup, sparse TF-IDF cosine pairs, fuzzy (minhash)
  * benchmark decontamination, deterministic per-group sampling and the
  * Zipf rank-frequency slope. Oracle SQL shares every constant
  * (separators, caps, hash family, thresholds) with the Spark side so
  * the two cannot drift. */
object RefineQueries {

  private val toksSql = "regexp_split_to_array(lower(text), ' +')"

  // ---------------------------------------------------------------- E28
  /** The synthetic corpus is one line per document with no repeated
    * lines, so the query plants deterministic boilerplate (the CCNet
    * motivation: footers repeating across a crawl) on BOTH sides — two
    * shared footer lines appended to doc_id%4 / doc_id%6 slices. At the
    * df cap of 5 exactly those planted lines are removed (df 125 / 84 at
    * sf0.01) while every original line survives (df 1). */
  private val footerA = "standard legal boilerplate footer"
  private val footerB = "subscribe to the newsletter now"

  private def augLines: Column = F.concat(
    F.col("text"),
    F.when(F.pmod(F.col("doc_id"), F.lit(4)) === 0,
      F.lit("\n" + footerA)).otherwise(F.lit("")),
    F.when(F.pmod(F.col("doc_id"), F.lit(6)) === 0,
      F.lit("\n" + footerB)).otherwise(F.lit("")))

  private val lineDedup = QueryDef(
    "line_dedup",
    (s, d) => Dedup.lineDedup(
      t(s, d, "documents").select(F.col("doc_id"), augLines.as("text")),
      "doc_id", "text", sep = "\n", maxDocFreq = 5)
      .orderBy("doc_id"),
    Some(s"""
      WITH a AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '$footerA' ELSE '' END
               || CASE WHEN doc_id % 6 = 0 THEN chr(10) || '$footerB' ELSE '' END
                 AS text
        FROM documents),
      e AS (
        SELECT doc_id, i AS line_idx, ls[i] AS line
        FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM a))),
      d AS (SELECT line, count(DISTINCT doc_id) AS df FROM e GROUP BY 1)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN df <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             coalesce(string_agg(CASE WHEN df <= 5 THEN line END,
                                 chr(10) ORDER BY line_idx), '') AS clean_text,
             round(CAST(count(*) - sum(CASE WHEN df <= 5 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*), 6) AS removed_frac
      FROM e JOIN d USING (line)
      GROUP BY doc_id ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E29
  private val tfidfCosinePairs = QueryDef(
    "tfidf_cosine_pairs",
    (s, d) => Dedup.tfidfCosinePairs(t(s, d, "documents"), "doc_id", "text",
      minCosine = 0.5, maxDocFreq = 1000)
      .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
        GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
             HAVING count(*) <= 1000),
      n AS (SELECT count(*) AS nd FROM documents),
      w AS (SELECT doc_id, term,
                   tf * ((length(bin(nd)) - 1) - (length(bin(df)) - 1)) AS w
            FROM tf JOIN df USING (term), n),
      nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w
              GROUP BY 1 HAVING sum(w * w) > 0),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(sum(a.w * b.w) AS BIGINT) AS num
            FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      c AS (SELECT doc_a, doc_b,
                   round(CAST(num AS DOUBLE)
                         / sqrt(CAST(x.n2 AS DOUBLE) * y.n2), 6) AS cosine
            FROM p JOIN nrm x ON p.doc_a = x.doc_id
                   JOIN nrm y ON p.doc_b = y.doc_id)
      SELECT doc_a, doc_b, cosine FROM c
      WHERE cosine >= 0.5 ORDER BY doc_a, doc_b"""))

  // ---------------------------------------------------------------- E31
  private val FUZZY_K = 16; private val FUZZY_BANDS = 4

  /** Benchmark = the doc_id%20 slice (an eval-suite stand-in); corpus =
    * everything else. The replicated fingerprint groups in the testdata
    * make real cross-slice near-dups, so the screen has genuine hits. */
  private val contaminationFuzzy = QueryDef(
    "contamination_fuzzy",
    (s, d) => {
      val docs = t(s, d, "documents")
      val isBench = F.pmod(F.col("doc_id"), F.lit(20)) === 0
      Curation.contaminationFuzzy(
        docs.where(!isBench), docs.where(isBench),
        "doc_id", "text", k = FUZZY_K, bands = FUZZY_BANDS, shingleN = 3,
        flagAt = 0.5)
        .orderBy("doc_id")
    },
    Some {
      val mins = (0 until FUZZY_K).map { i =>
        val (a, b) = Dedup.minhashCoef(i)
        s"min((_h * $a + $b) % ${Dedup.M31}) AS h$i"
      }.mkString(",\n               ")
      val r = FUZZY_K / FUZZY_BANDS
      val bandSelects = (0 until FUZZY_BANDS).map { b =>
        val cols = (0 until r).map(j => s"CAST(h${b * r + j} AS VARCHAR)")
          .mkString(", ")
        s"SELECT doc_id, $b AS band_idx, " +
          s"${Hashing.hash60Sql(s"concat_ws(',', $cols)")} AS band_hash FROM sig"
      }.mkString("\nUNION ALL\n")
      val matchSum = (0 until FUZZY_K)
        .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")
      val parts = (0 until 3).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH sh AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, greatest(len(t) - 2, 0)),
         |    i -> $parts)) AS shingle
         |  FROM (SELECT doc_id, $toksSql AS t FROM documents))),
         |shh AS (SELECT doc_id,
         |        ${Hashing.hash60Sql("shingle")} % ${Dedup.M31} AS _h FROM sh),
         |sig AS (SELECT doc_id,
         |               $mins
         |        FROM shh GROUP BY doc_id),
         |bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
         |         FROM bands c JOIN bands b
         |           ON c.band_idx = b.band_idx AND c.band_hash = b.band_hash
         |         WHERE c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0),
         |agree AS (SELECT cand.doc_id, cand.bench_id,
         |                 round(CAST(($matchSum) AS DOUBLE) / $FUZZY_K, 6) AS est
         |          FROM cand JOIN sig a ON a.doc_id = cand.doc_id
         |                    JOIN sig b ON b.doc_id = cand.bench_id),
         |best AS (SELECT doc_id, bench_id, est,
         |                row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY est DESC, bench_id) AS rn
         |         FROM agree)
         |SELECT doc_id, bench_id, est AS est_jaccard,
         |       CAST(CASE WHEN est >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
         |         AS contaminated
         |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
    })

  // ---------------------------------------------------------------- E30
  private val sampleGroup = QueryDef(
    "sample_group",
    (s, d) => Curation.sampleGroup(t(s, d, "documents"), "doc_id", "source",
      k = 10)
      .orderBy("source", "sample_rank"),
    Some(s"""
      WITH h AS (
        SELECT source, doc_id,
               ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")} AS h
        FROM documents),
      r AS (SELECT source, doc_id, h,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY h, doc_id) AS rn,
                   count(*) OVER (PARTITION BY source) AS n_total
            FROM h)
      SELECT source, CAST(n_total AS BIGINT) AS n_total,
             CAST(rn AS BIGINT) AS sample_rank, doc_id, h
      FROM r WHERE rn <= 10 ORDER BY source, sample_rank"""))

  // ---------------------------------------------------------------- E32
  private val zipfSlope = QueryDef(
    "zipf_slope",
    (s, d) => TextOps.zipfSlope(t(s, d, "documents"), "text", topV = 100),
    Some(s"""
      WITH c AS (
        SELECT term, count(*) AS freq
        FROM (SELECT unnest($toksSql) AS term FROM documents)
        GROUP BY 1 ORDER BY freq DESC, term LIMIT 100),
      r AS (SELECT row_number() OVER (ORDER BY freq DESC, term) AS rnk, freq
            FROM c),
      s AS (SELECT count(*) AS v, CAST(sum(freq) AS BIGINT) AS top_tokens,
                   sum(length(bin(rnk)) - 1) AS sx,
                   sum(length(bin(freq)) - 1) AS sy,
                   sum((length(bin(rnk)) - 1) * (length(bin(freq)) - 1)) AS sxy,
                   sum((length(bin(rnk)) - 1) * (length(bin(rnk)) - 1)) AS sxx
            FROM r)
      SELECT CAST(v AS BIGINT) AS n_terms, top_tokens,
             CASE WHEN v * sxx - sx * sx <> 0
                  THEN round(CAST(v * sxy - sx * sy AS DOUBLE)
                             / (v * sxx - sx * sx), 6)
             END AS zipf_slope
      FROM s"""))

  def all: Seq[QueryDef] = Seq(
    lineDedup, tfidfCosinePairs, contaminationFuzzy, sampleGroup, zipfSlope)
}
