package graft.queries

import graft.operators.UrlOps
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-40 inventory (r7): crawl-prep URL curation — the CCNet/
  * RefinedWeb steps that precede web-scale dedup. The corpus has no URL
  * column, so a deterministic messy raw URL is derived per document
  * ([[UrlOps.withSyntheticUrl]] — hash-chosen case/www/port/slash/utm/
  * fragment noise); the OPERATORS under test are the normalizer and the
  * canonical-URL/host aggregations, which a real pipeline points at the
  * crawl's own URL column.
  *
  * Scale shape shared by all three: normalization is a narrow codegen'd
  * regexp map (no UDF, no shuffle); each rollup is ONE map-side-combined
  * hash aggregate on the canonical key; outputs are URL-space/host-space
  * bounded, never corpus-sized, and nothing sorts globally. */
object CrawlQueries {

  private def normalized(s: org.apache.spark.sql.SparkSession, d: String,
      cols: String*) =
    UrlOps.withNormalizedUrl(
      UrlOps.withSyntheticUrl(
        t(s, d, "documents").select("doc_id", cols: _*)),
      "raw_url")

  // ---------------------------------------------------------------- E66
  /** URL canonicalization audit: per source, how many raw URLs collapse
    * under normalization (lowercase scheme/host, strip www./default
    * port/fragment/utm params/trailing slash). The before/after distinct
    * counts are the number a crawl-prep run reports to justify the
    * canonical form. One pass, two distinct-counts per group. */
  private val urlNormalize = QueryDef(
    "url_normalize",
    (s, d) => normalized(s, d, "source")
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.countDistinct("raw_url").as("n_raw_urls"),
        F.countDistinct("norm_url").as("n_norm_urls"))
      .orderBy("source"),
    Some(s"""
      WITH base AS (SELECT doc_id, source FROM documents),
      ${UrlOps.syntheticUrlCtes("base")},
      ${UrlOps.normalizeUrlCtes("su", "raw_url")}
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_urls,
             CAST(count(DISTINCT norm_url) AS BIGINT) AS n_norm_urls
      FROM un GROUP BY source ORDER BY source"""))

  // ---------------------------------------------------------------- E67
  /** URL-exact dedup: canonical-URL groups with more than one document,
    * keeping the min doc id as representative (D1's keep rule on the
    * crawl key). ONE hash aggregate on norm_url; the published frame is
    * only the duplicated groups — URL-space bounded. At 100 TB this is
    * the first dedup pass a crawl runs, before any content hashing. */
  private val urlDedup = QueryDef(
    "url_dedup",
    (s, d) => normalized(s, d, "source")
      .groupBy("norm_url")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.min("doc_id").as("keep_doc"))
      .where(F.col("n_docs") > 1)
      .orderBy("norm_url"),
    Some(s"""
      WITH base AS (SELECT doc_id, source FROM documents),
      ${UrlOps.syntheticUrlCtes("base")},
      ${UrlOps.normalizeUrlCtes("su", "raw_url")}
      SELECT norm_url, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(doc_id) AS BIGINT) AS keep_doc
      FROM un GROUP BY norm_url HAVING count(*) > 1
      ORDER BY norm_url"""))

  // ---------------------------------------------------------------- E68
  /** Per-host volume/quality rollup — the table a host-level keep/drop
    * policy reads (RefinedWeb's host blocklists operate on exactly
    * this): docs, distinct canonical URLs, total chars and corpus share
    * in exact ppm per normalized host. One aggregate to a host-bounded
    * frame plus a 1-row broadcast total. */
  private val hostRollup = QueryDef(
    "host_rollup",
    (s, d) => {
      val per = normalized(s, d, "source", "n_chars")
        .groupBy("u_host")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.countDistinct("norm_url").as("n_urls"),
          F.sum("n_chars").as("sum_chars"))
      val tot = per.agg(F.sum("n_docs").as("t"))
      per.crossJoin(F.broadcast(tot))
        .select(F.col("u_host"), F.col("n_docs"), F.col("n_urls"),
          F.col("sum_chars"),
          F.expr("n_docs * 1000000L div t").as("share_ppm"))
        .orderBy("u_host")
    },
    Some(s"""
      WITH base AS (SELECT doc_id, source, n_chars FROM documents),
      ${UrlOps.syntheticUrlCtes("base")},
      ${UrlOps.normalizeUrlCtes("su", "raw_url")},
      per AS (
        SELECT u_host, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT norm_url) AS BIGINT) AS n_urls,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM un GROUP BY u_host),
      tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM per)
      SELECT u_host, n_docs, n_urls, sum_chars,
             CAST(n_docs * 1000000 // t AS BIGINT) AS share_ppm
      FROM per, tt ORDER BY u_host"""))

  // ---------------------------------------------------------------- E72
  /** Host keep/drop policy — the decision E68's rollup exists to feed,
    * composed end-to-end: per normalized host, volume (docs, corpus
    * share ppm), URL-dup rate ppm, and mean E2 quality in exact micros
    * (per-doc quality is a 6-dp double identical on both engines, so
    * round(q·10⁶) is an exact integer; the mean is one integral
    * division) → verdict: low quality ⇒ drop, heavy duplication ⇒
    * dedup_first, oversized share ⇒ throttle, else keep. One corpus
    * aggregate to a host-bounded frame. */
  private val hostPolicy = QueryDef(
    "host_policy",
    (s, d) => {
      val cols = graft.operators.TextOps.qualityColumns(F.col("text")).toMap
      val per = normalized(s, d, "source", "text")
        .withColumn("q_micro",
          F.round(cols("quality") * 1000000).cast("long"))
        .groupBy("u_host")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.countDistinct("norm_url").as("n_urls"),
          F.sum("q_micro").as("sum_q"))
      val tot = per.agg(F.sum("n_docs").as("t"))
      per.crossJoin(F.broadcast(tot))
        .select(F.col("u_host"), F.col("n_docs"), F.col("n_urls"),
          F.expr("(n_docs - n_urls) * 1000000L div n_docs").as("dup_ppm"),
          F.expr("sum_q div n_docs").as("avg_q_micro"),
          F.expr("n_docs * 1000000L div t").as("share_ppm"))
        .withColumn("verdict", F.expr(
          """CASE WHEN avg_q_micro < 210000 THEN 'drop'
            |     WHEN dup_ppm > 400000 THEN 'dedup_first'
            |     WHEN share_ppm > 20000 THEN 'throttle'
            |     ELSE 'keep' END""".stripMargin))
        .orderBy("u_host")
    },
    Some {
      val stop = graft.operators.TextOps.stopwords
        .map(m => s"x = '$m'").mkString(" OR ")
      val toksSql = "regexp_split_to_array(lower(text), ' +')"
      s"""
      WITH base AS (SELECT doc_id, source, text FROM documents),
      ${graft.operators.UrlOps.syntheticUrlCtes("base")},
      ${graft.operators.UrlOps.normalizeUrlCtes("su", "raw_url")},
      f AS (
        SELECT u_host, norm_url,
               CAST(len($toksSql) AS BIGINT) AS n_toks,
               len(list_filter($toksSql, x -> $stop)) AS n_stop,
               CAST(len(regexp_extract_all(text, '[.,!?;]')) AS BIGINT)
                 AS n_punct,
               CAST(length(text) AS BIGINT) AS n_chars_len
        FROM un),
      qq AS (
        SELECT u_host, norm_url,
               CAST(round(round((n_stop * 1.0 / n_toks) * 0.5
                     + (n_punct * 1.0 / n_chars_len) * 0.3
                     + least(n_toks / 100.0, 1.0) * 0.2, 6) * 1000000)
                 AS BIGINT) AS q_micro
        FROM f),
      per AS (
        SELECT u_host, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT norm_url) AS BIGINT) AS n_urls,
               CAST(sum(q_micro) AS BIGINT) AS sum_q
        FROM qq GROUP BY 1),
      tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM per)
      SELECT u_host, n_docs, n_urls,
             CAST((n_docs - n_urls) * 1000000 // n_docs AS BIGINT)
               AS dup_ppm,
             CAST(sum_q // n_docs AS BIGINT) AS avg_q_micro,
             CAST(n_docs * 1000000 // t AS BIGINT) AS share_ppm,
             CASE WHEN sum_q // n_docs < 210000 THEN 'drop'
                  WHEN (n_docs - n_urls) * 1000000 // n_docs > 400000
                    THEN 'dedup_first'
                  WHEN n_docs * 1000000 // t > 20000 THEN 'throttle'
                  ELSE 'keep' END AS verdict
      FROM per, tt ORDER BY u_host"""
    })

  val all: Seq[QueryDef] = Seq(urlNormalize, urlDedup, hostRollup,
    hostPolicy)
}
