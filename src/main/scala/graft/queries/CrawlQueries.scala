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

  val all: Seq[QueryDef] = Seq(urlNormalize, urlDedup, hostRollup)
}
