package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Crawl-prep URL operators — the CCNet/RefinedWeb curation moves that
  * precede any web-scale dedup: canonicalize each document's URL, dedup
  * on the canonical form, and roll volume/quality up per host so
  * host-level keep/drop policies have something to read.
  *
  * Normalization (RFC 3986 §6 syntax-based, plus the crawl-pipeline
  * conventions): lowercase scheme and host, strip a leading `www.`,
  * strip the scheme's default port (:80 / :443), drop the fragment,
  * drop `utm_*` tracking params (keeping any others), and strip
  * trailing slashes from the path. Every step is a codegen'd
  * regexp/string function — a pure narrow map, no UDF, no shuffle.
  *
  * The test corpus has no URL column, so [[withSyntheticUrl]] derives a
  * deterministic, deliberately messy raw URL from (doc_id, source) via
  * the portable [[Hashing.hash60]]: mixed-case scheme/host, optional
  * `www.`, scheme-default ports, trailing slashes, utm params and
  * fragments all appear on hash-chosen rows, so normalization has real
  * work to do and URL-exact duplicates genuinely occur (the path/host
  * space is finite). Each Spark fragment has its DuckDB twin kept
  * adjacent (the [[Hashing.hash60Sql]] discipline) so the two can never
  * drift.
  */
object UrlOps {

  /** Adds `h` (60-bit hash of the doc id) and `raw_url` to a frame with
    * doc_id + source. Deterministic test-data synthesis, not an
    * operator: a real pipeline reads the crawl's URL column. */
  def withSyntheticUrl(df: DataFrame): DataFrame = df
    .withColumn("h", Hashing.hash60(
      F.concat(F.lit("url:"), F.col("doc_id").cast("string"))))
    .withColumn("raw_url", F.expr(
      """concat(
        |  CASE WHEN h % 2 = 0 THEN 'https' ELSE 'HTTP' END, '://',
        |  CASE WHEN h % 3 = 0 THEN 'www.' ELSE '' END,
        |  CASE WHEN h % 5 = 0
        |       THEN upper(concat(source, '-', CAST(h % 4 AS STRING),
        |                         '.example.com'))
        |       ELSE concat(source, '-', CAST(h % 4 AS STRING),
        |                   '.example.com') END,
        |  CASE WHEN h % 7 = 0
        |       THEN CASE WHEN h % 2 = 0 THEN ':443' ELSE ':80' END
        |       ELSE '' END,
        |  '/p/', CAST((h div 7) % 97 AS STRING),
        |  CASE WHEN h % 11 = 0 THEN '/' ELSE '' END,
        |  CASE WHEN h % 13 = 0 THEN '?utm_source=feed&utm_campaign=x'
        |       WHEN h % 13 = 1 THEN '?ref=home&utm_medium=social'
        |       ELSE '' END,
        |  CASE WHEN h % 17 = 0 THEN '#sec-2' ELSE '' END)""".stripMargin))

  /** DuckDB twin of [[withSyntheticUrl]]: two CTEs over `inRel`
    * (must expose doc_id, source, plus whatever else the caller needs —
    * SELECT * carries the rest through). */
  def syntheticUrlCtes(inRel: String): String = {
    val h = Hashing.hash60Sql("'url:' || CAST(doc_id AS VARCHAR)")
    s"""su0 AS (SELECT *, $h AS h FROM $inRel),
       |su AS (SELECT *,
       |  (CASE WHEN h % 2 = 0 THEN 'https' ELSE 'HTTP' END) || '://' ||
       |  (CASE WHEN h % 3 = 0 THEN 'www.' ELSE '' END) ||
       |  (CASE WHEN h % 5 = 0
       |        THEN upper(source || '-' || CAST(h % 4 AS VARCHAR) ||
       |                   '.example.com')
       |        ELSE source || '-' || CAST(h % 4 AS VARCHAR) ||
       |             '.example.com' END) ||
       |  (CASE WHEN h % 7 = 0
       |        THEN CASE WHEN h % 2 = 0 THEN ':443' ELSE ':80' END
       |        ELSE '' END) ||
       |  '/p/' || CAST((h // 7) % 97 AS VARCHAR) ||
       |  (CASE WHEN h % 11 = 0 THEN '/' ELSE '' END) ||
       |  (CASE WHEN h % 13 = 0 THEN '?utm_source=feed&utm_campaign=x'
       |        WHEN h % 13 = 1 THEN '?ref=home&utm_medium=social'
       |        ELSE '' END) ||
       |  (CASE WHEN h % 17 = 0 THEN '#sec-2' ELSE '' END) AS raw_url
       | FROM su0)""".stripMargin
  }

  /** Adds `norm_url` and `u_host` (the normalized host — the per-host
    * rollup key) from `urlCol`. All intermediates are dropped. */
  def withNormalizedUrl(df: DataFrame, urlCol: String): DataFrame = df
    .withColumn("_u_scheme", F.expr(
      s"lower(regexp_extract($urlCol, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"))
    .withColumn("_u_rest", F.expr(
      s"regexp_extract($urlCol, '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$$', 1)"))
    .withColumn("_u_auth", F.expr("regexp_extract(_u_rest, '^([^/?#]*)', 1)"))
    .withColumn("_u_tail",
      F.expr("substring(_u_rest, length(_u_auth) + 1)"))
    .withColumn("_u_host0",
      F.expr("regexp_replace(lower(_u_auth), '^www\\\\.', '')"))
    .withColumn("u_host", F.expr(
      """CASE WHEN _u_scheme = 'http'
        |     THEN regexp_replace(_u_host0, ':80$', '')
        |     WHEN _u_scheme = 'https'
        |     THEN regexp_replace(_u_host0, ':443$', '')
        |     ELSE _u_host0 END""".stripMargin))
    .withColumn("_u_path", F.expr(
      "regexp_replace(regexp_extract(_u_tail, '^([^?#]*)', 1), '/+$', '')"))
    .withColumn("_u_query",
      F.expr("regexp_extract(_u_tail, '\\\\?([^#]*)', 1)"))
    .withColumn("_u_qn", F.expr(
      "array_join(filter(split(_u_query, '&'), " +
        "q -> NOT startswith(q, 'utm_') AND q != ''), '&')"))
    .withColumn("norm_url", F.expr(
      """concat(_u_scheme, '://', u_host, _u_path,
        |  CASE WHEN _u_qn != '' THEN concat('?', _u_qn) ELSE '' END)"""
        .stripMargin))
    .drop("_u_scheme", "_u_rest", "_u_auth", "_u_tail", "_u_host0",
      "_u_path", "_u_query", "_u_qn")

  /** DuckDB twin of [[withNormalizedUrl]]: CTE chain over `inRel`
    * (must expose `urlCol`); ends with relation `un` exposing norm_url
    * and u_host beside the carried columns. */
  def normalizeUrlCtes(inRel: String, urlCol: String): String =
    s"""nu0 AS (SELECT *,
       |  lower(regexp_extract($urlCol, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |    AS u_scheme,
       |  regexp_extract($urlCol, '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$$', 1)
       |    AS u_rest
       | FROM $inRel),
       |nu1 AS (SELECT *, regexp_extract(u_rest, '^([^/?#]*)', 1) AS u_auth
       | FROM nu0),
       |nu2 AS (SELECT *,
       |  substr(u_rest, length(u_auth) + 1) AS u_tail,
       |  regexp_replace(lower(u_auth), '^www\\.', '') AS u_host0
       | FROM nu1),
       |nu3 AS (SELECT *,
       |  CASE WHEN u_scheme = 'http'
       |       THEN regexp_replace(u_host0, ':80$$', '')
       |       WHEN u_scheme = 'https'
       |       THEN regexp_replace(u_host0, ':443$$', '')
       |       ELSE u_host0 END AS u_host,
       |  regexp_replace(regexp_extract(u_tail, '^([^?#]*)', 1), '/+$$', '')
       |    AS u_path,
       |  regexp_extract(u_tail, '\\?([^#]*)', 1) AS u_query
       | FROM nu2),
       |nu4 AS (SELECT *,
       |  array_to_string(list_filter(string_split(u_query, '&'),
       |    q -> NOT starts_with(q, 'utm_') AND q != ''), '&') AS u_qn
       | FROM nu3),
       |un AS (SELECT *,
       |  u_scheme || '://' || u_host || u_path ||
       |  (CASE WHEN u_qn != '' THEN '?' || u_qn ELSE '' END) AS norm_url
       | FROM nu4)""".stripMargin
}
