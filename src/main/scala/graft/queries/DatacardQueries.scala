package graft.queries

import graft.operators.{Hashing, TextOps}
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-44 inventory (r7): corpus governance one-pagers — the data card
  * a corpus release ships with, the temporal-split leakage audit a
  * training run gates on, and the document↔embedding reconciliation an
  * index rebuild starts from. All three are metadata-sized outputs from
  * single-shuffle plans. */
object DatacardQueries {

  // ---------------------------------------------------------------- E73
  /** Corpus data card in ONE scan (the E41 one-pass discipline over the
    * documents table): docs, chars, tokens, languages, sources, exact
    * distinct texts (via the portable 60-bit md5), duplicate count and
    * mean E2 quality in exact micros — unpivoted to (metric, value)
    * rows so the card is schema-stable as metrics are added. The
    * count-distincts plan via Spark's Expand exactly like E41, with
    * approx_count_distinct the documented 100 TB drop-in. */
  private val corpusDatacard = QueryDef(
    "corpus_datacard",
    (s, d) => {
      val cols = TextOps.qualityColumns(F.col("text")).toMap
      t(s, d, "documents")
        .select(F.col("lang"), F.col("source"),
          F.length(F.col("text")).cast("long").as("nc"),
          cols("n_tokens").as("nt"),
          Hashing.hash60(F.col("text")).as("th"),
          F.round(cols("quality") * 1000000).cast("long").as("qm"))
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("nc").as("n_chars"), F.sum("nt").as("n_tokens"),
          F.countDistinct("lang").as("n_langs"),
          F.countDistinct("source").as("n_sources"),
          F.countDistinct("th").as("n_texts"),
          F.sum("qm").as("sq"))
        .select(F.expr("""stack(8,
            'n_docs', n_docs,
            'n_chars', n_chars,
            'n_tokens', n_tokens,
            'n_langs', n_langs,
            'n_sources', n_sources,
            'n_distinct_texts', n_texts,
            'dup_docs', n_docs - n_texts,
            'mean_quality_micro', sq div n_docs) AS (metric, value)"""))
        .orderBy("metric")
    },
    Some {
      val stop = TextOps.stopwords.map(m => s"x = '$m'").mkString(" OR ")
      val toksSql = "regexp_split_to_array(lower(text), ' +')"
      s"""
      WITH f AS (
        SELECT lang, source,
               CAST(length(text) AS BIGINT) AS nc,
               CAST(len($toksSql) AS BIGINT) AS nt,
               len(list_filter($toksSql, x -> $stop)) AS n_stop,
               CAST(len(regexp_extract_all(text, '[.,!?;]')) AS BIGINT)
                 AS n_punct,
               ${Hashing.hash60Sql("text")} AS th
        FROM documents),
      q AS (
        SELECT lang, source, nc, nt, th,
               CAST(round(round((n_stop * 1.0 / nt) * 0.5
                     + (n_punct * 1.0 / nc) * 0.3
                     + least(nt / 100.0, 1.0) * 0.2, 6) * 1000000)
                 AS BIGINT) AS qm
        FROM f),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nc) AS BIGINT) AS n_chars,
               CAST(sum(nt) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT th) AS BIGINT) AS n_texts,
               CAST(sum(qm) AS BIGINT) AS sq
        FROM q)
      SELECT metric, CAST(value AS BIGINT) AS value FROM (
        SELECT 'n_docs' AS metric, n_docs AS value FROM a
        UNION ALL SELECT 'n_chars', n_chars FROM a
        UNION ALL SELECT 'n_tokens', n_tokens FROM a
        UNION ALL SELECT 'n_langs', n_langs FROM a
        UNION ALL SELECT 'n_sources', n_sources FROM a
        UNION ALL SELECT 'n_distinct_texts', n_texts FROM a
        UNION ALL SELECT 'dup_docs', n_docs - n_texts FROM a
        UNION ALL SELECT 'mean_quality_micro', sq // n_docs FROM a)
      ORDER BY metric"""
    })

  // ---------------------------------------------------------------- E74
  /** Temporal train/val split audit: split events at max(ts) − 7 days
    * (data-derived, deterministic — no wall clock), then measure the
    * leakage a user-level model would see: users present on BOTH sides
    * and the share of validation events contributed by train-seen users
    * in exact ppm. One per-user aggregate (each user's counts on both
    * sides in one row — never two scans), the cutoff a 1-row broadcast,
    * output a single summary row. The E23 (hash-split) audit's temporal
    * sibling. */
  private val timeSplitAudit = QueryDef(
    "time_split_audit",
    (s, d) => {
      val ev = t(s, d, "events").select("user_id", "ts")
      val cut = ev.agg(
        F.expr("max(ts) - INTERVAL 7 DAYS").as("cutoff"))
      ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
          F.sum(F.expr("CASE WHEN ts < cutoff THEN 1L ELSE 0L END"))
            .as("nt"),
          F.sum(F.expr("CASE WHEN ts >= cutoff THEN 1L ELSE 0L END"))
            .as("nv"))
        .agg(F.sum("nt").as("train_events"),
          F.sum("nv").as("val_events"),
          F.sum(F.expr("CASE WHEN nt > 0 THEN 1L ELSE 0L END"))
            .as("train_users"),
          F.sum(F.expr("CASE WHEN nv > 0 THEN 1L ELSE 0L END"))
            .as("val_users"),
          F.sum(F.expr("CASE WHEN nt > 0 AND nv > 0 THEN 1L ELSE 0L END"))
            .as("overlap_users"),
          F.sum(F.expr("CASE WHEN nt > 0 THEN nv ELSE 0L END"))
            .as("leak_val_events"))
        .select(F.col("train_events"), F.col("val_events"),
          F.col("train_users"), F.col("val_users"),
          F.col("overlap_users"), F.col("leak_val_events"),
          F.expr("CASE WHEN val_events > 0 THEN " +
            "leak_val_events * 1000000L div val_events ELSE 0L END")
            .as("leak_ppm"))
    },
    Some("""
      WITH c AS (SELECT max(ts) - INTERVAL 7 DAY AS cutoff FROM events),
      per AS (
        SELECT user_id,
               CAST(sum(CASE WHEN ts < cutoff THEN 1 ELSE 0 END)
                    AS BIGINT) AS nt,
               CAST(sum(CASE WHEN ts >= cutoff THEN 1 ELSE 0 END)
                    AS BIGINT) AS nv
        FROM events, c GROUP BY 1)
      SELECT CAST(sum(nt) AS BIGINT) AS train_events,
             CAST(sum(nv) AS BIGINT) AS val_events,
             CAST(sum(CASE WHEN nt > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS train_users,
             CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS val_users,
             CAST(sum(CASE WHEN nt > 0 AND nv > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS overlap_users,
             CAST(sum(CASE WHEN nt > 0 THEN nv ELSE 0 END) AS BIGINT)
               AS leak_val_events,
             CAST(CASE WHEN sum(nv) > 0 THEN
               sum(CASE WHEN nt > 0 THEN nv ELSE 0 END) * 1000000
                 // sum(nv) ELSE 0 END AS BIGINT) AS leak_ppm
      FROM per"""))

  // ---------------------------------------------------------------- H17
  /** Document↔embedding reconciliation (the H8 referential audit applied
    * to the two corpus tables an index rebuild joins): docs lacking a
    * vector, orphan vectors, dimension profile and corrupt-component
    * count (null/NaN elements) — the preconditions every ANN operator in
    * section D assumes. Both sides collapse to distinct keys before the
    * membership join; three 1-row summaries cross-join as metadata. */
  private val embedCoverage = QueryDef(
    "embed_coverage",
    (s, d) => {
      val dk = t(s, d, "documents").select("doc_id").distinct()
      val ek = t(s, d, "embeddings").select("vec_id").distinct()
      val a = dk.join(ek, dk("doc_id") === ek("vec_id"), "left")
        .agg(F.count(F.lit(1)).as("docs_total"),
          F.sum(F.when(ek("vec_id").isNull, 1L).otherwise(0L))
            .as("docs_without_vec"))
      val b = ek.join(dk, dk("doc_id") === ek("vec_id"), "left")
        .agg(F.sum(F.when(dk("doc_id").isNull, 1L).otherwise(0L))
          .as("vecs_without_doc"))
      val dims = t(s, d, "embeddings")
        .agg(F.count(F.lit(1)).as("vecs_total"),
          F.min(F.size(F.col("embedding")).cast("long")).as("dim_min"),
          F.max(F.size(F.col("embedding")).cast("long")).as("dim_max"),
          F.sum(F.expr(
            "CASE WHEN size(embedding) != 64 THEN 1L ELSE 0L END"))
            .as("bad_dim_vecs"),
          F.sum(F.expr("CASE WHEN exists(embedding, " +
            "x -> x IS NULL OR isnan(x)) THEN 1L ELSE 0L END"))
            .as("bad_component_vecs"))
      a.crossJoin(b).crossJoin(dims)
        .select("docs_total", "vecs_total", "docs_without_vec",
          "vecs_without_doc", "dim_min", "dim_max", "bad_dim_vecs",
          "bad_component_vecs")
    },
    Some("""
      WITH dk AS (SELECT DISTINCT doc_id FROM documents),
      ek AS (SELECT DISTINCT vec_id FROM embeddings),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS docs_total,
               CAST(sum(CASE WHEN e.vec_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_without_vec
        FROM dk d LEFT JOIN ek e ON d.doc_id = e.vec_id),
      b AS (
        SELECT CAST(sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS vecs_without_doc
        FROM ek e LEFT JOIN dk d ON d.doc_id = e.vec_id),
      dims AS (
        SELECT CAST(count(*) AS BIGINT) AS vecs_total,
               CAST(min(len(embedding)) AS BIGINT) AS dim_min,
               CAST(max(len(embedding)) AS BIGINT) AS dim_max,
               CAST(sum(CASE WHEN len(embedding) != 64 THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_dim_vecs,
               CAST(sum(CASE WHEN len(list_filter(embedding,
                      x -> x IS NULL OR isnan(x))) > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_component_vecs
        FROM embeddings)
      SELECT docs_total, vecs_total, docs_without_vec, vecs_without_doc,
             dim_min, dim_max, bad_dim_vecs, bad_component_vecs
      FROM a, b, dims"""))

  val all: Seq[QueryDef] = Seq(corpusDatacard, timeSplitAudit,
    embedCoverage)
}
