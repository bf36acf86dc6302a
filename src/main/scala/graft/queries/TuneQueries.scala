package graft.queries

import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-28 inventory (r6): curation-knob tuning sweeps — the queries a
  * data team runs BEFORE fixing a pipeline's thresholds: tokenizer
  * fertility per cohort (which tokenizer fits which language mix),
  * the length-filter retention curve (what each minimum-length cut
  * costs), and the dedup band-threshold sweep (how aggressive the
  * LSH verdict should be). Each sweep explodes a FIXED knob ladder
  * (bounded ×8/×4 blowup) over an already-aggregated or staged frame —
  * never a re-scan per knob value, which is the anti-pattern these
  * queries exist to replace at 100 TB.
  */
object TuneQueries {

  // ---------------------------------------------------------------- E59
  /** Tokenizer fertility per (lang, source): characters per token in
    * exact ppm — the number that picks a tokenizer for a corpus mix
    * (fertility ≫ expected means the vocab fragments this cohort).
    * One narrow projection (token count is a per-row array length) and
    * one map-side-combined aggregate. */
  private val tokenizerFertility = QueryDef(
    "tokenizer_fertility",
    (s, d) => {
      t(s, d, "documents")
        .select(F.col("lang"), F.col("source"),
          F.length(F.col("text")).cast("long").as("chars"),
          F.size(F.array_remove(
            graft.operators.TextOps.tokens(F.col("text")), ""))
            .cast("long").as("toks"))
        .where(F.col("toks") > 0)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("chars").as("total_chars"),
          F.sum("toks").as("total_tokens"))
        .withColumn("fertility_ppm",
          F.expr("CAST(CAST(total_chars AS DECIMAL(38,0)) * 1000000 div " +
            "total_tokens AS BIGINT)"))
        .orderBy("lang", "source")
    },
    Some("""
      WITH tk AS (
        SELECT lang, source, CAST(length(text) AS BIGINT) AS chars,
               CAST(len(list_filter(
                 regexp_split_to_array(lower(text), ' +'),
                 x -> x != '')) AS BIGINT) AS toks
        FROM documents)
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(chars) AS BIGINT) AS total_chars,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             CAST(CAST(sum(chars) AS HUGEINT) * 1000000 // sum(toks)
                  AS BIGINT)
               AS fertility_ppm
      FROM tk WHERE toks > 0
      GROUP BY lang, source ORDER BY lang, source"""))

  // ---------------------------------------------------------------- E60
  /** Length-filter retention curve: for a fixed ladder of minimum
    * n_chars thresholds, the documents / characters retained and the
    * retained share in ppm — the sweep behind "what does min_length=N
    * actually cost". The ladder explodes over the PER-DOC frame (×8
    * bounded blowup), then one grouped aggregate; totals broadcast
    * back for shares. */
  private val lengthFilterSweep = QueryDef(
    "length_filter_sweep",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(F.col("n_chars"))
      val tot = docs.agg(F.count(F.lit(1)).as("tn"),
        F.sum("n_chars").as("tc"))
      docs
        .select(F.col("n_chars"), F.explode(F.expr(
          "array(0L, 50L, 100L, 200L, 400L, 800L, 1600L, 3200L)"))
          .as("min_chars"))
        .where(F.col("n_chars") >= F.col("min_chars"))
        .groupBy("min_chars")
        .agg(F.count(F.lit(1)).as("docs_kept"),
          F.sum("n_chars").as("chars_kept"))
        .crossJoin(F.broadcast(tot))
        .select(F.col("min_chars"), F.col("docs_kept"),
          F.col("chars_kept"),
          F.expr("docs_kept * 1000000L div tn").as("doc_share_ppm"),
          F.expr("CAST(CAST(chars_kept AS DECIMAL(38,0)) * 1000000 " +
            "div tc AS BIGINT)").as("char_share_ppm"))
        .orderBy("min_chars")
    },
    Some("""
      WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS tn,
                          CAST(sum(n_chars) AS BIGINT) AS tc
                   FROM documents),
      sw AS (
        SELECT m AS min_chars, CAST(count(*) AS BIGINT) AS docs_kept,
               CAST(sum(n_chars) AS BIGINT) AS chars_kept
        FROM documents,
             unnest([0, 50, 100, 200, 400, 800, 1600, 3200]) AS u(m)
        WHERE n_chars >= m GROUP BY m)
      SELECT CAST(min_chars AS BIGINT) AS min_chars, docs_kept, chars_kept,
             CAST(docs_kept * 1000000 // tn AS BIGINT) AS doc_share_ppm,
             CAST(CAST(chars_kept AS HUGEINT) * 1000000 // tc AS BIGINT)
               AS char_share_ppm
      FROM sw, tot ORDER BY min_chars"""))

  // ---------------------------------------------------------------- D35
  /** Dedup band-threshold sweep over the STAGED minhash candidate
    * graph: for each minimum band-collision count b ∈ 1..4, the pairs
    * retained and distinct documents implicated — the "how aggressive
    * should the near-dup verdict be" tuning table, computed from the
    * checkpointed pair graph without re-banding the corpus. */
  private val dedupThresholdSweep = QueryDef(
    "dedup_threshold_sweep",
    (s, d) => {
      val pairs = Staged.minhashPairs(s, d)
      pairs
        .select(F.col("doc_a"), F.col("doc_b"), F.col("n_bands"),
          F.explode(F.expr("sequence(1L, 4L)")).as("min_bands"))
        .where(F.col("n_bands") >= F.col("min_bands"))
        .groupBy("min_bands")
        .agg(F.count(F.lit(1)).as("n_pairs"),
          F.expr("CAST(count(DISTINCT doc_a) + count(DISTINCT doc_b) " +
            "AS BIGINT)").as("docs_touched_ub"))
        .orderBy("min_bands")
    },
    Some(s"""WITH ${PipelineQueries.minhashCtesSqlShared}
      SELECT m AS min_bands, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT doc_a) + count(DISTINCT doc_b)
                  AS BIGINT) AS docs_touched_ub
      FROM mh_pairs, unnest(generate_series(1, 4)) AS u(m)
      WHERE n_bands >= m GROUP BY m ORDER BY min_bands"""))

  val all: Seq[QueryDef] = Seq(tokenizerFertility, lengthFilterSweep,
    dedupThresholdSweep)
}
