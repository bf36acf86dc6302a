package graft.queries

import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-33 inventory (r6): readability and character-composition
  * screens — the Flesch–Kincaid grade proxy (a standard corpus-quality
  * feature: too-low and too-high grades both correlate with junk) and
  * the per-source character-class profile (the "is this source full of
  * digits/punctuation noise" composition table). Both are pure per-row
  * regex/length counting (codegen'd, no shuffle before the final
  * bounded aggregate) with exact integer counts and one closing double
  * formula at 6dp.
  */
object ReadabilityQueries {

  // ---------------------------------------------------------------- E61
  /** Flesch–Kincaid grade proxy per document: words = whitespace
    * tokens, sentences = [.!?]+ runs (min 1), syllables = vowel-group
    * runs (the standard cheap estimator) — FK = 0.39·(words/sentences)
    * + 11.8·(syllables/words) − 15.59 from exact integer counts.
    * Grade published at 6dp beside its inputs so downstream filters
    * can re-threshold without recomputing. */
  private val readingLevel = QueryDef(
    "reading_level",
    (s, d) => {
      t(s, d, "documents")
        .select(F.col("doc_id"),
          F.expr("CAST(size(filter(split(lower(text), ' +'), " +
            "x -> x != '')) AS BIGINT)").as("words"),
          F.expr("CAST(greatest(size(regexp_extract_all(text, " +
            "'[.!?]+', 0)), 1) AS BIGINT)").as("sentences"),
          F.expr("CAST(size(regexp_extract_all(lower(text), " +
            "'[aeiouy]+', 0)) AS BIGINT)").as("syllables"))
        .where(F.col("words") > 0)
        .withColumn("fk_grade", F.expr(
          "round(0.39 * (CAST(words AS DOUBLE) / sentences) + " +
            "11.8 * (CAST(syllables AS DOUBLE) / words) - 15.59, 6)"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, words, sentences, syllables,
             round(0.39 * (CAST(words AS DOUBLE) / sentences) +
                   11.8 * (CAST(syllables AS DOUBLE) / words)
                   - 15.59, 6) AS fk_grade
      FROM (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(lower(text),
                 ' +'), x -> x != '')) AS BIGINT) AS words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS syllables
        FROM documents)
      WHERE words > 0 ORDER BY doc_id"""))

  // ---------------------------------------------------------------- E62
  /** Character-class composition per source: alpha/digit/whitespace/
    * other shares in exact ppm from integer class counts (counted by
    * stripping the complement class — one regexp_replace + length per
    * class, no explode). The "which source is digit/symbol noise"
    * routing table. */
  private val charclassProfile = QueryDef(
    "charclass_profile",
    (s, d) => {
      t(s, d, "documents")
        .select(F.col("source"),
          F.length(F.col("text")).cast("long").as("n"),
          F.expr("CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) " +
            "AS BIGINT)").as("alpha"),
          F.expr("CAST(length(regexp_replace(text, '[^0-9]', '')) " +
            "AS BIGINT)").as("digit"),
          F.expr("CAST(length(regexp_replace(text, '[^ \\t\\n]', '')) " +
            "AS BIGINT)").as("ws"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("n").as("chars"),
          F.expr("CAST(CAST(sum(alpha) AS DECIMAL(38,0)) * 1000000 div " +
            "sum(n) AS BIGINT)").as("alpha_ppm"),
          F.expr("CAST(CAST(sum(digit) AS DECIMAL(38,0)) * 1000000 div " +
            "sum(n) AS BIGINT)").as("digit_ppm"),
          F.expr("CAST(CAST(sum(ws) AS DECIMAL(38,0)) * 1000000 div " +
            "sum(n) AS BIGINT)").as("ws_ppm"),
          F.expr("CAST(CAST(sum(n) - sum(alpha) - sum(digit) - sum(ws) " +
            "AS DECIMAL(38,0)) * 1000000 div sum(n) AS BIGINT)")
            .as("other_ppm"))
        .orderBy("source")
    },
    Some("""
      WITH c AS (
        SELECT source, CAST(length(text) AS BIGINT) AS n,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    AS BIGINT) AS alpha,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS digit,
               CAST(length(regexp_replace(text, '[^ \t\n]', '', 'g'))
                    AS BIGINT) AS ws
        FROM documents)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS chars,
             CAST(CAST(sum(alpha) AS HUGEINT) * 1000000 // sum(n)
                  AS BIGINT) AS alpha_ppm,
             CAST(CAST(sum(digit) AS HUGEINT) * 1000000 // sum(n)
                  AS BIGINT) AS digit_ppm,
             CAST(CAST(sum(ws) AS HUGEINT) * 1000000 // sum(n)
                  AS BIGINT) AS ws_ppm,
             CAST(CAST(sum(n) - sum(alpha) - sum(digit) - sum(ws)
                       AS HUGEINT) * 1000000 // sum(n)
                  AS BIGINT) AS other_ppm
      FROM c GROUP BY source ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(readingLevel, charclassProfile)
}
