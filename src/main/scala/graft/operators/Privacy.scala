package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** PII scrubbing for LLM training corpora: regex-redact well-known
  * identifier shapes (emails, IPv4 addresses, phone-like digit runs)
  * and report per-document redaction counts.
  *
  * Scale shape: a pure narrow map — one scan, zero shuffles, fully
  * codegen'd `regexp_replace`/`regexp_count` per row. At 100 TB this is
  * embarrassingly parallel over input splits; regex cost is linear in
  * text bytes.
  *
  * Pattern portability: the patterns below restrict themselves to the
  * regex intersection of Java (Spark) and RE2-style (DuckDB) dialects —
  * character classes, bounded repetition, alternation; no backrefs or
  * lookaround — so the DuckDB oracle applies the IDENTICAL pattern
  * strings (see the `pii_redact` query).
  */
object Privacy {

  /** (name, pattern, replacement token). Order matters: email first so
    * its digits aren't half-eaten by the phone pattern. */
  val defaultPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b", "<PHONE>"))

  /** Redact every pattern in sequence; emit the scrubbed text plus one
    * count column per pattern (`n_<name>`) and the total `n_pii`. */
  def redactPii(
      docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[(String, String, String)] = defaultPatterns): DataFrame = {
    val text = F.col(textCol)
    val counts = patterns.map { case (name, pat, _) =>
      name -> F.regexp_count(text, F.lit(pat)).cast("long")
    }
    val redacted = patterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      F.regexp_replace(c, pat, repl)
    }
    docs.select(
      Seq(F.col(idCol), redacted.as("clean_text")) ++
        counts.map { case (n, c) => c.as(s"n_$n") } :+
        counts.map(_._2).reduce(_ + _).as("n_pii"): _*)
  }

  /** k-anonymity audit over a quasi-identifier tuple: every equivalence
    * class (distinct quasi-identifier combination) with its population
    * and whether it meets the k threshold — classes below k are the
    * re-identification risk a release must suppress or generalize
    * [Sweeney 2002].
    *
    * Scale shape: ONE map-side-combined aggregate on the quasi-id tuple
    * (class cardinality ≪ rows by construction — that is what makes
    * them quasi-identifiers); the flag is a pure projection. At 100 TB
    * the output is still only the class table. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    df.groupBy(quasiCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"))
      .withColumn("k_anonymous",
        F.when(F.col("n") >= k, 1L).otherwise(0L))
      .orderBy(quasiCols.map(F.col): _*)
  }
}
