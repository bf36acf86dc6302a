package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Properties of the D81 longest-duplicated-span ladder
  * ([[Dedup.spanLadder]]):
  *
  *  - monotone flags (a THEOREM for exact windows): a corpus-
  *    duplicated w-window contains duplicated w'-windows for every
  *    ladder width w' < w, so dup_w40 > 0 ⇒ dup_w20 > 0 ⇒ … ⇒
  *    dup_w5 > 0 — any violation means the hashing/rollup broke;
  *  - doubled corpus: unioning the corpus with an id-shifted copy
  *    makes EVERY window corpus-duplicated, so every doc's max_dup_w
  *    must equal the largest ladder width it has windows at, dup
  *    counts must equal window counts, and no doc may be 'keep';
  *  - decision thresholds partition exactly on max_dup_w.
  */
class DedupSpanLadderSpec extends SparkSpec {

  private val WS = Seq(5, 10, 20, 40)

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  test("ladder duplication flags are monotone in w") {
    val out = Dedup.spanLadder(docs, "doc_id", "text", WS, dropW = 20)
    val bad = out.where(
      (col("dup_w40") > 0 && col("dup_w20") === 0) ||
        (col("dup_w20") > 0 && col("dup_w10") === 0) ||
        (col("dup_w10") > 0 && col("dup_w5") === 0))
    assert(bad.count() == 0, "a wide duplicated span must imply " +
      "duplicated narrow windows inside it")
    // and the corpus actually exercises all three decisions
    val decisions = out.select("decision").distinct()
      .collect().map(_.getString(0)).toSet
    assert(decisions == Set("keep", "cut", "drop"),
      s"expected all three decisions in the planted corpus: $decisions")
  }

  test("a doubled corpus dupes every window: max_dup_w = widest " +
    "populated rung, dup counts = window counts, nobody keeps") {
    val doubled = docs.unionAll(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val out = Dedup.spanLadder(doubled, "doc_id", "text", WS, dropW = 20)
      .where(col("doc_id") < 1000000L)
    // every original doc has ≥10 tokens, so w=5 windows always exist
    assert(out.where(col("decision") === "keep").count() == 0)
    assert(out.where(col("dup_w5") =!= col("n_w5")).count() == 0,
      "every base window must be flagged duplicated")
    // cross-check max_dup_w against token counts computed independently
    val toks = docs.select(col("doc_id"),
      size(split(lower(col("text")), " +")).as("n_toks"))
    val joined = out.join(toks, "doc_id")
    val wrong = joined.where(
      col("max_dup_w") =!= when(col("n_toks") >= 40, 40)
        .when(col("n_toks") >= 20, 20)
        .when(col("n_toks") >= 10, 10)
        .when(col("n_toks") >= 5, 5).otherwise(0))
    assert(wrong.count() == 0,
      "max_dup_w must be the widest rung the doc has windows at")
  }

  test("decision partitions exactly on max_dup_w thresholds") {
    val out = Dedup.spanLadder(docs, "doc_id", "text", WS, dropW = 20)
    assert(out.where(
      (col("decision") === "drop" && col("max_dup_w") < 20) ||
        (col("decision") === "cut" &&
          (col("max_dup_w") === 0 || col("max_dup_w") >= 20)) ||
        (col("decision") === "keep" && col("max_dup_w") =!= 0))
      .count() == 0)
    // dup_at_max is the dup count of the max rung, never larger than
    // that rung's window total
    assert(out.where(col("max_dup_w") === 0 && col("dup_at_max") =!= 0)
      .count() == 0)
    assert(out.where(col("max_dup_w") > 0 && col("dup_at_max") <= 0)
      .count() == 0)
  }
}
