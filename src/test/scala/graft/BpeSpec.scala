package graft

import graft.operators.{Bpe, Curation}
import org.apache.spark.sql.{functions => F}

/** BPE training primitives (E36) on the classic Sennrich corpus with
  * hand-computed merges, plus DSIR importance weights (E35) on a
  * constructed two-domain corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. 2016 §3.2 example vocabulary:
  //   low×5  lower×2  newest×6  widest×3
  private lazy val sennrich = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)).toDF("doc_id", "text")

  test("train: four hand-computed merges on the Sennrich corpus") {
    // r1: "e s"=9 ties "s t"=9 → lexical break picks (e,s)
    // r2: (es,t)=9; r3: "l o"=7 ties "o w"=7 → (l,o); r4: (lo,w)=7
    val merges = Bpe.train(sennrich, "text", rounds = 4)
    assert(merges == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("train: stops early when no pairs remain") {
    val d = Seq((1L, "ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); the word is then one symbol → no pairs
    assert(Bpe.train(d, "text", rounds = 10) == Seq((1, "a", "b", 1L)))
  }

  test("symbols: greedy left-to-right, 'aaa' under (a,a) → [aa, a]") {
    val d = Seq("aaa").toDF("word")
    val r = d.select(Bpe.symbols(F.col("word"), Seq(("a", "a"))))
      .as[Seq[String]].head()
    assert(r == Seq("aa", "a"))
  }

  test("symbols: chained merges apply in order") {
    val d = Seq("newest").toDF("word")
    val r = d.select(Bpe.symbols(F.col("word"),
      Seq(("e", "s"), ("es", "t"), ("n", "e")))).as[Seq[String]].head()
    assert(r == Seq("ne", "w", "est"))
  }

  test("pairCounts: weighted by word frequency") {
    val wf = Bpe.wordFreq(sennrich, "text")
    val counts = Bpe.pairCounts(wf, Nil)
      .as[(String, Long)].collect().toMap
    assert(counts("e s") == 9L && counts("s t") == 9L &&
      counts("l o") == 7L && counts("w e") == 8L)
  }

  // ------------------------------------------------------------- DSIR

  test("dsir: target-like docs outscore off-domain docs") {
    // target domain (tgt=true) speaks only "alpha beta"; the pool also
    // holds "zeta eta" docs. A doc of target bigrams must carry a
    // higher avg log2 importance weight than an off-domain doc.
    val docs = (
      (1 to 8).map(i => (i.toLong, ("alpha beta " * 4).trim, true)) ++
        (9 to 16).map(i => (i.toLong, ("zeta eta " * 4).trim, false)) :+
        (17L, ("alpha beta " * 4).trim, false))
      .toDF("doc_id", "text", "is_tgt")
    val w = Curation.dsirWeights(docs, "doc_id", "text",
      targetCol = F.col("is_tgt"), buckets = 64)
      .select("doc_id", "avg_log2").as[(Long, Double)].collect().toMap
    assert(w(17L) > w(9L)) // target-like pool doc beats off-domain doc
    assert(w(1L) == w(17L)) // same text → same weight regardless of flag
  }

  test("dsir: n_feats is the doc's bigram count") {
    val docs = Seq((1L, "a b c d e", true)).toDF("doc_id", "text", "t")
    val r = Curation.dsirWeights(docs, "doc_id", "text", F.col("t"), 64)
      .select("n_feats").as[Long].head()
    assert(r == 4L) // 5 tokens → 4 bigrams (collisions preserve the sum)
  }
}
