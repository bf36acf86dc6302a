package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Distributed BPE tokenizer training primitives (Sennrich et al. 2016,
  * arXiv:1508.07909) — the corpus-side half of tokenizer prep that a
  * training-data engine owns (the reference's data layer stops at
  * validation; byte-pair counting is the standard next step after
  * [[TextOps.vocabBuild]]-style frequency tables).
  *
  * Scale discipline: the CORPUS is scanned once, into a word-frequency
  * table (one shuffle on the word key, map-side combined). Every merge
  * round then iterates over the VOCABULARY (millions of rows at
  * web scale, not the corpus's trillions of tokens) — the classic BPE
  * trick, preserved distributed. Per round the only driver traffic is
  * the single winning pair (one `limit(1)` collect,
  * TakeOrderedAndProject — never a full sort).
  */
object Bpe {

  /** Corpus word-frequency table: ONE corpus scan + one map-side
    * combined shuffle on the word key. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(F.explode(TextOps.tokens(F.col(textCol))).as("word"))
      .where(F.length(F.col("word")) > 0)
      .groupBy("word").agg(F.count(F.lit(1)).as("freq"))

  /** Symbol sequence of a word after applying `merges` in order. Starts
    * from single characters; each merge (a,b) is one greedy
    * left-to-right pass (a fold over the symbol array), so "aaa" under
    * (a,a) becomes ["aa","a"] — standard BPE application semantics.
    * The empty-string guard strips the trailing "" Java's limit=-1
    * regex split appends. */
  def symbols(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = F.filter(F.split(word, ""), s => s =!= "")
    merges.foldLeft(chars) { case (arr, (a, b)) =>
      F.aggregate(arr, F.array().cast("array<string>"),
        (acc, x) =>
          F.when(F.size(acc) > 0 &&
              F.element_at(acc, -1) === F.lit(a) && x === F.lit(b),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
              F.array(F.lit(a + b))))
            .otherwise(F.concat(acc, F.array(x))))
    }
  }

  /** Adjacent-symbol pair frequencies over the (already aggregated)
    * word-frequency table, weighted by word frequency — the per-round
    * counting step. Pair key is "left right" (space-joined; BPE symbols
    * never contain spaces because words are whitespace tokens). */
  def pairCounts(wordFreq: DataFrame, merges: Seq[(String, String)]): DataFrame =
    wordFreq
      .select(symbols(F.col("word"), merges).as("_sy"), F.col("freq"))
      .select(F.explode(TextOps.shinglesOf(F.col("_sy"), 2)).as("pair"),
        F.col("freq"))
      .groupBy("pair").agg(F.sum("freq").as("cnt"))

  /** Train `rounds` BPE merges: per round, count pairs over the vocab
    * and take the most frequent (ties broken lexically so training is
    * deterministic — reference BPE implementations that break ties by
    * insertion order are not reproducible across partitionings).
    * Returns (rank, left, right, count). Driver traffic: one row per
    * round. The word-freq table is persisted across rounds (each round
    * re-derives symbols from scratch — recomputing k aggregate folds
    * over the vocab beats materializing a new symbol column per round,
    * which would write the vocab k times). */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[(Int, String, String, Long)] = {
    val wf = CacheScope.persist(wordFreq(docs, textCol))
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var merges = Vector.empty[(String, String)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val top = pairCounts(wf, merges)
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0).split(" ", 2)
        out += ((r + 1, pair(0), pair(1), top(0).getLong(1)))
        merges :+= ((pair(0), pair(1)))
        r += 1
      }
    }
    out.result()
  }
}
