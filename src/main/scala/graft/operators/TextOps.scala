package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Text-analysis operators for LLM-pipeline data prep: tokenization,
  * shingling, language ID, quality scoring, n-gram stats.
  *
  * All operators are single-pass narrow transforms (no shuffle) except
  * the n-gram frequency count (one shuffle on the gram key) — at 100 TB
  * each stays embarrassingly parallel over input splits.
  */
object TextOps {

  /** Whitespace word tokens, lowercased. */
  def tokens(text: Column): Column = F.split(F.lower(text), " +")

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token array
    * column. Guarded sequence: Spark's sequence(0, negative) would
    * DESCEND. Callers must project the token array first ([[shingleDocs]])
    * — inlining `split()` here makes Catalyst re-split the text once per
    * element reference, turning shingling O(len·shingles). */
  def shinglesOf(toks: Column, n: Int): Column =
    F.when(F.size(toks) >= n,
      F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        i => F.concat_ws(" ", (0 until n).map(k => F.element_at(toks, i + k + 1)): _*)))
      .otherwise(F.array())

  /** Word n-gram shingles of a text column (materializes tokens). */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** (doc_id, shingle) distinct pairs with tokens materialized once per
    * row (the Generate node keeps the token projection from collapsing
    * back into per-element re-splits). */
  def shingleDocs(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(F.col(idCol).as("doc_id"), tokens(F.col(textCol)).as("_toks"))
      .select(F.col("doc_id"),
        F.explode(F.array_distinct(shinglesOf(F.col("_toks"), n))).as("shingle"))

  /** Marker-stopword language-ID heuristic: count language-specific
    * marker tokens; predict the argmax, 'unknown' when none hit.
    * Deterministic tie-break by the order below. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "les", "des"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "una"))

  def markerCount(text: Column, markers: Seq[String]): Column =
    F.size(F.filter(tokens(text), t => markers.map(m => t === m).reduce(_ || _)))

  def langId(text: Column): Column = {
    val counts = langMarkers.map { case (lang, ms) => lang -> markerCount(text, ms) }
    val best = counts.map(_._2).reduce((a, b) => F.greatest(a, b))
    counts.foldRight(F.lit("unknown"): Column) { case ((lang, cnt), els) =>
      F.when(cnt > 0 && cnt === best, F.lit(lang)).otherwise(els)
    }
  }

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Linear quality score in [0,1]-ish: stopword ratio + punctuation
    * ratio + length saturation. Deliberately transcendental-free so the
    * score is bit-identical across engines (exp/log differ by ULPs
    * between libm implementations; + * / do not). */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTokens = F.size(toks).cast("long")
    val nStop = F.size(F.filter(toks, t => stopwords.map(m => t === m).reduce(_ || _))).cast("long")
    val nPunct = F.regexp_count(text, F.lit("[.,!?;]")).cast("long")
    val nChars = F.length(text).cast("long")
    val stopRatio = nStop.cast("double") / nTokens
    val punctRatio = nPunct.cast("double") / nChars
    val lenSat = F.least(nTokens.cast("double") / 100.0, F.lit(1.0))
    Seq(
      "n_tokens" -> nTokens,
      "n_stop" -> nStop,
      "n_punct" -> nPunct,
      "stop_ratio" -> F.round(stopRatio, 6),
      "quality" -> F.round(stopRatio * 0.5 + punctRatio * 0.3 + lenSat * 0.2, 6))
  }

  /** Top-k word n-grams by frequency across a corpus (one shuffle). */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(tokens(F.col(textCol)).as("_toks"))
      .select(F.explode(shinglesOf(F.col("_toks"), n)).as("gram"))
      .groupBy("gram").agg(F.count(F.lit(1)).as("freq"))
      .orderBy(F.col("freq").desc, F.col("gram"))
      .limit(k)

  /** GPT-2-style pretokenizer regex, restricted to the Java∩RE2
    * dialect: a pretoken is an optional leading space followed by a
    * letter run, a digit run, or a punctuation run. This is the
    * deterministic "BPE-ish" token count — real BPE merges only ever
    * split WITHIN pretokens, so the pretoken count upper-bounds and
    * tracks the trained-tokenizer count far better than chars/4. */
  val pretokenPattern: String = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Per-document pretokenization stats: BPE-ish pretoken count, the
    * whitespace count for comparison, and the first `headK` pretokens
    * (bounded slice, not the whole doc re-materialized). Pure narrow
    * map — one scan, no shuffle. */
  def pretokenize(docs: DataFrame, idCol: String, textCol: String,
      headK: Int = 10): DataFrame = {
    val text = F.col(textCol)
    docs.select(
      F.col(idCol),
      F.regexp_count(text, F.lit(pretokenPattern)).cast("long").as("n_pretokens"),
      F.size(tokens(text)).cast("long").as("n_ws_tokens"),
      F.slice(F.regexp_extract_all(text, F.lit(pretokenPattern), F.lit(0)),
        1, headK).as("head_pretokens"))
  }

  /** Floor of log2 of a positive LONG, computed EXACTLY as
    * `length(bin(x)) − 1` (number of binary digits minus one) — integer
    * string ops, no floating-point log, so the value is bit-identical
    * in every engine with a binary formatter (Spark `bin`, DuckDB
    * `bin`). */
  def floorLog2(c: Column): Column =
    (F.length(F.bin(c)) - 1).cast("long")

  /** Unigram surprisal proxy — a perplexity-style quality score without
    * a trained LM: per document, the mean over tokens of
    * `floor(log2 N) − floor(log2 count(term))`, where counts come from
    * the corpus itself. Rare-token-heavy docs (typos, boilerplate soup,
    * non-language noise) score HIGH; stopword soup scores LOW — the
    * standard cheap both-tails filter.
    *
    * Integer surprisals make the score transcendental-free (the one
    * division is a per-row double op — bit-portable), so the DuckDB
    * oracle hash-matches exactly; a float log2 would drift by ULPs
    * across libm implementations.
    *
    * Scale shape: one explode into a (doc, term) tf aggregate; that
    * frame is PERSISTED (it feeds both the vocabulary re-aggregate and
    * the scoring join — without the cache the broadcast build side
    * recomputes it from a second corpus scan); per-term scoring is one
    * join on the term key weighted by tf; the corpus-total rides a
    * one-row broadcast. No driver-side state; release via
    * [[CacheScope.release]] after the consuming action. */
  def surprisalProxy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = CacheScope.persist(docs
      .select(F.col(idCol).as("doc_id"), tokens(F.col(textCol)).as("_toks"))
      .select(F.col("doc_id"), F.explode(F.col("_toks")).as("term"))
      .groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("tf")))
    val termCounts = tf.groupBy("term").agg(F.sum("tf").as("_c"))
    val total = termCounts.agg(F.sum("_c").as("_total"))
    tf
      .join(termCounts, "term")
      .crossJoin(F.broadcast(total))
      .select(F.col("doc_id"), F.col("tf"),
        (floorLog2(F.col("_total")) - floorLog2(F.col("_c"))).as("_s"))
      .groupBy("doc_id")
      .agg(
        F.sum("tf").as("n_tokens"),
        F.round(F.sum(F.col("tf") * F.col("_s")).cast("double") / F.sum("tf"), 6)
          .as("mean_surprisal"))
  }

  /** Bigram-LM surprisal — the conditional upgrade of
    * [[surprisalProxy]]: per document, the mean over bigram instances
    * of `floorLog2(ctx(u)) − floorLog2(c(u v))`, the integer-log2 image
    * of −log p(v|u) with p estimated from the corpus itself
    * (ctx(u) = Σ_v c(u v), so probabilities are self-consistent and
    * every document bigram has corpus count ≥ 1 — no backoff case).
    * A KenLM-style quality score without a trained LM: conditional
    * surprisal separates "rare words" from "rare word ORDER", which is
    * the actual signal for word-salad and boilerplate-soup filtering.
    * Transcendental-free (floorLog2 = binary digit count), so scores
    * are bit-identical across engines.
    *
    * Scale shape: one explode + (doc, bigram) map-side-combined
    * aggregate; corpus bigram counts and context counts are two
    * re-aggregates of that index (persisted — three consumers); the
    * final rejoin carries distinct (doc, bigram) rows. Documents with
    * < 2 tokens have no bigrams and are absent. */
  def surprisalBigram(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf2 = CacheScope.persist(docs
      .select(F.col(idCol).as("doc_id"), tokens(F.col(textCol)).as("_toks"))
      .select(F.col("doc_id"), F.explode(shinglesOf(F.col("_toks"), 2)).as("bigram"))
      .groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).as("tf")))
    val c2 = CacheScope.persist(
      tf2.groupBy("bigram").agg(F.sum("tf").as("_c2")))
    val ctx = c2
      .select(F.split(F.col("bigram"), " ").getItem(0).as("_u"), F.col("_c2"))
      .groupBy("_u").agg(F.sum("_c2").as("_cctx"))
    tf2
      .join(c2, "bigram")
      .withColumn("_u", F.split(F.col("bigram"), " ").getItem(0))
      .join(ctx, "_u")
      .groupBy("doc_id")
      .agg(
        F.sum("tf").as("n_bigrams"),
        F.round(
          F.sum(F.col("tf") * (floorLog2(F.col("_cctx")) - floorLog2(F.col("_c2"))))
            .cast("double") / F.sum("tf"), 6).as("mean_surprisal2"))
  }

  /** Tokenizer-prep vocabulary build: the top-V corpus terms by
    * frequency with contiguous ids assigned in (freq DESC, term ASC)
    * order — ties broken lexically so the id assignment is
    * deterministic across runs and engines.
    *
    * Scale shape: the corpus side is one explode + one map-side-combined
    * aggregate on the term key; `orderBy().limit(V)` plans as
    * TakeOrderedAndProject (a per-partition top-V heap + driver merge of
    * V-row slices — never a global sort of the vocabulary); the
    * row_number window then runs on the V retained rows only (vocab is
    * metadata-sized: 32k–1M rows, not corpus-sized). */
  def vocabBuild(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(tokens(F.col(textCol)).as("_toks"))
      .select(F.explode(F.col("_toks")).as("term"))
      .groupBy("term").agg(F.count(F.lit(1)).as("freq"))
      .orderBy(F.col("freq").desc, F.col("term"))
      .limit(size)
    counts.withColumn("token_id",
      F.row_number().over(
        Window.orderBy(F.col("freq").desc, F.col("term"))).cast("long"))
      .select("token_id", "term", "freq")
  }

  /** Zipf rank-frequency slope over the top-V vocabulary — the classic
    * one-number naturalness check for a corpus (natural language sits
    * near −1 on the log-log rank/frequency line; machine-generated or
    * template-heavy corpora flatten or step). Slope = the least-squares
    * fit of ⌊log₂ freq⌋ against ⌊log₂ rank⌋: with the integer floors
    * ([[floorLog2]]) every regression sum is EXACT long arithmetic and
    * the single closing division is one double op — bit-portable where
    * a float log would drift by ULPs.
    *
    * Scale shape: rides [[vocabBuild]] (one map-side-combined term
    * aggregate + a per-partition top-V heap); the regression runs over
    * the V retained rows only — metadata-sized, never the corpus. */
  def zipfSlope(docs: DataFrame, textCol: String, topV: Int = 100): DataFrame = {
    val vocab = vocabBuild(docs, textCol, topV)
    val x = floorLog2(F.col("token_id"))
    val y = floorLog2(F.col("freq"))
    vocab.agg(
      F.count(F.lit(1)).as("n_terms"),
      F.sum("freq").as("top_tokens"),
      F.sum(x).as("_sx"), F.sum(y).as("_sy"),
      F.sum(x * y).as("_sxy"), F.sum(x * x).as("_sxx"))
      .select(
        F.col("n_terms"), F.col("top_tokens"),
        F.when(
          F.col("n_terms") * F.col("_sxx") - F.col("_sx") * F.col("_sx") =!= 0L,
          F.round(
            (F.col("n_terms") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
              .cast("double") /
              (F.col("n_terms") * F.col("_sxx") - F.col("_sx") * F.col("_sx")), 6))
          .as("zipf_slope"))
  }

  /** Per-document top-k TF-IDF keywords. One explode; document
    * frequencies come from re-aggregating the (doc, term) tf frame (no
    * second corpus scan); the doc count rides a one-row broadcast; the
    * per-doc top-k is the bounded-heap `top_k` aggregate — k terms per
    * doc cross the final shuffle, never a doc's full vocabulary sorted.
    * The idf is the rational Robertson form (N − df + ½)/(df + ½) —
    * transcendental-free, so scores are bit-identical across engines
    * (same trick as the BM25 operator). Ties break by term DESC (the
    * heap's struct ordering), mirrored in the oracle. */
  def keywordsTfIdf(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    val tf = docs
      .select(F.col(idCol).as("doc_id"), tokens(F.col(textCol)).as("_toks"))
      .select(F.col("doc_id"), F.explode(F.col("_toks")).as("term"))
      .groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val nDocs = docs.agg(F.count(F.lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(F.broadcast(nDocs))
      .withColumn("score", F.round(
        F.col("tf") * ((F.col("n_docs") - F.col("df") + F.lit(0.5)) /
          (F.col("df") + F.lit(0.5))), 6))
    scored.groupBy("doc_id").agg(
      F.transform(
        graft.functions.TopKFunctions.topK(
          F.struct(F.col("score"), F.col("term")), k),
        x => x.getField("term")).as("keywords"),
      F.max("score").as("top_score"))
  }
}
