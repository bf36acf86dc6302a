package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Corpus-curation operators for LLM training-data prep: heuristic
  * quality gates (Gopher-style rule sets), repetition metrics,
  * benchmark-contamination screening, token-budget sequence packing and
  * domain-mixture rebalancing.
  *
  * Scale shape, per operator:
  *  - [[qualityRules]] — pure narrow map (codegen, one scan, no shuffle).
  *  - [[repetitionStats]] — one explode + two partial-aggregated
  *    shuffles keyed on (doc, gram) then doc; state per group is a
  *    handful of longs, never a list.
  *  - [[contamination]] — benchmark n-gram set is broadcast (eval sets
  *    are tiny relative to a 100 TB corpus); the corpus side stays a
  *    narrow explode + one doc-keyed aggregate.
  *  - [[packBins]] — the classic scale trap here is a GLOBAL running sum
  *    (single-partition window). We shard into deterministic hash
  *    buckets and pack within each bucket, so the window parallelizes
  *    across buckets and each task only sorts its bucket.
  *  - [[domainMix]] — group token totals are a map-side-combined
  *    aggregate producing one row per domain; rates broadcast back.
  *    Row selection is the deterministic md5-bucket filter (stable
  *    across runs/engines/cluster sizes, unlike rand()).
  */
object Curation {

  // ------------------------------------------------------------ quality
  /** Gopher-style heuristic quality rules (Rae et al. 2021, "Scaling
    * Language Models", table A1 — re-expressed over whitespace tokens):
    * word-count bounds, mean-word-length bounds, alphabetic-character
    * ratio, and a minimum stop-word hit count. Emits the per-rule
    * metrics, each rule as an int flag (0/1 — ints hash identically
    * across engines; booleans are dtype-fragile), and the conjunction.
    * Transcendental-free so every value is bit-portable. */
  def qualityRules(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 20, maxWords: Int = 1000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.7, minStopHits: Int = 2): DataFrame = {
    val text = F.col(textCol)
    val toks = TextOps.tokens(text)
    val nWords = F.size(toks).cast("long")
    val sumLen = F.aggregate(F.transform(toks, t => F.length(t).cast("long")),
      F.lit(0L), (acc, x) => acc + x)
    val meanLen = F.round(sumLen.cast("double") / nWords, 6)
    val nAlpha = F.regexp_count(text, F.lit("[a-z]")).cast("long")
    val alphaRatio = F.round(nAlpha.cast("double") / F.length(text), 6)
    val nStop = F.size(F.filter(toks,
      t => TextOps.stopwords.map(m => t === m).reduce(_ || _))).cast("long")
    val flag = (c: Column) => F.when(c, 1L).otherwise(0L)
    val ruleWords = flag(nWords >= minWords && nWords <= maxWords)
    val ruleMeanLen = flag(meanLen >= minMeanLen && meanLen <= maxMeanLen)
    val ruleAlpha = flag(alphaRatio >= minAlphaRatio)
    val ruleStop = flag(nStop >= minStopHits)
    docs.select(
      F.col(idCol),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      alphaRatio.as("alpha_ratio"),
      nStop.as("n_stop"),
      ruleWords.as("rule_words"),
      ruleMeanLen.as("rule_mean_len"),
      ruleAlpha.as("rule_alpha"),
      ruleStop.as("rule_stop"),
      (ruleWords * ruleMeanLen * ruleAlpha * ruleStop).as("keep"))
  }

  // --------------------------------------------------------- repetition
  /** Per-document repetition metrics (the Gopher repetition filters):
    * duplicate-token fraction (narrow, via array_distinct) and the
    * fraction of n-grams taken by the single most frequent n-gram.
    * One explode; aggregation state is O(1) per (doc, gram) and per doc
    * — a pathological doc repeating one phrase millions of times costs
    * counts, not buffered lists. Docs too short to have any n-gram
    * survive with zero gram counts (explode_outer). */
  def repetitionStats(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 2,
      maxDupTokenFrac: Double = 0.55, maxTopGramFrac: Double = 0.10): DataFrame = {
    // r15 (§2.4: remove shuffles outright): every output is a pure
    // per-document function, so the old explode → (doc, gram) aggregate
    // → per-doc aggregate pipeline shuffled the whole exploded gram
    // frame twice (carrying n_tokens/n_distinct on every gram row) for
    // values computable NARROW inside the row: n_grams = |grams|, and
    // max_gram_freq = the longest equal-run of the SORTED gram array
    // (identical to max per-gram count). Zero exchanges at any scale.
    val runBest = F.aggregate(
      F.col("_grams"),
      F.struct(F.lit(null).cast("string").as("p"), F.lit(0L).as("run"),
        F.lit(0L).as("best")),
      (acc, x) => {
        val run = F.when(acc("p").isNotNull && acc("p") === x,
          acc("run") + 1L).otherwise(F.lit(1L))
        F.struct(x.as("p"), run.as("run"),
          F.greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val perDoc = docs.select(
      F.col(idCol).as("doc_id"),
      TextOps.tokens(F.col(textCol)).as("_toks"))
      .select(
        F.col("doc_id"),
        F.size(F.col("_toks")).cast("long").as("n_tokens"),
        F.size(F.array_distinct(F.col("_toks"))).cast("long").as("n_distinct"),
        F.array_sort(TextOps.shinglesOf(F.col("_toks"), n)).as("_grams"))
      .select(
        F.col("doc_id"), F.col("n_tokens"), F.col("n_distinct"),
        F.size(F.col("_grams")).cast("long").as("n_grams"),
        runBest.as("max_gram_freq"))
    val dupFrac = F.round(F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens"), 6)
    val topFrac = F.when(F.col("n_grams") === 0, 0.0)
      .otherwise(F.round(F.col("max_gram_freq").cast("double") / F.col("n_grams"), 6))
    perDoc.select(
      F.col("doc_id"), F.col("n_tokens"),
      dupFrac.as("dup_token_frac"),
      F.col("n_grams"), F.col("max_gram_freq"),
      topFrac.as("top_gram_frac"),
      F.when(dupFrac <= maxDupTokenFrac && topFrac <= maxTopGramFrac, 1L)
        .otherwise(0L).as("keep"))
  }

  // ------------------------------------------------------ contamination
  /** Benchmark-contamination screen: fraction of each corpus document's
    * distinct word n-grams that appear anywhere in the benchmark
    * (eval-set) documents. The benchmark's distinct n-gram set is
    * broadcast — eval suites are MBs against a corpus of TBs — so the
    * corpus side is a narrow explode plus one doc-keyed aggregate, no
    * corpus-sized shuffle on the gram key. Docs with fewer than n
    * tokens have no n-grams and are omitted (nothing to contaminate). */
  def contamination(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      flagAt: Double = 0.5): DataFrame = {
    val benchGrams = TextOps.shingleDocs(benchmark, idCol, textCol, n)
      .select(F.col("shingle")).distinct()
      .withColumn("_hit", F.lit(1L))
    val corpusGrams = TextOps.shingleDocs(corpus, idCol, textCol, n)
    corpusGrams
      .join(F.broadcast(benchGrams), Seq("shingle"), "left")
      .groupBy("doc_id").agg(
        F.count(F.lit(1)).as("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0L))).as("n_hit"))
      .select(
        F.col("doc_id"), F.col("n_grams"), F.col("n_hit"),
        F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 6).as("contam_frac"),
        F.when(F.col("n_hit").cast("double") / F.col("n_grams") >= flagAt, 1L)
          .otherwise(0L).as("contaminated"))
  }

  // ---------------------------------------------------- fuzzy contamination
  /** Fuzzy benchmark-contamination screen: MinHash the corpus and the
    * benchmark with the SAME signature family ([[Dedup.minhashSignatures]]),
    * LSH-band both sides, and flag corpus docs whose estimated Jaccard
    * against any benchmark doc crosses `flagAt`. This is the
    * paraphrase-tolerant complement of the exact n-gram screen
    * ([[contamination]]): an eval question lightly reworded into the
    * corpus shares most minhash components even when few whole n-grams
    * survive verbatim.
    *
    * Scale shape: the benchmark side (eval suites are MBs against a
    * corpus of TBs) is BROADCAST twice — its banded keys into the
    * candidate join and its signatures into the agreement join — so the
    * corpus is never shuffled on a pair key; corpus signatures are
    * persisted (the band projection and the agreement join both consume
    * them). Estimated Jaccard = matching signature components / k (the
    * standard unbiased minhash estimate); the per-doc winner is an
    * O(1)-state max(struct) aggregate, not a window. */
  def contaminationFuzzy(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      flagAt: Double = 0.5): DataFrame = {
    val sigC = CacheScope.persist(
      Dedup.minhashSignatures(corpus, idCol, textCol, k, shingleN))
    val sigB = Dedup.minhashSignatures(benchmark, idCol, textCol, k, shingleN)
    val bandsC = Dedup.minhashBands(sigC, k, bands)
    val bandsB = Dedup.minhashBands(sigB, k, bands)
      .withColumnRenamed("doc_id", "bench_id")
    val cand = bandsC.join(F.broadcast(bandsB), Seq("band_idx", "band_hash"))
      .select("doc_id", "bench_id").distinct()
    val sigBRenamed = sigB.select(
      F.col("doc_id").as("bench_id") +:
        (0 until k).map(i => F.col(s"h$i").as(s"b$i")): _*)
    val nMatch = (0 until k)
      .map(i => F.when(F.col(s"h$i") === F.col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(sigC, "doc_id")
      .join(F.broadcast(sigBRenamed), "bench_id")
      .select(F.col("doc_id"),
        F.struct(
          F.round(nMatch.cast("double") / k, 6).as("est"),
          (-F.col("bench_id")).as("_nb")).as("_m"))
      .groupBy("doc_id")
      .agg(F.max("_m").as("_best"))
      .select(
        F.col("doc_id"),
        (-F.col("_best._nb")).as("bench_id"),
        F.col("_best.est").as("est_jaccard"),
        F.when(F.col("_best.est") >= flagAt, 1L).otherwise(0L).as("contaminated"))
  }

  // ----------------------------------------------------------- sampling
  /** Deterministic fixed-size per-group sample: the k documents with the
    * smallest portable hash of their id within each group — "give me
    * 1000 inspection docs per source", stable across runs, engines and
    * cluster sizes (a rand()-ranked sample resamples on every retry;
    * per-partition reservoirs depend on the split layout).
    *
    * Scale shape: ONE aggregate on the group key whose state is the
    * bounded top-k heap ([[graft.functions.TopKStruct]] on the negated
    * key) — k rows per group per map task cross the shuffle, never the
    * group's membership sorted (the row_number window form would). Ties
    * (hash collisions) break to the smaller doc id.
    *
    * The id column must be integral: the heap ranks by the NEGATED id
    * for its ascending tie-break, and a silent `cast("long")` on a
    * string id would null every doc_id in the sample under non-ANSI
    * casting (the hash is computed on the string form, so the sample
    * would look plausible while being garbage). Fail loudly instead —
    * callers with string ids hash them to a surrogate long first. */
  def sampleGroup(
      docs: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = docs.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"sampleGroup requires an integral id column (tie-break negates it); " +
        s"'$idCol' is ${idType.simpleString} — derive a surrogate long id first " +
        s"(e.g. Hashing.hash60 of the id)")
    val h = Hashing.hash60(F.col(idCol).cast("string"))
    docs
      .select(F.col(groupCol), F.col(idCol).cast("long").as("_id"), h.as("_h"))
      .groupBy(groupCol)
      .agg(
        F.count(F.lit(1)).as("n_total"),
        graft.functions.TopKFunctions.topK(
          F.struct((-F.col("_h")).as("_nh"), (-F.col("_id")).as("_nid")), k)
          .as("_top"))
      .select(F.col(groupCol), F.col("n_total"),
        F.posexplode(F.col("_top")).as(Seq("_pos", "_s")))
      .select(F.col(groupCol), F.col("n_total"),
        (F.col("_pos") + 1).cast("long").as("sample_rank"),
        (-F.col("_s._nid")).as("doc_id"),
        (-F.col("_s._nh")).as("h"))
  }

  // ------------------------------------------------------------ packing
  /** Token-budget sequence packing: assign documents to fixed-budget
    * bins (the "fill a 2k-token training sequence" move) via a running
    * token sum sharded over deterministic hash buckets. A bin never
    * spans buckets, so the per-bucket windows are independent — the
    * plan is one shuffle on the bucket key and a per-task sort, where
    * the naive global cumulative sum would serialize the corpus through
    * one partition. Documents are packed in doc-id order within a
    * bucket (deterministic; contiguous cumsum binning — a doc that
    * straddles the boundary opens the next bin). */
  def packBins(
      docs: DataFrame, idCol: String, tokensCol: String,
      buckets: Int = 8, budget: Long = 500L): DataFrame = {
    val bucket = F.pmod(Hashing.hash60(F.col(idCol).cast("string")), F.lit(buckets))
      .cast("long").as("bucket")
    val w = Window.partitionBy("bucket").orderBy(idCol)
    docs.select(F.col(idCol), F.col(tokensCol).as("_tok"), bucket)
      .withColumn("_cum", F.sum("_tok").over(w))
      .withColumn("bin", F.expr(s"(_cum - 1) div $budget"))
      .groupBy("bucket", "bin").agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum("_tok").as("bin_tokens"),
        F.min(idCol).as("first_doc"),
        F.max(idCol).as("last_doc"))
  }

  // ----------------------------------------------------------- chunking
  /** Sliding token-window chunking: split each document into
    * `chunkSize`-token windows advancing by `stride` tokens (overlap =
    * chunkSize − stride), the standard long-document → training-sample
    * move. Emits one row per chunk with its index, token count and
    * re-joined text.
    *
    * Scale shape: a narrow projection + one Generate (explode) — no
    * shuffle at all; each input split chunks independently, and chunk
    * count is ~len/stride per doc (bounded output amplification,
    * independent of corpus size). */
  def chunkDocs(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkSize >= 1 && stride >= 1,
      s"chunkSize and stride must be >= 1, got $chunkSize/$stride")
    docs
      .select(F.col(idCol).as("doc_id"),
        TextOps.tokens(F.col(textCol)).as("_toks"))
      .select(F.col("doc_id"), F.col("_toks"),
        // starts 0, stride, 2·stride, … < len (tokens() never yields an
        // empty array, so the sequence upper bound is always >= 0)
        F.explode(F.sequence(F.lit(0), F.size(F.col("_toks")) - 1,
          F.lit(stride))).as("_start"))
      .select(
        F.col("doc_id"),
        (F.col("_start") / stride).cast("long").as("chunk_idx"),
        F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(chunkSize)).as("_chunk"))
      .select(
        F.col("doc_id"), F.col("chunk_idx"),
        F.size(F.col("_chunk")).cast("long").as("n_tokens"),
        F.concat_ws(" ", F.col("_chunk")).as("chunk_text"))
  }

  // ----------------------------------------------------------- upsample
  /** Epoch-style domain upsampling — the other half of [[domainMix]]:
    * given target EPOCHS per domain (2.5 = "see this domain 2½ times
    * per training pass"; 0.25 = downsample to a quarter), emit each
    * document `floor(e)` times plus one more for the deterministic
    * md5-bucket fraction of docs covering `frac(e)`. Unlisted domains
    * default to 1 epoch. Emits (id, domain, n_copies, copy_idx) — one
    * row per materialized copy, `copy_idx` distinguishing repeats for
    * downstream shuffling/packing.
    *
    * Scale shape: a pure narrow map + one Generate; output amplification
    * is exactly the configured epoch mass, there is no shuffle, and the
    * hash-bucket selection is stable across runs/engines/cluster sizes
    * (rand() would resample every retry). */
  def domainUpsample(
      docs: DataFrame, idCol: String, domainCol: String,
      epochs: Map[String, Double]): DataFrame = {
    val e = epochs.foldRight(F.lit(1.0): Column) { case ((k, v), els) =>
      F.when(F.col(domainCol) === k, F.lit(v)).otherwise(els)
    }
    val base = F.floor(e).cast("long")
    val extra = (F.pmod(Hashing.hash60(F.col(idCol).cast("string")),
      F.lit(1000000L)) < F.floor((e - F.floor(e)) * 1e6)).cast("long")
    docs
      .select(F.col(idCol), F.col(domainCol), (base + extra).as("n_copies"))
      .where(F.col("n_copies") > 0)
      .select(F.col(idCol), F.col(domainCol), F.col("n_copies"),
        F.explode(F.sequence(F.lit(1L), F.col("n_copies"))).as("copy_idx"))
  }

  // --------------------------------------------------------- domain mix
  /** Domain-mixture rebalancing: given target token shares per domain
    * (language, source, …), compute a per-domain deterministic sampling
    * rate `min(1, target_share · total_tokens / domain_tokens)` and
    * apply it with the portable md5-bucket filter. Returns one row per
    * domain with the rate and the kept doc/token counts. Two aggregates
    * (domain totals, then kept counts) plus one broadcast join of the
    * domain-count rate table back onto the corpus — no global sort, no
    * rand(). */
  def domainMix(
      docs: DataFrame, idCol: String, domainCol: String, tokensCol: String,
      targets: Map[String, Double]): DataFrame = {
    val domTok = docs.groupBy(domainCol).agg(
      F.sum(F.col(tokensCol)).cast("long").as("domain_tokens"),
      F.count(F.lit(1)).as("n_total"))
    // one row per domain; the empty-frame window runs on that tiny
    // aggregate only (never on the corpus)
    val withTotal = domTok.withColumn("_total",
      F.sum("domain_tokens").over(Window.partitionBy()))
    val target = targets.foldRight(F.lit(0.0): Column) { case ((k, v), els) =>
      F.when(F.col(domainCol) === k, F.lit(v)).otherwise(els)
    }
    val rates = withTotal.select(
      F.col(domainCol), F.col("domain_tokens"), F.col("n_total"),
      F.round(F.least(F.lit(1.0),
        target * F.col("_total") / F.col("domain_tokens")), 6).as("rate"))
    val kept = docs
      .join(F.broadcast(rates.select(domainCol, "rate")), Seq(domainCol))
      .where(F.pmod(Hashing.hash60(F.col(idCol).cast("string")), F.lit(1000000L)) <
        F.floor(F.col("rate") * 1e6))
      .groupBy(domainCol).agg(
        F.count(F.lit(1)).as("n_kept"),
        F.sum(F.col(tokensCol)).cast("long").as("kept_tokens"))
    rates.join(kept, Seq(domainCol), "left")
      .select(
        F.col(domainCol), F.col("domain_tokens"), F.col("n_total"), F.col("rate"),
        F.coalesce(F.col("n_kept"), F.lit(0L)).as("n_kept"),
        F.coalesce(F.col("kept_tokens"), F.lit(0L)).as("kept_tokens"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    * score every pool document by how target-domain-like its hashed
    * n-gram feature distribution is. Features are bigrams hashed into
    * `buckets` counts; a document's log-importance weight is
    *   Σ_b n_doc(b) · [log p_target(b) − log p_raw(b)]
    * with add-1 smoothed bucket probabilities estimated from the corpus
    * itself (rows matching `targetCol` = the target domain, everything
    * = the raw pool). High weight → resample into training.
    *
    * Portability discipline: logs are floorLog2 (integer binary digit
    * count), so the weight is an exact integer and the oracle
    * hash-matches; float log ratios would drift by ULPs across libm.
    *
    * Scale shape: one corpus scan explodes bigrams into a
    * (doc, bucket) count aggregate (the one big shuffle, map-side
    * combined; PERSISTED — it feeds the raw totals, the target totals
    * and the scoring join). Bucket tables are ≤ `buckets` rows, so both
    * scoring joins broadcast; totals ride a one-row broadcast. Docs
    * with < 2 tokens have no features and are absent. */
  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String,
      targetCol: Column, buckets: Int = 1024): DataFrame = {
    import TextOps.floorLog2
    val feats = CacheScope.persist(docs
      .select(F.col(idCol).as("doc_id"), targetCol.as("_tgt"),
        TextOps.tokens(F.col(textCol)).as("_toks"))
      .select(F.col("doc_id"), F.col("_tgt"),
        F.explode(TextOps.shinglesOf(F.col("_toks"), 2)).as("gram"))
      .select(F.col("doc_id"), F.col("_tgt"),
        F.pmod(Hashing.hash60(F.col("gram")), F.lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "_tgt", "b").agg(F.count(F.lit(1)).as("n")))
    val raw = feats.groupBy("b").agg(F.sum("n").as("_craw"))
    val tgt = feats.where(F.col("_tgt"))
      .groupBy("b").agg(F.sum("n").as("_ctgt"))
    val tot = raw.agg(F.sum("_craw").as("_traw")).crossJoin(
      tgt.agg(F.coalesce(F.sum("_ctgt"), F.lit(0L)).as("_ttgt")))
    val normShift = // per-feature normalizer: log p uses totals + B smoothing mass
      floorLog2(F.col("_ttgt") + buckets) - floorLog2(F.col("_traw") + buckets)
    feats
      .join(F.broadcast(raw), "b")
      .join(F.broadcast(tgt), Seq("b"), "left")
      .select(F.col("doc_id"), F.col("n"),
        (floorLog2(F.coalesce(F.col("_ctgt"), F.lit(0L)) + 1) -
          floorLog2(F.col("_craw") + 1)).as("_sb"))
      .groupBy("doc_id")
      .agg(F.sum("n").as("n_feats"), F.sum(F.col("n") * F.col("_sb")).as("_sw"))
      .crossJoin(F.broadcast(tot))
      .select(
        F.col("doc_id"), F.col("n_feats"),
        (F.col("_sw") - F.col("n_feats") * normShift).as("log2_weight"),
        F.round((F.col("_sw") - F.col("n_feats") * normShift).cast("double")
          / F.col("n_feats"), 6).as("avg_log2"))
  }

  /** Temperature-flattened domain mixture — the T-sampling move from
    * multilingual / multi-domain LM training (sampling share ∝
    * raw_share^(1/T), T > 1 upsamples the tail): the data-driven
    * complement of [[domainMix]]'s explicit targets.
    *
    * Portability discipline: `temperature` must be a power of two —
    * share^(1/2^k) computes as k nested `sqrt`s, each CORRECTLY-ROUNDED
    * IEEE and therefore bit-identical on any engine, where
    * `pow(x, 1/T)` is libm-dependent. The flattened shares are then
    * floored into integer MICRO-units before normalizing, so the
    * normalizer is an order-independent exact long sum (a double sum
    * over domains would differ by ULPs with aggregation order).
    *
    * Output per domain: token count, raw share, flattened micro-share,
    * normalized weight, and the resulting per-domain sampling rate
    * (weight·total / domain_tokens, capped at 1).
    * Scale shape: one map-side-combined aggregate on the domain key +
    * two metadata-sized passes over the per-domain rows. */
  def domainTemperature(
      docs: DataFrame, domainCol: String, tokensCol: String,
      temperature: Double = 2.0): DataFrame = {
    val k = math.round(math.log(temperature) / math.log(2.0)).toInt
    require(k >= 1 && math.pow(2.0, k) == temperature,
      s"temperature must be a power of two >= 2 (got $temperature) — " +
        "share^(1/2^k) computes as k correctly-rounded sqrts; arbitrary " +
        "exponents would be libm-dependent and break engine portability")
    val domTok = docs.groupBy(domainCol).agg(
      F.sum(F.col(tokensCol)).cast("long").as("domain_tokens"))
    val withTotal = domTok.withColumn("_total",
      F.sum("domain_tokens").over(Window.partitionBy()))
    val share = F.col("domain_tokens").cast("double") / F.col("_total")
    val flat = (1 to k).foldLeft(share)((c, _) => F.sqrt(c))
    val micro = withTotal.withColumn("flat_micro",
      F.floor(flat * 1e6).cast("long"))
    val z = micro.withColumn("_z",
      F.sum("flat_micro").over(Window.partitionBy()))
    z.select(
      F.col(domainCol),
      F.col("domain_tokens"),
      F.round(share, 6).as("share"),
      F.col("flat_micro"),
      F.round(F.col("flat_micro").cast("double") / F.col("_z"), 6).as("weight"),
      F.round(F.least(F.lit(1.0),
        F.col("flat_micro").cast("double") / F.col("_z")
          * F.col("_total") / F.col("domain_tokens")), 6).as("sample_rate"))
  }

  /** Trained quality classifier, fastText/cc_net style: a multinomial
    * naive-Bayes log-count-ratio model over unigrams, trained on a
    * deterministic hash-half of the corpus against a weak label and
    * evaluated on the held-out half — the confusion matrix (label ×
    * prediction with doc counts and mean score) is the output, so the
    * whole train→score→evaluate loop is oracle-checkable.
    *
    * All-integer scoring ([[TextOps.floorLog2]] = `length(bin(x))-1`):
    * per-token weight floor(log2(c_pos+1)) − floor(log2(c_neg+1)),
    * a per-token normalizer from class totals + vocab smoothing mass,
    * and a class log-prior — the same integer-log2 discipline as
    * [[dsirWeights]], so scores are exact longs and hash-portable.
    *
    * Scale shape: token counts are one map-side-combined shuffle on
    * (doc, token) then one on token; scoring joins the test corpus to
    * the vocab on the token key (shuffle hash join — the vocab of a
    * 100 TB corpus does not broadcast); class totals/priors are a
    * 2-row cross join. Unseen test tokens coalesce to count 0 ⇒ weight
    * log2(1)−log2(1) = 0, the natural NB back-off. */
  def nbQuality(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column): DataFrame = {
    import TextOps.floorLog2
    val split = F.pmod(
      Hashing.hash60(F.col("doc_id").cast("string")), F.lit(2L)) === 0L
    val base = docs.select(F.col(idCol).as("doc_id"),
      labelCol.cast("boolean").as("_lbl"), F.col(textCol).as("_text"))
      .withColumn("_train", split)
    val tf = CacheScope.persist(base
      .select(F.col("doc_id"), F.col("_lbl"), F.col("_train"),
        F.explode(TextOps.tokens(F.col("_text"))).as("tok"))
      .where(F.length(F.col("tok")) > 0)
      .groupBy("doc_id", "_lbl", "_train", "tok")
      .agg(F.count(F.lit(1)).as("tf")))
    val vocab = tf.where(F.col("_train"))
      .groupBy("tok")
      .agg(
        F.sum(F.when(F.col("_lbl"), F.col("tf")).otherwise(0L)).as("_ct"),
        F.sum(F.when(!F.col("_lbl"), F.col("tf")).otherwise(0L)).as("_cf"))
    val totals = vocab.agg(
      F.sum("_ct").as("_tt"), F.sum("_cf").as("_tf_tot"),
      F.count(F.lit(1)).as("_v"))
    val priors = base.where(F.col("_train")).agg(
      F.sum(F.when(F.col("_lbl"), 1L).otherwise(0L)).as("_ndt"),
      F.sum(F.when(!F.col("_lbl"), 1L).otherwise(0L)).as("_ndf"))
    val normShift =
      floorLog2(F.col("_tt") + F.col("_v")) -
        floorLog2(F.col("_tf_tot") + F.col("_v"))
    val prior = floorLog2(F.col("_ndt") + 1) - floorLog2(F.col("_ndf") + 1)
    tf.where(!F.col("_train"))
      .join(vocab, Seq("tok"), "left")
      .select(F.col("doc_id"), F.col("_lbl"), F.col("tf"),
        (floorLog2(F.coalesce(F.col("_ct"), F.lit(0L)) + 1) -
          floorLog2(F.coalesce(F.col("_cf"), F.lit(0L)) + 1)).as("_w"))
      .groupBy("doc_id", "_lbl")
      .agg(F.sum("tf").as("_ntok"), F.sum(F.col("tf") * F.col("_w")).as("_sw"))
      .crossJoin(F.broadcast(totals))
      .crossJoin(F.broadcast(priors))
      .select(F.col("_lbl"),
        (F.col("_sw") - F.col("_ntok") * normShift + prior).as("_score"))
      .groupBy(
        F.when(F.col("_lbl"), 1L).otherwise(0L).as("label"),
        F.when(F.col("_score") >= 0L, 1L).otherwise(0L).as("pred"))
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.round(F.sum("_score").cast("double") / F.count(F.lit(1)), 6)
          .as("avg_score"))
      .orderBy("label", "pred")
  }
}
