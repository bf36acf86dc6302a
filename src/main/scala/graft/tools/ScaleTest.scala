package graft.tools

import org.apache.spark.sql.{functions => F}

/** Scale probe: replicate the sf0.1 corpus ~10× with shifted ids (/tmp
  * only) and run the heavy pipeline operators, reporting wall time. */
object ScaleTest {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/graft_scale"
    val mult = args.headOption.map(_.toInt).getOrElse(10)

    val docs0 = spark.read.parquet(s"$base/documents.parquet")
    val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
    val nDocs = docs0.count(); val nEmb = emb0.count()
    val docs = (0 until mult).map { i =>
      docs0.withColumn("doc_id", F.col("doc_id") + F.lit(i * nDocs))
    }.reduce(_ unionByName _)
    val emb = (0 until mult).map { i =>
      emb0.withColumn("vec_id", F.col("vec_id") + F.lit(i * nEmb))
    }.reduce(_ unionByName _)
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    emb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val d = spark.read.parquet(s"$out/documents.parquet")
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    println(s"scale corpus: ${d.count()} docs, ${e.count()} vectors")

    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$c")
      // release this probe's persisted intermediates OUTSIDE the timed
      // region: accumulated caches would otherwise contend for executor
      // memory and skew every LATER probe's measurement
      graft.operators.CacheScope.release(spark)
    }
    time("dedup_exact")(graft.operators.Dedup.exactGroups(d, "doc_id", "text").count())
    time("dedup_fingerprint")(graft.operators.Dedup.fingerprintGroups(d, "doc_id", "text").count())
    time("minhash_pairs")(graft.operators.Dedup.minhashCandidatePairs(d, "doc_id", "text").count())
    time("ngram_jaccard_unique")(graft.operators.Dedup.ngramJaccardPairsUnique(d, "doc_id", "text", 3, 0.5).count())
    time("simhash")(graft.operators.Dedup.simhash(d, "doc_id", "text").count())
    time("lsh_buckets")(graft.operators.Similarity.hyperplaneBuckets(e, "vec_id", "embedding").count())
    time("ivf_assign")(graft.operators.Ivf.assign(e,
      graft.operators.Ivf.centroidsByKey(e, "label", "embedding"), "vec_id", "embedding").count())
    time("topk_brute_10q")(graft.operators.Similarity.bruteForceTopK(
      e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", 5).count())
    time("kmeans_k8_i2")(graft.operators.Ivf.kmeansCentroids(
      e, "vec_id", "embedding", k = 8, iters = 2).count())
    time("simhash_pairs_blocked") {
      val sigs = graft.operators.Dedup.simhash(d, "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
      graft.operators.Dedup.simhashPairs(sigs, "lang", maxHamming = 3).count()
    }
    // r4: bounded-heap posting heads — O(k) state per term even for
    // stopword-sized posting lists (collect_list+slice would buffer the
    // whole corpus per stopword term here)
    time("inverted_heads_bounded") {
      d.select(F.col("doc_id"), F.explode(F.array_distinct(
          graft.operators.TextOps.tokens(F.col("text")))).as("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).as("df"),
          graft.functions.TopKFunctions.bottomKLong(F.col("doc_id"), 10).as("heads"))
        .count()
    }
    // r4: df-capped n-gram Jaccard on the DUPLICATED corpus — the cap
    // drops replicated-stopword shingles pre-join (vs 104 s uncapped /
    // 3.8 s dedup-first measured r3)
    time("ngram_jaccard_cap20")(graft.operators.Dedup.ngramJaccardPairs(
      d, "doc_id", "text", 3, 0.5, maxDocFreq = Some(20)).count())
    // r4: pairs → clusters (min-label propagation rounds over the
    // replication-inflated clique graph)
    time("dedup_clusters") {
      val pairs = graft.operators.Dedup.minhashCandidatePairs(d, "doc_id", "text")
      graft.operators.Dedup.connectedComponents(pairs, "doc_a", "doc_b").count()
    }

    // r4 curation suite on the duplicated corpus: quality gate is a
    // pure narrow map; repetition carries O(1) state per (doc, gram);
    // contamination broadcasts the benchmark gram set; packing windows
    // shard over hash buckets; domain mix is two tiny-keyed aggregates
    time("quality_rules")(graft.operators.Curation.qualityRules(
      d, "doc_id", "text").count())
    time("text_repetition")(graft.operators.Curation.repetitionStats(
      d, "doc_id", "text").count())
    time("contamination") {
      graft.operators.Curation.contamination(
        d.where(F.col("source") =!= "src0"),
        d.where(F.col("source") === "src0"), "doc_id", "text", n = 3).count()
    }
    time("pack_bins")(graft.operators.Curation.packBins(
      d.select(F.col("doc_id"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").as("tok")),
      "doc_id", "tok", buckets = 64, budget = 500L).count())
    time("domain_mix")(graft.operators.Curation.domainMix(
      d.select(F.col("doc_id"), F.col("lang"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").as("tok")),
      "doc_id", "lang", "tok",
      Map("en" -> 0.40, "fr" -> 0.15, "de" -> 0.15, "es" -> 0.15,
        "zh" -> 0.15)).count())

    // r4 wave-5 prep suite on the duplicated corpus: PII scrub and
    // chunking are narrow maps; KMV state is O(k) per group; incremental
    // dedup is one fingerprint join; surprisal reuses the cached tf
    // frame; leakage is a single fingerprint-keyed shuffle
    time("pii_redact")(graft.operators.Privacy.redactPii(
      d, "doc_id", "text").count())
    time("chunk_docs")(graft.operators.Curation.chunkDocs(
      d, "doc_id", "text", chunkSize = 64, stride = 48).count())
    time("kmv_distinct_k512")(graft.operators.Sketch.kmvDistinct(
      d.select(F.col("source"), F.explode(
        graft.operators.TextOps.tokens(F.col("text"))).as("term")),
      Seq("source"), "term", k = 512).count())
    time("dedup_incremental") {
      val isBatch = F.pmod(graft.operators.Hashing.hash60(
        F.col("doc_id").cast("string")), F.lit(10L)) === 0L
      graft.operators.Dedup.incrementalDedup(
        d.where(isBatch),
        d.where(!isBatch).select(
          graft.operators.Dedup.fingerprint(F.col("text")).as("fingerprint")),
        "doc_id", "text", "fingerprint").count()
    }
    time("surprisal_proxy")(
      graft.operators.TextOps.surprisalProxy(d, "doc_id", "text").count())
    time("split_leakage")(graft.operators.Dedup.splitLeakage(
      d, "doc_id", "text").count())
    time("vocab_build")(graft.operators.TextOps.vocabBuild(
      d, "text", size = 100).count())
    time("dedup_priority")(graft.operators.Dedup.priorityDedup(
      d, "doc_id", "text", "source",
      Map("src0" -> 9, "src1" -> 8, "src2" -> 7, "src3" -> 6)).count())
    time("domain_upsample")(graft.operators.Curation.domainUpsample(
      d, "doc_id", "lang",
      Map("en" -> 2.5, "fr" -> 1.0, "de" -> 0.5, "es" -> 1.5, "zh" -> 0.25))
      .count())

    // r4 wave-6/7/8 on the duplicated corpus: line dedup's df shuffles
    // carry 8-byte hashes; tfidf/cdc pairs go through the shared
    // df-capped inverted-index tail (caps sized ABOVE the replication
    // factor — replication inflates every df by mult, which is exactly
    // the documented dedup-first caveat); pagerank is one shuffle per
    // round over the replication-inflated minhash clique graph; PQ
    // training is mult-independent driver jobs, encode/ADC corpus-linear
    time("line_dedup_cap15")(graft.operators.Dedup.lineDedup(
      d, "doc_id", "text", maxDocFreq = mult + 5).count())
    time("tfidf_cosine_cap1k")(graft.operators.Dedup.tfidfCosinePairs(
      d, "doc_id", "text", minCosine = 0.9, maxDocFreq = 1000).count())
    time("cdc_pairs_cap20")(graft.operators.Dedup.cdcJaccardPairs(
      d, "doc_id", "text", p = 8, minJaccard = 0.5,
      maxDocFreq = Some(20)).count())
    time("sample_group_k100")(graft.operators.Curation.sampleGroup(
      d, "doc_id", "source", k = 100).count())
    time("zipf_slope")(graft.operators.TextOps.zipfSlope(
      d, "text", topV = 100).count())
    time("contamination_fuzzy") {
      // modulus coprime to the replication stride, so a doc's copies
      // land on BOTH sides of the bench/corpus split
      val isBench = F.pmod(F.col("doc_id"), F.lit(733L)) === 0L
      graft.operators.Curation.contaminationFuzzy(
        d.where(!isBench), d.where(isBench), "doc_id", "text").count()
    }
    time("pagerank_5r") {
      val pairs = graft.operators.Dedup.minhashCandidatePairs(d, "doc_id", "text")
      graft.operators.Graph.pageRank(pairs, "doc_a", "doc_b", iters = 5).count()
    }
    time("pq_train_encode_adc") {
      val cb = graft.operators.Pq.codebooks(e, "vec_id", "embedding")
      val codes = graft.operators.Pq.encode(e, cb, "vec_id", "embedding")
      graft.operators.Pq.adcTopK(codes, cb,
        e.where(F.col("vec_id") < 5), "vec_id", "embedding", k = 5).count()
    }
    // r5: PQ training on a 10% hash-sample — the 100 TB configuration;
    // mult-independent centroid count, mult/10-sized Lloyd scans
    time("pq_train_sampled_10pct") {
      graft.operators.Pq.codebooks(e, "vec_id", "embedding",
        trainFraction = 0.1).count()
    }
    // r5: substring-window dedup on the duplicated corpus — replication
    // makes EVERY window corpus-duplicated, the worst case for the
    // (doc, hash) index (nothing drops before the global count)
    time("substring_dup_w8")(graft.operators.Dedup.substringDupStats(
      d, "doc_id", "text", w = 8).count())
    // r5: SemDeDup at mult× — k-means cost is mult-linear narrow maps,
    // the within-cluster pair join is the quadratic-in-cluster-size
    // step the clustering bounds (k=16 keeps populations ~mult·300),
    // CC finishes locally when the pair graph is metadata-sized
    time("semantic_dedup_k16")(graft.operators.Dedup.semanticDedup(
      e, "vec_id", "embedding", k = 16, iters = 2, minCosine = 0.35).count())
    // r5 wave 9-12 on the duplicated corpus: DSIR is one persisted
    // (doc, bucket) aggregate + broadcast bucket joins; the CMS sketch
    // aggregates the VOCAB (replication only inflates counts, not
    // cells); KMV set algebra is one distinct-hash shuffle + O(k)
    // state; triangles run on the replication-inflated clique graph —
    // the orientation bound is what keeps clique wedges in check
    time("dsir_weights_b1024")(graft.operators.Curation.dsirWeights(
      d, "doc_id", "text", F.col("lang") === "en", buckets = 1024).count())
    time("cms_sketch_4x256") {
      val tc = graft.operators.Bpe.wordFreq(d, "text")
      graft.operators.Sketch.cmsSketch(tc, "word", "freq").count()
    }
    time("kmv_set_ops_k256")(graft.operators.Sketch.kmvSetOps(
      d, F.pmod(F.substring(F.col("source"), 4, 10).cast("long"), F.lit(2L)),
      "text", k = 256).count())
    time("triangle_count") {
      val pairs = graft.operators.Dedup.minhashCandidatePairs(d, "doc_id", "text")
      graft.operators.Graph.triangleCount(pairs, "doc_a", "doc_b").count()
    }
    time("bpe_train_10_rounds")(
      graft.operators.Bpe.train(d, "text", rounds = 10).size.toLong)

    // validation path at ~6M rows
    val li0 = spark.read.parquet(s"$base/lineitem.parquet")
    val nLi = li0.count()
    (0 until mult).map { i =>
      li0.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10000000L))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    println(s"lineitem scale rows: ${li.count()}")
    val v = graft.queries.Schemas.lineitem.validator
    time("validate_filter_6M")(v.filterValid(li).count())
    time("violation_report_6M")(v.report(li).count())
    // r5: reconciliation at 6M rows — per-bucket digests are one
    // map-side-combined shuffle per side; only dirty buckets rescan.
    // Key = (l_orderkey, line hash) surrogate to keep rows unique.
    time("table_diff_6M") {
      val a = li.select(F.col("l_orderkey"), F.col("l_linenumber"),
        F.col("l_partkey"), F.col("l_suppkey"), F.col("l_quantity"))
        .withColumn("rid", F.monotonically_increasing_id())
      // deterministic derived version: drop ~1/997, no edits (rid is
      // partition-dependent, so hash only stable columns)
      val b = a.filter(F.pmod(F.col("l_orderkey") * 31 +
        F.col("l_partkey"), F.lit(997)) =!= 0)
      val h = graft.operators.Hashing.hash60(F.concat_ws("|",
        F.col("rid").cast("string"), F.col("l_orderkey").cast("string")))
      graft.operators.Reconcile.diffRows(a, b, Seq("rid"), h,
        buckets = 1024).count()
    }
    // r5: z-order rewrite of the 6M-row fact — one range shuffle +
    // local sort; the write-side layout cost a ZORDER BY pays
    time("zorder_rewrite_6M")(graft.operators.Layout.zOrderBy(
      li.withColumn("da", F.pmod(F.col("l_orderkey"), F.lit(1024L)))
        .withColumn("db", F.pmod(F.col("l_partkey"), F.lit(1024L))),
      F.col("da"), F.col("db"), bits = 10, numPartitions = 64).count())

    // r5 wave 14-15: warehouse/audit operators at mult× events (10×
    // users via shifted ids — per-user history length stays constant,
    // so the per-key window cost is flat while the shuffle is mult×)
    val ev0 = graft.queries.Tables.t(spark, base, "events")
    (0 until mult).map { i =>
      ev0.withColumn("user_id", F.col("user_id") + F.lit(i * 1000000L))
        .withColumn("event_id", F.col("event_id") + F.lit(i * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val ev = spark.read.parquet(s"$out/events.parquet")
    println(s"events scale rows: ${ev.count()}")
    time("scd2_build_10x")(graft.operators.Warehouse.scd2Build(
      ev, "user_id", "ts", "event_id", "event_type").count())
    time("transitions_10x")(graft.operators.Warehouse.transitionMatrix(
      ev, "user_id", "ts", "event_id", "event_type").count())
    time("cdc_merge_10x") {
      val cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
      val bs = ev.where(F.col("ts") < cutoff).groupBy("user_id")
        .agg(F.max(F.struct(F.col("ts"), F.col("event_id"),
          F.col("event_type"))).as("_b"))
        .select(F.col("user_id"), F.col("_b.event_type").as("event_type"))
      val ch = ev.where(F.col("ts") >= cutoff).withColumn("op",
        F.when(F.col("event_type") === "error", "D").otherwise("U"))
      graft.operators.Warehouse.mergeChangelog(bs, ch,
        "user_id", "ts", "event_id", "op", "event_type").count()
    }
    // audits on the 6M-row fact: both collapse to distinct keys first
    val ord0 = spark.read.parquet(s"$base/orders.parquet")
    val ord = (0 until mult).map { i =>
      ord0.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10000000L))
    }.reduce(_ unionByName _)
    time("fk_check_6M")(graft.operators.Audit.fkCheck(
      li, "l_orderkey", ord, "o_orderkey", "li->o").count())
    // r6: the documented 100 TB distinct-count configs, measured not
    // asserted — exact (Expand-planned countDistinct, the oracle form)
    // vs approx (HLL++ sketches, no Expand) on the same profile
    val profCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_shipdate")
    time("profile_exact_6M")(
      graft.operators.Audit.tableProfile(li, profCols).count())
    time("profile_approx_6M")(
      graft.operators.Audit.tableProfile(li, profCols,
        approx = true).count())
    time("agg_distinct_exact_6M")(
      li.groupBy("l_returnflag")
        .agg(F.countDistinct(F.col("l_orderkey")).as("n_orders"),
          F.countDistinct(F.col("l_partkey")).as("n_parts"),
          F.count(F.lit(1)).as("n_rows")).count())
    time("agg_distinct_approx_6M")(
      li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct(F.col("l_orderkey")).as("n_orders"),
          F.approx_count_distinct(F.col("l_partkey")).as("n_parts"),
          F.count(F.lit(1)).as("n_rows")).count())
    time("key_skew_6M")(graft.operators.Audit.skewProfile(
      li, "l_orderkey").count())
    time("k_anonymity_6M")(graft.operators.Privacy.kAnonymity(
      li.select(F.col("l_returnflag"), F.col("l_linestatus"),
        F.pmod(F.col("l_suppkey"), F.lit(100L)).as("supp_bucket")),
      Seq("l_returnflag", "l_linestatus", "supp_bucket"), k = 1000L).count())

    // r5 wave-17/18 probes: stage a 10× directory with standard table
    // names and drive the SHIPPED SparkEntry query fns against it (not
    // probe re-implementations) — lineitem shifts BOTH keys so each
    // replica's co-purchase graph stays disjoint (hubs scale by data,
    // not by replication artifacts); events replicate rows onto the
    // SAME calendar days, proving the cusum/ewma day-grid state stays
    // calendar-bounded while the aggregate input is 10×.
    val qdir = s"$out/q"
    (0 until mult).map { i =>
      li0.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10000000L))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * 1000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$qdir/lineitem.parquet")
    ord.write.mode("overwrite").parquet(s"$qdir/orders.parquet")
    val part0 = spark.read.parquet(s"$base/part.parquet")
    (0 until mult).map { i =>
      part0.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * 1000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$qdir/part.parquet")
    val cust0 = spark.read.parquet(s"$base/customer.parquet")
    (0 until mult).map { i =>
      cust0.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 1000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$qdir/customer.parquet")
    ev.write.mode("overwrite").parquet(s"$qdir/events.parquet")
    spark.read.parquet(s"$out/documents.parquet")
      .write.mode("overwrite").parquet(s"$qdir/documents.parquet")
    def timeQ(n: String): Unit =
      time(n + "_10x")(graft.SparkEntry.queries(n)(spark, qdir).count())
    Seq("hll_distinct", "weighted_median", "pareto_front",
      "histogram_equiwidth", "open_pipeline_timeline", "degree_dist",
      "graph_reach", "cusum_drift", "ewma_smooth", "term_trends")
      .foreach(timeQ)
    // r6 wave-20..25 probes: the char-explode entropy screen, the
    // 32-resample bootstrap (input ×32 explode on a 10× corpus), the
    // anchor-cohort link prediction and incremental minhash (both must
    // stay cohort/batch-bounded as the corpus grows), the pair-bounded
    // Theil–Sen (calendar-bounded — time should NOT scale with mult),
    // and the interval-arithmetic trimmed mean.
    spark.read.parquet(s"$out/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$qdir/embeddings.parquet")
    Seq("payload_entropy", "bootstrap_ci", "link_predict",
      "dedup_minhash_batch", "trimmed_mean", "theil_sen",
      "histogram_log2", "id_gaps", "bom_explode", "mutual_information",
      "embed_dim_profile", "attribution_decay")
      .foreach(timeQ)
    // r7 probes: token-budget sharding (shard-manifest count grows with
    // the corpus — flagged in the r6 verdict as the one worth probing),
    // the trailing-window z-score, the length-stratified dup profile
    // and the survival/loyalty BI set; then the DistRank rewires (rfm /
    // drift_psi / gini / sample_systematic must scale linearly now that
    // their global ranks are distributed) and the r7 crawl-prep +
    // incremental-index waves (url ops narrow-map + host-bounded,
    // ivf_incremental batch-bounded).
    spark.read.parquet(s"$base/nation.parquet")
      .write.mode("overwrite").parquet(s"$qdir/nation.parquet")
    // (survival_curve reports rows=0 here BY CONSTRUCTION: replication
    // duplicates each customer's orders onto the same dates, so every
    // first-repeat gap is 0 days — below the 7-day ladder. The probe
    // still times the full 10× scan + per-customer window.)
    Seq("token_shards", "window_zscore", "dup_by_length",
      "survival_curve", "longest_streak", "repeat_interval",
      "hhi_concentration", "decile_report", "new_vs_returning",
      "boxplot_stats", "pareto_8020",
      "rfm", "drift_psi", "gini_concentration", "sample_systematic",
      "url_normalize", "url_dedup", "host_rollup", "ivf_incremental")
      .foreach(timeQ)
    // r7 wave-43..45 probes: category-bounded EMD (t_closeness), the
    // host-bounded crawl policy, the one-scan data card, the per-user
    // split audit and gap-regularity score (lag windows PARTITIONED BY
    // user — must scale with data, not blow a single partition), the
    // score-frame eval additions and the 2×2 DiD single aggregate.
    // (search_mrr / ivf_nprobe_sweep are excluded BY DESIGN: their
    // exact-truth pass is the documented tune-before-run audit whose
    // cost is #queries·corpus — quadratic on purpose, never the
    // production path.)
    Seq("t_closeness", "host_policy", "corpus_datacard",
      "time_split_audit", "bot_score", "eval_pr_curve",
      "eval_confusion", "eval_brier", "diff_in_diff", "embed_coverage",
      "pq_incremental", "user_entropy", "event_heatmap")
      .foreach(timeQ)
    // r7 wave-47/48 probes (knn_accuracy / hard_negatives excluded:
    // quadratic-by-design exact-truth audits, like search_mrr above)
    Seq("centroid_purity", "srm_check", "churn_labels",
      "conformal_threshold", "power_sample_size")
      .foreach(timeQ)
    // r7 wave-50..52 probes (late_interaction / rrf_fusion excluded:
    // constant-multiple variants of the documented quadratic truth pass)
    Seq("attribution_position", "dp_release", "graph_modularity",
      "ips_eval", "fairness_audit", "dr_eval", "calibration_ece",
      "ab_cuped")
      .foreach(timeQ)
    // r8 probes: label-propagation communities (k bounded rounds of
    // edges⋈labels shuffles — must scale with the edge list, like
    // pagerank) and the modularity of the detected partition.
    Seq("community_lpa", "community_modularity")
      .foreach(timeQ)
    // ivfpq_search: routing + restricted ADC + bounded rerank — must
    // scale with the probed lists, not the corpus. (ivfpq_recall
    // excluded: contains the quadratic-by-design exact-truth audit,
    // like search_mrr / knn_accuracy above.)
    timeQ("ivfpq_search")
    // r11 probe: residual IVFADC serving must scale exactly like
    // ivfpq_search — same probed-list restriction + broadcast rerank;
    // the residual artifacts are staged builds. (ivfpq_residual_recall
    // excluded: exact-truth audit, like ivfpq_recall.)
    timeQ("ivfpq_residual")
    // r9 probe: one Louvain local-move round + two exact modularity
    // evaluations — edge-linear (candidate frame ≤ directed edges),
    // must scale like the LPA pair above.
    timeQ("community_refine")
    // r10 probe: weighted modularity — one pair re-aggregation over the
    // staged multi-edge list + the one-pass explode score, edge-linear.
    timeQ("community_weighted")
    // r10 probe: the two-rung ladder — rung 2 live = one k_vc build
    // (scratch-parquet materialized, one edge pass) + one scoring pass;
    // edge-linear like community_refine, roughly its cost + one score.
    timeQ("community_ladder")
    // r11 probes: the weighted move rung is edge-linear like
    // community_refine (one weighted k_vc build + two weighted scoring
    // passes over the staged weight parquet); the coarsen rung is one
    // corpus pass (coarse-graph build) + one scoring pass — its move
    // itself is metadata arithmetic on the supernode graph.
    timeQ("community_ladder_weighted")
    timeQ("community_coarsen")
    // r10 probes: mann_whitney is one map-side-combined aggregate over
    // the 10× lineitem + a value-domain-sized cumsum (50 rows here) —
    // must be row-linear; clustering_coeff enumerates oriented wedges
    // over the 10 disjoint co-purchase replicas — edge-linear ×10
    // because orientation bounds fan-out per replica. (anova_f /
    // cramers_v read the unreplicated orders table — single-aggregate
    // shapes already covered by the agg_distinct probes above.)
    timeQ("mann_whitney")
    // r11 probes: the SAMPLED clustering coefficient must track the
    // sample budget, not the wedge count — K=8 caps the candidate-pair
    // frame at C(8,2)=28/node vs D60's C(30,2)=435/node vs the exact
    // form's oriented wedge enumeration (timed below as
    // clustering_coeff). (clustering_sample_audit excluded: it contains
    // the exact-truth side by design, like ivfpq_recall.)
    time("clust_sampled_k8")(graft.operators.Graph.localClusteringSampled(
      graft.queries.Staged.coPurchaseEdges(spark, qdir), "pa", "pb", 8)
      .count())
    timeQ("clustering_coeff_sampled")
    // r11 probe: kruskal_wallis generalizes mann_whitney's shape to k
    // groups — one map-side-combined (group, value) pass over the 10×
    // orders + one value-domain cumsum + a k-row finish; row-linear.
    // NOTE its domain is myriacent prices (~all-distinct): at 10× the
    // cumsum carries ~1.5 M domain rows — the probe pins that the
    // domain-frame shape stays row-linear even at domain ≈ rows.
    timeQ("kruskal_wallis")
    // r11 probes: friedman is one corpus aggregate to a calendar-
    // bounded (month × priority) cell frame — row-linear scan, fixed
    // finish; harmonic_centrality is a hop-bounded deduped-frontier
    // BFS from 8 pivots — one node-keyed shuffle per hop, edge-linear.
    // (jsonl_roundtrip is IO-bound like csv_text_roundtrip: neither is
    // probed — write+read throughput, not a plan shape.)
    timeQ("friedman")
    timeQ("harmonic_centrality")
    // r11 probe: ANF is k·m sketch rows per hop — edge-linear with the
    // fixed k=16 constant; the probe pins that the O(k)-state merge
    // aggregate (not a window sort) carries the 10× edge list.
    timeQ("graph_anf")
    // r12 probe: the effective-diameter readout is the SAME loop one
    // hop deeper — r13 stages the hop ladder under Staged.anfSketch,
    // so graph_anf's probe pays the hops-1-2 build and this probe pays
    // ONLY the hop-3 extension (was ~1.3× graph_anf when each re-ran
    // the full ladder); the crossing math is a 1-row frame.
    timeQ("graph_effective_diameter")
    // r13 probe: HITS is two L1-normalized power rungs — per rung two
    // edge-linear join+aggregate passes plus a 1-row normalizer; the
    // probe pins that rung cost tracks the 10× edge list with no
    // window/sort anywhere.
    timeQ("hits_scores")
    // r13 probes: cliffs_delta rides mann_whitney's value-domain cumsum
    // (row-linear scan, 50-value domain); pacf_lags is one corpus
    // aggregate to the calendar frame + a ×7 calendar-bounded pair
    // frame + a 1-row recursion (the whole ljung_box/durbin_watson/
    // runs_test family shares this shape — pacf is the costliest
    // member, so it carries the family probe); assoc_rules reads the
    // staged weighted pair list + one distinct (order, part) aggregate;
    // vocab_growth is one rank pass + one token explode + one
    // min-per-term aggregate — all corpus-linear, cumulation metadata.
    timeQ("cliffs_delta")
    timeQ("pacf_lags")
    timeQ("assoc_rules")
    timeQ("vocab_growth")
    // r12 probes: ktruss round 1 pays the full √m-bounded wedge pass
    // (the clustering_coeff constant), rounds 2+ run on the peeled
    // remnant; community_converge is 2×3 accept-guarded move rungs —
    // fine rungs edge-linear (k_vc + one scoring pass each), coarse
    // rungs metadata-sized; the harmonic audit's exact side must stay
    // cohort-bounded (|cohort|·d̄²) while its estimator side rides the
    // 10× BFS; wilcoxon is one corpus aggregate to a calendar frame.
    timeQ("ktruss_peel")
    timeQ("community_converge")
    timeQ("harmonic_sample_audit")
    timeQ("wilcoxon_signed_rank")
    timeQ("clustering_coeff")
    // r10: assortativity must stay edge-linear (two degree joins + one
    // aggregate over the 10 disjoint co-purchase replicas)
    timeQ("degree_assortativity")
    // r14 probes. phash_dct: the factored DCT sign pack is one narrow
    // codegen pass (corpus-linear), the 5-band blocking ships 5 rows
    // per doc and candidates stay ~2^-12.6-selective — the probe pins
    // both; its recall audit's exact side is a fixed 1/17 cohort
    // fraction (corpus-linear, unlike the excluded clustering audit).
    // frame_scene_cuts: <= 12 frames per doc, sig pass, doc-partitioned
    // lag — corpus-linear with a 12x constant. ppr_seeded: one
    // node-keyed shuffle per round over the replicated (disjoint)
    // co-purchase graphs — edge-linear x rounds. fdr_bh / periodogram /
    // holt_winters: one corpus aggregate each to a <= 25-cell /
    // calendar frame — the pacf/friedman family shape, probed because
    // each adds a new finish (BH cross-multiplication, 13 x 2
    // table-lookup axes, the depth-n integer fold).
    timeQ("phash_dct")
    timeQ("phash_dct_recall")
    timeQ("frame_scene_cuts")
    timeQ("ppr_seeded")
    timeQ("fdr_bh")
    timeQ("periodogram")
    timeQ("holt_winters")
    // mmr_rerank: corpus cost is the D6 shortlist scan (already pinned
    // by topk_brute_10q); everything after is queries x 8 metadata —
    // probed end-to-end against a 10x embeddings dir to prove it.
    spark.read.parquet(s"$out/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$qdir/embeddings.parquet")
    timeQ("mmr_rerank")
    // r15 probes. dedup_span_ladder: |ladder|=4 window explodes over
    // the 10x corpus, each collapsing map-side before the one
    // (w, doc, hash) shuffle — corpus-linear with the ladder constant.
    // video_neardup: the sig pass is frame_scene_cuts' shape (<=12
    // frames/doc, typed stage, doc-partitioned lag); the id-shifted
    // replicas mint DISJOINT video groups (content keys derive from
    // ids), so candidates grow linearly and the df-capped index join
    // must too — the probe pins that videos^2 never forms. The recall
    // audit's exact side is the fixed 1/17 cohort fraction.
    // (sink_time_travel is IO-bound like jsonl_roundtrip: write+read
    // throughput, not a plan shape — not probed.)
    timeQ("dedup_span_ladder")
    timeQ("video_neardup")
    timeQ("video_neardup_recall")
    // graph_random_walks: one ranked-adjacency window pass (degree-
    // bounded sorts) + 4 frontier joins over the replicated disjoint
    // co-purchase graphs — adjacency edge-linear, walk cost
    // cohort-bounded; the probe pins both as the graph grows 10x.
    timeQ("graph_random_walks")
    spark.stop()
  }
}
