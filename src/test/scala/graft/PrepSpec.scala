package graft

import graft.operators.{Curation, Dedup, Privacy, Sketch, TextOps}
import org.apache.spark.sql.{functions => F}

/** Wave-5 prep operators (SURVEY §2 E18–E23) on synthetic frames with
  * hand-computed answers plus the sf0.001 documents table. */
class PrepSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  // ------------------------------------------------------------ privacy
  test("pii redaction: replaces every pattern and counts each hit") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail bob.smith@corp.io and alice@a.co from 10.1.2.3 call 555-867-5309"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val r = Privacy.redactPii(d, "doc_id", "text").orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(r(0) == ((1L,
      "mail <EMAIL> and <EMAIL> from <IP> call <PHONE>", 2L, 1L, 1L, 4L)))
    assert(r(1) == ((2L, "no pii here at all", 0L, 0L, 0L, 0L)))
  }

  test("pii redaction plan is a single narrow scan (no shuffle)") {
    val plan = Privacy.redactPii(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("kAnonymity: class sizes and the k flag") {
    import spark.implicits._
    val d = Seq(
      ("us", "m", 1L), ("us", "m", 2L), ("us", "m", 3L), // class of 3
      ("us", "f", 4L), ("us", "f", 5L),                  // class of 2
      ("fr", "m", 6L))                                   // class of 1
      .toDF("country", "sex", "id")
    val r = Privacy.kAnonymity(d, Seq("country", "sex"), k = 2L)
      .as[(String, String, Long, Long)].collect()
    assert(r.toSeq == Seq(
      ("fr", "m", 1L, 0L), ("us", "f", 2L, 1L), ("us", "m", 3L, 1L)))
  }

  // ----------------------------------------------------------- chunking
  test("chunking: windows, stride overlap, and the short tail") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val d = Seq((7L, text)).toDF("doc_id", "text")
    val r = Curation.chunkDocs(d, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    // starts 0,3,6,9 → chunks w1-4 / w4-7 / w7-10 / w10
    assert(r.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(r.map(_._3).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(r(1)._4 == "w4 w5 w6 w7" && r(3)._4 == "w10")
  }

  test("chunking covers every token at stride == chunkSize (no overlap)") {
    val chunks = Curation.chunkDocs(docs, "doc_id", "text",
      chunkSize = 32, stride = 32)
    val totTokens = docs
      .select(F.size(TextOps.tokens(F.col("text"))).cast("long").as("n"))
      .agg(F.sum("n")).head().getLong(0)
    val totChunked = chunks.agg(F.sum("n_tokens")).head().getLong(0)
    assert(totTokens == totChunked)
  }

  // ---------------------------------------------------------------- kmv
  test("kmv sketch: exact below k, within rel-error envelope above k") {
    import spark.implicits._
    val d = (1 to 5000).map(i => ("big", s"v$i")) ++
      (1 to 40).map(i => ("small", s"v$i"))
    val r = Sketch.kmvDistinct(d.toDF("g", "v"), Seq("g"), "v", k = 256)
      .as[(String, Long, Option[Long], Double)].collect()
      .map(x => x._1 -> x).toMap
    // under-filled group: exact, no kth hash
    assert(r("small")._2 == 40L && r("small")._3.isEmpty && r("small")._4 == 40.0)
    // filled group: ~1/sqrt(k-2) ≈ 6.3% expected rel-error; 4σ envelope
    val est = r("big")._4
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est too far from 5000")
  }

  test("kmv aggregation state is the bounded TreeSet heap, not a list") {
    val plan = Sketch.kmvDistinct(
      docs.select(F.col("source"),
        F.explode(TextOps.tokens(F.col("text"))).as("term")),
      Seq("source"), "term", k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_distinct"), s"expected top_k_distinct agg:\n$plan")
    assert(!plan.contains("collect_list"), s"unbounded collect_list in:\n$plan")
  }

  // ---------------------------------------------------- incremental dedup
  test("incremental dedup: store dup / batch dup / new classification") {
    import spark.implicits._
    val batch = Seq(
      (10L, "alpha beta gamma"), // fp in store  -> dup_store
      (11L, "delta epsilon"),    // batch winner -> new
      (12L, "epsilon delta"),    // same fingerprint, higher id -> dup_batch
      (13L, "zeta eta theta")    // unique       -> new
    ).toDF("doc_id", "text")
    val store = Seq("gamma beta alpha").toDF("text")
      .select(Dedup.fingerprint(F.col("text")).as("fingerprint"))
    val r = Dedup.incrementalDedup(batch, store, "doc_id", "text", "fingerprint")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(r == Map(10L -> "dup_store", 11L -> "new",
      12L -> "dup_batch", 13L -> "new"))
  }

  // ----------------------------------------------------------- surprisal
  test("surprisal proxy: hand-computed integer surprisals") {
    import spark.implicits._
    // corpus: a a a a b b c d  → N=8, c(a)=4, c(b)=2, c(c)=c(d)=1
    // floorlog2: N=3, a=2, b=1, c=d=0 → s(a)=1 s(b)=2 s(c)=s(d)=3
    val d = Seq((1L, "a a a a"), (2L, "b b c d")).toDF("doc_id", "text")
    val r = TextOps.surprisalProxy(d, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    assert(r(0) == ((1L, 4L, 1.0)))             // 4·1/4
    assert(r(1) == ((2L, 4L, 2.5)))             // (2+2+3+3)/4
  }

  test("surprisal reuses the cached tf frame instead of re-scanning the corpus") {
    // every consumer (vocabulary re-agg, corpus total, scoring join)
    // must read the persisted tf cache — a FileScan outside an
    // InMemoryRelation's printed cached-plan would be a second real scan
    val plan = TextOps.surprisalProxy(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    try {
      val cacheReads =
        plan.sliding("InMemoryTableScan".length).count(_ == "InMemoryTableScan")
      assert(cacheReads >= 2, s"expected tf cache reuse:\n$plan")
      val firstScan = plan.indexOf("FileScan parquet")
      val firstCache = plan.indexOf("InMemoryRelation")
      assert(firstScan > firstCache,
        s"found a FileScan outside the cached tf plan:\n$plan")
    } finally graft.operators.CacheScope.release(spark)
  }

  // ------------------------------------------------------- split leakage
  test("split leakage: duplicated fingerprints across splits are counted") {
    import spark.implicits._
    // force ids into known buckets by probing the hash
    val ids = (1L to 400L)
    val bucket = (i: Long) =>
      java.lang.Long.remainderUnsigned(graft.operators.Hashing.hash60(i.toString), 10L)
    val holdoutIds = ids.filter(bucket(_) == 9L)
    assert(holdoutIds.nonEmpty)
    val leakId = holdoutIds.head
    val trainId = ids.find(bucket(_) != 9L).get
    // leakId shares text with a train doc; other holdout docs are unique
    val d = ids.map(i =>
      (i, if (i == leakId || i == trainId) "shared text" else s"unique text $i"))
      .toDF("doc_id", "text")
    val r = Dedup.splitLeakage(d, "doc_id", "text", splits = 10, holdoutBucket = 9)
      .head()
    assert(r.getAs[Long]("n_holdout") == holdoutIds.size.toLong)
    assert(r.getAs[Long]("n_train") == (400 - holdoutIds.size).toLong)
    assert(r.getAs[Long]("n_leaked") == 1L)
  }

  // --------------------------------------------------------- vocab build
  test("vocab build: ids follow (freq desc, term asc) with lexical ties") {
    import spark.implicits._
    val d = Seq((1L, "b b b a a c c z"), (2L, "a")).toDF("doc_id", "text")
    // freqs: a=3, b=3, c=2, z=1 → ids: a=1 (tie with b, lexical), b=2, c=3, z=4
    val r = TextOps.vocabBuild(d, "text", size = 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "a", 3L), (2L, "b", 3L), (3L, "c", 2L)))
  }

  test("vocab build plans the top-V as TakeOrdered, not a global sort") {
    val plan = TextOps.vocabBuild(docs, "text", size = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-V heap:\n$plan")
  }

  // ------------------------------------------------------ priority dedup
  test("priority dedup: highest source priority wins, then min doc_id") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y z", "crawl"),   // prio 0
      (2L, "z y x", "curated"), // prio 5 → wins despite higher id
      (3L, "x z y", "crawl"),
      (4L, "solo doc", "crawl")).toDF("doc_id", "text", "source")
    val r = Dedup.priorityDedup(d, "doc_id", "text", "source",
      Map("curated" -> 5))
      .select("keep_id", "keep_source", "n_members")
      .as[(Long, String, Long)].collect().toSet
    assert(r == Set((2L, "curated", 3L), (4L, "crawl", 1L)))
  }

  test("priority dedup aggregates with O(1) state (no window over corpus)") {
    val plan = Dedup.priorityDedup(docs, "doc_id", "text", "source",
      Map("src0" -> 9)).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected window-free agg plan:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_"),
      s"expected map-side partial aggregation:\n$plan")
  }

  // ----------------------------------------------------- domain upsample
  test("domain upsample: whole epochs replicate, fractions hash-select") {
    import spark.implicits._
    val d = (1L to 200L).map(i => (i, if (i <= 100) "hot" else "cold"))
      .toDF("doc_id", "lang")
    val r = Curation.domainUpsample(d, "doc_id", "lang",
      Map("hot" -> 2.0, "cold" -> 0.5))
    val byLang = r.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("hot") == 200L) // every hot doc exactly twice
    // cold: deterministic ~half; exact value fixed by the hash
    val cold = byLang.getOrElse("cold", 0L)
    assert(cold > 20L && cold < 80L, s"cold kept $cold of 100")
    // copy_idx enumerates 1..n_copies
    val bad = r.where(F.col("copy_idx") < 1 ||
      F.col("copy_idx") > F.col("n_copies")).count()
    assert(bad == 0)
    // rerun is bit-identical (hash selection, not rand())
    val again = Curation.domainUpsample(d, "doc_id", "lang",
      Map("hot" -> 2.0, "cold" -> 0.5))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == byLang)
  }

  // ------------------------------------------------------ embedding prep
  test("l2 normalize: unit vectors, norm preserved, zero vector nulls") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.l2Normalize(d, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Double, Seq[Option[Double]])].collect()
    assert(r(0) == ((1L, 5.0, Seq(Some(0.6), Some(0.8)))))
    assert(r(1)._2 == 0.0 && r(1)._3.forall(_.isEmpty)) // 0/0 → null kept
  }

  test("l2 normalize of the corpus: every non-zero vector lands on the sphere") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val unit = graft.operators.Similarity.l2Normalize(emb, "vec_id", "embedding")
    val offSphere = unit.where(F.col("l2_norm") > 0)
      .select(F.aggregate(F.col("unit"), F.lit(0.0), (a, x) => a + x * x).as("n2"))
      .where(F.abs(F.col("n2") - 1.0) > 1e-4)
    assert(offSphere.count() == 0)
  }

  test("int8 quantization: extremes hit -128/127, constants collapse") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(0.0f, 10.0f, 7.0f)),
      (2L, Array(1.0f, 20.0f, 7.0f)),
      (3L, Array(0.5f, 15.0f, 7.0f))).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.quantizeInt8(d, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Seq[Long])].collect()
    // dim1: min 0 → -128, max 1 → 127; dim3 constant → -128
    assert(r(0)._2 == Seq(-128L, -128L, -128L))
    assert(r(1)._2 == Seq(127L, 127L, -128L))
    // 0.5 → floor(0.5*255)=127 → -1; 15 → floor(127.5)=127 → -1
    assert(r(2)._2 == Seq(-1L, -1L, -128L))
    // every component in int8 range
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = graft.operators.Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val out = q.where(F.exists(F.col("q"), x => x < -128L || x > 127L)).count()
    assert(out == 0)
  }

  test("quantized top-k: integer dot ordering with id tie-break") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(10L, 0L)),  // query
      (1L, Seq(5L, 1L)),   // score 50
      (2L, Seq(7L, -3L)),  // score 70
      (3L, Seq(5L, 99L))   // score 50 → ties with 1, id breaks
    ).toDF("vec_id", "q")
    val r = graft.operators.Similarity.quantizedTopK(
      d, d.where(F.col("vec_id") === 0), "vec_id", "q", k = 3)
      .orderBy("rank").as[(Long, Int, Long, Long)].collect()
    assert(r.map(x => (x._2, x._3, x._4)).toSeq ==
      Seq((1, 2L, 70L), (2, 1L, 50L), (3, 3L, 50L)))
  }

  test("pretokenize: letter/digit/punct runs split like a BPE pretokenizer") {
    import spark.implicits._
    val d = Seq((1L, "hello world42 v2.0-beta!")).toDF("doc_id", "text")
    val r = TextOps.pretokenize(d, "doc_id", "text")
      .as[(Long, Long, Long, Seq[String])].head()
    // "hello"," world","42"," v","2",".","0","-","beta","!"
    assert(r._4 == Seq("hello", " world", "42", " v", "2", ".", "0", "-",
      "beta", "!"))
    assert(r._2 == 10L && r._3 == 3L)
  }

  // --------------------------------------------------------- empty inputs
  test("every wave-5 operator handles an empty corpus without nulls") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Privacy.redactPii(noDocs, "doc_id", "text").count() == 0)
    assert(Curation.chunkDocs(noDocs, "doc_id", "text").count() == 0)
    assert(Sketch.kmvDistinct(noDocs, Seq("source"), "text", 4).count() == 0)
    assert(Dedup.incrementalDedup(noDocs, noDocs.select(
      Dedup.fingerprint(F.col("text")).as("fingerprint")),
      "doc_id", "text", "fingerprint").count() == 0)
    assert(TextOps.surprisalProxy(noDocs, "doc_id", "text").count() == 0)
    assert(TextOps.vocabBuild(noDocs, "text", 10).count() == 0)
    assert(Dedup.priorityDedup(noDocs, "doc_id", "text", "source",
      Map("a" -> 1)).count() == 0)
    assert(Curation.domainUpsample(noDocs, "doc_id", "source",
      Map("a" -> 2.0)).count() == 0)
    assert(graft.operators.Similarity.l2Normalize(
      noVecs, "vec_id", "embedding").count() == 0)
    assert(graft.operators.Similarity.quantizeInt8(
      noVecs, "vec_id", "embedding").count() == 0)
    // the leakage audit is a global aggregate: one row, ZERO counts
    val audit = Dedup.splitLeakage(noDocs, "doc_id", "text").head()
    assert(audit.getAs[Long]("n_train") == 0L &&
      audit.getAs[Long]("n_holdout") == 0L &&
      audit.getAs[Long]("n_leaked") == 0L &&
      audit.getAs[Double]("leak_frac") == 0.0)
  }

  test("split leakage is a single-shuffle plan (no self-join, one scan)") {
    val plan = Dedup.splitLeakage(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val scans = plan.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans <= 1, s"expected one corpus scan, got $scans:\n$plan")
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
  }
}
