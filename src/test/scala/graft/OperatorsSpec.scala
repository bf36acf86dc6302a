package graft

import graft.operators._
import org.apache.spark.sql.{functions => F}

/** Dedup / similarity / text operators on the sf0.001 test tables. */
class OperatorsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup groups cover all docs") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.agg(F.sum("n_dups")).head().getLong(0) == docs.count())
  }

  test("connected components: transitivity across a path needs multiple rounds") {
    import spark.implicits._
    // path 1-2-3-4-5 (diameter 4 → several propagation rounds),
    // separate pair 10-11, and a triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // distributed propagation loop, forced past the union-find cutoff
    val dist = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
      localThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(dist == expected)
    // default hybrid path (small graph → driver union-find) agrees
    val local = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(local == expected)
    graft.operators.CacheScope.release(spark)
  }

  test("connected components agree with exact-dup groups on clique pairs") {
    import spark.implicits._
    // pairs generated within exact-dup groups are cliques → components
    // must reproduce the groups exactly (min id as representative)
    val dup = docs.select(F.md5(F.col("text")).as("h"), F.col("doc_id"))
    val pairs = dup.join(dup.withColumnRenamed("doc_id", "doc_b"), "h")
      .filter(F.col("doc_id") < F.col("doc_b"))
      .select(F.col("doc_id").as("doc_a"), F.col("doc_b"))
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val expected = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(F.col("n_dups") > 1)
      .select(F.col("keep_id")).as[Long].collect().toSet
    val gotReps = cc.select("cluster_id").distinct().as[Long].collect().toSet
    assert(gotReps == expected)
    graft.operators.CacheScope.release(spark)
  }

  test("star-contract CC: 500-hop path converges in <= 2*log2(n) rounds") {
    import spark.implicits._
    // adversarial diameter: a path 0-1-2-...-500. Plain min-label
    // propagation needs ~500 rounds; pointer jumping doubles label
    // reach per round, so 2*ceil(log2(501)) = 18 rounds must suffice —
    // maxRounds IS the property (non-convergence throws).
    val n = 500
    val pairs = (0 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val budget = 2 * math.ceil(math.log(n + 1) / math.log(2)).toInt
    val got = Dedup.connectedComponentsStarContract(
      pairs, "doc_a", "doc_b", maxRounds = budget, localThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(got.length == n + 1)
    assert(got.forall(_._2 == 0L), "every vertex labels the path min")
    graft.operators.CacheScope.release(spark)
  }

  test("star-contract CC equals propagation CC on a mixed graph") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val prop = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
      localThreshold = 0L).as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStarContract(pairs, "doc_a", "doc_b",
      localThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(star == prop)
    graft.operators.CacheScope.release(spark)
  }

  test("substring-window dup stats: cross-doc and intra-doc repetition both count") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f"),      // 4 windows at w=3, all shared with doc 3
      (2L, "a b c x y"),        // 3 windows; only 'a b c' repeats
      (3L, "a b c d e f"),      // exact duplicate of doc 1
      (4L, "p q r p q r p q"),  // every window repeats WITHIN the doc
      (5L, "z z")               // < w tokens: no windows, absent
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(d, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((3L, 1L, 0.333333)))
    assert(got(3L) == ((4L, 4L, 1.0)))
    assert(got(4L) == ((6L, 6L, 1.0)), "intra-doc repeats are duplication")
    graft.operators.CacheScope.release(spark)
  }

  test("semantic dedup keeps one representative per tight embedding cluster") {
    import spark.implicits._
    def vec(base: Float, jitter: Float): Seq[Float] =
      (0 until 64).map(i => if (i % 2 == 0) base + jitter else base - jitter)
    val corpus = ((1L to 4L).map(i => (i, vec(10f, i * 0.01f))) ++
      (5L to 8L).map(i => (i, vec(-10f, i * 0.01f))))
      .toDF("vec_id", "embedding")
      .select(F.col("vec_id"), F.col("embedding").cast("array<float>"))
    val got = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      k = 2, iters = 2, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got.size == 8)
    val kept = got.collect { case (id, (_, 1L)) => id }.toSet
    assert(kept == Set(1L, 5L), s"one min-id representative per cluster, got $kept")
    // members of one semantic cluster share the kmeans label (tight blobs)
    assert((1L to 4L).map(got(_)._1).toSet.size == 1)
    assert((5L to 8L).map(got(_)._1).toSet.size == 1)
    graft.operators.CacheScope.release(spark)
  }

  test("fingerprint ignores token order and repetition") {
    import spark.implicits._
    val d = Seq((1L, "b a a c"), (2L, "a b c c"), (3L, "x y")).toDF("doc_id", "text")
    val g = Dedup.fingerprintGroups(d, "doc_id", "text").collect()
    assert(g.length == 2)
    assert(g.find(_.getLong(2) == 2L).get.getLong(1) == 1L) // keep min id
  }

  test("minhash LSH finds the near-duplicate pairs found by exact jaccard") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH with 4 bands of 4 rows catches j>=0.8 pairs w.h.p.
    assert(exact.nonEmpty || lsh.isEmpty || true) // structural guard
    assert((exact -- lsh).isEmpty, s"missed pairs: ${exact -- lsh}")
  }

  test("simhash of identical texts equal, near hamming for near-dups") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "q r s t u v w")).toDF("doc_id", "text")
    val s = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    assert(java.lang.Long.bitCount(s(1L) ^ s(3L)) > 0)
  }

  test("cosine matches manual computation") {
    import spark.implicits._
    val d = Seq((Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f))).toDF("a", "b")
    val c = d.select(Similarity.cosine(F.col("a"), F.col("b"))).head().getDouble(0)
    val expected = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(c - expected) < 1e-6)
  }

  test("brute-force top-k returns k ranked matches per query") {
    val topk = Similarity.bruteForceTopK(emb, emb.filter(F.col("vec_id") < 2),
      "vec_id", "embedding", 3)
    val byQ = topk.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
      val cosines = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.sliding(2).forall(p => p(0) >= p(1))) // descending
    }
  }

  test("hyperplane buckets deterministic and bounded") {
    val b = Similarity.hyperplaneBuckets(emb, "vec_id", "embedding", planes = 8)
    val vals = b.select("bucket").collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v < 256))
    val again = Similarity.hyperplaneBuckets(emb, "vec_id", "embedding", planes = 8)
      .select("bucket").collect().map(_.getLong(0))
    assert(vals.toSeq == again.toSeq)
  }

  test("language id picks marker language") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog"), (2L, "le chat et la mer les amis"),
      (3L, "der hund und die katze"), (4L, "xyz qqq")).toDF("doc_id", "text")
    val out = d.select(F.col("doc_id"), TextOps.langId(F.col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "unknown"))
  }

  test("shingles guarded for short docs") {
    import spark.implicits._
    val d = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = d.select(F.col("doc_id"), TextOps.shingles(F.col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty)
    assert(sh(2L) == Seq("a b c", "b c d"))
  }
}
