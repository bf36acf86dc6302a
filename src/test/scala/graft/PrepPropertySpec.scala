package graft

import graft.operators.{Curation, Dedup, Sketch}
import org.apache.spark.sql.{functions => F}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the wave-5 prep operators: structural invariants
  * that must hold for ANY corpus, checked over deterministic ScalaCheck
  * samples (same offline sampling bridge as DslPropertySpec). */
class PrepPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toSeq
  }

  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta"))
  } yield ws.mkString(" ")

  private def corpus(nDocs: Int, seed: Long) = {
    import spark.implicits._
    samples(genDoc, nDocs, seed).zipWithIndex
      .map { case (t, i) => (i.toLong + 1, t) }.toDF("doc_id", "text")
  }

  test("chunking: chunk count is ceil(len/stride); tokens partition at stride==size") {
    import spark.implicits._
    for (seed <- 1L to 3L; (size, stride) <- Seq((8, 8), (8, 5), (3, 7))) {
      val d = corpus(30, seed)
      val chunks = Curation.chunkDocs(d, "doc_id", "text", size, stride)
      val got = chunks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).as("n_chunks"), F.sum("n_tokens").as("tok_sum"))
      val expected = d.select(F.col("doc_id"),
        F.size(graft.operators.TextOps.tokens(F.col("text"))).as("len"))
      val joined = got.join(expected, "doc_id")
        .as[(Long, Long, Long, Int)].collect()
      joined.foreach { case (id, nChunks, tokSum, len) =>
        assert(nChunks == (len + stride - 1) / stride,
          s"doc $id: $nChunks chunks for len=$len stride=$stride")
        if (stride == size)
          assert(tokSum == len, s"doc $id: partition lost tokens")
        if (stride < size) // overlap can only add coverage
          assert(tokSum >= len, s"doc $id: overlap dropped tokens")
      }
    }
  }

  test("kmv: estimate is EXACT whenever a group has fewer than k distinct values") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val d = corpus(40, seed)
        .select(F.col("doc_id"), F.explode(
          graft.operators.TextOps.tokens(F.col("text"))).as("term"))
        .withColumn("g", F.pmod(F.col("doc_id"), F.lit(3L)))
      val exact = d.groupBy("g").agg(
        F.countDistinct("term").cast("double").as("truth"))
      // vocabulary is 8 words → every group is under-filled at k=64
      val est = Sketch.kmvDistinct(d, Seq("g"), "term", k = 64)
      val bad = est.join(exact, "g")
        .where(F.col("est_distinct") =!= F.col("truth"))
      assert(bad.count() == 0)
    }
  }

  test("split leakage: counts partition the corpus and bound the leaks") {
    for (seed <- 1L to 3L) {
      val d = corpus(60, seed) // tiny vocab → heavy fingerprint dup
      val total = d.count()
      val r = Dedup.splitLeakage(d, "doc_id", "text").head()
      val (tr, ho, lk) = (r.getAs[Long]("n_train"),
        r.getAs[Long]("n_holdout"), r.getAs[Long]("n_leaked"))
      assert(tr + ho == total)
      assert(lk >= 0 && lk <= ho)
    }
  }

  test("incremental dedup: statuses partition the batch; one winner per new fp") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val all = corpus(50, seed)
      val batch = all.where(F.col("doc_id") % 5 === 0)
      val store = all.where(F.col("doc_id") % 5 =!= 0)
        .select(Dedup.fingerprint(F.col("text")).as("fingerprint"))
      val r = Dedup.incrementalDedup(batch, store, "doc_id", "text", "fingerprint")
      assert(r.count() == batch.count()) // total function of the batch
      // exactly one 'new' winner per fingerprint absent from the store
      val winners = r.where(F.col("status") === "new")
        .groupBy("fingerprint").count().where(F.col("count") > 1)
      assert(winners.count() == 0)
      // no fingerprint has both dup_store and new/dup_batch members
      val mixed = r.groupBy("fingerprint")
        .agg(F.count_distinct(F.when(F.col("status") === "dup_store", 1)
          .otherwise(0)).as("kinds"))
        .where(F.col("kinds") > 1)
      assert(mixed.count() == 0)
    }
  }

  test("substring dup stats: window accounting holds; a doubled corpus is 100% duplicated") {
    import spark.implicits._
    val w = 3
    for (seed <- 1L to 3L) {
      val d = corpus(40, seed)
      val got = Dedup.substringDupStats(d, "doc_id", "text", w)
      // bounds + exact window count per doc: max(0, len - w + 1)
      assert(got.where(F.col("n_dup_windows") > F.col("n_windows")).count() == 0)
      val expectedWindows = d
        .select(F.greatest(F.lit(0L),
          (F.size(F.split(F.lower(F.col("text")), " +")) - (w - 1)).cast("long"))
          .as("nw"))
        .agg(F.sum("nw")).head().getLong(0)
      assert(got.agg(F.sum("n_windows")).head().getLong(0) == expectedWindows)
      graft.operators.CacheScope.release(spark)
      // doubling the corpus makes EVERY window corpus-duplicated
      val doubled = d.unionByName(
        d.withColumn("doc_id", F.col("doc_id") + 1000L))
      val dd = Dedup.substringDupStats(doubled, "doc_id", "text", w)
      assert(dd.where(F.col("dup_frac") =!= 1.0).count() == 0,
        "every window of a doubled corpus occurs >= 2 times")
      graft.operators.CacheScope.release(spark)
    }
  }
}
