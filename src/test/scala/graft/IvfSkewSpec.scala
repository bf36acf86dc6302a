package graft

import graft.operators.{Ivf, Similarity, Skew}
import org.apache.spark.sql.{functions => F}

/** D9 (IVF ANN) + skew patterns. */
class IvfSkewSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("centroids: one float vector of corpus dimension per key") {
    val c = Ivf.centroidsByKey(emb, "label", "embedding")
    val rows = c.collect()
    assert(rows.length == emb.select("label").distinct().count())
    assert(rows.forall(_.getSeq[Float](1).length == 64))
  }

  test("assignment covers every vector exactly once") {
    val centroids = Ivf.centroidsByKey(emb, "label", "embedding")
    val a = Ivf.assign(emb, centroids, "vec_id", "embedding")
    assert(a.count() == emb.count())
    assert(a.select("vec_id").distinct().count() == emb.count())
  }

  test("ivf search: probing more lists converges toward brute force") {
    val centroids = Ivf.centroidsByKey(emb, "label", "embedding")
    val queries = emb.filter(F.col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfAll = Ivf.search(emb, centroids, queries, "vec_id", "embedding",
      k = 5, nprobe = 10) // probe all 10 lists == exhaustive
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAll == brute) // full probe must equal brute force
    val ivf2 = Ivf.search(emb, centroids, queries, "vec_id", "embedding",
      k = 5, nprobe = 2)
    assert(ivf2.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
  }

  test("kmeans quantizer: deterministic, k clusters, full-probe search == brute force") {
    val c1 = Ivf.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
    val c2 = Ivf.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(c1.count() == 8)
    val v1 = c1.orderBy("ckey").collect().map(_.getSeq[Float](1))
    val v2 = c2.orderBy("ckey").collect().map(_.getSeq[Float](1))
    assert(v1.toSeq == v2.toSeq) // deterministic

    val queries = emb.filter(F.col("vec_id") < 2)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.search(emb, c1, queries, "vec_id", "embedding", k = 3, nprobe = 8)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute)
  }

  test("trainFraction trains on the deterministic hash-sample only") {
    import graft.operators.Hashing
    val frac = 0.5
    // the sampled run must equal a full run over the PRE-FILTERED corpus:
    // proof that seeds AND every Lloyd iteration read the sample, nothing else
    val sampled = Ivf.kmeansCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 3, trainFraction = frac)
      .orderBy("ckey").collect().map(_.getSeq[Float](1))
    val manual = emb.filter(
      Hashing.hash60(F.col("vec_id").cast("string")) % 1000000L <
        math.floor(frac * 1e6).toLong)
    assert(manual.count() > 0 && manual.count() < emb.count()) // the sample bites
    val expected = Ivf.kmeansCentroids(manual, "vec_id", "embedding",
      k = 4, iters = 3)
      .orderBy("ckey").collect().map(_.getSeq[Float](1))
    assert(sampled.toSeq == expected.toSeq)
    // and differs from full-corpus training (the parameter has effect)
    val full = Ivf.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 3)
      .orderBy("ckey").collect().map(_.getSeq[Float](1))
    assert(sampled.toSeq != full.toSeq)
    // PQ passes the fraction through to every subspace quantizer
    val cbS = graft.operators.Pq.codebooks(emb, "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 2, trainFraction = frac)
      .orderBy("sub", "ckey").collect().map(_.getSeq[Float](2))
    val cbE = graft.operators.Pq.codebooks(manual, "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 2)
      .orderBy("sub", "ckey").collect().map(_.getSeq[Float](2))
    assert(cbS.toSeq == cbE.toSeq)
  }

  test("salted count equals plain count") {
    val plain = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(li, "l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select(F.col("s_suppkey").as("l_suppkey"), F.col("s_name"))
    val plain = li.join(supp, "l_suppkey").groupBy("s_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, supp, "l_suppkey", 8).groupBy("s_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
