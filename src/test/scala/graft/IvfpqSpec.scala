package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.{Ivf, Pq}
import graft.queries.Tables.t

/** D52/D52b invariants for the composed IVFPQ index. */
class IvfpqSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val emb = t(spark, sf, "embeddings")
  private lazy val cents = Ivf.centroidsByKey(emb, "label", "embedding")
  private lazy val cb = Pq.codebooks(emb, "vec_id", "embedding", 4, 16, 8, 2)
  private lazy val queries = emb.where(F.col("vec_id") < 5)

  test("ivfpq with nprobe = all lists equals the unrouted ADC rerank") {
    // restricting to EVERY list is no restriction: the composition must
    // then reproduce the D14d shortlist-rerank exactly
    val nLists = cents.count().toInt
    val full = Pq.ivfpqTopK(emb, cents, cb, queries,
      "vec_id", "embedding", k = 5, nprobe = nLists, shortlistK = 20)
      .collect().map(_.toString).sorted.toSeq
    val rerank = q("embed_pq_rerank").collect()
      .map(r => org.apache.spark.sql.Row(
        r.getLong(r.fieldIndex("query_id")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("match_id")),
        r.getDouble(r.fieldIndex("cos"))).toString)
      .sorted.toSeq
    assert(full == rerank)
  }

  test("every ivfpq_search match lies in one of its query's probed lists") {
    val asg = Ivf.assign(emb, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // replay the routing: top-3 lists per query by (cos DESC, ckey)
    val centRows = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val probed = queries.select("vec_id", "embedding").collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      r.getLong(0) -> centRows
        .map { case (ck, c) => (ck, cos(v, c)) }
        .sortBy { case (ck, s) => (-s, ck) }.take(3).map(_._1).toSet
    }.toMap
    q("ivfpq_search").collect().foreach { r =>
      val qid = r.getLong(r.fieldIndex("query_id"))
      val mid = r.getLong(r.fieldIndex("match_id"))
      assert(probed(qid).contains(asg(mid)),
        s"match $mid (list ${asg(mid)}) outside query $qid's " +
          s"probed lists ${probed(qid)}")
    }
  }

  test("ivfpq_recall is bounded by 1 and consistent with its hits") {
    val k = graft.queries.RefineQueries.IVFPQ_K
    q("ivfpq_recall").collect().foreach { r =>
      val hits = r.getLong(r.fieldIndex("n_hits"))
      assert(hits >= 0L && hits <= k.toLong)
      assert(r.getDouble(r.fieldIndex("recall")) == hits.toDouble / k)
    }
  }

  test("staged residual corpus is the exact float32 x - centroid(list)") {
    val cmap = graft.queries.Staged.ivfCentroids(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    val amap = graft.queries.Staged.ivfAssignments(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orig = emb.select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val res = graft.queries.Staged.pqResidualCorpus(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(res.length == orig.size)
    res.foreach { case (id, rv) =>
      val c = cmap(amap(id)); val x = orig(id)
      rv.indices.foreach { i =>
        assert(rv(i) == x(i) - c(i), // IEEE float32 subtraction, exact
          s"vec $id dim $i: ${rv(i)} vs ${x(i) - c(i)}")
      }
    }
    graft.operators.CacheScope.release(spark)
  }

  test("every ivfpq_residual match lies in a probed list and reranks " +
    "by exact cosine") {
    val rows = q("ivfpq_residual").collect()
    assert(rows.length == 25, "5 queries x 5 ranks")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(rs.head.fieldIndex("rank")))
      val coss = byRank.map(_.getDouble(byRank.head.fieldIndex("cos")))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b },
        "ranks must be cos-descending")
    }
    graft.operators.CacheScope.release(spark)
  }

  test("ivfpq_residual_recall is bounded and consistent with its hits") {
    val k = graft.queries.RefineQueries.IVFPQ_K
    q("ivfpq_residual_recall").collect().foreach { r =>
      val hits = r.getLong(r.fieldIndex("n_hits"))
      assert(hits >= 0L && hits <= k.toLong)
      assert(r.getDouble(r.fieldIndex("recall")) == hits.toDouble / k)
    }
  }

  test("serve paths on prebuilt artifacts equal the inline builds") {
    // the build/serve split must be a pure refactoring of WHERE the
    // index parts come from, never of the results
    val asg = Ivf.assign(emb, cents, "vec_id", "embedding")
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", 4, 16)
    val served = Pq.ivfpqServe(emb, asg, codes, cents, cb, queries,
      "vec_id", "embedding", k = 5, nprobe = 3, shortlistK = 20)
      .collect().map(_.toString).sorted.toSeq
    val inline = Pq.ivfpqTopK(emb, cents, cb, queries,
      "vec_id", "embedding", k = 5, nprobe = 3, shortlistK = 20)
      .collect().map(_.toString).sorted.toSeq
    assert(served == inline)
    val sa = Ivf.searchAssigned(emb, asg, cents, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    val s0 = Ivf.search(emb, cents, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(sa == s0)
    graft.operators.CacheScope.release(spark)
  }
}
