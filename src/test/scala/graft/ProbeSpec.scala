package graft

import org.apache.spark.sql.{functions => F}

/** Wave-19 invariants: n-gram containment, multiprobe LSH, discrete
  * percentiles, and the streaming EWMA twin. */
class ProbeSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ngram_containment directions are consistent with set algebra") {
    val rows = q("ngram_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (cab, cba) = (r.getLong(5), r.getLong(6))
      assert(nc <= math.min(na, nb), "intersection bounded by sizes")
      assert(cab == nc * 1000000L / na && cba == nc * 1000000L / nb)
      assert(cab <= 1000000L && cba <= 1000000L)
      assert(math.max(cab, cba) >= 800000L, "gate")
      // the bigger containment belongs to the smaller set
      if (na < nb) assert(cab >= cba) else if (nb < na) assert(cba >= cab)
    }
    // cross-check against the uncapped Jaccard operator on shared pairs
    val jac = graft.operators.Dedup.ngramJaccardPairs(
      graft.queries.Tables.t(spark, sf, "documents"), "doc_id", "text",
      shingleN = 3, minJaccard = 0.0, maxDocFreq = None)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(jac((r.getLong(0), r.getLong(1))) == r.getLong(2),
        "n_common agrees with the Jaccard operator")
    }
  }

  test("lsh_multiprobe recall dominates the single-bucket probe") {
    val rows = q("lsh_multiprobe").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nh) = (r.getLong(1), r.getLong(2))
      assert(nc > 0L && nh >= 0L && nh <= 5L)
      assert(math.abs(r.getDouble(3) - nh / 5.0) < 1e-9)
    }
    // single-bucket candidates are a strict subset of multiprobe's, so
    // per-query multiprobe candidate counts must dominate
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val b = graft.operators.Similarity.hyperplaneBuckets(
      emb, "vec_id", "embedding", planes = 8, dim = 64)
    val byBucket = b.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = byBucket.values.groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val qid = r.getLong(0)
      val single = counts(byBucket(qid)) - 1 // same bucket minus self
      assert(r.getLong(1) >= single, s"query $qid examines >= single-bucket")
    }
  }

  test("percentile_disc picks actual values at the right ranks") {
    val rows = q("percentile_disc").collect()
    val cents = graft.queries.Tables.t(spark, sf, "lineitem")
      .select(F.col("l_returnflag"),
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vs = cents(r.getString(0))
      val n = vs.length
      def disc(p: Int): Long = vs((p * n + 99) / 100 - 1) // ceil(p*n/100), 1-based
      assert(r.getLong(1) == disc(25))
      assert(r.getLong(2) == disc(50))
      assert(r.getLong(3) == disc(75))
      assert(r.getLong(4) == disc(90))
      assert(r.getLong(5) == n)
    }
  }

  test("stream_ewma equals its batch twin exactly") {
    val stream = q("stream_ewma").collect().map(_.toSeq)
    val batch = q("ewma_smooth").collect().map(_.toSeq)
    assert(stream.nonEmpty)
    assert(stream.sameElements(batch))
  }
}
