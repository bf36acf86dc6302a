package graft

import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.{functions => F}

/** search_mrr (M17) re-aggregated from the per-query exact/approx
  * frames produced by the already-verified Similarity/Ivf operators —
  * checks the metric assembly (first-hit rank, reciprocal-rank micros,
  * the three closing divisions) independently of the query's join
  * formulation. */
class RetrievalSpec extends SparkSpec {

  test("search_mrr equals re-aggregation of per-query top-5 frames") {
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val qs = emb.filter(F.expr("vec_id % 50 = 3"))
    val qids = qs.select("vec_id").collect().map(_.getLong(0)).sorted
    val exact = Similarity
      .bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.search(emb,
      Ivf.centroidsByKey(emb, "label", "embedding"),
      qs, "vec_id", "embedding", k = 5, nprobe = 2)
      .select("query_id", "rank", "match_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val perq = qids.map { qid =>
      val hits = approx.filter(a =>
        a._1 == qid && exact.contains((qid, a._3)))
      val fr = if (hits.isEmpty) None else Some(hits.map(_._2).min)
      (fr, hits.length.toLong)
    }
    val nq = qids.length.toLong
    val mrr = perq.map {
      case (Some(fr), _) => 1000000L / fr
      case _ => 0L
    }.sum / nq
    val prec = perq.map(_._2).sum * 1000000L / (5L * nq)
    val hit = perq.count(_._1.isDefined).toLong * 1000000L / nq
    val r = SparkEntry.queries("search_mrr")(spark, sf).collect().head
    assert(r.getLong(r.fieldIndex("n_queries")) == nq)
    assert(r.getLong(r.fieldIndex("mrr_micro")) == mrr)
    assert(r.getLong(r.fieldIndex("prec_ppm")) == prec)
    assert(r.getLong(r.fieldIndex("hit_ppm")) == hit)
  }

  test("ivf_nprobe_sweep recall is non-decreasing and matches re-aggregation") {
    val rows = SparkEntry.queries("ivf_nprobe_sweep")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(r => r.getLong(r.fieldIndex("recall_ppm")))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall not monotone: ${recalls.toSeq}")
    // re-derive one sweep point from the operators directly
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val qs = emb.filter(F.col("vec_id") < 5)
    val exact = Similarity
      .bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits2 = Ivf.search(emb,
      Ivf.centroidsByKey(emb, "label", "embedding"),
      qs, "vec_id", "embedding", k = 5, nprobe = 2)
      .select("query_id", "match_id").collect()
      .count(r => exact.contains((r.getLong(0), r.getLong(1)))).toLong
    val nq = qs.count()
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getLong(r2.fieldIndex("n_hits")) == hits2)
    assert(r2.getLong(r2.fieldIndex("recall_ppm")) ==
      hits2 * 1000000L / (5L * nq))
  }
}
