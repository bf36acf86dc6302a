package graft

import graft.operators.{Hashing, Ivf, Similarity}
import org.apache.spark.sql.{functions => F}

/** Wave-47 audits re-derived from the underlying operators (kNN vote,
  * purity re-aggregation) and from first principles (SRM chi-square). */
class ClusterEvalSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("knn_accuracy equals a driver-side majority-vote replay") {
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val qs = emb.filter(F.expr("vec_id % 25 = 1"))
    val nb = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val preds = nb.groupBy(_._1).view.mapValues { ms =>
      val votes = ms.map(m => labels(m._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      // higher count wins, then SMALLER label
      votes.toSeq.minBy(p => (-p._2, p._1))._1
    }.toMap
    val byTruth = preds.toSeq.groupBy(p => labels(p._1))
    val rows = q("knn_accuracy").collect()
    assert(rows.map(_.getLong(0)).toSet == byTruth.keySet)
    rows.foreach { r =>
      val truth = r.getLong(r.fieldIndex("truth"))
      val ps = byTruth(truth)
      val correct = ps.count(_._2 == truth).toLong
      assert(r.getLong(r.fieldIndex("n_queries")) == ps.length)
      assert(r.getLong(r.fieldIndex("n_correct")) == correct)
      assert(r.getLong(r.fieldIndex("acc_ppm")) ==
        correct * 1000000L / ps.length)
    }
  }

  test("centroid_purity equals re-aggregation of the kmeans assignment") {
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val cents = Ivf.kmeansCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val asg = Ivf.assign(emb, cents, "vec_id", "embedding")
      .select("vec_id", "centroid_label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val byC = asg.groupBy(_._2)
    val rows = q("centroid_purity").collect()
    assert(rows.map(_.getLong(0)).toSet == byC.keySet)
    rows.foreach { r =>
      val ck = r.getLong(r.fieldIndex("centroid_label"))
      val members = byC(ck)
      val cells = members.map(m => labels(m._1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (mLabel, mCount) = cells.toSeq.minBy(p => (-p._2, p._1))
      assert(r.getLong(r.fieldIndex("n_members")) == members.length)
      assert(r.getLong(r.fieldIndex("majority_label")) == mLabel)
      assert(r.getLong(r.fieldIndex("purity_ppm")) ==
        mCount * 1000000L / members.length)
    }
    // every vector lands in exactly one cluster
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_members"))).sum ==
      labels.size)
  }

  test("srm_check equals a first-principles chi-square replay") {
    val folds = graft.queries.Tables.t(spark, sf, "orders")
      .select("o_orderkey").collect()
      .map(r => Hashing.hash60(r.getLong(0).toString) % 5)
    val byFold = folds.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val n = folds.length.toLong
    val terms = byFold.map { case (f, c) =>
      f -> (BigInt(5 * c - n) * (5 * c - n) * 1000000 /
        (BigInt(5) * n)).toLong
    }
    val chi2 = terms.values.sum
    val rows = q("srm_check").collect()
    assert(rows.length == byFold.size)
    rows.foreach { r =>
      val f = r.getLong(r.fieldIndex("fold"))
      assert(r.getLong(r.fieldIndex("n_fold")) == byFold(f))
      assert(r.getLong(r.fieldIndex("term_micro")) == terms(f))
      assert(r.getLong(r.fieldIndex("chi2_micro")) == chi2)
      assert(r.getBoolean(r.fieldIndex("srm_alarm")) ==
        (chi2 > 9488000L))
    }
  }

  test("hard_negatives: different label always, ranks dense, cos ordered") {
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = q("hard_negatives").collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(rs.head.fieldIndex("rank")))
      assert(sorted.map(_.getInt(sorted.head.fieldIndex("rank"))).toSeq ==
        (1 to sorted.length))
      sorted.foreach { r =>
        // the mined negative really has a different label — and the
        // published neg_label matches the corpus
        assert(r.getLong(r.fieldIndex("neg_label")) ==
          labels(r.getLong(r.fieldIndex("match_id"))))
        assert(r.getLong(r.fieldIndex("neg_label")) != labels(qid))
      }
      // cosine non-increasing with rank
      val cs = sorted.map(_.getDouble(sorted.head.fieldIndex("cos")))
      assert(cs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    // a hard negative is never closer than rank-1 of the unrestricted
    // top-k for the same probe (the restriction can only lower cosine)
    val free = Similarity.bruteForceTopK(emb,
      emb.filter(F.expr("vec_id % 25 = 1")), "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("cos"))).toMap
    byQ.foreach { case (qid, rs) =>
      val top = rs.sortBy(_.getInt(rs.head.fieldIndex("rank"))).head
      assert(top.getDouble(top.fieldIndex("cos")) <= free(qid) + 1e-12)
    }
  }

  test("churn_labels equals a driver-side two-window replay") {
    val o = graft.queries.Tables.t(spark, sf, "orders")
      .select(F.col("o_custkey"), F.to_date(F.col("o_orderdate")).as("dt"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val rows = q("churn_labels").collect()
    val cohort = o.filter(_._2.getYear == 1996).map(_._1).distinct
    assert(rows.length == cohort.length)
    rows.foreach { r =>
      val ck = r.getLong(r.fieldIndex("c_custkey"))
      val mine = o.filter(_._1 == ck)
      val obs = mine.filter(_._2.getYear == 1996)
      val out = mine.filter(_._2.getYear == 1997)
      assert(r.getLong(r.fieldIndex("n_orders_obs")) == obs.length)
      assert(r.getLong(r.fieldIndex("cents_obs")) == obs.map(_._3).sum)
      val last = obs.map(_._2).max(Ordering.by((d: java.time.LocalDate) =>
        d.toEpochDay))
      assert(r.getLong(r.fieldIndex("recency_days")) ==
        java.time.LocalDate.of(1996, 12, 31).toEpochDay - last.toEpochDay)
      assert(r.getLong(r.fieldIndex("churned")) ==
        (if (out.isEmpty) 1L else 0L))
    }
  }

  test("stream_conformal matches the batch conformal_threshold row") {
    val a = q("conformal_threshold").collect().map(_.toString).toSeq
    val b = q("stream_conformal").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("stream_ips matches the batch ips_eval row for row") {
    val a = q("ips_eval").collect().map(_.toString).toSeq
    val b = q("stream_ips").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("stream_srm matches the batch srm_check row for row") {
    val a = q("srm_check").collect().map(_.toString).sorted.toSeq
    val b = q("stream_srm").collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("stream_sprt matches the batch ab_sprt row") {
    val a = q("ab_sprt").collect().map(_.toString).toSeq
    val b = q("stream_sprt").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("knn_confusion cells re-aggregate the prediction frame; rows sum to knn_accuracy") {
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val nb = Similarity.bruteForceTopK(emb,
      emb.filter(F.expr("vec_id % 25 = 1")), "vec_id", "embedding", 5)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val preds = nb.groupBy(_._1).view.mapValues { ms =>
      val votes = ms.map(m => labels(m._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      votes.toSeq.minBy(p => (-p._2, p._1))._1
    }.toMap
    val cells = preds.toSeq
      .groupBy(p => (labels(p._1), p._2)).view.mapValues(_.size.toLong)
      .toMap
    val rows = q("knn_confusion").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      cells.keySet)
    val rowTot = cells.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(r.fieldIndex("n")) == cells(key))
      assert(r.getLong(r.fieldIndex("row_share_ppm")) ==
        cells(key) * 1000000L / rowTot(key._1))
    }
    // diagonal totals equal knn_accuracy's n_correct per truth
    val acc = q("knn_accuracy").collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_correct")))
      .toMap
    acc.foreach { case (truth, nc) =>
      assert(cells.getOrElse((truth, truth), 0L) == nc)
    }
  }
}
