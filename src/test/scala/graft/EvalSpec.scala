package graft

import org.apache.spark.sql.{functions => F}

/** Round-6 eval-suite invariants: each metric re-derived brute-force on
  * the small SF (AUC by literally counting concordant pairs, Gini from
  * a driver-side sorted cumsum, KS from the two empirical CDFs) and
  * compared to the distributed query's exact-integer output. */
class EvalSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (label, score) pairs exactly as the scorer defines them. */
  private def scoredPairs(): Array[(Long, Long)] = {
    val stop = Set("the", "and", "of", "to", "in", "a", "is")
    graft.queries.Tables.t(spark, sf, "documents")
      .select("lang", "text").collect().map { r =>
        val toks = r.getString(1).toLowerCase.split(" +").filter(_.nonEmpty)
        val score =
          1000L * toks.count(stop) / math.max(toks.length, 1).toLong
        (if (r.getString(0) == "en") 1L else 0L, score)
      }
  }

  test("eval_auc equals the brute-force pairwise AUC (ties at half credit)") {
    val pairs = scoredPairs()
    val pos = pairs.filter(_._1 == 1L).map(_._2)
    val neg = pairs.filter(_._1 == 0L).map(_._2)
    var u2 = 0L // doubled U: win=2, tie=1
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val r = q("eval_auc").collect().head
    assert(r.getLong(r.fieldIndex("p_count")) == pos.length)
    assert(r.getLong(r.fieldIndex("n_count")) == neg.length)
    assert(r.getLong(r.fieldIndex("u2")) == u2)
    assert(r.getLong(r.fieldIndex("auc_micros")) ==
      u2 * 500000L / (pos.length.toLong * neg.length))
  }

  test("eval_calibration buckets partition the corpus and rates are exact") {
    val rows = q("eval_calibration").collect()
    val pairs = scoredPairs()
    assert(rows.map(_.getLong(1)).sum == pairs.length)
    rows.foreach { r =>
      val b = r.getLong(r.fieldIndex("bucket"))
      val inB = pairs.filter(p => p._2 / 100 == b)
      assert(r.getLong(r.fieldIndex("n_docs")) == inB.length)
      assert(r.getLong(r.fieldIndex("n_pos")) == inB.count(_._1 == 1L))
      assert(r.getLong(r.fieldIndex("pos_rate_micros")) ==
        1000000L * inB.count(_._1 == 1L) / inB.length)
    }
  }

  test("eval_lift deciles cover the corpus; top decile lift >= bottom") {
    val rows = q("eval_lift").collect().sortBy(_.getLong(0))
    val pairs = scoredPairs()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum ==
      pairs.length)
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_pos"))).sum ==
      pairs.count(_._1 == 1L))
    // capture is monotone nondecreasing in decile
    val caps = rows.map(r => r.getLong(r.fieldIndex("capture_micros")))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b })
    assert(caps.last == 1000000L)
  }

  test("ks_drift equals the brute-force sup over the merged support") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0) == "en", r.getLong(1)))
    val a = docs.filter(_._1).map(_._2).sorted
    val b = docs.filterNot(_._1).map(_._2).sorted
    val support = (a ++ b).distinct.sorted
    val sup = support.map { v =>
      a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length
    }.map(math.abs).max
    val r = q("ks_drift").collect().head
    assert(r.getLong(r.fieldIndex("na")) == a.length)
    assert(r.getLong(r.fieldIndex("nb")) == b.length)
    assert(r.getLong(r.fieldIndex("d_scaled")) == sup)
  }

  test("gini_concentration matches a driver-side sorted-rank Gini") {
    val rows = q("gini_concentration").collect()
    val byCust = graft.queries.Tables.t(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
      .join(graft.queries.Tables.t(spark, sf, "customer")
        .select(F.col("c_custkey").as("o_custkey"),
          F.col("c_mktsegment").as("seg")), "o_custkey")
      .collect()
      .map(r => (r.getString(r.fieldIndex("seg")),
        r.getLong(r.fieldIndex("o_custkey")),
        r.getLong(r.fieldIndex("cents"))))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getString(0)
      val xs = byCust(seg).sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toLong
      val s = xs.sum
      val rw = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      assert(r.getLong(r.fieldIndex("n_cust")) == n, seg)
      assert(r.getLong(r.fieldIndex("rank_weighted")) == rw, seg)
      val expect = (BigInt(rw) * 2000000 / (BigInt(n) * s)).toLong -
        1000000L * (n + 1) / n
      assert(r.getLong(r.fieldIndex("gini_micros")) == expect, seg)
    }
  }

  test("seasonality_dow indexes average to ~1 and cover all order days") {
    val rows = q("seasonality_dow").collect()
    assert(rows.map(_.getLong(rows.head.fieldIndex("dow"))).toSet
      .subsetOf((1L to 7L).toSet))
    val n = rows.map(_.getLong(rows.head.fieldIndex("n_orders"))).sum
    val rev = rows.map(_.getLong(rows.head.fieldIndex("rev_cents"))).sum
    // weighted mean of index over orders is 1 by construction (up to
    // the per-row floor): sum(n_d * idx_d) in [1e6*N - 7*N, 1e6*N]
    val wsum = rows.map(r => r.getLong(r.fieldIndex("n_orders")) *
      r.getLong(r.fieldIndex("index_micros"))).sum
    assert(wsum <= 1000000L * n && wsum > 1000000L * n - 7L * n,
      s"wsum=$wsum n=$n rev=$rev")
  }

  test("autocorr_lag is a valid correlation and matches driver replay") {
    val daily = graft.queries.Tables.t(spark, sf, "orders")
      .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val pairs = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d.minusDays(7)).map(y => (x, y))
    }
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
    val sxy = pairs.map(p => p._1.toDouble * p._2).sum
    val sxx = pairs.map(p => p._1.toDouble * p._1).sum
    val syy = pairs.map(p => p._2.toDouble * p._2).sum
    val expect = (sxy - sx * sy / n) /
      (math.sqrt(sxx - sx * sx / n) * math.sqrt(syy - sy * sy / n))
    val r = q("autocorr_lag").collect().head
    assert(r.getLong(r.fieldIndex("n")) == pairs.length)
    val got = r.getDouble(r.fieldIndex("autocorr_7"))
    assert(math.abs(got - expect) < 1e-4, s"got=$got expect=$expect")
    assert(got >= -1.0 && got <= 1.0)
  }

  /** Score-grouped (score, n_pos, n_neg) descending — the frame the PR
    * family cumulates over. */
  private def byScoreDesc(): Seq[(Long, Long, Long)] =
    scoredPairs().groupBy(_._2).toSeq.map { case (s2, ps) =>
      (s2, ps.count(_._1 == 1L).toLong, ps.count(_._1 == 0L).toLong)
    }.sortBy(-_._1)

  test("eval_pr_curve matches the brute-force descending cumulation") {
    val p = scoredPairs().count(_._1 == 1L).toLong
    var tp = 0L; var fp = 0L
    val expect = byScoreDesc().map { case (s2, np, nn) =>
      tp += np; fp += nn
      (s2, tp, fp, tp * 1000000L / (tp + fp), tp * 1000000L / p)
    }
    val rows = q("eval_pr_curve").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows == expect)
  }

  test("eval_pr_auc equals the brute-force average precision") {
    val pairs = scoredPairs()
    val p = pairs.count(_._1 == 1L).toLong
    var tp = 0L; var fp = 0L; var num = BigInt(0)
    byScoreDesc().foreach { case (_, np, nn) =>
      tp += np; fp += nn
      num += BigInt(np) * (tp * 1000000L / (tp + fp))
    }
    val r = q("eval_pr_auc").collect().head
    assert(r.getLong(r.fieldIndex("p_count")) == p)
    assert(r.getLong(r.fieldIndex("n_count")) ==
      pairs.length.toLong - p)
    assert(r.getLong(r.fieldIndex("ap_ppm")) == (num / p).toLong)
    // AP of a weak-but-positive scorer sits strictly between the
    // positive base rate (random) and perfection
    assert(r.getLong(r.fieldIndex("ap_ppm")) <= 1000000L)
  }

  test("eval_confusion: counts partition the corpus at every threshold") {
    val pairs = scoredPairs()
    val rows = q("eval_confusion").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1 to 9).map(_ * 100L))
    rows.foreach { r =>
      val th = r.getLong(r.fieldIndex("th"))
      val tp = pairs.count(x => x._2 >= th && x._1 == 1L).toLong
      val fp = pairs.count(x => x._2 >= th && x._1 == 0L).toLong
      val tn = pairs.count(x => x._2 < th && x._1 == 0L).toLong
      val fn = pairs.count(x => x._2 < th && x._1 == 1L).toLong
      assert(r.getLong(r.fieldIndex("tp")) == tp)
      assert(r.getLong(r.fieldIndex("fp")) == fp)
      assert(r.getLong(r.fieldIndex("tn")) == tn)
      assert(r.getLong(r.fieldIndex("fn")) == fn)
      assert(r.getLong(r.fieldIndex("accuracy_ppm")) ==
        (tp + tn) * 1000000L / pairs.length)
      if (2 * tp + fp + fn > 0)
        assert(r.getLong(r.fieldIndex("f1_ppm")) ==
          2 * tp * 1000000L / (2 * tp + fp + fn))
      else assert(r.isNullAt(r.fieldIndex("f1_ppm")))
    }
  }

  test("conformal_threshold equals a driver-side order-statistic replay") {
    val stop = Set("the", "and", "of", "to", "in", "a", "is")
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect().map { r =>
        val toks = r.getString(2).toLowerCase.split(" +").filter(_.nonEmpty)
        val score =
          1000L * toks.count(stop) / math.max(toks.length, 1).toLong
        val lbl = if (r.getString(1) == "en") 1L else 0L
        (r.getLong(0), math.abs(score - 1000L * lbl))
      }
    val (cal, test) = docs.partition(d =>
      graft.operators.Hashing.hash60(d._1.toString) % 5 == 0)
    val n = cal.length.toLong
    val k = ((n + 1) * 9 + 9) / 10
    val qThr = cal.map(_._2).sorted.apply((k - 1).toInt)
    val covered = test.count(_._2 <= qThr).toLong
    val r = q("conformal_threshold").collect().head
    assert(r.getLong(r.fieldIndex("n_cal")) == n)
    assert(r.getLong(r.fieldIndex("k_rank")) == k)
    assert(r.getLong(r.fieldIndex("q_threshold")) == qThr)
    assert(r.getLong(r.fieldIndex("n_test")) == test.length)
    assert(r.getLong(r.fieldIndex("n_covered")) == covered)
    assert(r.getLong(r.fieldIndex("coverage_ppm")) ==
      covered * 1000000L / test.length)
    // the conformal guarantee: coverage should sit near 1-alpha
    assert(r.getLong(r.fieldIndex("coverage_ppm")) >= 800000L)
  }

  test("power_sample_size equals the closed-form replay; monotone in lift") {
    val rows = q("power_sample_size").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(5L, 10L, 20L))
    val ev = graft.queries.Tables.t(spark, sf, "events")
      .select("event_type").collect().map(_.getString(0))
    val p1ppm = ev.count(_ == "purchase").toLong * 1000000L / ev.length
    rows.foreach { r =>
      val lift = r.getLong(r.fieldIndex("lift_pct"))
      assert(r.getLong(r.fieldIndex("p1_ppm")) == p1ppm)
      val p2ppm = p1ppm * (100 + lift) / 100
      assert(r.getLong(r.fieldIndex("p2_ppm")) == p2ppm)
      val p1 = p1ppm / 1e6; val p2 = p2ppm / 1e6
      val pbar = (p1ppm + p2ppm) / 2e6
      val expect = math.ceil(
        math.pow(1.959964 * math.sqrt(2 * pbar * (1 - pbar)) +
          0.841621 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2) /
          math.pow(p2 - p1, 2)).toLong
      assert(r.getLong(r.fieldIndex("n_per_arm")) == expect)
    }
    // bigger detectable lift needs fewer users
    val ns = rows.map(_.getLong(rows.head.fieldIndex("n_per_arm")))
    assert(ns(0) > ns(1) && ns(1) > ns(2))
  }

  test("ips_eval equals a driver-side Horvitz-Thompson replay") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
      .select(F.col("event_type"),
        F.expr("CAST(floor(value * 1e6) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = ev.length.toLong
    val srAll = ev.map(_._2).sum
    val rows = q("ips_eval").collect()
    val nActions = ev.map(_._1).distinct.length.toLong
    assert(rows.length == nActions)
    rows.foreach { r =>
      val a = r.getString(r.fieldIndex("action"))
      val mine = ev.filter(_._1 == a)
      val na = mine.length.toLong
      val sr = mine.map(_._2).sum
      assert(r.getLong(r.fieldIndex("n_a")) == na)
      // the uniform-target action count is derived from the logged
      // frame, not hardcoded — a silent zero-event arm would show here
      assert(r.getLong(r.fieldIndex("n_actions")) == nActions)
      assert(r.getLong(r.fieldIndex("mean_reward_micro")) == sr / na)
      assert(r.getLong(r.fieldIndex("ips_weight_ppm")) ==
        (BigInt(n) * 1000000 / (nActions * na)).toLong)
      assert(r.getLong(r.fieldIndex("ips_term_micro")) ==
        sr / (nActions * na))
      assert(r.getLong(r.fieldIndex("behavior_mean_micro")) == srAll / n)
    }
    // identity: if the behavior policy were uniform, Sigma terms would
    // equal the behavior mean; with near-uniform logging they are close
    val ipsTotal = rows
      .map(_.getLong(rows.head.fieldIndex("ips_term_micro"))).sum
    assert(math.abs(ipsTotal - srAll / n) < srAll / n / 10)
  }

  test("fairness_audit AUC matches a per-group pairwise count") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .select(F.col("lang"),
        F.expr("CASE WHEN n_chars > 1000 THEN 1L ELSE 0L END"),
        F.round(graft.operators.TextOps
          .qualityColumns(F.col("text")).toMap.apply("quality") * 1000)
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = q("fairness_audit").collect()
    val gp = docs.count(_._2 == 1L).toLong
    val gn = docs.length.toLong
    rows.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      val mine = docs.filter(_._1 == lang)
      val pos = mine.filter(_._2 == 1L).map(_._3)
      val neg = mine.filter(_._2 == 0L).map(_._3)
      assert(r.getLong(r.fieldIndex("n_docs")) == mine.length)
      assert(r.getLong(r.fieldIndex("p_count")) == pos.length)
      assert(r.getLong(r.fieldIndex("pos_rate_ppm")) ==
        pos.length.toLong * 1000000L / mine.length)
      assert(r.getLong(r.fieldIndex("parity_gap_ppm")) ==
        pos.length.toLong * 1000000L / mine.length -
          gp * 1000000L / gn)
      if (pos.nonEmpty && neg.nonEmpty) {
        var u2 = 0L
        for (p <- pos; q2 <- neg)
          u2 += (if (p > q2) 2L else if (p == q2) 1L else 0L)
        assert(r.getLong(r.fieldIndex("auc_micros")) ==
          (BigInt(u2) * 500000 /
            (BigInt(pos.length) * neg.length)).toLong, s"lang=$lang")
      } else assert(r.isNullAt(r.fieldIndex("auc_micros")))
    }
  }

  test("dr_eval equals a driver-side cross-fitted replay") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
      .select(F.col("event_type"), F.col("event_id"),
        F.expr("CAST(floor(value * 1e6) AS BIGINT)"))
      .collect().map(r => (r.getString(0),
        graft.operators.Hashing.hash60(r.getLong(1).toString) % 2,
        r.getLong(2)))
    val rows = q("dr_eval").collect()
    rows.foreach { r =>
      val a = r.getString(r.fieldIndex("action"))
      val m = ev.filter(e => e._1 == a && e._2 == 0L)
      val e2 = ev.filter(e => e._1 == a && e._2 == 1L)
      val qhat = m.map(_._3).sum / m.length
      assert(r.getLong(r.fieldIndex("n_m")) == m.length)
      assert(r.getLong(r.fieldIndex("n_e")) == e2.length)
      assert(r.getLong(r.fieldIndex("q_hat_micro")) == qhat)
      assert(r.getLong(r.fieldIndex("direct_micro")) == qhat / 5)
      val resid = e2.map(_._3).sum - e2.length * qhat
      assert(r.getLong(r.fieldIndex("correction_micro")) ==
        resid / (5 * e2.length))
      assert(r.getLong(r.fieldIndex("dr_term_micro")) ==
        qhat / 5 + resid / (5 * e2.length))
    }
  }

  test("calibration_ece equals a replay with an inclusive top bin") {
    // replay from raw (label, score) pairs: bin = min(score div 100, 9)
    // — score 1000 joins bin 9 (midpoint 0.95), standard 10-bin ECE
    val pairs = scoredPairs()
    val cal = pairs.groupBy { case (_, sc) => math.min(sc / 100, 9L) }
      .map { case (b, xs) =>
        val nb = xs.length.toLong
        val rate = xs.map(_._1).sum * 1000000L / nb
        (b, nb, rate)
      }.toArray
    val n = cal.map(_._2).sum
    val gaps = cal.map { case (b, nb, rate) =>
      (nb, math.abs(rate - (b * 100 + 50) * 1000))
    }
    val ece = gaps.map { case (nb, g) => BigInt(nb) * g }.sum / n
    assert(cal.forall(_._1 <= 9L)) // inclusive top bin, 10 bins max
    val r = q("calibration_ece").collect().head
    assert(r.getLong(r.fieldIndex("n")) == n)
    assert(r.getLong(r.fieldIndex("ece_micro")) == ece.toLong)
    assert(r.getLong(r.fieldIndex("mce_micro")) == gaps.map(_._2).max)
    assert(r.getLong(r.fieldIndex("ece_micro")) <=
      r.getLong(r.fieldIndex("mce_micro")))
  }

  test("eval_brier equals the brute-force mean squared error") {
    val pairs = scoredPairs()
    val se = pairs.map { case (lbl, sc) =>
      BigInt(sc - 1000L * lbl) * (sc - 1000L * lbl)
    }.sum
    val r = q("eval_brier").collect().head
    assert(r.getLong(r.fieldIndex("n")) == pairs.length)
    assert(r.getLong(r.fieldIndex("brier_micro")) ==
      (se / pairs.length).toLong)
    // per-mille² units: a [0,1] probability scorer can never exceed 10⁶
    assert(r.getLong(r.fieldIndex("brier_micro")) <= 1000000L)
  }
}
