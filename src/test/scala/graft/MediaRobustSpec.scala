package graft

import org.apache.spark.sql.{functions => F}

/** Wave-20/21 invariants: payload entropy bounds and a driver-side
  * re-derivation, PCM window RMS/clipping consistency against a JVM md5
  * replay, tile-stat pixel-cover exactness, Theil–Sen's portable floor
  * division vs BigInteger, MI non-negativity, link-prediction cohort /
  * non-edge / score-range contracts, and the dim-profile permutation
  * rank. */
class MediaRobustSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("payload_entropy matches a driver-side recomputation") {
    val rows = q("payload_entropy").collect()
    assert(rows.nonEmpty)
    val texts = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(25).foreach { r =>
      val text = texts(r.getLong(r.fieldIndex("doc_id")))
      val counts = text.split("").filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val s = counts.map(c =>
        math.round(c * (math.log(c.toDouble) / math.log(2)) * 1e6)).sum
      val h = math.round((math.log(n.toDouble) / math.log(2)) * 1e6) - s / n
      assert(r.getLong(r.fieldIndex("n")) == n)
      assert(r.getLong(r.fieldIndex("entropy_micro")) == h,
        s"doc entropy mismatch: got ${r.getLong(r.fieldIndex("entropy_micro"))} want $h")
      // 0 <= H <= log2(alphabet)
      assert(h >= 0 && h <= math.round(math.log(counts.size.toDouble) /
        math.log(2) * 1e6) + 1)
    }
  }

  test("audio_rms_windows replays the md5 sample decode") {
    val rows = q("audio_rms_windows").collect()
    assert(rows.length == 4 * graft.queries.Tables.t(spark, sf, "documents").count())
    val texts = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.take(40).foreach { r =>
      val text = texts(r.getLong(r.fieldIndex("doc_id")))
      val wi = r.getLong(r.fieldIndex("window_idx"))
      val hex = md.digest(s"$text|$wi".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val samples = (0 until 16).map(k =>
        java.lang.Long.parseLong(hex.substring(2 * k, 2 * k + 2), 16) - 128)
      val sumsq = samples.map(x => x * x).sum
      val peak = samples.map(math.abs).max
      assert(r.getLong(r.fieldIndex("sumsq")) == sumsq)
      assert(r.getLong(r.fieldIndex("peak")) == peak)
      assert(r.getDouble(r.fieldIndex("rms")) ==
        BigDecimal(math.sqrt(sumsq / 16.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getLong(r.fieldIndex("clipped")) ==
        (if (peak >= 120) 1L else 0L))
    }
  }

  test("image_tile_stats tiles cover all 64 pixels once and bound the mean") {
    // the tile indexing (4·(t div 2) + k div 4)·8 + 4·(t mod 2) + k mod 4
    // must be a bijection onto 0..63
    val cover = for (t <- 0 until 4; k <- 0 until 16)
      yield (4 * (t / 2) + k / 4) * 8 + 4 * (t % 2) + (k % 4)
    assert(cover.sorted == (0 until 64))
    val rows = q("image_tile_stats").collect()
    assert(rows.length == 4 * graft.queries.Tables.t(spark, sf, "documents").count())
    rows.foreach { r =>
      val mn = r.getLong(r.fieldIndex("px_min"))
      val mx = r.getLong(r.fieldIndex("px_max"))
      val mean = r.getLong(r.fieldIndex("mean_micro"))
      assert(mn >= 0 && mx <= 255 && mn <= mx)
      assert(mean >= mn * 1000000L && mean <= mx * 1000000L)
    }
  }

  test("theil_sen floor division matches BigInteger semantics") {
    // the query's portable (a - ((a%b)+b)%b) div b must equal true floor
    // division for negative dividends, where Spark div / DuckDB // differ
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong() % 1000000000L
      val b = 1L + rnd.nextInt(30)
      val portable = (a - (((a % b) + b) % b)) / b
      val expected = java.math.BigInteger.valueOf(a)
        .subtract(java.math.BigInteger.valueOf(a)
          .mod(java.math.BigInteger.valueOf(b))) // mod is non-negative
        .divide(java.math.BigInteger.valueOf(b)).longValueExact()
      assert(portable == expected, s"fdiv($a, $b): $portable != $expected")
    }
    val rows = q("theil_sen").collect()
    assert(rows.length == 12) // one per 1995 month
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_pairs"))
      assert(n >= 1 && n <= 465) // C(31,2) calendar bound
    }
  }

  test("mutual_information partials are non-negative and sum plausibly") {
    val rows = q("mutual_information").collect()
    assert(rows.nonEmpty)
    val totalDocs = graft.queries.Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum == totalDocs) // marginals partition n
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("mi_part_micro")) >= 0)
    }
  }

  test("link_predict rows are cohort-anchored non-edges with valid scores") {
    val rows = q("link_predict").collect()
    assert(rows.nonEmpty)
    val edges = graft.queries.Staged.coPurchasePairs(spark, sf)
      .select("pa", "pb").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val a = r.getLong(r.fieldIndex("a")); val b = r.getLong(r.fieldIndex("b"))
      assert(a % 199 == 0, s"anchor $a not in cohort")
      assert(!edges((math.min(a, b), math.max(a, b))), s"($a,$b) is an edge")
      val cn = r.getLong(r.fieldIndex("cn"))
      val da = r.getLong(r.fieldIndex("da")); val db = r.getLong(r.fieldIndex("db"))
      assert(cn >= 2 && cn <= math.min(da, db))
      val j = r.getLong(r.fieldIndex("jaccard_micro"))
      assert(j == cn * 1000000L / (da + db - cn) && j <= 1000000L)
    }
  }

  test("embed_dim_profile ranks are a permutation and variance is exact") {
    val rows = q("embed_dim_profile").collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(rows.head.fieldIndex("var_rank"))).sorted
      .toSeq == (1L to 64L))
    // spot re-derivation on one dimension, exact integer arithmetic
    val qs = graft.queries.Tables.t(spark, sf, "embeddings")
      .select(F.expr("CAST(round(CAST(embedding[0] AS DOUBLE) * 1000000) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val n = qs.length.toLong
    val sq = qs.sum
    val sqq = qs.map(x => BigInt(x) * x).sum
    val want = ((BigInt(n) * sqq - BigInt(sq) * sq) / (BigInt(n) * n)).toLong
    val d1 = rows.find(_.getLong(0) == 1L).get
    assert(d1.getLong(d1.fieldIndex("mean_micro")) == sq / n)
    assert(d1.getLong(d1.fieldIndex("var_micro2")) == want)
  }
}
