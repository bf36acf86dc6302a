package graft

import org.apache.spark.sql.{functions => F}

/** Round-6 corpus-audit wave invariants: each operator re-derived
  * brute-force on sf0.001 (trigram sets, VMR sums, md5 pixel decode)
  * and compared to the distributed query's exact-integer output. */
class CorpusWaveSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def docs(): Array[(Long, String, String, String)] =
    graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("ccnet_buckets: buckets partition each language, ranges ordered") {
    val rows = q("ccnet_buckets").collect()
    val byLang = docs().groupBy(_._3).view.mapValues(_.length).toMap
    val grouped = rows.groupBy(_.getString(0))
    assert(grouped.keySet == byLang.keySet)
    grouped.foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(rs.head.fieldIndex("n_docs"))).sum ==
        byLang(lang), lang)
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSet.subsetOf(Set(0L, 1L, 2L)))
      // score ranges of successive buckets never overlap
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getLong(lo.fieldIndex("max_score_mip")) <=
            hi.getLong(hi.fieldIndex("min_score_mip")), lang)
        case _ =>
      }
    }
  }

  test("vocab_overlap equals brute-force trigram Jaccard per source pair") {
    val bySource = docs().groupBy(_._4).view.mapValues { ds =>
      ds.flatMap { case (_, text, _, _) =>
        val t = text.toLowerCase.split(" +").filter(_.nonEmpty)
        t.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet
    }.toMap
    val rows = q("vocab_overlap").collect()
    val expectPairs = bySource.keys.toSeq.sorted.combinations(2).filter {
      case Seq(a, b) => (bySource(a) & bySource(b)).nonEmpty
    }.size
    assert(rows.length == expectPairs)
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (va, vb) = (bySource(sa), bySource(sb))
      val inter = (va & vb).size.toLong
      assert(r.getLong(r.fieldIndex("n_common")) == inter, s"$sa-$sb")
      assert(r.getLong(r.fieldIndex("na")) == va.size)
      assert(r.getLong(r.fieldIndex("nb")) == vb.size)
      assert(r.getLong(r.fieldIndex("jaccard_micros")) ==
        1000000L * inter / (va.size + vb.size - inter))
    }
  }

  test("term_burstiness equals brute-force variance-to-mean over all docs") {
    val all = docs()
    val n = all.length.toLong
    val tf = all.flatMap { case (id, text, _, _) =>
      text.toLowerCase.split(" +").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = q("term_burstiness").collect()
    rows.foreach { r =>
      val term = r.getString(0)
      val counts = tf(term)
      val s = counts.sum
      val ss = counts.map(c => c * c).sum
      assert(s >= 50)
      assert(r.getLong(r.fieldIndex("df")) == counts.length)
      assert(r.getLong(r.fieldIndex("s")) == s)
      assert(r.getLong(r.fieldIndex("ss")) == ss)
      val expect = ((BigInt(n) * ss - BigInt(s) * s) * 1000000 /
        (BigInt(s) * (n - 1))).toLong
      assert(r.getLong(r.fieldIndex("vmr_micros")) == expect, term)
    }
    // every gated term is present
    assert(rows.map(_.getString(0)).toSet ==
      tf.filter(_._2.sum >= 50).keySet)
  }

  test("phash_neardup matches a driver-side md5 pixel decode end to end") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sig(text: String): Array[Long] = {
      val px = (0 until 64).map { j =>
        val hex = md.digest((text + (j / 16).toString).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(2 * (j % 16), 2 * (j % 16) + 2), 16)
      }
      val s = px.sum
      (0 until 4).map { b =>
        (0 until 16).map { k =>
          if (64L * px(b * 16 + k) >= s) 1L << k else 0L
        }.sum
      }.toArray
    }
    val sigs = docs().map { case (id, text, _, _) => (id, sig(text)) }.toMap
    // expected candidates: any pair colliding in >= 1 band
    val ids = sigs.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sigs(ids(i)); b = sigs(ids(j))
      if (0 until 4).exists(k => a(k) == b(k))
    } yield {
      val ham = (0 until 4).map(k => java.lang.Long.bitCount(a(k) ^ b(k))).sum
      (ids(i), ids(j), ham.toLong)
    }).toSet
    val got = q("phash_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    q("phash_neardup").collect().foreach { r =>
      val h = r.getLong(r.fieldIndex("hamming"))
      assert(h >= 0 && h <= 64)
      assert(r.getLong(r.fieldIndex("is_neardup")) ==
        (if (h <= 16) 1L else 0L))
    }
  }

  test("stream_sample equals the batch hash-bucket sample") {
    val got = q("stream_sample").collect()
    val expect = docs().filter { case (id, _, _, _) =>
      graft.operators.Hashing.hash60(id.toString) % 20 == 0
    }.map(_._1).sorted
    assert(got.map(_.getLong(0)).toSeq == expect.toSeq)
    got.foreach(r => assert(r.getLong(r.fieldIndex("bucket")) == 0L))
  }
}
