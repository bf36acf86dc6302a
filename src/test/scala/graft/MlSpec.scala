package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Wave-16 invariants: record linkage, target encoding, fold
  * assignment, nearest as-of, cume windows, systematic resampling. */
class MlSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("fuzzy_match pairs share the block and pass the distance gate") {
    // sf0.001's (brand × size) blocks hold ≤ 2 parts and no name pair
    // survives the gate — use sf0.01 where the output is non-empty so
    // the invariants actually bite.
    val rows = SparkEntry.queries("fuzzy_match")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("dist")) <= 4L)
      assert(r.getLong(r.fieldIndex("id_a")) < r.getLong(r.fieldIndex("id_b")))
    }
  }

  test("target_encode shrinks the segment mean toward the global mean") {
    val rows = q("target_encode").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getLong(r.fieldIndex("seg_mean_micros"))
      val g = r.getLong(r.fieldIndex("global_mean_micros"))
      val enc = r.getLong(r.fieldIndex("enc_micros"))
      // enc lies between the segment mean and the global mean (within
      // 1 micro of integer-division rounding at each endpoint)
      assert(enc >= math.min(seg, g) - 1 && enc <= math.max(seg, g) + 1,
        s"enc=$enc outside [$seg, $g]")
    }
  }

  test("fold_assign partitions every stratum across exactly k folds") {
    val rows = q("fold_assign").collect()
    val total = rows.map(_.getLong(2)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs)
    rows.foreach(r => assert((0L to 4L).contains(r.getLong(1))))
    // deviation column is consistent: per-lang devs sum to n_lang mod k
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (_, rs) =>
      val n = rs.map(_.getLong(2)).sum
      assert(rs.map(_.getLong(4)).sum == n - 5 * (n / 5))
    }
  }

  test("asof_nearest picks the smaller |Δt| with past winning ties") {
    val out = q("asof_nearest")
    // recompute both directions brute-force on the small sf and compare
    val ev = graft.queries.Tables.t(spark, sf, "events")
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", F.unix_micros($"ts").as("t"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), F.unix_micros($"ts").as("ct"))
    val best = errors.join(clicks, $"user_id" === $"cu", "left")
      .groupBy("event_id").agg(F.min(F.abs($"t" - $"ct")).as("best"))
    val joined = out.select($"event_id", $"delta_us")
      .join(best, Seq("event_id"))
      .collect()
    joined.foreach { r =>
      val got = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      val want = if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))
      assert(got == want, s"event ${r.getLong(0)}: $got vs $want")
    }
  }

  test("window_cume_dist is monotone and tops out at exactly 1e6") {
    val rows = q("window_cume_dist")
      .select("nation", "c_acctbal", "n_le", "cume_micros")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.last._4 == 1000000L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3 && a._4 <= b._4)
        case _ =>
      }
    }
  }

  test("sample_systematic cumsum equals the single-partition prefix sum") {
    val got = q("sample_systematic").select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"n_chars".cast("long").as("w"))
      .withColumn("cum", F.sum("w").over(Window.orderBy("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    got.foreach { case (id, cum) => assert(naive(id) == cum, s"doc $id") }
  }

  test("sample_systematic yields ~target copies and is deterministic") {
    val a = q("sample_systematic").collect()
    val copies = a.map(_.getLong(3)).sum
    // tot div (tot div 100) is 100 or 101 for any tot >= 100
    assert(copies >= 100L && copies <= 101L, s"total copies $copies")
    val b = q("sample_systematic").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("dedup_minhash_recall counts are mutually consistent") {
    val r = q("dedup_minhash_recall").collect().head
    val (truth, cand, hit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(hit <= math.min(truth, cand))
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
  }

  test("langid_confusion shares sum to ~1e6 per label") {
    val rows = q("langid_confusion").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == docs)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val s = rs.map(_.getLong(3)).sum
      // integer floor per cell: total within |cells| micros of 1e6
      assert(s > 1000000L - rs.length && s <= 1000000L, s"$lang share $s")
    }
  }
}
