package graft

import java.sql.Timestamp

import graft.operators.{Curation, Warehouse}
import org.apache.spark.sql.{functions => F}

/** Warehouse-modeling operators: SCD2 builds, attribution splits,
  * growth accounting, MAD outliers, NB classifier invariants. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2Build collapses consecutive dups and versions the changes") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "a"), // consecutive dup: dropped
      (1L, ts("2024-01-03 00:00:00"), 3L, "b"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "a"), // back to a: NEW version
      (2L, ts("2024-01-01 00:00:00"), 5L, "x"))
      .toDF("k", "t", "id", "v")
    val out = Warehouse.scd2Build(log, "k", "t", "id", "v")
      .orderBy("k", "version")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4),
        r.getLong(5)))
    assert(out.length == 4)
    // key 1: a [01-01, 01-03) v1, b [01-03, 01-04) v2, a [01-04, null) v3
    assert(out(0) == ((1L, "a", ts("2024-01-01 00:00:00"),
      Some(ts("2024-01-03 00:00:00")), 1L, 0L)))
    assert(out(1) == ((1L, "b", ts("2024-01-03 00:00:00"),
      Some(ts("2024-01-04 00:00:00")), 2L, 0L)))
    assert(out(2) == ((1L, "a", ts("2024-01-04 00:00:00"), None, 3L, 1L)))
    assert(out(3) == ((2L, "x", ts("2024-01-01 00:00:00"), None, 1L, 1L)))
    // exactly one current row per key
    assert(out.filter(_._6 == 1L).map(_._1).toSeq == Seq(1L, 2L))
  }

  test("linearAttribution splits value equally and reconciles totals") {
    val ev = Seq(
      // user 1: two touches then a 3.00 purchase -> 1.50 each
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, "view", 0.0),
      (1L, ts("2024-01-01 12:00:00"), 3L, "purchase", 3.0),
      // user 1: touch OUTSIDE the 24h lookback of this purchase
      (1L, ts("2024-01-05 12:00:00"), 4L, "purchase", 5.0),
      // user 2: purchase with no touches at all
      (2L, ts("2024-01-01 12:00:00"), 5L, "purchase", 7.0),
      // user 2: touch AFTER the purchase: not attributable
      (2L, ts("2024-01-01 13:00:00"), 6L, "click", 0.0))
      .toDF("user_id", "t", "id", "typ", "value")
    val out = Warehouse.linearAttribution(ev, "user_id", "t", "id", "typ",
      "value", "purchase", Seq("click", "view", "signup"), 24)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("click") == ((1L, 1L, 1500000L)))
    assert(out("view") == ((1L, 1L, 1500000L)))
    // both untouched purchases land in (none) with full value
    assert(out("(none)") == ((0L, 2L, 12000000L)))
    // attributed + unattributed == total micro value
    assert(out.values.map(_._3).sum == 15000000L)
  }

  test("linearAttribution integer split leaves the remainder unallocated") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, "view", 0.0),
      (1L, ts("2024-01-01 11:00:00"), 3L, "signup", 0.0),
      (1L, ts("2024-01-01 12:00:00"), 4L, "purchase", 1.0)) // 1000000 div 3
      .toDF("user_id", "t", "id", "typ", "value")
    val micro = Warehouse.linearAttribution(ev, "user_id", "t", "id", "typ",
      "value", "purchase", Seq("click", "view", "signup"), 24)
      .agg(F.sum("attr_micro")).as[Long].head()
    assert(micro == 333333L * 3) // 1 micro deliberately unallocated
  }

  test("cumulativeDistinct: new vs active vs cumulative") {
    val ev = Seq(
      (1L, ts("2024-01-01 05:00:00")), (2L, ts("2024-01-01 06:00:00")),
      (1L, ts("2024-01-02 05:00:00")), // returning: active, not new
      (3L, ts("2024-01-02 06:00:00")),
      (1L, ts("2024-01-04 05:00:00")))
      .toDF("user_id", "t")
    val out = Warehouse.cumulativeDistinct(ev, "user_id", "t")
      .select("active_users", "new_users", "cum_users")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 2L, 2L), (2L, 1L, 3L), (1L, 0L, 3L)))
  }

  test("madOutliers flags only |x - median| > k*MAD") {
    // group g: values 1..9 plus an extreme 1000
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "x")
    val r = Warehouse.madOutliers(df, "grp", "x", k = 3.0).collect().head
    // median of (1..9,1000) = 5.5; adevs = 4.5,3.5,...,0.5,0.5,...,994.5
    // MAD = median(adev) = 2.5 -> cutoff 7.5 -> only 1000 flagged
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 5.5)
    assert(r.getDouble(3) == 2.5)
    assert(r.getLong(4) == 1L)
  }

  test("madThresholds matches madOutliers' internal medians") {
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "x")
    val r = Warehouse.madThresholds(df, "grp", "x").collect().head
    assert(r.getString(0) == "g")
    assert(r.getDouble(1) == 5.5) // median
    assert(r.getDouble(2) == 2.5) // MAD
  }

  test("mergeChangelog: delete wins, upsert wins, base passes through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    val changes = Seq(
      // key 1: U then D (later ts): key deleted
      (1L, ts("2024-01-01 00:00:00"), 1L, "U", "a2"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "D", "x"),
      // key 2: D then U (later ts): upsert wins
      (2L, ts("2024-01-01 00:00:00"), 3L, "D", "x"),
      (2L, ts("2024-01-02 00:00:00"), 4L, "U", "b2"),
      // key 4: brand-new insert
      (4L, ts("2024-01-01 00:00:00"), 5L, "U", "d"))
      .toDF("k", "t", "id", "op", "s")
    val out = Warehouse.mergeChangelog(base, changes, "k", "t", "id",
      "op", "s").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (2L, "b2", "cdc"), (3L, "c", "base"), (4L, "d", "cdc")))
  }

  test("mergeChangelog ties inside a key resolve by the tie column") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "U", "first"),
      (1L, ts("2024-01-01 00:00:00"), 2L, "U", "second"))
      .toDF("k", "t", "id", "op", "s")
    val out = Warehouse.mergeChangelog(base, changes, "k", "t", "id",
      "op", "s").collect()
    assert(out.length == 1 && out.head.getString(1) == "second")
  }

  test("transitionMatrix rows sum to totals and p_micro is floored") {
    // key 1: a->b->a->b ; key 2: a->a
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "b"),
      (2L, ts("2024-01-01 00:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 00:01:00"), 6L, "a"))
      .toDF("k", "t", "id", "s")
    val out = Warehouse.transitionMatrix(ev, "k", "t", "id", "s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // src a: a->b twice, a->a once (total 3); src b: b->a once (total 1)
    assert(out.toSeq == Seq(
      ("a", "a", 1L, 3L, 333333L),
      ("a", "b", 2L, 3L, 666666L),
      ("b", "a", 1L, 1L, 1000000L)))
    // per-src counts reconcile against the published total
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == rows.head._4)
    }
  }

  test("nbQuality confusion matrix partitions the held-out half") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Curation.nbQuality(docs, "doc_id", "text",
      F.col("lang") === "en").collect()
    val n = out.map(_.getLong(2)).sum
    // held-out docs (hash-odd) that have at least one token
    val heldOut = docs.where(
      F.pmod(graft.operators.Hashing.hash60(F.col("doc_id").cast("string")),
        F.lit(2L)) =!= 0L)
      .where(F.size(F.split(F.lower(F.col("text")), " +")) > 0).count()
    assert(n == heldOut)
    // scores agree in sign with the prediction bucket
    out.foreach { r =>
      val pred = r.getLong(1)
      val avg = r.getDouble(3)
      if (pred == 1L) assert(avg >= 0.0) else assert(avg < 0.0)
    }
    // the classifier must beat chance on the weak label it trained on:
    // accuracy strictly above the majority-class rate would be ideal but
    // floor-log2 quantization is coarse; require > 0.5 at minimum
    val correct = out.filter(r => r.getLong(0) == r.getLong(1))
      .map(_.getLong(2)).sum
    assert(correct.toDouble / n > 0.5, s"accuracy ${correct.toDouble / n}")
  }

  test("assoc_rules matches a brute-force support/confidence/lift " +
    "replay on the real baskets") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nBaskets = li.map(_._1).distinct.length.toLong
    val perPart = li.groupBy(_._2).map { case (pk, xs) =>
      pk -> xs.length.toLong }
    val pairCnt = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p2, xs) => p2 -> xs.size.toLong }
    val expect = pairCnt.toSeq.collect {
      case ((a, b), nab) if nab >= 3 =>
        val (na, nb2) = (perPart(a), perPart(b))
        val lift = (BigInt(nab) * nBaskets * 1000000 /
          (BigInt(na) * nb2)).toLong
        (a, b, nab, na, nb2,
          nab * 1000000L / nBaskets, nab * 1000000L / na,
          nab * 1000000L / nb2, lift)
    }.sortBy(x => (-x._9, x._1, x._2)).take(50)
    val got = SparkEntry.queries("assoc_rules")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(got.length == expect.length, s"${got.length} vs ${expect.length}")
    (got zip expect).foreach { case (g, e) => assert(g == e, s"$g vs $e") }
    graft.operators.CacheScope.release(spark)
  }
}
