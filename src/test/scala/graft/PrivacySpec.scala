package graft

import org.apache.spark.sql.{functions => F}

/** t-closeness (E71) re-derived driver-side: the ordinal EMD between
  * each QI class's sensitive distribution and the global one, computed
  * by the textbook cumulative-difference sum on collected rows, must
  * equal the distributed query's exact integer output bit for bit. */
class PrivacySpec extends SparkSpec {

  test("t_closeness equals a driver-side exact EMD replay") {
    val base = graft.queries.Tables.t(spark, sf, "orders")
      .join(graft.queries.Tables.t(spark, sf, "customer"),
        F.col("o_custkey") === F.col("c_custkey"))
      .select(F.expr("CAST(c_nationkey AS BIGINT)").as("nation"),
        F.col("c_mktsegment").as("segment"),
        F.col("o_orderpriority").as("pri"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val pris = base.map(_._3).distinct.sorted
    val v = pris.length
    val n = base.length.toLong
    val globalCum = pris
      .scanLeft(0L)((acc, p) => acc + base.count(_._3 == p)).tail
    val rows = SparkEntry.queries("t_closeness")(spark, sf).collect()
    assert(rows.nonEmpty && v >= 2)
    // every populated QI class is published
    assert(rows.length ==
      base.map(b => (b._1, b._2)).distinct.length)
    rows.foreach { r =>
      val nat = r.getLong(r.fieldIndex("nation"))
      val seg = r.getString(r.fieldIndex("segment"))
      val cls = base.filter(b => b._1 == nat && b._2 == seg)
      val nc = cls.length.toLong
      var cum = 0L
      var num = BigInt(0)
      pris.zipWithIndex.foreach { case (p, i) =>
        cum += cls.count(_._3 == p)
        num += (BigInt(cum) * n - BigInt(globalCum(i)) * nc).abs
      }
      assert(r.getLong(r.fieldIndex("n_c")) == nc)
      assert(r.getLong(r.fieldIndex("t_micro")) ==
        (BigInt(1000000) * num / (BigInt(nc) * n * (v - 1))).toLong,
        s"class ($nat,$seg)")
    }
  }
}
