package graft

import graft.operators.Hashing
import org.apache.spark.sql.{functions => F}

/** Wave-52: DP release replayed against the hardcoded quantile table,
  * modularity replayed from the collected edge list. */
class PrivacyGraphSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private val lapTable = Seq(-2772589L, -1673976L, -1163151L, -826679L,
    -575364L, -374693L, -207639L, -64539L, 64539L, 207639L, 374693L,
    575364L, 826679L, 1163151L, 1673976L, 2772589L)

  test("dp_release noise comes from the table via the hash; release reconciles") {
    val rows = q("dp_release").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val seg = r.getString(r.fieldIndex("segment"))
      val idx = (Hashing.hash60("dp:" + seg) % 16).toInt
      assert(r.getLong(r.fieldIndex("noise_micro")) == lapTable(idx))
      assert(r.getLong(r.fieldIndex("released_micro")) ==
        r.getLong(r.fieldIndex("n_true")) * 1000000L + lapTable(idx))
      assert(r.getLong(r.fieldIndex("epsilon_micro")) == 1000000L)
      // Laplace(1) noise is bounded by the table's extreme quantiles
      assert(math.abs(r.getLong(r.fieldIndex("noise_micro"))) <= 2772589L)
    }
    // the quantile table itself is symmetric and monotone
    assert(lapTable == lapTable.sorted)
    assert(lapTable.zip(lapTable.reverse).forall(p => p._1 == -p._2))
  }

  test("graph_modularity equals a driver-side replay; terms sum near zero on uniform baskets") {
    val edges = graft.queries.Staged.coPurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brand = graft.queries.Tables.t(spark, sf, "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = edges.length.toLong
    val eIn = edges.filter(e => brand(e._1) == brand(e._2))
      .groupBy(e => brand(e._1)).view.mapValues(_.length.toLong).toMap
    val degPairs = edges.flatMap(e =>
      Seq((brand(e._1), e._1), (brand(e._2), e._2)))
    val dC = degPairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nNodes = degPairs.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    val rows = q("graph_modularity").collect()
    assert(rows.map(_.getString(0)).toSet == dC.keySet)
    rows.foreach { r =>
      val b = r.getString(r.fieldIndex("brand"))
      assert(r.getLong(r.fieldIndex("n_nodes")) == nNodes(b))
      assert(r.getLong(r.fieldIndex("e_in")) == eIn.getOrElse(b, 0L))
      assert(r.getLong(r.fieldIndex("d_c")) == dC(b))
      val eb: Long = eIn.getOrElse(b, 0L)
      val num = BigInt(4) * m * eb - BigInt(dC(b)) * dC(b)
      val expect = (num * 1000000 / (BigInt(4) * m * m)).toLong
      assert(r.getLong(r.fieldIndex("q_term_micro")) == expect, s"b=$b")
    }
    // identities: sum(d_c) = 2m, sum(e_in) <= m
    assert(dC.values.sum == 2 * m)
    assert(eIn.values.sum <= m)
  }
}
