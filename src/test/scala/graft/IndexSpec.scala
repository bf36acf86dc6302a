package graft

import graft.operators.Ivf
import org.apache.spark.sql.{functions => F}

/** Incremental IVF maintenance (D39): structural invariants the oracle
  * hash can't see on its own. */
class IndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("incremental assign covers the whole batch, touches only the batch") {
    val old = emb.where(F.expr("vec_id % 10 != 7"))
    val batch = emb.where(F.expr("vec_id % 10 = 7"))
    val cents = Ivf.centroidsByKey(old, "label", "embedding")
    val asg = Ivf.assign(batch, cents, "vec_id", "embedding")
    assert(asg.count() == batch.count())            // every batch vector routed
    assert(asg.where(F.expr("vec_id % 10 != 7")).count() == 0)
    // every assigned list is a real index list
    val labels = cents.select("ckey").collect().map(_.getInt(0)).toSet
    val used = asg.select("centroid_label").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(used.subsetOf(labels))
  }

  test("ivf_incremental report is per-list complete and flag-consistent") {
    val out = graft.SparkEntry.queries("ivf_incremental")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_new")) > 0)  // only lists that got vectors
      val drift = r.getLong(r.fieldIndex("drift_micros2"))
      val flag = r.getLong(r.fieldIndex("retrain"))
      assert(flag == (if (drift > 200000000000L) 1L else 0L))
    }
  }
}
