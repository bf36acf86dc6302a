package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Checksum-based table reconciliation (anti-entropy): locate the few
  * rows that differ between two versions of a huge table WITHOUT
  * joining the full tables.
  *
  * Shape: each side aggregates to `buckets` (count, bit_xor(row-hash))
  * cells — one map-side-combined shuffle of metadata-sized output per
  * side. Buckets whose cells match are PROVABLY identical-in-aggregate
  * and are never rescanned; only rows hashing into dirty buckets join
  * key-to-key for per-row classification. Finding 100 changed rows in
  * a 100 TB table costs two cheap scans plus a join over ~100/buckets
  * of the data — the pattern behind Cassandra/Dynamo Merkle-tree
  * repair, flattened to one level because Spark aggregates the whole
  * level in one pass anyway.
  *
  * bit_xor keeps the per-bucket digest order-independent and
  * overflow-free (a sum of 60-bit hashes overflows a long at ~8 rows);
  * a deletion or edit flips the digest unless an adversarial second
  * change cancels it — for drift detection (not security) that risk is
  * the standard trade.
  */
object Reconcile {

  /** Per-bucket (n, xor-of-row-hash) digest. `rowHash` must cover the
    * key AND every compared column. */
  private def digest(df: DataFrame, bucket: Column, rowHash: Column): DataFrame =
    df.groupBy(bucket.as("_bucket"))
      .agg(F.count(F.lit(1)).as("_n"),
        F.bit_xor(rowHash).as("_xor"))

  /** Rows differing between `a` and `b`: full outer key-join restricted
    * to dirty buckets, classified as missing_in_b / missing_in_a /
    * changed. `key` must be unique per side; `rowHash` decides
    * "changed". */
  def diffRows(
      a: DataFrame, b: DataFrame, keyCols: Seq[String],
      rowHash: Column, buckets: Int = 256): DataFrame = {
    val bucket = F.pmod(Hashing.hash60(
      F.concat_ws("|", keyCols.map(c => F.col(c).cast("string")): _*)),
      F.lit(buckets.toLong))
    val da = digest(a, bucket, rowHash)
      .withColumnRenamed("_n", "_na").withColumnRenamed("_xor", "_xa")
    val db = digest(b, bucket, rowHash)
      .withColumnRenamed("_n", "_nb").withColumnRenamed("_xor", "_xb")
    val dirtyBuckets = da.join(db, Seq("_bucket"), "full")
      .where(F.coalesce(F.col("_na"), F.lit(-1L)) =!= F.coalesce(F.col("_nb"), F.lit(-1L))
        || F.coalesce(F.col("_xa"), F.lit(-1L)) =!= F.coalesce(F.col("_xb"), F.lit(-1L)))
      .select(F.col("_bucket"))
    val keep = F.broadcast(dirtyBuckets) // dirty set is metadata-sized
    val sa = a.withColumn("_bucket", bucket).join(keep, "_bucket")
      .select(keyCols.map(F.col) :+ rowHash.as("_ha"): _*)
    val sb = b.withColumn("_bucket", bucket).join(keep, "_bucket")
      .select(keyCols.map(F.col) :+ rowHash.as("_hb"): _*)
    sa.join(sb, keyCols, "full")
      .where(F.col("_ha").isNull || F.col("_hb").isNull
        || F.col("_ha") =!= F.col("_hb"))
      .select(keyCols.map(F.col) :+
        F.when(F.col("_hb").isNull, "missing_in_b")
          .when(F.col("_ha").isNull, "missing_in_a")
          .otherwise("changed").as("diff_type"): _*)
  }
}
