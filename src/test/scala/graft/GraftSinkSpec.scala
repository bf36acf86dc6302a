package graft

import org.apache.spark.sql.functions._

/** Transactional proof for the DSv2 atomic sink (H10): the
  * manifest-gated commit must make a write all-or-nothing —
  *
  *  - a clean overwrite/append round-trips every supported type
  *    (including nulls, tabs/newlines/backslashes in strings, and
  *    bit-exact doubles);
  *  - an INJECTED task failure mid-write aborts the job with NO
  *    visible effect: a fresh path still has no committed snapshot
  *    (reads throw), an appended-onto path still reads EXACTLY its
  *    previous snapshot, and the staging directory is gone either way.
  */
class GraftSinkSpec extends SparkSpec {

  private val FMT = "graft.sources.GraftAtomicSinkProvider"

  private def tmpDir(): String = java.nio.file.Files
    .createTempDirectory("graft_sink").toString + "/t"

  test("overwrite + append round-trip all supported types, nulls and " +
    "escaped control characters exactly") {
    val path = tmpDir()
    import spark.implicits._
    val df1 = Seq(
      (1, 10L, 1.5, "plain"),
      (2, 20L, math.Pi, "tab\there"),
      (3, 30L, -0.0, "line\nbreak \r and \\N backslash \\ tail"),
      (4, 40L, Double.MaxValue, null.asInstanceOf[String]))
      .toDF("i", "l", "d", "s")
    val df2 = Seq((5, 50L, 1e-300, "")).toDF("i", "l", "d", "s")
    df1.write.format(FMT).option("path", path).mode("overwrite").save()
    val got1 = spark.read.format(FMT).option("path", path).load()
      .orderBy("i")
    assert(got1.schema == df1.schema)
    assert(got1.collect().toSeq == df1.orderBy("i").collect().toSeq)
    // bit-exactness of the double round-trip (covers -0.0 and MaxValue)
    val bits = got1.collect().map(r => java.lang.Double
      .doubleToRawLongBits(r.getDouble(2))).toSeq
    val want = df1.orderBy("i").collect().map(r => java.lang.Double
      .doubleToRawLongBits(r.getDouble(2))).toSeq
    assert(bits == want)

    df2.write.format(FMT).option("path", path).mode("append").save()
    val got2 = spark.read.format(FMT).option("path", path).load()
    assert(got2.count() == 5)
    assert(got2.where(col("i") === 5).collect().head.getString(3) == "")
    // overwrite truncates: only the new snapshot remains
    df2.write.format(FMT).option("path", path).mode("overwrite").save()
    assert(spark.read.format(FMT).option("path", path).load()
      .collect().map(_.getInt(0)).toSeq == Seq(5))
  }

  /** A frame whose write fails mid-job: one row raises at evaluation
    * time AFTER other rows/partitions have already been written. */
  private def poisoned = spark.range(0, 1000, 1, 4)
    .select(col("id"),
      when(col("id") === 777L,
        raise_error(lit("injected task failure")).cast("long"))
        .otherwise(col("id") * 2).as("v"))

  test("a failed first write publishes nothing: no committed snapshot, " +
    "no staging residue") {
    val path = tmpDir()
    val err = intercept[Exception] {
      poisoned.write.format(FMT).option("path", path)
        .mode("overwrite").save()
    }
    assert(err.getMessage != null)
    // no manifest -> reads must refuse, not return partial rows
    val readErr = intercept[Exception] {
      spark.read.format(FMT).option("path", path).load().collect()
    }
    assert(readErr.getMessage.contains("no committed snapshot"),
      s"got: ${readErr.getMessage}")
    // abort dropped the staging dir (data/ may exist but is unreachable)
    val staging = new java.io.File(path, "_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty,
      "staging directory survived the abort")
  }

  test("a failed append leaves the previous snapshot intact and fully " +
    "readable") {
    val path = tmpDir()
    import spark.implicits._
    val base = (0L until 100L).map(i => (i, i * 3)).toDF("id", "v")
    base.write.format(FMT).option("path", path).mode("overwrite").save()
    intercept[Exception] {
      poisoned.write.format(FMT).option("path", path)
        .mode("append").save()
    }
    val got = spark.read.format(FMT).option("path", path).load()
      .orderBy("id").collect()
    assert(got.length == 100, s"snapshot changed: ${got.length} rows")
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L until 100L).map(i => (i, i * 3)))
    val staging = new java.io.File(path, "_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty)
  }

  test("unsupported column types fail at write-build time with a clear " +
    "error") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq((1, java.sql.Date.valueOf("2024-01-01"))).toDF("i", "dt")
        .write.format(FMT).option("path", tmpDir())
        .mode("overwrite").save()
    }
    assert(err.getMessage.contains("int/long/double/string"),
      s"got: ${err.getMessage}")
  }
}
