package graft

import graft.dsl._
import graft.schema._
import org.apache.spark.sql.{functions => F}

/** Raw-expression checks (the dict-result validator analog): a Spark
  * Column for the bulk path, an optional callable for the row path. */
class RawCheckSpec extends SparkSpec {
  import spark.implicits._

  private val schemaBulkOnly = GSchema("S")
    .field(GLong("id"))
    .field(GString("code", nullable = true))
    .check(raw(F.length(F.col("code")) === 4), "code must be 4 chars")

  test("bulk path enforces the raw Column") {
    val df = Seq((1L, "abcd"), (2L, "xy")).toDF("id", "code")
    val kept = schemaBulkOnly.validator.filterValid(df)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("bulk-only raw check is skipped on the row path (pydantic=None analog)") {
    assert(schemaBulkOnly.rowValidator.check(Map("id" -> 1L, "code" -> "xy")).isEmpty)
  }

  test("raw check with a row callable applies on both paths") {
    val s = GSchema("S2")
      .field(GLong("id"))
      .field(GString("code", nullable = true))
      .check(raw(F.length(F.col("code")) === 4,
        Some(r => r.get("code").map(_.asInstanceOf[String].length == 4).orNull)),
        "code must be 4 chars")
    val df = Seq((1L, "abcd"), (2L, "xy")).toDF("id", "code")
    assert(s.validator.filterValid(df).count() == 1)
    assert(s.rowValidator.check(Map("id" -> 2L, "code" -> "xy")) ==
      Seq("code must be 4 chars"))
    assert(s.rowValidator.check(Map("id" -> 1L, "code" -> "abcd")).isEmpty)
  }
}
