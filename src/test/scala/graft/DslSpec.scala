package graft

import graft.dsl._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Mirrors reference tests/test_validators.py: the col() DSL compiled to
  * Spark Columns AND the row interpreter, checked for agreement. */
class DslSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val df = spark.createDataFrame(
    Seq(
      Row(1L, 10.0, 20.0, "  Hello World  ", java.sql.Timestamp.valueOf("2024-03-15 10:30:45")),
      Row(2L, -5.5, 3.0, "spark engine", java.sql.Timestamp.valueOf("2023-07-01 00:00:00")),
      Row(3L, null, 7.0, null, null)).asJava,
    StructType(Seq(
      StructField("id", LongType), StructField("a", DoubleType),
      StructField("b", DoubleType), StructField("s", StringType),
      StructField("ts", TimestampType))))

  private def colVals(e: Expr): Seq[Any] =
    df.orderBy("id").select(e.toColumn.as("x")).collect().map(r => r.get(0)).toSeq

  private def rowVals(e: Expr): Seq[Any] = {
    df.orderBy("id").collect().map { r =>
      val m = r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
      e.eval(m)
    }.toSeq
  }

  /** Column path and row-interpreter path must agree (the reference's
    * to_polars / to_python duality). */
  private def agree(e: Expr): Unit = {
    val (c, r) = (colVals(e), rowVals(e))
    (c zip r).zipWithIndex.foreach { case ((cv, rv), i) =>
      (cv, rv) match {
        case (null, null) => ()
        case (x: java.lang.Number, y: java.lang.Number) =>
          assert(math.abs(x.doubleValue - y.doubleValue) < 1e-9, s"row $i: $cv vs $rv for $e")
        case _ => assert(cv == rv, s"row $i: $cv vs $rv for $e")
      }
    }
  }

  test("comparisons and arithmetic agree across both compilers") {
    Seq[Expr](
      col("a") > col("b"), col("a") >= 10.0, col("a") < col("b"),
      col("a") <= col("b"), col("a") === 10.0, col("a") !== col("b"),
      col("a") + col("b"), col("a") - 1.0, col("a") * 2.0, col("a") / col("b"),
      (col("a") > 0.0) & (col("b") > 0.0), (col("a") > 0.0) | (col("b") > 100.0),
      !(col("a") > 0.0), col("a").isNull, col("a").isNotNull
    ).foreach(agree)
  }

  test("math ops agree") {
    Seq[Expr](
      col("a").abs, col("a").round(1), col("a").floor, col("a").ceil,
      col("b").sqrt, col("b").pow(2.0), col("id") % 2L
    ).foreach(agree)
  }

  test("string ops agree") {
    Seq[Expr](
      col("s").str.contains("spark"), col("s").str.startsWith("  "),
      col("s").str.endsWith("engine"), col("s").str.lenChars,
      col("s").str.stripChars, col("s").str.toLowercase, col("s").str.toUppercase,
      col("s").str.replace("[aeiou]", "_"), col("s").str.extract("([A-Za-z]+)", 1),
      col("s").str.slice(2, 5), col("s").str.countMatches("l")
    ).foreach(agree)
  }

  test("datetime ops agree") {
    Seq[Expr](
      col("ts").dt.year, col("ts").dt.month, col("ts").dt.day,
      col("ts").dt.hour, col("ts").dt.minute, col("ts").dt.second,
      col("ts").dt.totalDays(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    ).foreach(agree)
  }

  test("membership ops agree") {
    Seq[Expr](
      col("id").isIn(Seq(1L, 3L)),
      col("a").isBetween(0.0, 15.0),
      col("a").isBetween(10.0, 20.0, "left"),
      col("a").isBetween(10.0, 20.0, "right"),
      col("a").isBetween(10.0, 20.0, "none"),
      col("a").isBetween(col("b") - 20.0, col("b"))
    ).foreach(agree)
  }

  test("isIn nullsEqual treats null as a member (reference nulls_equal)") {
    val m = Map[String, Any]("x" -> null)
    assert(col("x").isIn(Seq(1L, 2L)).eval(m) == null)
    assert(col("x").isIn(Seq(1L, null), nullsEqual = true).eval(m) == true)
    assert(col("x").isIn(Seq(1L, 2L), nullsEqual = true).eval(m) == false)
    // column path agrees
    val df3 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(null.asInstanceOf[java.lang.Long])),
      StructType(Seq(StructField("x", LongType))))
    assert(df3.select(col("x").isIn(Seq(1L, null), nullsEqual = true).toColumn).head().getBoolean(0))
  }

  test("totalDays works on DATE columns too") {
    import spark.implicits._
    val d = Seq(java.sql.Date.valueOf("2024-01-11")).toDF("d")
    val v = d.select(col("d").dt.totalDays(java.time.Instant.parse("2024-01-01T00:00:00Z"))
      .toColumn).head().getDouble(0)
    assert(v == 10.0)
  }

  test("invalid closed mode rejected") {
    intercept[IllegalArgumentException](col("a").isBetween(1, 2, "sideways"))
  }

  test("inverted literal bounds warn but still evaluate (reference membership.py:166)") {
    val inv = col("a").isBetween(20.0, 10.0).asInstanceOf[BetweenOp]
    assert(inv.invertedBounds) // the warning fired at construction
    // the predicate still constructs and evaluates — to the empty interval
    assert(inv.eval(Map("a" -> 15.0)) == false)
    import spark.implicits._
    assert(Seq(15.0).toDF("a").select(inv.toColumn).head().getBoolean(0) == false)
    // expression bounds and proper bounds are not flagged
    assert(!col("a").isBetween(10.0, 20.0).asInstanceOf[BetweenOp].invertedBounds)
    assert(!col("a").isBetween(col("b") - 20.0, col("b")).asInstanceOf[BetweenOp].invertedBounds)
  }

  test("chained expression example from reference README") {
    // cleaned = col('phone').str.replace(r'[^\d]',''); cleaned.str.len_chars() == 10
    val phone = col("s").str.replace("[^0-9]", "").str.lenChars === 0L
    assert(colVals(phone) == Seq(true, true, null))
  }

  test("kleene boolean logic on nulls in row path") {
    val m = Map[String, Any]("x" -> null, "y" -> true)
    assert((col("x") & col("y")).eval(m) == null)
    assert((col("x") | col("y")).eval(m) == true)
    assert(((col("x") > 1.0) & (col("y") === true)).eval(Map("x" -> null, "y" -> false)) == false)
  }
}
