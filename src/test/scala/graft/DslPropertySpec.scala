package graft

import graft.dsl._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: for ANY generated expression and row values, the Column
  * compiler and the row interpreter agree (the invariant behind using
  * one schema for bulk + API-side validation). */
class DslPropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  /** Deterministic sampling from a ScalaCheck generator (the
    * scalatest-scalacheck bridge isn't in the offline cache). */
  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toSeq
  }

  private val genDouble: Gen[Any] =
    Gen.frequency(8 -> Gen.chooseNum(-1e6, 1e6).map(d => d: Any), 1 -> Gen.const(null))
  private val genLong: Gen[Any] =
    Gen.frequency(8 -> Gen.chooseNum(-1000000L, 1000000L).map(l => l: Any), 1 -> Gen.const(null))
  private val genStr: Gen[Any] =
    Gen.frequency(8 -> Gen.alphaNumStr.map(s => s.take(12): Any), 1 -> Gen.const(null))

  private val leafNum: Gen[Expr] = Gen.oneOf(
    Gen.const(col("a")), Gen.const(col("b")), Gen.const(col("i")),
    Gen.chooseNum(-100.0, 100.0).map(lit(_)))

  private def genNumExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) leafNum
    else Gen.frequency(
      3 -> leafNum,
      2 -> (for {
        l <- genNumExpr(depth - 1); r <- genNumExpr(depth - 1)
        op <- Gen.oneOf(Seq[(Expr, Expr) => Expr](_ + _, _ - _, _ * _))
      } yield op(l, r)),
      1 -> genNumExpr(depth - 1).map(_.abs),
      1 -> genNumExpr(depth - 1).map(_.round(2)))

  private def genBoolExpr(depth: Int): Gen[Expr] = {
    val cmp = for {
      l <- genNumExpr(depth); r <- genNumExpr(depth)
      op <- Gen.oneOf(Seq[(Expr, Expr) => Expr](_ > _, _ >= _, _ < _, _ <= _, _ === _, _ !== _))
    } yield op(l, r)
    if (depth <= 0) cmp
    else Gen.frequency(
      4 -> cmp,
      2 -> (for { l <- Gen.lzy(genBoolExpr(depth - 1)); r <- Gen.lzy(genBoolExpr(depth - 1))
        op <- Gen.oneOf(Seq[(Expr, Expr) => Expr](_ & _, _ | _)) } yield op(l, r)),
      1 -> Gen.lzy(genBoolExpr(depth - 1)).map(e => !e),
      1 -> Gen.oneOf(col("a").isNull, col("s").isNotNull),
      1 -> (for { lo <- Gen.chooseNum(-50.0, 0.0); hi <- Gen.chooseNum(0.0, 50.0)
        c <- Gen.oneOf("both", "left", "right", "none") } yield col("a").isBetween(lo, hi, c)))
  }

  private val schema = StructType(Seq(
    StructField("a", DoubleType), StructField("b", DoubleType),
    StructField("i", LongType), StructField("s", StringType)))

  private val genRow: Gen[(Any, Any, Any, Any)] =
    for { a <- genDouble; b <- genDouble; i <- genLong; s <- genStr } yield (a, b, i, s)

  test("column compiler and row interpreter agree on random boolean expressions") {
    val cases = samples(genBoolExpr(2), 40) zip samples(Gen.listOfN(5, genRow), 40, seed = 7L)
    cases.foreach { case (e, rows) =>
      val df = spark.createDataFrame(
        rows.map { case (a, b, i, s) => Row(a, b, i, s) }.asJava, schema)
      val viaColumn = df.select(e.toColumn.as("x")).collect().map(_.get(0)).toSeq
      val viaRows = rows.map { case (a, b, i, s) =>
        e.eval(Map("a" -> a, "b" -> b, "i" -> i, "s" -> s))
      }
      (viaColumn zip viaRows).foreach { case (c, r) =>
        (c, r) match {
          case (null, null) => ()
          case (x: java.lang.Number, y: java.lang.Number) =>
            assert(math.abs(x.doubleValue - y.doubleValue) < 1e-6, s"$e")
          case _ => assert(c == r, s"expr $e on rows $rows: $c vs $r")
        }
      }
    }
  }

  test("row validator and bulk validator agree on pass/fail per row") {
    import graft.schema._
    val gs = GSchema("P")
      .field(GDouble("a", ge = Some(-100.0), le = Some(100.0), nullable = true))
      .field(GLong("i", gt = Some(0L)))
      .field(GString("s", minLength = Some(2), nullable = true))
      .check(col("a") < (col("i") * 2L), "a < 2i")
    samples(Gen.listOfN(8, genRow), 20, seed = 11L).foreach { rows =>
      val df = spark.createDataFrame(
        rows.map { case (a, b, i, s) => Row(a, b, i, s) }.asJava, schema)
      val bulkValid = gs.validator.filterValid(df.drop("b"))
        .collect().length
      val rowValid = rows.count { case (a, _, i, s) =>
        gs.rowValidator.isValid(Map("a" -> a, "i" -> i, "s" -> s))
      }
      assert(bulkValid == rowValid, s"rows=$rows")
    }
  }
}
