package graft

import graft.queries.Schemas
import graft.schema.{Evolution, GDouble, GLong, GSchema, GString}

/** Schema evolution (SURVEY §2 A11): structural diff, ALTER DDL,
  * breaking-change report, and data migration. */
class EvolutionSpec extends SparkSpec {

  private val v1 = GSchema("VSchema")
    .field(GLong("id", primaryKey = true))
    .field(GLong("count", width = 32))
    .field(GString("note", nullable = true))
    .field(GDouble("score"))

  private val v2 = GSchema("VSchema")
    .field(GLong("id", primaryKey = true))
    .field(GLong("count")) // widened 32 → 64
    .field(GDouble("score", nullable = true)) // relaxed
    .field(GString("tag", default = Some("none"))) // added w/ default
    .field(GLong("rev")) // added REQUIRED, no default
  // note: removed

  test("diff classifies added / removed / changed") {
    val d = Evolution.diff(v1, v2)
    assert(d.added.map(_.name) == Seq("tag", "rev"))
    assert(d.removed.map(_.name) == Seq("note"))
    assert(d.changed.map(_.name) == Seq("count", "score"))
    assert(d.changed.find(_.name == "count").get.changes
      .exists(_.startsWith("type ")))
    assert(d.changed.find(_.name == "score").get.changes
      .exists(_.startsWith("nullable")))
    assert(Evolution.diff(v1, v1).isEmpty)
  }

  test("alterStatements emit Spark SQL DDL for every diff class") {
    val stmts = Evolution.diff(v1, v2).alterStatements("t")
    // defaulted adds carry NOT NULL + DEFAULT; the required no-default
    // add is emitted nullable (it can't be satisfied on existing rows —
    // it shows up in breaking instead)
    assert(stmts.contains(
      "ALTER TABLE t ADD COLUMNS (tag STRING NOT NULL DEFAULT 'none', rev BIGINT)"))
    assert(stmts.contains("ALTER TABLE t DROP COLUMN note"))
    assert(stmts.contains("ALTER TABLE t ALTER COLUMN count TYPE BIGINT"))
    assert(stmts.contains("ALTER TABLE t ALTER COLUMN score DROP NOT NULL"))
  }

  test("narrows: family-aware — cross-family flagged, string absorbs, decimals by precision") {
    import org.apache.spark.sql.types._
    assert(Evolution.narrows(LongType, ShortType)) // 64 -> 16 bit
    assert(!Evolution.narrows(ShortType, LongType)) // pure widening
    assert(!Evolution.narrows(LongType, StringType)) // string absorbs
    assert(Evolution.narrows(TimestampType, DateType)) // drops time
    assert(!Evolution.narrows(DateType, TimestampType))
    assert(Evolution.narrows(TimestampType, LongType)) // cross-family
    assert(Evolution.narrows(DecimalType(38, 4), DecimalType(9, 2)))
    assert(!Evolution.narrows(DecimalType(9, 2), DecimalType(38, 4)))
  }

  test("narrows: integral -> floating flagged when the mantissa is smaller") {
    import org.apache.spark.sql.types._
    // float carries 24 mantissa bits, double 53 — int/long -> float and
    // long -> double silently round large values
    assert(Evolution.narrows(IntegerType, FloatType))
    assert(Evolution.narrows(LongType, FloatType))
    assert(Evolution.narrows(LongType, DoubleType))
    // exact embeddings stay safe
    assert(!Evolution.narrows(ShortType, FloatType))
    assert(!Evolution.narrows(IntegerType, DoubleType))
    assert(!Evolution.narrows(BooleanType, DoubleType))
    // floating -> integral is still narrowing (fraction loss)
    assert(Evolution.narrows(FloatType, LongType))
  }

  test("breaking report: drops, narrowings, new requirements — not widenings") {
    val b = Evolution.diff(v1, v2).breaking
    assert(b.contains("drop column note"))
    assert(b.contains("add required column rev with no default"))
    assert(!b.exists(_.startsWith("narrow count"))) // int→long widens
    // the reverse direction narrows
    val back = Evolution.diff(v2, v1).breaking
    assert(back.exists(_.startsWith("narrow count: BIGINT -> INT")))
    assert(back.contains("require score: nullable -> NOT NULL"))
  }

  test("migrate: drops, defaults, casts and reorders; missing required throws") {
    import spark.implicits._
    val df = Seq((1L, 7, "x", 0.5)).toDF("id", "count", "note", "score")
    // v2 minus the no-default 'rev' (which must throw)
    val v2ok = GSchema("VSchema", v2.fields.filterNot(_.name == "rev"))
    val out = Evolution.migrate(df, v2ok)
    assert(out.columns.toSeq == Seq("id", "count", "score", "tag"))
    val row = out.head()
    assert(row.getLong(1) == 7L) // int widened to long
    assert(row.getString(3) == "none") // added from default
    intercept[IllegalArgumentException] {
      Evolution.migrate(df, v2)
    }
  }

  test("lineitem v1 -> v2 diff matches the declared evolution") {
    val d = Evolution.diff(Schemas.lineitem, Schemas.lineitemV2)
    assert(d.added.map(_.name) == Seq("l_audit"))
    assert(d.removed.map(_.name) == Seq("l_linestatus"))
    assert(d.changed.map(_.name) == Seq("l_linenumber"))
    assert(d.breaking == Seq("drop column l_linestatus"))
  }
}
