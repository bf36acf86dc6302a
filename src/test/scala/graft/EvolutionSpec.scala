package graft

import graft.queries.Schemas
import graft.dsl.col
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

  test("inheritance override: validator / DDL / migration trio stays consistent") {
    // reference test_schema.py exercises field collection + validator
    // accumulation under inheritance; this extends it across the whole
    // trio — the CHILD's overridden constraints must win everywhere
    val parent = GSchema("MetricSchema")
      .field(GLong("id", primaryKey = true))
      .field(GLong("qty", ge = Some(0L), width = 32))
      .field(GString("label", nullable = true))
      .check(col("id") >= 0L, "id non-negative")
    val child = GSchema("MetricSchema")
      .field(GLong("qty", ge = Some(0L), lt = Some(100L))) // tightened + widened 32→64
      .field(GString("label", default = Some("na"))) // nullable → required w/ default
      .extend(parent)

    // field collection: parent order preserved, overrides in place
    assert(child.fields.map(_.name) == Seq("id", "qty", "label"))
    // validator accumulation: overridden field contributes the CHILD's
    // constraint set (never the parent's), inherited model checks kept
    assert(child.allChecks.map(_.message) ==
      Seq("qty must be >= 0", "qty must be < 100", "id non-negative"))
    // DDL sees the overridden storage type + the new default
    val ddl = child.ddl()
    assert(ddl.contains("qty BIGINT NOT NULL"))
    assert(ddl.contains("label STRING NOT NULL DEFAULT 'na'"))
    // diff parent → child agrees with what the DDL/validator changed
    val d = Evolution.diff(parent, child)
    assert(d.added.isEmpty && d.removed.isEmpty)
    assert(d.changed.map(_.name) == Seq("qty", "label"))
    assert(d.changed.find(_.name == "qty").get.changes
      .exists(_.startsWith("type INT -> BIGINT")))
    assert(d.changed.find(_.name == "qty").get.changes.contains("constraints changed"))
    assert(d.breaking == Seq("require label: nullable -> NOT NULL"))

    // migrate parent-shaped DATA to the child version: widened cast,
    // default fills the previously-nullable column
    import spark.implicits._
    val df = Seq((1L, Some(7), Some("x")), (2L, Some(150), None))
      .toDF("id", "qty", "label")
    val out = Evolution.migrate(df, child, fillNulls = true)
    assert(out.schema("qty").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(1) == 7L && rows(0).getString(2) == "x")
    assert(rows(1).getString(2) == "na") // filled from the child default
    // and the child validator applies the overridden constraint to the
    // migrated data: qty=150 violates lt(100), qty=7 passes
    val valid = child.validator.filterValid(out)
    assert(valid.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
