package graft.queries

import graft.dsl._
import graft.schema._

/** Schema declarations for the driver test tables — the graft analog of a
  * flycatcher user's `class XSchema(Schema): ...` definitions. */
object Schemas {

  /** Lineitem with deliberately tight constraints so filter/report modes
    * have real work to do on the synthetic data (qty≤45, disc≤0.05,
    * shipdate≥1995-06-01, unit price ≤ 2000). */
  val lineitem: GSchema = GSchema("LineitemSchema")
    .field(GLong("l_orderkey", ge = Some(0L), primaryKey = true))
    .field(GLong("l_partkey"))
    .field(GLong("l_suppkey"))
    .field(GLong("l_linenumber", width = 32))
    .field(GDouble("l_quantity", ge = Some(1.0), le = Some(45.0)))
    .field(GDouble("l_extendedprice", gt = Some(0.0)))
    .field(GDouble("l_discount", ge = Some(0.0), le = Some(0.05)))
    .field(GDouble("l_tax", ge = Some(0.0)))
    .field(GString("l_returnflag", minLength = Some(1), maxLength = Some(1),
      pattern = Some("^[ANR]$")))
    .field(GString("l_linestatus"))
    .field(GTimestamp("l_shipdate",
      ge = Some(java.time.Instant.parse("1995-06-01T00:00:00Z"))))
    .check(col("l_extendedprice") / col("l_quantity") <= 2000.0,
      "unit price must be <= 2000")

  /** Events with defaults — exercises missing-column defaults + fillNulls. */
  val events: GSchema = GSchema("EventSchema")
    .field(GLong("event_id", primaryKey = true))
    .field(GTimestamp("ts"))
    .field(GLong("user_id", ge = Some(0L)))
    .field(GString("event_type", minLength = Some(1)))
    .field(GDouble("value", default = Some(0.0), nullable = true))
    .field(GString("props", default = Some("{}"), nullable = true))
    .field(GLong("schema_version", default = Some(1L),
      description = Some("added by validation when absent")))

  /** Coercion-only schema: prune events to 4 columns, narrow event_id to
    * int32, cast ts → date. */
  val eventsCoerced: GSchema = GSchema("EventCoercedSchema")
    .field(GLong("event_id", width = 32))
    .field(GDate("ts"))
    .field(GLong("user_id"))
    .field(GString("event_type"))

  /** Evolution target — lineitem v2: DROPS l_linestatus, WIDENS
    * l_linenumber to 64-bit, ADDS a defaulted audit column. Exercises
    * all three diff classes (removed / changed / added-with-default). */
  val lineitemV2: GSchema = GSchema("LineitemV2Schema",
    fields = lineitem.fields.flatMap {
      case f: GLong if f.name == "l_linenumber" => Seq(f.copy(width = 64))
      case f if f.name == "l_linestatus" => Nil
      case f => Seq(f)
    } :+ GLong("l_audit", default = Some(0L),
      description = Some("v2 audit flag")),
    modelChecks = lineitem.modelChecks)

  /** Documents with uniqueness declarations (doc_id pk is unique; lang is
    * deliberately non-unique so uniqueViolations finds real offenders). */
  val documents: GSchema = GSchema("DocumentSchema")
    .field(GLong("doc_id", primaryKey = true))
    .field(GString("text", minLength = Some(1)))
    .field(GString("lang", unique = true))
    .field(GString("source"))
    .field(GLong("n_chars", ge = Some(0L)))
}
