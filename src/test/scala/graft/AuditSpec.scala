package graft

import graft.operators.Audit

/** Data-quality audits: FK integrity both directions, column profiles,
  * Benford digit extraction boundaries. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("fkCheck counts orphans (rows AND keys) and childless parents") {
    // children: key 1 (2 rows, ok), key 9 (3 rows, orphan), key 8 (1 row,
    // orphan); parents: 1, 2 (childless), 3 (childless)
    val child = Seq(1L, 1L, 9L, 9L, 9L, 8L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Audit.fkCheck(child, "fk", parent, "pk", "c->p").collect().head
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 6L) // child_rows
    assert(r.getLong(2) == 3L) // child_keys
    assert(r.getLong(3) == 4L) // orphan_rows (9 x3 + 8 x1)
    assert(r.getLong(4) == 2L) // orphan_keys
    assert(r.getLong(5) == 2L) // childless_parents
  }

  test("fkCheck on a fully-consistent relation reports zeros") {
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Audit.fkCheck(child, "fk", parent, "pk", "ok").collect().head
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((0L, 0L, 0L)))
  }

  test("tableProfile: one row per column with exact null/distinct") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (None, Some("b")))
      .toDF("x", "y")
    val r = Audit.tableProfile(df, Seq("x", "y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r.toSeq == Seq(("x", 3L, 1L, 1L), ("y", 3L, 1L, 2L)))
  }

  test("skewProfile: power-of-two buckets partition the keys and rows") {
    // key a: 1 row (bucket 0), b: 3 rows (bucket 1), c: 8 rows (bucket 3)
    val df = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(8)("c"))
      .toDF("k")
    val r = Audit.skewProfile(df, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(r.toSeq == Seq(
      (0L, 1L, 1L, 1L, 1L), (1L, 1L, 3L, 3L, 3L), (3L, 1L, 8L, 8L, 8L)))
    // buckets partition everything: keys sum to 3, rows to 12
    assert(r.map(_._2).sum == 3L && r.map(_._3).sum == 12L)
  }

  test("benfordAudit: digit of floor, <1 excluded, shares reconcile") {
    // 19.5 -> 1, 2.0 -> 2, 200.0 -> 2, 0.5 -> excluded
    val df = Seq(19.5, 2.0, 200.0, 0.5).toDF("v")
    val r = Audit.benfordAudit(df, "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r.toSeq == Seq(
      ("1", 1L, 333333L, 301030L), ("2", 2L, 666666L, 176091L)))
    // expectation table itself sums to ~1e6 (floor residue only)
    assert(Audit.benfordMicro.values.sum == 1000000L)
  }
}
