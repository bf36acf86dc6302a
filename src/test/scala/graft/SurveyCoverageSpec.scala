package graft

import org.scalatest.funsuite.AnyFunSuite

/** The coverage contract, machine-verified (r10, from the r9 verdict:
  * three driver-green queries shipped with no SURVEY §2 row and a stale
  * README count — the inventory this whole process audits against must
  * never lag the registry again).
  *
  * Every key in `SparkEntry.queries` must appear in SURVEY.md §2 as a
  * backticked query name on a checked inventory row. (The reverse — a
  * row with no implementation — is covered by the rows themselves being
  * hand-audited `[x]` entries; this spec pins the direction that
  * actually drifted.)
  */
class SurveyCoverageSpec extends AnyFunSuite {

  private def surveySection2: String = {
    val f = Seq("SURVEY.md", "/root/repo/SURVEY.md")
      .map(new java.io.File(_)).find(_.isFile)
      .getOrElse(fail("SURVEY.md not found"))
    val text = new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = text.indexOf("## §2")
    assert(start >= 0, "SURVEY.md has no '## §2' heading")
    val rest = text.substring(start)
    val end = rest.indexOf("\n## §", 1)
    if (end >= 0) rest.substring(0, end) else rest
  }

  test("every registered query has a SURVEY §2 inventory row") {
    val sec = surveySection2
    val missing = SparkEntry.queries.keySet.toSeq.sorted
      .filterNot(k => sec.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"queries registered in SparkEntry but absent from SURVEY §2 " +
        s"(add the inventory rows): ${missing.mkString(", ")}")
  }

  test("SURVEY §2 inventory row IDs are unique") {
    // r12 verdict hygiene nit: C85/C86 were each reused across §C and
    // §M, making "row N" ambiguous in audits. Pin uniqueness so a
    // future duplicate fails the suite instead of drifting.
    val rowId = """(?m)^- \[[xo ]\] ([A-Z][0-9]+[a-z]?) """.r
    val ids = rowId.findAllMatchIn(surveySection2).map(_.group(1)).toSeq
    val dups = ids.groupBy(identity).collect {
      case (id, occ) if occ.size > 1 => s"$id (×${occ.size})"
    }.toSeq.sorted
    assert(dups.isEmpty,
      s"duplicate SURVEY §2 row IDs: ${dups.mkString(", ")}")
  }

  test("every oracle belongs to a registered query, and the registry " +
    "is oracle-complete") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty,
      s"oracleSql keys with no query: ${(os -- qs).mkString(", ")}")
    assert((qs -- os).isEmpty,
      s"queries with no oracle (driver would record a weaker " +
        s"rows-only check): ${(qs -- os).mkString(", ")}")
  }
}
