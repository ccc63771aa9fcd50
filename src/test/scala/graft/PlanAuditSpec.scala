package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.PlanAudit

/** Breadth guarantee over EVERY registered query's physical plan: no
  * cartesian product anywhere, and no query grows a nested-loop join
  * beyond its pinned bounded-broadcast count ([[PlanAudit.pinnedBnlj]]).
  * PlanSpec pins the flagship plans in depth; this closes the other ~130
  * against the one regression class that is invisible at sf0.001 wall
  * time and fatal at 100 TB — an accidental all-pairs join.
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the audit judges the STATIC plan: AQE can only ever improve on it
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every registered query: zero cartesians, nested-loop joins " +
      "within their pinned bounded-broadcast counts") {
    val audits = PlanAudit.auditAll(spark, "/root/testdata/sf0.001")
    assert(audits.size == SparkEntry.queries.size)
    val bad = audits.filter(_.flagged.nonEmpty)
    assert(bad.isEmpty, "plan regressions:\n" + bad.map(a =>
      s"  ${a.name}: ${a.flagged.mkString("; ")}").mkString("\n"))
  }

  test("the pin list names only registered queries (no stale entries)") {
    val stale = PlanAudit.pinnedBnlj.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"pinned but not registered: $stale")
  }
}
