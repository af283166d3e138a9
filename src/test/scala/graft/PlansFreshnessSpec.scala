package graft

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md is generated evidence (tools.PlanDump); it went stale in round 6
  * — its table still described a retired query's plan. This spec fails the
  * build whenever the committed PLANS.md's row set drifts from the live
  * catalog: every non-skipped catalog query must have a table row, every
  * table row must name a live query, and every skipped (eager demo-engine)
  * query must be covered by the flagship stage section instead. No Spark
  * session needed — pure file/catalog bookkeeping. */
class PlansFreshnessSpec extends AnyFunSuite {

  test("PLANS.md rows match the live catalog (regenerate via PlanDump)") {
    val path = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.exists(path), "PLANS.md missing — run PlanDump")
    val lines = java.nio.file.Files.readAllLines(path)
    import scala.jdk.CollectionConverters._
    val rows = lines.asScala
      .filter(l => l.startsWith("| ") && l.count(_ == '|') == 6)
      .map(_.split("\\|")(1).trim)
      .filterNot(Set("query", "---", "stage"))
      .toSet
    val catalogNames = graft.queries.Catalog.all.map(_.name).toSet
    val expected = catalogNames -- PlanDumpNames.skipped
    val tableRows = rows.filter(catalogNames) // flagship stage rows aren't queries
    assert(expected -- tableRows == Set.empty,
      s"queries missing from PLANS.md (regenerate): ${expected -- tableRows}")
    assert(tableRows -- expected == Set.empty,
      s"PLANS.md documents retired queries (regenerate): ${tableRows -- expected}")
    // the skip set itself must stay live: a skipped name that no longer
    // exists means the audit's scope note is stale too
    assert(PlanDumpNames.skipped -- catalogNames == Set.empty,
      s"skip set names retired queries: ${PlanDumpNames.skipped -- catalogNames}")
  }
}

/** Indirection so the spec reads the same set PlanDump writes with. */
private object PlanDumpNames {
  def skipped: Set[String] = graft.tools.PlanDump.skippedQueries
}
