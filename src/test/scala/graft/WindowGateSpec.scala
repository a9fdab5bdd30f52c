package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** STANDING GATE against the single-partition-window hazard: an
  * unpartitioned `Window.orderBy` / `Window.rowsBetween` (or the
  * degenerate `Window.partitionBy(lit(1))`) compiles to
  * `Exchange SinglePartition` — every input row through ONE task. That
  * is only acceptable over a frame whose cardinality is bounded by
  * something OTHER than the data (a calendar, a value domain, a status
  * enum, a fixed checkpoint list); at fact/doc/entity grain the exact
  * two-phase [[graft.operators.GlobalRank]] helper must be used
  * instead.
  *
  * This spec scans the main source tree and pins every such site to an
  * explicit allowlist of (file, enclosing def) pairs, each annotated
  * with its cardinality bound. Adding a NEW unpartitioned window
  * anywhere fails this test until the author either converts it to
  * GlobalRank or argues its bound here — the review step the round-12
  * audit asked to make structural. */
class WindowGateSpec extends AnyFunSuite {

  /** (file, enclosing def) → the bound that justifies one task. */
  private val allowlist: Map[(String, String), String] = Map(
    ("BatchOps.scala", "reorderHazardOf") ->
      "distinct gap-days grain: bounded by the order-date span in days",
    ("BatchOps.scala", "dailyRevenueRunning") ->
      "day grain: calendar-bounded (thousands of rows a decade)",
    ("BatchOps.scala", "revenueTrailing7d") ->
      "day grain: calendar-bounded",
    ("BatchOps.scala", "rankPick") ->
      "day grain (revenueMadOutliers median picks): calendar-bounded",
    ("BatchOps.scala", "revenueCusum") ->
      "day grain: calendar-bounded",
    ("BatchOps.scala", "paretoFrontier") ->
      "distinct p_size grain: value-domain-bounded (~50)",
    ("BatchOps.scala", "orderBacklog") ->
      "day-spine grain: calendar-bounded",
    ("BatchOps.scala", "wowGrowth") ->
      "ISO-week grain: calendar-bounded",
    ("CdcOps.scala", "rolling7dMetricsOf") ->
      "day grain: calendar-bounded",
    ("CdcOps.scala", "cumulativeReachOf") ->
      "day-spine grain: calendar-bounded",
    ("MultiModalOps.scala", "u32") ->
      "status-enum grain (audioFormatCensus total): 4 statuses",
    ("TextOps.scala", "curriculumInterleave") ->
      "distinct-source grain: source enum (~5)",
    ("TextOps.scala", "qualityCalibration") ->
      "distinct n_chars grain: value-domain-bounded",
    ("TextOps.scala", "ksDriftOf") ->
      "merged length-grid grain: value-domain-bounded",
    ("TextOps.scala", "bpeMergeCensus") ->
      "post-LIMIT frame: <= BpeTopK rows by construction",
    ("TextOps.scala", "vocabGrowthHeaps") ->
      "decile grain: HeapsDeciles = 10 rows")

  test("every unpartitioned window site is allowlisted with a cardinality bound") {
    // Whole-file regex (\s* spans newlines), so a line-wrapped
    // `Window\n  .orderBy(...)` cannot evade the gate; the match
    // offset maps back to a line to find the enclosing def.
    val pat = ("""Window\s*\.\s*(orderBy|rowsBetween)""" +
      """|Window\s*\.\s*partitionBy\(lit\(""").r
    val defPat = """\bdef (\w+)""".r
    val root = Paths.get("src/main/scala/graft")
    val sites = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") &&
        !p.getFileName.toString.equals("GlobalRank.scala"))
      .flatMap { p =>
        val text = new String(Files.readAllBytes(p), "UTF-8")
        val lines = text.split("\n", -1)
        val lineStarts = lines.scanLeft(0)(_ + _.length + 1)
        def lineOf(offset: Int): Int =
          lineStarts.lastIndexWhere(_ <= offset) // 0-based line index
        pat.findAllMatchIn(text).flatMap { m =>
          val li = math.min(lineOf(m.start), lines.length - 1)
          val trimmed = lines(li).trim
          val isComment = trimmed.startsWith("*") || trimmed.startsWith("//")
          if (isComment) None
          else {
            val lastDef = lines.take(li + 1).reverseIterator
              .flatMap(l => defPat.findFirstMatchIn(l).map(_.group(1)))
              .toSeq.headOption.getOrElse("<top>")
            Some((p.getFileName.toString, lastDef))
          }
        }
      }.toSet
    val rogue = sites.diff(allowlist.keySet)
    assert(rogue.isEmpty,
      s"unpartitioned window(s) outside the allowlist — convert to " +
        s"GlobalRank or argue a data-independent cardinality bound " +
        s"here: $rogue")
    // Keep the list honest in the other direction too: an entry whose
    // site was removed must be deleted, so the allowlist never grows
    // stale entries that silently re-authorize a future window.
    val stale = allowlist.keySet.diff(sites)
    assert(stale.isEmpty, s"stale allowlist entries (site removed): $stale")
  }
}
