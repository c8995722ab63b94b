package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Plan linting for scale readiness — the checks PlanQualitySpec runs
  * against every registered query, exposed as a library API so a user
  * can audit THEIR composed query before pointing it at 100 TB:
  *
  * {{{
  * val df = spark.read.parquet(lake).join(dim, "k").groupBy(...).agg(...)
  * PlanAudit.report(df)   // human summary
  * PlanAudit.fullWidthScans(df, Map("lineitem" -> 11))  // must be empty
  * }}}
  *
  * Each check encodes a 100 TB failure mode:
  *  - a CartesianProduct is O(n·m) row pairs — never survives scale;
  *  - an unpartitioned Window moves ALL rows through ONE task;
  *  - a full-width scan of a wide table reads bytes the query never
  *    uses (column pruning lost somewhere above the scan);
  *  - the Exchange count is the number of cluster-wide shuffles the
  *    plan pays — the unit of cost that dominates everything else.
  *
  * Traversal covers scans hidden under AQE wrappers and cached-plan
  * (InMemoryTableScan) nodes, which plain `plan.collect` misses.
  */
object PlanAudit {

  /** All parquet/file scans in `df`'s physical plan, including those
    * under AdaptiveSparkPlan and InMemoryTableScan wrappers. */
  def scans(df: DataFrame): Seq[FileSourceScanExec] =
    scansOf(df.queryExecution.executedPlan)

  private def scansOf(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collect {
      case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
      case m: InMemoryTableScanExec => scansOf(m.relation.cachedPlan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten

  /** Scans of named tables that read the table FULL-width.
    * `tableWidths` maps table name (file stem) → its column count;
    * returns one human-readable line per offending scan. */
  def fullWidthScans(df: DataFrame, tableWidths: Map[String, Int]): Seq[String] =
    for {
      f <- scans(df)
      root <- f.relation.location.rootPaths.map(_.toString)
      table = root.split('/').last.stripSuffix(".parquet")
      w <- tableWidths.get(table)
      if f.requiredSchema.size >= w
    } yield s"$table scanned full-width (${f.requiredSchema.size}/$w cols) at $root"

  /** Number of SHUFFLE Exchange operators in the plan. Counted from
    * the rendered tree (under AQE the wrapper's `inputPlan` predates
    * exchange insertion, so node collection would undercount), with
    * `BroadcastExchange` (a broadcast, deliberately cheap) and
    * `ReusedExchange` (pays no second shuffle) excluded. */
  def exchanges(df: DataFrame): Int =
    treeString(df).linesIterator.count { l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange") &&
        !l.contains("ReusedExchange")
    }

  /** True if the plan contains a CartesianProduct. */
  def hasCartesianProduct(df: DataFrame): Boolean =
    treeString(df).contains("CartesianProduct")

  /** Window operators whose partition spec is EMPTY — every input row
    * of each flows through one task. Returns the offending plan lines.
    * (treeString renders `Window [exprs], [partition?], [order?]` with
    * absent specs omitted: 1 bracket group after "Window " = fully
    * global; 2 groups where the 2nd is an ORDER spec (carries ASC/
    * DESC) = unpartitioned-ordered.) */
  def unpartitionedWindows(df: DataFrame): Seq[String] =
    treeString(df).linesIterator.filter { l =>
      val i = l.indexOf("Window [")
      i >= 0 && {
        val groups = l.substring(i + "Window ".length).split("\\], \\[")
        groups.length match {
          case 1 => true
          case 2 => groups(1).contains(" ASC ") || groups(1).contains(" DESC ") ||
            groups(1).endsWith(" ASC") || groups(1).endsWith(" DESC")
          case _ => false
        }
      }
    }.map(_.trim).toSeq

  /** One-paragraph human summary of every check. */
  def report(df: DataFrame, tableWidths: Map[String, Int] = Map.empty): String = {
    val fw = fullWidthScans(df, tableWidths)
    val uw = unpartitionedWindows(df)
    Seq(
      s"shuffles (Exchange): ${exchanges(df)}",
      s"cartesian product: ${if (hasCartesianProduct(df)) "PRESENT (fatal at scale)" else "none"}",
      s"unpartitioned windows: ${if (uw.isEmpty) "none" else uw.mkString("; ")}",
      s"full-width scans: ${if (fw.isEmpty) "none" else fw.mkString("; ")}",
      s"scans: ${scans(df).map(f => s"${f.requiredSchema.size} cols").mkString(", ")}"
    ).mkString("\n")
  }

  private def treeString(df: DataFrame): String =
    df.queryExecution.executedPlan.treeString
}
