package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

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
  * Every check runs over ONE fixed plan form (see [[auditNodes]]): the
  * typed node set of `executedPlan`, with each AdaptiveSparkPlanExec
  * wrapper replaced by its `initialPlan` — the post-exchange-insertion
  * plan AQE starts from, which never mutates — and each cached
  * InMemoryTableScan expanded into its cached subplan. The r6 audit
  * matched substrings of `executedPlan.treeString`, whose rendering
  * changes once an AQE plan executes (ShuffleQueryStage/ReusedQueryStage
  * wrappers appear) and which never descends into cached subplans — so
  * the same DataFrame audited before vs after an action could disagree
  * (r6 ADVICE). Typed traversal over the pre-execution form makes the
  * audit action-independent and gives every check the same coverage.
  * Caveat: the audit is therefore of the STATIC plan — AQE runtime
  * re-planning (skew-join splits, shuffle reuse, empty-relation
  * shortcuts) can only remove or cheapen work relative to what is
  * reported here, never add a shuffle or cartesian the audit missed.
  */
object PlanAudit {

  /** The audited node set: every typed physical node reachable from
    * `df`'s executed plan, descending into AQE wrappers via their
    * immutable pre-execution `initialPlan` and into cached plans via
    * `InMemoryTableScan.relation.cachedPlan` (the scan node itself is
    * kept too — it is a real operator of the outer plan). */
  private def auditNodes(plan: SparkPlan): Seq[SparkPlan] =
    plan.collect {
      case a: AdaptiveSparkPlanExec => auditNodes(a.initialPlan)
      case m: InMemoryTableScanExec => m +: auditNodes(m.relation.cachedPlan)
      case p => Seq(p)
    }.flatten

  private def auditNodes(df: DataFrame): Seq[SparkPlan] =
    auditNodes(df.queryExecution.executedPlan)

  /** All parquet/file scans in `df`'s physical plan, including those
    * under AdaptiveSparkPlan and InMemoryTableScan wrappers. */
  def scans(df: DataFrame): Seq[FileSourceScanExec] =
    auditNodes(df).collect { case f: FileSourceScanExec => f }

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

  /** Number of SHUFFLE Exchange operators in the audited plan form.
    * Typed count of [[ShuffleExchangeLike]] nodes: broadcasts
    * (BroadcastExchange — deliberately cheap) are a different node
    * family and ReusedExchange (pays no second shuffle) is a leaf
    * whose referenced exchange is not re-collected, so both are
    * excluded by construction. AQE's `inputPlan` would undercount
    * (it predates exchange insertion); `initialPlan` is counted
    * post-insertion. */
  def exchanges(df: DataFrame): Int =
    auditNodes(df).count { case _: ShuffleExchangeLike => true; case _ => false }

  /** True if the plan contains a CartesianProduct. */
  def hasCartesianProduct(df: DataFrame): Boolean =
    auditNodes(df).exists { case _: CartesianProductExec => true; case _ => false }

  /** Window operators whose partition spec is EMPTY — every input row
    * of each flows through one task. Returns one rendered line per
    * offending operator. */
  def unpartitionedWindows(df: DataFrame): Seq[String] =
    auditNodes(df).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w.simpleString(160)
    }

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
}
