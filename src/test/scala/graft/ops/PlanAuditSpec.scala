package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[PlanAudit]] is the user-facing form of PlanQualitySpec's checks;
  * this pins that each detector actually fires on a plan built to
  * violate it (the engine's own queries only ever exercise the clean
  * path, so without these the detectors could rot into always-empty).
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("fullWidthScans flags an unpruned wide scan and clears a pruned one") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val widths = Map("lineitem" -> 11)
    // distinct over the full row needs every column — not prunable
    val bad = li.distinct()
    assert(PlanAudit.fullWidthScans(bad, widths).nonEmpty)
    val good = li.select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    assert(PlanAudit.fullWidthScans(good, widths).isEmpty)
  }

  test("hasCartesianProduct and unpartitionedWindows fire on violating plans") {
    import org.apache.spark.sql.expressions.Window
    val a = spark.range(10).toDF("x")
    val b = spark.range(10).toDF("y")
    // tiny sides broadcast by default (BNLJ); the shuffle_replicate_nl
    // hint forces the CartesianProductExec the detector looks for
    assert(PlanAudit.hasCartesianProduct(
      a.hint("shuffle_replicate_nl").crossJoin(b)))
    assert(!PlanAudit.hasCartesianProduct(a.join(b, col("x") === col("y"))))
    val w = a.withColumn("rn", row_number().over(Window.orderBy("x")))
    assert(PlanAudit.unpartitionedWindows(w).nonEmpty)
    val wp = a.withColumn("g", col("x") % 2)
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy("x")))
    assert(PlanAudit.unpartitionedWindows(wp).isEmpty)
  }

  test("audit results are identical before and after the plan executes (AQE)") {
    // r6 ADVICE: the treeString-based audit changed once AQE replaced
    // stages with ShuffleQueryStage wrappers; the typed audit over
    // initialPlan must not.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    val agg = li.groupBy("l_returnflag").agg(sum("l_quantity"))
      .join(spark.read.parquet(s"$sf/region.parquet").limit(1)
        .select(col("r_regionkey").as("rk")), col("l_returnflag").isNotNull, "left")
    val before = (PlanAudit.exchanges(agg), PlanAudit.hasCartesianProduct(agg),
      PlanAudit.unpartitionedWindows(agg), PlanAudit.scans(agg).size)
    agg.collect() // executes; AQE finalizes the plan
    val after = (PlanAudit.exchanges(agg), PlanAudit.hasCartesianProduct(agg),
      PlanAudit.unpartitionedWindows(agg), PlanAudit.scans(agg).size)
    assert(before == after)
  }

  test("audit descends into cached (InMemoryTableScan) subplans") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    val cached = li.groupBy("l_returnflag").agg(sum("l_quantity").as("s")).cache()
    try {
      cached.collect() // populate the cache so the scan reads from memory
      val over = cached.filter(col("s") > 0)
      // the groupBy shuffle lives INSIDE the cached subplan; the
      // treeString audit could not see it (r6 ADVICE)
      assert(PlanAudit.exchanges(over) >= 1)
      assert(PlanAudit.scans(over).nonEmpty)
    } finally cached.unpersist()
  }

  test("exchanges counts shuffles; report renders every section") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    val agg = li.groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(PlanAudit.exchanges(agg) >= 1)
    val r = PlanAudit.report(agg, Map("lineitem" -> 11))
    assert(r.contains("shuffles") && r.contains("cartesian product: none")
      && r.contains("full-width scans: none"))
  }
}
