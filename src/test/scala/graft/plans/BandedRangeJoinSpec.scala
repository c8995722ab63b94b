package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The banded-range-join optimizer rule: result-identical to the naive
  * join, adds the bin equi-key (visible as a Generate/explode in the
  * rewritten plan), fires only on the exact two-conjunct shape, and is
  * idempotent on its own output. */
class BandedRangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))

  test("rewrite is result-identical to the naive range join") {
    val a = events.select(col("event_id").as("ida"), col("user_id").as("ka"),
      col("tus").as("ta"))
    val b = events.select(col("event_id").as("idb"), col("user_id").as("kb"),
      col("tus").as("tb"))
    val naive = a.join(b,
      col("ka") === col("kb") && abs(col("ta") - col("tb")) <= 300000000L)
      .filter(col("ida") < col("idb"))

    val analyzed = naive.queryExecution.analyzed
    val rewritten = BandedRangeJoin(analyzed)
    assert(rewritten != analyzed, "rule did not fire")
    assert(rewritten.collect { case g: Generate => g }.nonEmpty,
      "rewritten plan should probe neighbor bins via Generate")

    val got = Bridge.ofRows(spark, rewritten)
    assert(got.count() == naive.count())
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
  }

  test("rule is idempotent and ignores non-matching shapes") {
    // fired once: re-application must be a no-op (three conjuncts now)
    val b = events.select(col("event_id").as("idb"), col("user_id").as("kb"),
      col("tus").as("tb"))
    val naive = events
      .select(col("event_id").as("ida"), col("user_id").as("ka"), col("tus").as("ta"))
      .join(b, col("ka") === col("kb") && abs(col("ta") - col("tb")) <= 300000000L)
    val once = BandedRangeJoin(naive.queryExecution.analyzed)
    val twice = BandedRangeJoin(once)
    assert(once.sameResult(twice))

    // extra conjunct: not the two-conjunct shape — untouched
    val guarded = events
      .select(col("event_id").as("ida"), col("user_id").as("ka"), col("tus").as("ta"))
      .join(b, col("ka") === col("kb") &&
        abs(col("ta") - col("tb")) <= 300000000L && col("ida") < col("idb"))
    val g = guarded.queryExecution.analyzed
    assert(BandedRangeJoin(g) == g)

    // non-literal window — untouched
    val nonLit = events
      .select(col("event_id").as("ida"), col("user_id").as("ka"), col("tus").as("ta"))
      .join(b, col("ka") === col("kb") && abs(col("ta") - col("tb")) <= col("idb"))
    val n = nonLit.queryExecution.analyzed
    assert(BandedRangeJoin(n) == n)
  }

  test("GraftExtensions injects the rule") {
    val rules = Bridge.extensionOptimizerRules(new GraftExtensionsProxy, spark)
    assert(rules.contains(BandedRangeJoin))
  }

  /** indirection so the test reads naturally */
  private class GraftExtensionsProxy
      extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
    override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
      new graft.GraftExtensions()(ext)
  }
}
