package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Runtime bloom-filter injection — Spark's defense for selective
  * fact-fact joins at scale: the selective side's join keys are
  * summarized into a bloom filter that pre-filters the big side's scan
  * BEFORE the shuffle, cutting shuffled bytes by the join selectivity.
  * At 100 TB this (plus partition pruning) is what keeps a
  * one-customer query from shuffling the whole lineitem table. */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective fact-fact join gets a bloom runtime filter on the big side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val d = "/root/testdata/sf0.01"
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val sel = spark.read.parquet(s"$d/orders.parquet")
        .filter(col("o_totalprice") > 450000)
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))

      val plan = j.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloom"),
        "expected a bloom runtime filter in:\n" + j.queryExecution.optimizedPlan.toString.take(2000))

      // the filter is a performance rewrite only — results unchanged
      val n = j.count()
      withConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val plain = li.join(sel, col("l_orderkey") === col("o_orderkey")).count()
        assert(n == plain)
      }
    }
  }
}
