package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The pre-partitioned (bucketed) join layout — the scale path for
  * repeated fact-fact joins: both sides bucketed on the join key join
  * WITHOUT a shuffle exchange. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-key tables join with zero Exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // force the shuffle-join path so the bucket layout is what's tested
    // (conf must stay set until the physical plan is materialized —
    // queryExecution is lazy)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) =
      try {
        val j = spark.table("b_orders")
          .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        (j, j.queryExecution.executedPlan.treeString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert(plan.contains("SortMergeJoin"))
    // the join inputs must not shuffle (bucket layout IS the
    // partitioning); only the final aggregation may exchange
    val joinPart = plan.split("SortMergeJoin").last
    assert(!joinPart.contains("Exchange hashpartitioning(o_custkey"))
    assert(!joinPart.contains("Exchange hashpartitioning(c_custkey"))

    // and the result matches the plain-parquet join
    val plain = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(joined).count() == 0)
  }
}
