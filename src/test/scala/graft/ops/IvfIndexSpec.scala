package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The persisted IVF layout: cluster-partitioned parquet + pruned probe
  * scans. */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  private lazy val centroids = vectors.filter(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("v").as("cv"))

  test("writeIvfIndex partitions by cluster; probe scan prunes partitions") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_").toString + "/index"
    VectorOps.writeIvfIndex(vectors, centroids, path)

    // the layout is one directory per cell
    val cells = new java.io.File(path).listFiles().filter(_.getName.startsWith("cid="))
    assert(cells.length == 8)

    val asg = VectorOps.assignClusters(vectors, centroids)
    val probes = asg.filter(col("vec_id").between(100, 102))
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("cid").as("pcid"))

    val result = VectorOps.probeIvfIndex(spark, path, probes, k = 3)

    // partition pruning visible in the scan
    val plan = result.queryExecution.executedPlan.treeString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"))

    // equals the fully in-memory computation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("c").desc, col("neighbor_id"))
    val expected = asg
      .join(broadcast(probes), col("cid") === col("pcid") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        VectorOps.cosine(col("pv"), col("v")).as("c"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), round(col("c"), 4).as("cos"))
    assert(result.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(result).count() == 0)
  }
}
