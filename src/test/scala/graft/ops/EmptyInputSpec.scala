package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Zero-row inputs through the heavy kernels. At scale an empty input
  * is ROUTINE — a daily pipeline run over a partition with no new
  * data, an incremental-dedup batch after a quiet hour — and several
  * kernels do driver-side bound/fence probing (`agg(min,max).head()`)
  * where an unguarded null unwrap would throw only on the empty case.
  * These pin that every such path returns an EMPTY result, not an
  * exception.
  */
class EmptyInputSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def emptyDocs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  test("exactJaccardPairs on an empty corpus returns zero pairs") {
    assert(DedupOps.exactJaccardPairs(emptyDocs).count() == 0)
  }

  test("portable near-dup pipelines (r7) on an empty corpus return zero pairs") {
    assert(DedupOps.minHashNearDupsPortable(emptyDocs).count() == 0)
    assert(DedupOps.simHashNearDupsPortable(emptyDocs).count() == 0)
    assert(DedupOps.bottomKNearDupsPortable(emptyDocs).count() == 0)
  }

  test("thresholdSweep on an empty corpus returns its single audit row with zero candidates") {
    val row = DedupOps.thresholdSweep(emptyDocs).head()
    assert(row.getAs[Long]("n_candidate_pairs") == 0L)
  }

  test("PrefixSum.byLongKey on zero rows returns zero rows") {
    val df = spark.range(0).toDF("k").withColumn("v", col("k"))
    assert(PrefixSum.byLongKey(df, "k", Nil, col("v"), "cum",
      inclusive = true).count() == 0)
  }

  test("GridQuantile.perGroup on zero rows returns zero fence rows") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("x", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assert(GridQuantile.perGroup(df, Seq("g"), "x",
      Seq("p50" -> 0.5)).count() == 0)
  }

  test("mutualKnnExact on an empty embedding set returns zero edges") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assert(VectorOps.mutualKnnExact(df).count() == 0)
  }
}
