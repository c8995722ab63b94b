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

  test("text index: quiet-hour empty append leaves probes unchanged; empty build probes empty") {
    // a daily ingest with no new documents writes ZERO posting files
    // under its batch dirs and a (0, 0) stats row — both must be
    // invisible to every later probe, and a store whose only batches
    // are quiet must probe EMPTY, not throw on schema inference
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ei_ti_").toString + "/index"
    TextIndex.buildTextIndex(docs, dir)
    val qt = TextIndex.queryTerms(docs, 42)
    val before = TextIndex.probeTextIndex(spark, dir, qt, 10).collect().toSeq
    TextIndex.appendTextIndex(emptyDocs, dir, batch = 1L)
    val after = TextIndex.probeTextIndex(spark, dir, qt, 10).collect().toSeq
    assert(after == before, "an empty append must not move any answer")
    val emptyIdx = java.nio.file.Files
      .createTempDirectory("graft_ei_ti0_").toString + "/index"
    TextIndex.buildTextIndex(emptyDocs, emptyIdx)
    assert(TextIndex.probeTextIndex(spark, emptyIdx, qt, 10).count() == 0)
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
