package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The persisted LSH signature store: (band, bucket-group) partitioned
  * postings + pruned probe scans — the incremental near-dup path that
  * never rescans corpus text. */
class LshIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val corpus = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("writeLshIndex layout + probe finds every exact duplicate via pruned scans") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_").toString + "/index"
    DedupOps.writeLshIndex(corpus, path)

    // layout: one directory per band, bucket-group dirs inside
    val bandDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("band="))
    assert(bandDirs.length == 8)
    assert(bandDirs.head.listFiles().exists(_.getName.startsWith("bg=")))

    // the "new batch": exact copies of 50 corpus docs under shifted ids.
    // Identical text ⇒ identical signature ⇒ identical band hashes, so
    // the probe MUST surface every (original, copy) pair.
    val batch = corpus.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val result = DedupOps.probeLshIndex(spark, path, batch).cache()

    val plan = result.queryExecution.executedPlan.treeString
    assert(plan.contains("PartitionFilters"),
      s"probe scan should prune (band, bg) partitions:\n$plan")

    val pairs = result.select(col("corpus_id"), col("batch_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 50L).foreach { id =>
      assert(pairs.contains((id, id + 100000L)),
        s"probe missed exact duplicate of doc $id")
    }
  }
}
