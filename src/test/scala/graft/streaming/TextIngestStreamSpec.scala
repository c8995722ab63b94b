package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.TextIndex

/** Slicing invariance for the streaming text-index ingest: the
  * accumulated posting store + stats log must equal the one-shot
  * build's answers wherever the micro-batch boundaries fall. */
class TextIngestStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  private def probe(dir: String): DataFrame =
    TextIndex.probeTextIndex(spark, dir,
      TextIndex.queryTerms(docs, 42), k = 10)

  test("ingest sliced into many micro-batches == one-shot build") {
    val landing = java.nio.file.Files
      .createTempDirectory("graft_tis_landing_").toString
    docs.repartition(4, col("doc_id"))
      .write.mode("overwrite").parquet(s"$landing/in")
    val schema = spark.read.parquet(s"$landing/in").schema

    def ingest(fpt: Int): String = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_tis_idx${fpt}_").toString
      val ck = java.nio.file.Files
        .createTempDirectory(s"graft_tis_ck${fpt}_").toString
      val q = TextIndexStream.textIngest(spark, s"$landing/in", schema,
        s"$base/index", ck, filesPerTrigger = fpt)
      q.awaitTermination()
      s"$base/index"
    }

    val fine = ingest(1)   // one batch per file
    val coarse = ingest(64) // everything in one batch
    val oneShot = java.nio.file.Files
      .createTempDirectory("graft_tis_oneshot_").toString + "/index"
    TextIndex.buildTextIndex(docs, oneShot)

    val ref = probe(oneShot).collect().toSeq
    assert(probe(fine).collect().toSeq == ref,
      "per-file slicing must not change the probe answer")
    assert(probe(coarse).collect().toSeq == ref,
      "single-batch slicing must not change the probe answer")
  }
}
