package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.TextIndex

/** Continuous inverted-index maintenance: the streaming counterpart of
  * tx34's batch [[TextIndex.appendTextIndex]], completing the
  * streaming-ingest symmetry across all three index families (st12 =
  * LSH, st13 = IVF, st16 = text). Documents land as files; each
  * micro-batch becomes one `batch=<id>` posting shard (partitioned by
  * tp inside, so probes prune identically across every shard) plus one
  * stats-log row — batch-sized cost, the existing index never read on
  * the write path.
  *
  * Contracts, mirroring [[DedupStream.lshIngest]] /
  * [[VectorStream.ivfIngest]]:
  *
  * - **Slicing invariance.** A doc's posting rows (th, tf, dl) are a
  *   pure per-document function, and N/avgdl are SUMS over the stats
  *   log — so the accumulated index is EXACTLY the one-shot build
  *   wherever micro-batch boundaries fall (TextIngestStreamSpec
  *   re-slices to prove it; the st16 oracle holds the whole pipeline
  *   to the from-scratch BM25 answer).
  * - **Exactly-once per micro-batch.** [[TextIndex.appendTextIndex]]
  *   overwrites the batch's own subdirs, so a replayed batch replaces
  *   its previous attempt instead of double-appending.
  */
object TextIndexStream {

  def textIngest(
      spark: SparkSession,
      inDir: String,
      schema: StructType,
      indexDir: String,
      checkpointDir: String,
      filesPerTrigger: Int = 1,
      processAll: Boolean = true): StreamingQuery = {
    val trigger =
      if (processAll) Trigger.AvailableNow()
      else Trigger.ProcessingTime("10 seconds")
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        TextIndex.appendTextIndex(batch, indexDir, id)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
