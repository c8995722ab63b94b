package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.Merge

/** The reference's merge workflow run as a *continuous service*: watch
  * a folder, append every newly arriving parquet file into the merged
  * output — the reference's add-folders → merge loop
  * (`src/main.rs:116-126, 549-613`) without the re-scan-everything
  * restart. Structured Streaming's file source tracks processed files
  * in the checkpoint, so each input file is merged exactly once even
  * across job restarts, and the parquet sink commits atomically per
  * microbatch — the operational contract a 100 TB ingest folder needs
  * (the reference re-reads and re-buffers the whole corpus per run).
  *
  * The output is a parquet *directory* that appends in parallel — the
  * single-file contract ([[Merge.writeSingleFile]]) stays a batch-side
  * export concern.
  */
object MergeStream {

  /** Start a continuous merge of `inDir` into `outDir`.
    *
    * @param schema     fixed source schema — probe one input with
    *                   [[Merge.probeSchema]] (file sources need the
    *                   schema up front; drifting files surface as nulls
    *                   or read errors rather than silent column loss)
    * @param processAll `true` = drain what exists then stop
    *                   (Trigger.AvailableNow — batch-like invocation);
    *                   `false` = keep running on new arrivals
    */
  def continuousMerge(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      schema: StructType,
      processAll: Boolean = true): StreamingQuery = {
    val trigger =
      if (processAll) Trigger.AvailableNow() else Trigger.ProcessingTime("10 seconds")
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1000)
      .parquet(inDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
