package graft.core

import org.apache.spark.sql.SparkSession

/** A planned merge batch (reference `Batch`, main.rs:46-54). */
final case class MergeJob(name: String, files: Seq[ParquetFileRef], hasSchemaMismatch: Boolean)

final case class MergeResult(job: MergeJob, rows: Long)

/** Driver-side workflow around [[Merge]] — batch construction, schema
  * probing, and the merge loop with error accumulation
  * (shanytc/parquet-merger `src/main.rs:184-228, 298-404, 408-430`).
  */
object MergeJobs {

  /** W1 `add_batch` (main.rs:184-228): sort files (main.rs:190-191),
    * probe for schema mismatch, generate a name from the file stems. */
  def buildJob(spark: SparkSession, files: Seq[ParquetFileRef], batchNumber: Int): MergeJob = {
    val sorted   = files.sortBy(_.displayPath)
    val mismatch = checkSchemaMismatch(spark, sorted.map(_.fullPath))
    val stems    = sorted.map(f => Naming.stem(Discovery.fileName(f.fullPath)))
    MergeJob(Naming.generateBatchName(stems, batchNumber), sorted, mismatch)
  }

  /** W4 `check_schema_mismatch` (main.rs:408-430): fewer than 2 files is
    * never a mismatch; every file is compared pairwise against the
    * first; an unreadable footer counts as a mismatch. */
  def checkSchemaMismatch(spark: SparkSession, files: Seq[String]): Boolean = {
    if (files.size < 2) return false
    try {
      val schemas = files.map(Merge.probeSchema(spark, _))
      !schemas.tail.forall(SchemaAlign.compatible(schemas.head, _))
    } catch { case _: MergeException => true }
  }

  /** W3 `merge_batches` loop (main.rs:298-404): outputs land under
    * `outDir/merged/<sanitized-name>.parquet` (dir main.rs:322-329, path
    * main.rs:351-352); each job is tried independently and failures are
    * accumulated, not fatal (main.rs:355-375); when
    * `autoRemoveCompleted` (reference default ON, main.rs:108, 380-385)
    * the returned remaining-job list keeps only the failures. */
  def runAll(
      spark: SparkSession,
      jobs: Seq[MergeJob],
      outDir: String,
      exportCsv: Boolean = false,
      singleFile: Boolean = true,
      autoRemoveCompleted: Boolean = true)
      : (Seq[Either[(MergeJob, String), MergeResult]], Seq[MergeJob]) = {
    val outcomes = jobs.map { job =>
      try {
        if (job.files.isEmpty) throw new MergeException(s"No files found for batch: ${job.name}")
        val safe = Naming.sanitizeFilename(job.name)
        val dest = s"$outDir/merged/$safe.parquet"
        val csv  = if (exportCsv) Some(s"$outDir/merged/$safe.csv") else None
        Right(MergeResult(job, Merge.merge(spark, job.files.map(_.fullPath), dest, singleFile, csv)))
      } catch {
        case e: Exception => Left((job, Option(e.getMessage).getOrElse(e.toString)))
      }
    }
    val remaining = if (autoRemoveCompleted) outcomes.collect { case Left((j, _)) => j } else jobs
    (outcomes, remaining)
  }
}
