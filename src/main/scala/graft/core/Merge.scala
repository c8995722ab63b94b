package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** A merge failed in a way the reference surfaces as a per-batch error
  * (unreadable footer, empty column intersection, empty batch). */
final class MergeException(msg: String) extends RuntimeException(msg)

/** The reference's whole data path — scan → schema-align → UNION ALL →
  * sink (shanytc/parquet-merger `src/main.rs:549-613`) — re-expressed as
  * a declarative Spark plan.
  *
  * Scale notes (the part the reference gets wrong, main.rs:580-601: it
  * buffers every record batch in RAM, single-threaded):
  *  - The union is never materialized on the driver; it is a lazy
  *    `DataFrame` that Spark executes as one pipelined
  *    scan→project→write stage with one task per file split. No shuffle:
  *    union is partition concatenation.
  *  - The compatible fast path reads ALL files through a single
  *    multi-path parquet scan (one `FileSourceScanExec` that bin-packs
  *    splits across executors) instead of N union legs.
  *  - `singleFile = true` mirrors the reference's one-output-file
  *    contract via `coalesce(1)` (narrow, no shuffle). At 100 TB pass
  *    `singleFile = false` and the write stays fully parallel.
  */
object Merge {

  /** Decided before any row is read, mirroring the reference's
    * analyze-before-execute split (main.rs:549-578). */
  sealed trait AlignPlan
  /** Identical schemas: positional UNION ALL (main.rs:564-569). */
  case object FastPath extends AlignPlan
  /** Schema drift: project every file to the common columns, first
    * file's column order (main.rs:570-577). */
  final case class Intersect(columns: Seq[String]) extends AlignPlan

  /** Footer-only schema probe (main.rs:433-437); raises the reference's
    * "Cannot read schema from" error (main.rs:557-561) on failure. */
  def probeSchema(spark: SparkSession, file: String): StructType =
    try spark.read.parquet(file).schema
    catch { case _: Exception => throw new MergeException(s"Cannot read schema from: $file") }

  def plan(schemas: Seq[StructType]): AlignPlan =
    if (SchemaAlign.allCompatible(schemas)) FastPath
    else {
      val common = SchemaAlign.commonColumns(schemas)
      if (common.isEmpty)
        throw new MergeException("No common columns found across all files")
      Intersect(common)
    }

  /** Aligned UNION ALL over parquet `files` as a lazy DataFrame. */
  def alignedUnion(spark: SparkSession, files: Seq[String]): DataFrame = {
    if (files.isEmpty) throw new MergeException("No files in batch")
    val schemas = files.map(probeSchema(spark, _))
    plan(schemas) match {
      case FastPath =>
        // One distributed scan over every file; passing the schema skips
        // a second footer-inference pass.
        spark.read.schema(schemas.head).parquet(files: _*)
      case Intersect(common) =>
        val cols = common.map(col)
        files
          .map(f => spark.read.parquet(f).select(cols: _*))
          .reduce(_ unionByName _)
    }
  }

  /** Aligned UNION ALL over already-loaded DataFrames — same planning as
    * [[alignedUnion]] for in-memory composition (schema drift between
    * the inputs resolves to the first input's common-column order). */
  def alignedUnionOf(dfs: Seq[DataFrame]): DataFrame = {
    if (dfs.isEmpty) throw new MergeException("No files in batch")
    plan(dfs.map(_.schema)) match {
      case FastPath => dfs.reduce(_ union _)
      case Intersect(common) =>
        val cols = common.map(col)
        dfs.map(_.select(cols: _*)).reduce(_ unionByName _)
    }
  }

  /** OUTER-union drift mode — the complement of the reference's
    * intersection semantics: keep the UNION of all columns, padding
    * inputs that lack one with NULL (`unionByName(allowMissingColumns)`
    * — Spark's analog of parquet `mergeSchema`). Data is never dropped;
    * downstream must tolerate nulls. The reference only implements
    * intersection (main.rs:617-642); both modes are offered because a
    * lake ingesting evolving schemas usually wants widening, not
    * silent column loss. */
  def alignedUnionOuter(dfs: Seq[DataFrame]): DataFrame = {
    if (dfs.isEmpty) throw new MergeException("No files in batch")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Write `df` as ONE plain file at `dest` — the reference's output
    * layout (`merged/<name>.parquet` is a file, not a directory):
    * coalesce(1) into a staging dir, then rename the part file.
    * Rename is atomic-cheap on HDFS/local; on object stores prefer
    * `singleFile=false` directory output. */
  def writeSingleFile(
      df: DataFrame,
      dest: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit = {
    val spark   = df.sparkSession
    val staging = new org.apache.hadoop.fs.Path(dest + ".__staging__")
    val tmp     = new org.apache.hadoop.fs.Path(dest + ".__tmp__")
    val target  = new org.apache.hadoop.fs.Path(dest)
    val fs      = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Staging (and the temp sibling) are cleaned up on EVERY exit path;
    // the target is replaced with a sibling-to-sibling rename so the
    // destination-missing window is a single metadata op, not a write.
    try {
      df.coalesce(1).write.mode("overwrite").format(format).options(options)
        .save(staging.toString)
      val part = fs.listStatus(staging)
        .map(_.getPath)
        .find(p => p.getName.startsWith("part-"))
        .getOrElse(throw new MergeException(s"No part file written under $staging"))
      if (!fs.mkdirs(target.getParent))
        throw new MergeException(s"Cannot create output directory: ${target.getParent}")
      // Hadoop rename/delete report failure via return value, not exceptions
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (!fs.rename(part, tmp))
        throw new MergeException(s"Cannot move $part to $tmp")
      if (fs.exists(target) && !fs.delete(target, true))
        throw new MergeException(s"Cannot replace existing output: $dest")
      if (!fs.rename(tmp, target))
        throw new MergeException(s"Cannot move $tmp to $dest")
    } finally {
      fs.delete(staging, true)
      fs.delete(tmp, true)
    }
  }

  /** Full merge job: align → union → parquet sink; returns rows written
    * (main.rs:601-613 returns the same count). `singleFile = true`
    * produces one plain parquet FILE like the reference; `false` keeps
    * Spark's fully parallel directory output for scale. */
  def merge(
      spark: SparkSession,
      files: Seq[String],
      outPath: String,
      singleFile: Boolean = true,
      csvPath: Option[String] = None): Long = {
    val df = alignedUnion(spark, files)
    if (singleFile) writeSingleFile(df, outPath)
    else df.write.mode("overwrite").parquet(outPath)
    csvPath.foreach(p => exportCsv(spark, outPath, p, singleFile))
    spark.read.parquet(outPath).count()
  }

  /** Small-file compaction — the reference's merge workflow stated as
    * the maintenance operation a 100 TB lake actually runs. Instead of
    * the reference's one-output-file contract (main.rs:603-611, which
    * cannot scale past a single writer), the merged data is rewritten
    * into ~`targetBytes` output files, sized from the inputs' real
    * on-disk footprint:
    *
    *  - file count = ceil(totalInputBytes / targetBytes), so output
    *    sizes track the target regardless of input fragmentation;
    *  - `coalesce` (narrow, no shuffle) when reducing file count —
    *    each output task concatenates whole input splits;
    *  - `repartition` (round-robin shuffle) only when asked to *grow*
    *    the file count, where a shuffle is unavoidable for balance.
    *
    * Returns (rows, outputFiles). */
  def compact(
      spark: SparkSession,
      files: Seq[String],
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Long, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val totalBytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = alignedUnion(spark, files)
    val sized =
      if (nOut <= df.rdd.getNumPartitions) df.coalesce(nOut)
      else df.repartition(nOut)
    sized.write.mode("overwrite").parquet(outPath)
    val out = spark.read.parquet(outPath)
    val parts = out.inputFiles.length
    (out.count(), parts)
  }

  /** CSV export of a merged parquet (main.rs:693-729): drop `__...__`
    * internal columns (main.rs:689-691, 702-708); header on; NULL -> ""
    * and RFC-4180 quoting are Spark CSV defaults, matching the
    * reference's `escape_csv_field` (main.rs:731-737). Dates/timestamps
    * emit ISO-8601 — a deliberate deviation from the reference's
    * `Some(...)` Debug-format quirk (SURVEY §7.5.1). */
  def exportCsv(
      spark: SparkSession,
      parquetPath: String,
      csvPath: String,
      singleFile: Boolean = true): Unit = {
    val df       = spark.read.parquet(parquetPath)
    val internal = df.columns.filter(SchemaAlign.isInternalColumn)
    val clean    = df.drop(internal.toIndexedSeq: _*)
    // RFC-4180 quote doubling like the reference's escape_csv_field
    // (Spark's default is backslash-escaping)
    val opts = Map("header" -> "true", "escape" -> "\"")
    if (singleFile) writeSingleFile(clean, csvPath, "csv", opts)
    else clean.write.mode("overwrite").options(opts).csv(csvPath)
  }
}
