package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Measurement tooling for the STREAMING MICRO-BATCH FLOOR (r9
  * verdict task 5): every st-family query pays a fixed per-trigger
  * cost (offset-log write, micro-batch planning, one Spark job, sink
  * commit) that has nothing to do with the engine's per-row work —
  * at 4 triggers × ~0.6s it dominates the family's bench profile and
  * reads as "slow streaming" when it is actually the floor of
  * Spark's micro-batch machinery at local scale. This main measures
  * that floor directly (an AvailableNow file stream of K tiny files,
  * one file per trigger, foreachBatch writing one tiny parquet shard
  * — the exact st16/st17 shape) under config variants, reporting
  * per-trigger marginal cost so COVERAGE can quote a measured
  * constant instead of a suspicion. Validation tooling, not part of
  * the library's data path (SketchQuality's precedent).
  */
object StreamFloorProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val workers = if (cpus >= 16) cpus - 2 else cpus
    val spark = SparkSession.builder()
      .master(s"local[$workers]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // landing: K one-row parquet files with distinct mtimes (the
    // st17 fixture discipline — deterministic trigger order)
    def stage(k: Int): String = {
      val staged = java.nio.file.Paths.get(
        graft.core.Scratch.dir(s"graft_floor_landing_${k}_"))
      val in = staged.resolve("in")
      java.nio.file.Files.createDirectories(in)
      (0 until k).foreach { b =>
        val tmp = java.nio.file.Files.createTempDirectory(staged, s"s$b")
        Seq((b.toLong, s"row$b")).toDF("id", "v")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val target = in.resolve(f"b$b%02d.parquet")
        java.nio.file.Files.move(part.toPath, target)
        java.nio.file.Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1600000000000L + b * 60000))
      }
      in.toString
    }

    def run(inDir: String, confs: Map[String, String]): Double = {
      val prev = confs.keys.map(k =>
        k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val out = graft.core.Scratch.dir("graft_floor_out_")
        val ck = graft.core.Scratch.dirAt("/dev/shm", "graft_floor_ck_")
        val schema = spark.read.parquet(inDir).schema
        val t0 = System.nanoTime()
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
          .writeStream
          .foreachBatch { (batch: DataFrame, id: Long) =>
            batch.write.mode("overwrite").parquet(s"$out/batch=$id")
            ()
          }
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }

    val variants: Seq[(String, Map[String, String])] = Seq(
      ("baseline_sp8", Map("spark.sql.shuffle.partitions" -> "8")),
      ("shuffle_partitions_1", Map("spark.sql.shuffle.partitions" -> "1")),
      ("retain_2", Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.minBatchesToRetain" -> "2")),
      ("no_compact_log", Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.fileSource.log.compactInterval" -> "100")),
      ("combined", Map("spark.sql.shuffle.partitions" -> "1",
        "spark.sql.streaming.minBatchesToRetain" -> "2",
        "spark.sql.streaming.fileSource.log.compactInterval" -> "100")))

    val in1 = stage(1)
    val in9 = stage(9)
    println("[floor] variant, t(1 trigger) min-of-3, t(9 triggers) " +
      "min-of-3, marginal sec/trigger = (t9-t1)/8")
    variants.foreach { case (name, confs) =>
      run(in9, confs) // warm-up (codegen, file-source init)
      val t1 = Seq.fill(3)(run(in1, confs)).min
      val t9 = Seq.fill(3)(run(in9, confs)).min
      println(f"[floor] $name%-22s t1=$t1%.3f t9=$t9%.3f marginal=${(t9 - t1) / 8}%.3f")
    }
    spark.stop()
  }
}
