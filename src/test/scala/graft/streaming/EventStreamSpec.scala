package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Drives the streaming surface with the events parquet as a file
  * source and a memory sink (one microbatch = the whole file). */
class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** File streaming sources need a DIRECTORY of files. */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("hourlyCounts: streaming result matches the batch equivalent") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.hourlyCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("hourly").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("hourly")

    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

    // append mode emits only windows sealed by the watermark; every
    // emitted row must equal its batch counterpart, and most windows
    // (29 days of data, 1h watermark) must have been emitted.
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() == 0)
    assert(got.count() >= batch.count() - 2)
  }

  test("dedupStream: duplicated source collapses to distinct events") {
    // stage the SAME file twice: every event arrives twice
    val dupDir = java.nio.file.Files.createTempDirectory("graft_stream_dup_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dupDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dupDir.resolve("b.parquet"))
    val stream = EventStream.readEvents(spark, dupDir.toString)
    val q = EventStream.dedupStream(stream, Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("deduped").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val expected = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(spark.table("deduped").count() == expected)
  }

  test("sessionize: closed sessions respect the gap and cover the data") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.sessionize(stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("sessions")

    assert(got.count() > 0)
    // session invariants
    assert(got.filter(col("end_us") < col("start_us")).count() == 0)
    assert(got.filter(col("n_events") < 1).count() == 0)
    // no two closed sessions of a user overlap or sit closer than the gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_us")
    val gaps = got.withColumn("prev_end", lag("end_us", 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(col("start_us") - col("prev_end") <= 30L * 60L * 1000000L)
    assert(gaps.count() == 0)

    // closed + open sessions must equal the batch sessionization count
    val batchSessions = graft.SparkEntry.queries("ev03_sessionize")(spark, sfDir)
      .agg(sum("n_sessions")).head.getLong(0)
    val openUsers = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    // each user's final session either stays open in state or closes via
    // event-time timeout once the end-of-stream watermark passes it:
    // total - openUsers <= closed <= total
    assert(got.count() >= batchSessions - openUsers)
    assert(got.count() <= batchSessions)
  }
}
