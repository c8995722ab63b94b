package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

// temporary prototyping harness; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("scratch_src_")
    val file = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.createSymbolicLink(dir.resolve(file.getFileName), file)
    val ckpt = java.nio.file.Files.createTempDirectory("scratch_ckpt_")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val src = spark.readStream.schema(schema).parquet(dir.toString)
    val q = src.select(col("user_id")).dropDuplicates("user_id")
      .writeStream.format("memory").queryName("scr")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    try {
      spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView("events")
      spark.sql("""SELECT event_type,
        hll_sketch_estimate(hll_sketch_agg(user_id)) AS est FROM events GROUP BY 1""").show()
      spark.sql("""WITH s AS (SELECT event_type, hll_sketch_agg(user_id) AS sk FROM events GROUP BY 1)
        SELECT hll_sketch_estimate(hll_union_agg(sk)) AS u FROM s""").show()
      spark.sql("""SELECT hll_sketch_estimate(hll_sketch_agg(user_id)) AS direct FROM events""").show()
    } catch { case e: Throwable => println(s"HLL FAIL: ${e.getMessage.take(300)}") }
    try {
      spark.sql("""SELECT try_divide(10.0, 0.0) AS a, try_divide(10, 0) AS b,
        try_cast('x12' AS BIGINT) AS c, try_cast('12' AS BIGINT) AS d,
        try_add(9223372036854775807L, 1L) AS e""").show()
    } catch { case e: Throwable => println(s"TRY FAIL: ${e.getMessage.take(300)}") }
    spark.stop()
  }
}
