package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quality audit of the 5 rows-only SKETCH queries against their exact
  * tiers — the numbers behind the "cross-checked in specs" claim, made
  * bench-visible: run
  *   sbt 'runMain graft.SketchQuality [sfDir] [outFile]'
  * and the per-sketch precision / recall / error bounds land in
  * SKETCH_QUALITY.json. SketchQualitySpec asserts the same metrics
  * (via [[metrics]]) above the thresholds recorded in the artifact, so
  * the committed JSON cannot silently drift from what the suite
  * enforces.
  *
  * Exact tiers: dd06 (all-pairs Jaccard >= 0.8, oracle-exact) for the
  * three near-dup sketches; built-in exact `percentile` for ev14's GK
  * sketch; exact `count_distinct` for q18's HLL++.
  */
object SketchQuality {

  /** name -> metric -> value, all doubles for uniform JSON. */
  def metrics(spark: SparkSession, sfDir: String): Seq[(String, Seq[(String, Double)])] = {
    val exactPairs = SparkEntry.queries("dd06_exact_jaccard")(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def pairMetrics(name: String): (String, Seq[(String, Double)]) = {
      val got = SparkEntry.queries(name)(spark, sfDir)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val tp = (got intersect exactPairs).size.toDouble
      (name, Seq(
        "n_pairs" -> got.size.toDouble,
        "n_exact_tier_pairs" -> exactPairs.size.toDouble,
        "precision_vs_dd06" -> (if (got.isEmpty) 1.0 else tp / got.size),
        "recall_vs_dd06" -> (if (exactPairs.isEmpty) 1.0 else tp / exactPairs.size)))
    }

    val ev = Tables.events(spark, sfDir)
    val exactQ = ev.groupBy("event_type").agg(
      percentile(col("value"), lit(0.5)).as("e50"),
      percentile(col("value"), lit(0.95)).as("e95"))
    val qErr = SparkEntry.queries("ev14_approx_quantiles")(spark, sfDir)
      .join(exactQ, "event_type")
      .select(
        max(abs(col("p50_approx") - col("e50"))).as("m50"),
        max(abs(col("p95_approx") - col("e95"))).as("m95"),
        max(abs(col("p50_approx") - col("e50")) /
          greatest(abs(col("e50")), lit(1e-9))).as("r50"),
        max(abs(col("p95_approx") - col("e95")) /
          greatest(abs(col("e95")), lit(1e-9))).as("r95"))
      .head()
    val ev14 = ("ev14_approx_quantiles", Seq(
      "max_abs_err_p50" -> qErr.getDouble(0),
      "max_abs_err_p95" -> qErr.getDouble(1),
      "max_rel_err_p50" -> qErr.getDouble(2),
      "max_rel_err_p95" -> qErr.getDouble(3)))

    val ord = Tables(spark, sfDir, "orders")
    val exactD = ord.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("nd"))
    val dErr = SparkEntry.queries("q18_approx_distinct")(spark, sfDir)
      .join(exactD, "o_orderstatus")
      .select(max(abs(col("n_cust_approx") - col("nd"))
        / col("nd").cast("double")).as("mr"))
      .head()
    val q18 = ("q18_approx_distinct", Seq(
      "max_rel_err" -> dErr.getDouble(0)))

    Seq(pairMetrics("dd02_minhash_lsh"), pairMetrics("dd03_simhash"),
      pairMetrics("dd04_ngram_jaccard"), ev14, q18)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1).getOrElse("SKETCH_QUALITY.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = metrics(spark, sfDir)
    def f(v: Double): String = if (v == v.floor && v.abs < 1e15) v.toLong.toString
      else f"$v%.6f"
    val json = m.map { case (name, kvs) =>
      s"""  "$name": {${kvs.map { case (k, v) => s""""$k": ${f(v)}""" }.mkString(", ")}}"""
    }.mkString("{\n", ",\n", s",\n  \"sf_dir\": \"$sfDir\"\n}\n")
    Files.writeString(Paths.get(outFile), json)
    println(s"[sketch-quality] wrote $outFile")
    spark.stop()
  }
}
