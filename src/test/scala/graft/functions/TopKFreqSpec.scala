package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The mergeable top-k aggregate: equivalence to the window
  * formulation, associative-merge stability under different
  * partitionings, and the (count DESC, key ASC) eviction order. */
class TopKFreqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def vocabTopK(k: Int) = {
    import spark.implicits._
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim($"text"), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val agg = counts
      .agg(GraftFunctions.topk_freq($"tok", $"n", k).as("tk"))
      .select(posexplode($"tk"))
      .select($"col.tok", $"col.n", ($"pos" + 1).as("rnk"))
    val win = counts
      .withColumn("rnk", row_number().over(Window.orderBy($"n".desc, $"tok")).cast("long"))
      .filter($"rnk" <= k)
      .select($"tok", $"n", $"rnk".cast("int").as("rnk"))
    (agg, win)
  }

  test("topk_freq equals the window top-k on the real vocabulary") {
    val (agg, win) = vocabTopK(20)
    assert(agg.collect().toSet == win.collect().toSet)
  }

  test("merge path: identical result at 1, 3, and 8 shuffle partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val results = Seq("1", "3", "8").map { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        vocabTopK(5)._1.collect().toSet
      }
      assert(results.distinct.size == 1, "partitioning changed the top-k")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("eviction respects (count DESC, key ASC): ties keep the lexicographically smaller key") {
    import spark.implicits._
    // k=2 over {z:5, a:5, m:3}: ties at 5 keep both; m evicted.
    val df = Seq(("z", 5L), ("a", 5L), ("m", 3L)).toDF("tok", "n")
      .repartition(3) // force per-partition buffers + merge
    val got = df.agg(GraftFunctions.topk_freq($"tok", $"n", 2).as("tk"))
      .select(explode($"tk").as("e")).select($"e.tok", $"e.n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("a", 5L), ("z", 5L)))
    // and with k=1 the tie resolves to the smaller key
    val one = df.agg(GraftFunctions.topk_freq($"tok", $"n", 1).as("tk"))
      .select(explode($"tk").as("e")).select($"e.tok")
      .collect().map(_.getString(0)).toList
    assert(one == List("a"))
  }

  test("SQL registration: topk_freq callable from spark.sql") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_tk")
    val r = spark.sql(
      """SELECT topk_freq(lang, n, 3) AS tk FROM (
        |  SELECT lang, count(*) AS n FROM docs_tk GROUP BY lang)""".stripMargin)
      .select(explode(col("tk"))).count()
    assert(r == 3)
  }
}
