package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hh(values: Seq[String], k: Int): Map[String, Long] =
    values.toDF("v")
      .agg(GraftFunctions.heavy_hitters(col("v"), k).as("m"))
      .head.getMap[String, Long](0).toMap

  test("k >= distinct values: exact counts") {
    val vs = Seq("a", "a", "a", "b", "b", "c")
    assert(hh(vs, 10) == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("Misra-Gries guarantee: items above n/(k+1) always survive, counts are lower bounds") {
    val rnd = new scala.util.Random(11)
    // 2000 noise values over 200 keys + two heavy items
    val noise = Seq.fill(2000)(s"n${rnd.nextInt(200)}")
    val heavy = Seq.fill(900)("HOT") ++ Seq.fill(500)("WARM")
    val vs = rnd.shuffle(noise ++ heavy)
    val n = vs.size
    val k = 8
    val out = hh(vs, k)
    val trueCounts = vs.groupBy(identity).map { case (kk, g) => kk -> g.size.toLong }
    // items with freq > n/(k+1) are guaranteed present
    trueCounts.filter(_._2 > n / (k + 1)).keys.foreach { key =>
      assert(out.contains(key), s"guaranteed heavy item $key missing")
    }
    // reported counts never exceed the truth and are within n/(k+1)
    out.foreach { case (key, c) =>
      val t = trueCounts(key)
      assert(c <= t, s"$key overcounted: $c > $t")
      assert(t - c <= n / (k + 1) + 1, s"$key undercounted beyond bound")
    }
    assert(out.size <= k)
  }

  test("distributed aggregation (partial + merge) matches single-partition result") {
    val vs = (1 to 5000).map(i => s"v${i % 37}")
    val many = vs.toDF("v").repartition(16)
      .agg(GraftFunctions.heavy_hitters(col("v"), 64).as("m"))
      .head.getMap[String, Long](0).toMap
    val one = vs.toDF("v").coalesce(1)
      .agg(GraftFunctions.heavy_hitters(col("v"), 64).as("m"))
      .head.getMap[String, Long](0).toMap
    // exact regime (k > 37 distinct): identical regardless of partitioning
    assert(many == one)
  }

  test("non-string input fails at analysis (or casts), never executor-side CCE") {
    GraftFunctions.register(spark)
    val df = Seq(1L, 2L, 2L).toDF("v")
    df.createOrReplaceTempView("hh_long")
    // either a clean analysis error or an implicit cast is acceptable;
    // an executor-side ClassCastException is not
    try {
      val m = spark.sql("SELECT heavy_hitters(v, 4) AS m FROM hh_long")
        .head.getMap[String, Long](0).toMap
      assert(m == Map("1" -> 1L, "2" -> 2L))
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        assert(e.getMessage.toLowerCase.contains("type"))
    }
  }

  test("group-by usage and SQL registration") {
    GraftFunctions.register(spark)
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")).toDF("g", "v")
    df.createOrReplaceTempView("hh_in")
    val rows = spark.sql("SELECT g, heavy_hitters(v, 4) AS m FROM hh_in GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).getMap[String, Long](1).toMap == Map("x" -> 2L, "y" -> 1L))
    assert(rows(1).getMap[String, Long](1).toMap == Map("z" -> 1L))
  }
}
