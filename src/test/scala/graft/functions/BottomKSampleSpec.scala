package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[BottomKSample]] — the deterministic bottom-k-by-hash sample
  * behind the oracle-exact ev14: exact-below-cap, cap semantics,
  * partitioning invariance, and the sampled tier's rank accuracy. */
class BottomKSampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bks(h: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column, k: Int) =
    GraftFunctions.bottomk_sample(h, v, k)

  test("below the cap the sample IS the group, ascending by value") {
    val got = Seq((5L, 3.0), (1L, 9.0), (3L, 1.0)).toDF("h", "v")
      .agg(bks(col("h"), col("v"), 10)).head().getAs[scala.collection.Seq[Double]](0)
    assert(got == Seq(1.0, 3.0, 9.0))
  }

  test("cap keeps the values of the k smallest (hash, value) pairs") {
    // hashes 1..100 carry value = hash + 1000; k=5 must keep exactly
    // the values of hashes 1..5 (then sort by value — same order here)
    val df = scala.util.Random.shuffle((1 to 100).toList)
      .map(h => (h.toLong, h + 1000.0)).toDF("h", "v")
    val got = df.agg(bks(col("h"), col("v"), 5))
      .head().getAs[scala.collection.Seq[Double]](0)
    assert(got == (1L to 5L).map(_ + 1000.0))
  }

  test("merge path: identical sample at 1, 3, and 8 shuffle partitions") {
    val df = spark.range(50000).toDF("x")
      .select(GraftFunctions.md5_low60(col("x").cast("string")).as("h"),
        col("x").cast("double").as("v"), pmod(col("x"), lit(3L)).as("g"))
    val results = Seq(1, 3, 8).map { p =>
      df.repartition(p).groupBy("g").agg(bks(col("h"), col("v"), 100).as("vs"))
        .orderBy("g").collect().map(_.toSeq).toSeq
    }
    assert(results.distinct.size == 1)
  }

  test("sampled tier: median of a 10k sample of uniform values lands near the true median") {
    val n = 100000
    val df = spark.range(n)
      .select(GraftFunctions.md5_low60(col("id").cast("string")).as("h"),
        col("id").cast("double").as("v"))
    val vs = df.agg(bks(col("h"), col("v"), 10000))
      .head().getAs[scala.collection.Seq[Double]](0)
    assert(vs.size == 10000)
    val sampleMedian = vs(4999)
    // rank error ~ sqrt(0.25/10000) = 0.5%; 5 sigma on n rows
    assert(math.abs(sampleMedian - n / 2.0) <= 0.025 * n, s"median=$sampleMedian")
  }

  test("property: sample equals the reference (values of k smallest (h,v) pairs) on random data") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 25) {
      val k = 1 + rnd.nextInt(12)
      // deliberately includes duplicate hashes with distinct values —
      // the lexicographic (h, v) order must arbitrate exactly like the
      // oracle's ORDER BY hv, value rank window
      val pairs = Seq.fill(rnd.nextInt(150))(
        (rnd.nextInt(20).toLong, rnd.nextInt(9).toDouble))
      val want = pairs.distinct.sorted.take(k).map(_._2).sorted
      val got = (if (pairs.isEmpty) spark.emptyDataset[(Long, Double)].toDF("h", "v")
                 else pairs.toDF("h", "v"))
        .repartition(1 + rnd.nextInt(6))
        .agg(bks(col("h"), col("v"), k)).head().getAs[scala.collection.Seq[Double]](0)
      assert(got == want, s"trial=$trial k=$k")
    }
  }

  test("nulls skipped; SQL registration") {
    GraftFunctions.register(spark)
    val got = Seq[(java.lang.Long, java.lang.Double)]((1L, 5.0), (null, 1.0), (2L, null))
      .toDF("h", "v")
      .agg(expr("bottomk_sample(h, v, 4) AS vs"))
      .head().getAs[scala.collection.Seq[Double]](0)
    assert(got == Seq(5.0))
  }
}
