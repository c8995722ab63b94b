package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[KmvMinHashes]] — the KMV distinct-count synopsis behind the
  * oracle-exact q18: distinct semantics, the k cap, merge-order
  * invariance across partitionings, and the estimator's accuracy. */
class KmvMinHashesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kmv(c: org.apache.spark.sql.Column, k: Int) =
    GraftFunctions.kmv_min_hashes(c, k)

  test("set semantics: duplicates and order don't change the synopsis; ascending output") {
    val a = Seq(3L, 1L, 2L, 1L, 3L, 2L, 2L).toDF("h")
      .agg(kmv(col("h"), 8)).head().getAs[scala.collection.Seq[Long]](0)
    val b = Seq(2L, 3L, 1L).toDF("h")
      .agg(kmv(col("h"), 8)).head().getAs[scala.collection.Seq[Long]](0)
    assert(a == Seq(1L, 2L, 3L) && b == Seq(1L, 2L, 3L))
  }

  test("k cap keeps exactly the k smallest distinct values") {
    val vals = (1L to 100L).flatMap(v => Seq(v, v)) // duplicated 1..100
    val got = scala.util.Random.shuffle(vals).toDF("h")
      .agg(kmv(col("h"), 10)).head().getAs[scala.collection.Seq[Long]](0)
    assert(got == (1L to 10L))
  }

  test("merge path: identical synopsis at 1, 3, and 8 shuffle partitions") {
    val df = spark.range(100000).toDF("x")
      .select(GraftFunctions.md5_low60(col("x").cast("string")).as("h"),
        pmod(col("x"), lit(4L)).as("g"))
    val results = Seq(1, 3, 8).map { p =>
      df.repartition(p).groupBy("g").agg(kmv(col("h"), 64).as("mins"))
        .orderBy("g").collect().map(_.toSeq).toSeq
    }
    assert(results.distinct.size == 1)
  }

  test("estimator: exact below k; within 3 standard errors above k") {
    val n = 50000L
    val space = 1152921504606846976.0 // 2^60
    val hashes = spark.range(n)
      .select(GraftFunctions.md5_low60(col("id").cast("string")).as("h"))
    // below cap: synopsis IS the distinct set
    val small = spark.range(500)
      .select(GraftFunctions.md5_low60(col("id").cast("string")).as("h"))
      .agg(kmv(col("h"), 1024)).head().getAs[scala.collection.Seq[Long]](0)
    assert(small.size == 500)
    // above cap: (k-1)·2^60 / h_(k) within 3·n/sqrt(k-2) of n
    val k = 1024
    val mins = hashes.agg(kmv(col("h"), k)).head().getAs[scala.collection.Seq[Long]](0)
    assert(mins.size == k)
    val est = (k - 1).toDouble * space / mins(k - 1).toDouble
    assert(math.abs(est - n) <= 3.0 * n / math.sqrt((k - 2).toDouble),
      s"est=$est n=$n")
  }

  test("property: synopsis equals the reference (k smallest distinct) on random multisets") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 25) {
      val k = 1 + rnd.nextInt(12) + 1 // in (1, 14]
      val vals = Seq.fill(rnd.nextInt(200))(rnd.nextInt(50).toLong)
      val want = vals.distinct.sorted.take(k)
      val got = (if (vals.isEmpty) spark.emptyDataset[Long].toDF("h")
                 else vals.toDF("h"))
        .repartition(1 + rnd.nextInt(6))
        .agg(kmv(col("h"), k)).head().getAs[scala.collection.Seq[Long]](0)
      assert(got == want, s"trial=$trial k=$k")
    }
  }

  test("nulls skipped; SQL registration") {
    GraftFunctions.register(spark)
    val got = Seq[(java.lang.Long, Int)]((1L, 0), (null, 0), (2L, 0)).toDF("h", "g")
      .groupBy("g").agg(expr("kmv_min_hashes(h, 4) AS mins"))
      .head().getAs[scala.collection.Seq[Long]](1)
    assert(got == Seq(1L, 2L))
  }
}
