package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong % 50, i.toDouble))
      .toDF("k", "v")
    val right = (0 to 60).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")

    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    val salted = SkewJoin.saltedInnerJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "v", "name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salt spreads the hot key across sub-keys") {
    val left = (1 to 1000).map(i => (1L, i.toDouble)).toDF("k", "v")
    val salts = left.withColumn("s", pmod(xxhash64(col("v")), lit(8)))
      .select("s").distinct().count()
    assert(salts == 8)
  }

  test("saltFactor=1 degenerates to the plain join") {
    val left = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val right = Seq((1L, "a"), (3L, "c")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(left, right, Seq("k"), saltFactor = 1)
    assert(out.collect().map(r => (r.getLong(0), r.getString(2))).toSeq == Seq((1L, "a")))
  }
}
