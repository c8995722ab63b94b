package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two-phase distributed prefix sum must be VALUE-IDENTICAL to the
  * single-partition window it replaces — that equivalence is what lets
  * a dozen queries (tx17/mm07/sp11/sp12/sp14/sp17/tx26…) swap it in
  * without re-deriving oracle parity. Exercised across both key shapes
  * (long-range buckets, hex-prefix buckets), both framings, ties,
  * negative keys, sparse/skewed key ranges, and the empty input. */
class PrefixSumSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: single-partition window (correct by construction). */
  private def windowed(df: org.apache.spark.sql.DataFrame, orderCols: Seq[String],
      inclusive: Boolean) = {
    val w = Window.orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0L else -1L)
    df.withColumn("want", coalesce(sum("v").over(w), lit(0L)))
  }

  private def assertMatches(got: org.apache.spark.sql.DataFrame,
      ref: org.apache.spark.sql.DataFrame, key: String): Unit = {
    val bad = got.join(ref.select(col(key), col("want")), key)
      .filter(col("cum") =!= col("want"))
    assert(bad.count() == 0, bad.take(5).mkString("\n"))
  }

  test("byLongKey matches the global window on random data, both framings") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 5000L).map(i => (i, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "v").repartition(13)
    for (inclusive <- Seq(true, false)) {
      val got = PrefixSum.byLongKey(df, "k", Nil, col("v"), "cum", inclusive)
      assertMatches(got, windowed(df, Seq("k"), inclusive), "k")
    }
  }

  test("byLongKey: negative, sparse, and skewed keys bucket correctly") {
    val rnd = new scala.util.Random(11)
    // half the keys clustered near Long.MinValue/2, half huge positive,
    // plus dense duplicates broken by a tie column
    val rows = (0 until 3000).map { i =>
      val k = if (i % 2 == 0) -4000000000L + rnd.nextInt(1000)
      else 7000000000000L + rnd.nextInt(50)
      (k, i.toLong, rnd.nextInt(10).toLong)
    }
    val df = rows.toDF("k", "tie", "v").repartition(7)
    val got = PrefixSum.byLongKey(df, "k", Seq(col("tie")), col("v"), "cum",
      inclusive = true)
    val w = Window.orderBy("k", "tie")
      .rowsBetween(Window.unboundedPreceding, 0L)
    val ref = df.withColumn("want", sum("v").over(w))
    val bad = got.join(ref.select(col("tie").as("t2"), col("want")),
      col("tie") === col("t2")).filter(col("cum") =!= col("want"))
    assert(bad.count() == 0, bad.take(5).mkString("\n"))
  }

  test("byHexKey matches the global window over an md5 ordering") {
    val df = (0L until 4000L).map(i => (i, i % 7))
      .toDF("id", "v").withColumn("h", md5(col("id").cast("string")))
      .repartition(9)
    val got = PrefixSum.byHexKey(df, "h", Seq(col("id")), col("v"), "cum",
      inclusive = false)
    val w = Window.orderBy("h", "id")
      .rowsBetween(Window.unboundedPreceding, -1L)
    val ref = df.withColumn("want", coalesce(sum("v").over(w), lit(0L)))
    assertMatches(got, ref, "id")
  }

  test("empty input yields an empty (or zero) result, not a crash") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.byLongKey(df, "k", Nil, col("v"), "cum",
      inclusive = true).count() == 0)
  }

  test("ntileCutKeys reproduces exact ntile(10) boundaries through the bracket path") {
    val rnd = new scala.util.Random(19)
    val n = 50000 // > 2·accuracy → bracket regime
    val rows = (0L until n.toLong).map(i => (rnd.nextInt(800).toDouble, i))
    val df = rows.toDF("v", "t").repartition(17)
    val (gotN, keys) = GridQuantile.ntileCutKeys(df, "v", "t", 10)
    assert(gotN == n)
    val sorted = rows.sorted
    val want = (1 to 9).map(i => sorted(i * (n / 10) + math.min(i, n % 10) - 1))
    assert(keys == want)
    // and the derived bucket assignment equals ntile(10) exactly
    val w = org.apache.spark.sql.expressions.Window.orderBy("v", "t")
    val bucket = keys.map { case (kv, kt) =>
      when(col("v") > kv || (col("v") === kv && col("t") > kt), 1).otherwise(0)
    }.reduce(_ + _) + 1
    val bad = df.withColumn("nt", ntile(10).over(w))
      .withColumn("bk", bucket).filter(col("nt") =!= col("bk"))
    assert(bad.count() == 0)
  }

  test("rankKeys returns the exact order-statistic keys in both regimes") {
    val rnd = new scala.util.Random(3)
    // duplicate-heavy values force real tie-breaking through the tie col
    val rows = (0L until 20000L).map(i => (rnd.nextInt(500).toDouble, i))
    val df = rows.toDF("v", "t").repartition(11)
    val sorted = rows.sorted // (v, t) lexicographic — the contract order
    val ranks = Seq(1L, 37L, 5000L, 10000L, 19999L, 20000L)
    // accuracy 10000 → n=20k takes the bracket path; 100000 → collect-all
    for (acc <- Seq(10000, 100000)) {
      val got = GridQuantile.rankKeys(df, "v", "t", ranks, 20000L, acc)
      val want = ranks.map(r => sorted(r.toInt - 1))
      assert(got == want, s"acc=$acc: $got != $want")
    }
  }
}
