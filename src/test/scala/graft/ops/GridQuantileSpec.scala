package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** GridQuantile must be value-identical to the built-in exact
  * `percentile` — that equivalence is what lets queries swap it in
  * without re-deriving DuckDB parity. Exercises both regimes: groups
  * small enough for the collect-all fallback and groups large enough
  * that the sketch bracket is the path taken.
  */
class GridQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val QS = Seq("p05" -> 0.05, "p25" -> 0.25, "p50" -> 0.5,
    "p95" -> 0.95, "p100" -> 1.0, "p0" -> 0.0)

  private def toDf(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  private def compare(df: org.apache.spark.sql.DataFrame, accuracy: Int): Unit = {
    import spark.implicits._
    val got = GridQuantile.perGroup(df, Seq("g"), "v", QS, accuracy)
      .collect().map(r => r.getString(0) -> QS.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val want = df.filter($"v".isNotNull).groupBy("g")
      .agg(QS.map { case (n, q) => percentile($"v", lit(q)).as(n) }.head,
        QS.tail.map { case (n, q) => percentile($"v", lit(q)).as(n) }: _*)
      .collect().map(r => r.getString(0) -> QS.indices.map(i => r.getDouble(i + 1)))
      .toMap
    assert(got.keySet == want.keySet)
    for (k <- got.keySet) assert(got(k) == want(k), s"group $k")
  }

  test("rankKeysByFraction on empty input returns (0, no keys) instead of throwing") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Long)].toDF("v", "t")
    val (n, keys) = GridQuantile.rankKeysByFraction(
      empty, "v", "t", Seq(0.25, 0.5), nn => Seq(nn / 4, nn / 2))
    assert(n == 0L && keys.isEmpty)
  }

  test("small groups (collect-all regime) match percentile exactly") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(String, Double)] = (1 to 500).map(_ => ("a", rnd.nextDouble() * 100)) ++
      (1 to 37).map(_ => ("b", rnd.nextInt(5).toDouble)) ++ // heavy ties
      Seq(("c", 42.0)) // singleton group
    compare(toDf(rows), accuracy = 10000)
  }

  test("large groups (bracket regime) match percentile exactly") {
    val rnd = new scala.util.Random(11)
    // accuracy 300 => threshold ~202: both groups take the bracket path
    val rows: Seq[(String, Double)] = (1 to 5000).map(_ => ("a", rnd.nextDouble() * 1e6)) ++
      (1 to 3000).map(_ => ("b", rnd.nextInt(50) * 0.25)) // gridded + ties
    compare(toDf(rows), accuracy = 300)
  }

  test("nulls are skipped like percentile") {
    import spark.implicits._
    val rows: Seq[(String, Option[Double])] = Seq(("a", Some(1.0)), ("a", None),
      ("a", Some(3.0)), ("a", Some(2.0)), ("b", Some(9.0)))
    compare(rows.toDF("g", "v"), accuracy = 10000)
  }
}
