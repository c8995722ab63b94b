package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The banded interval join must be pair-for-pair identical to the
  * naive range join (recall-exact banding) while planning as an
  * equi-join, not a cartesian/nested-loop. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = graft.Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))

  test("banded self-join matches the naive O(n^2) range join exactly") {
    val w = 300000000L
    val banded = RangeJoin.bandedSelfJoin(events, "user_id", "event_id", "tus", w)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val e = events
    val naive = e.select(col("user_id"), col("event_id").as("a"), col("tus").as("ta"))
      .join(e.select(col("user_id"), col("event_id").as("b"), col("tus").as("tb")), "user_id")
      .filter(col("a") < col("b") && abs(col("ta") - col("tb")) <= w)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty && banded.sameElements(naive))
  }

  test("banding yields no duplicate pairs (disjoint probe bins)") {
    val out = RangeJoin.bandedSelfJoin(events, "user_id", "event_id", "tus", 300000000L)
    assert(out.count() == out.select("a", "b").distinct().count())
  }

  test("the banded plan is a shuffled equi-join — no cartesian, no nested loop") {
    val p = RangeJoin.bandedSelfJoin(events, "user_id", "event_id", "tus", 300000000L)
      .queryExecution.executedPlan.treeString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("window boundary is inclusive and exact (pairs at exactly W survive)") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0L), (1L, 11L, 300000000L), (1L, 12L, 300000001L))
      .toDF("k", "id", "t")
    val got = RangeJoin.bandedSelfJoin(df, "k", "id", "t", 300000000L)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L), (11L, 12L)))
  }
}
