package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PairExpandIds/PairExpandSized vs the HOF spelling they replaced:
  * identical pair sets for every bucket size including the k<2
  * degenerate cases and null arrays. */
class PairExpandSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofPairs(idsCol: String) =
    explode(flatten(transform(col(idsCol), (x, i) =>
      transform(slice(col(idsCol), i + 2, size(col(idsCol))),
        y => struct(x.as("a"), y.as("b"))))))

  test("pair_ids matches the HOF expansion on assorted bucket sizes") {
    val df = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(10L, 20L),
      Seq(7L),
      Seq.empty[Long],
      (1L to 50L) // the dd02 bucket-cap edge
    ).toDF("ids")
    val gen = df.select(GraftFunctions.pair_ids(col("ids")))
      .as[(Long, Long)].collect().sorted.toSeq
    val hof = df.select(hofPairs("ids").as("p"))
      .select(col("p.a"), col("p.b")).as[(Long, Long)].collect().sorted.toSeq
    assert(gen == hof)
    assert(gen.size == 6 + 1 + 0 + 0 + 50 * 49 / 2)
  }

  test("pair_ids of a null array emits nothing") {
    val df = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("ids")
    assert(df.select(GraftFunctions.pair_ids(col("ids"))).count() == 0)
  }

  test("pair_sized carries each side's size and keeps array order") {
    val df = Seq(Seq((3L, 30L), (5L, 50L), (9L, 90L))).toDF("ids")
    val got = df.select(GraftFunctions.pair_sized(col("ids")))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((3L, 30L, 5L, 50L), (3L, 30L, 9L, 90L), (5L, 50L, 9L, 90L)))
  }

  test("pair_sized emits nothing for k < 2") {
    val df = Seq(Seq((3L, 30L)), Seq.empty[(Long, Long)]).toDF("ids")
    assert(df.select(GraftFunctions.pair_sized(col("ids"))).count() == 0)
  }
}
