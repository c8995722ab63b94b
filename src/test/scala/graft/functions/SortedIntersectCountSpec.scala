package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[SortedIntersectCount]] replaced `size(array_intersect(a, b))` in
  * the dedup verify stages — so its contract IS that equivalence (on
  * ascending-sorted inputs), pinned here on both eval paths.
  */
class SortedIntersectCountSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sic(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftFunctions.sorted_intersect_count(a, b)

  test("matches size(array_intersect) on random sorted arrays (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val diff = df.filter(
      sic(col("a"), col("b")) =!= size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(diff.count() == 0)
  }

  test("matches on the interpreted path (eval without codegen)") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 200) {
      def arr() = Array.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong).sorted
      val (a, b) = (arr(), arr())
      val expr = SortedIntersectCount(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      val want = (a.toSet intersect b.toSet).size.toLong
      assert(expr.eval(null) == want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("duplicates count once; empty and disjoint are 0; null array is null") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 1L, 2L, 2L, 3L), Array(1L, 2L, 2L, 4L), 2L), // dup runs both sides
      (Array.empty[Long], Array(1L, 2L), 0L),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L), 0L),
      (Array(Long.MinValue, 0L, Long.MaxValue), Array(Long.MinValue, Long.MaxValue), 2L)
    ).toDF("a", "b", "want")
    assert(df.filter(sic(col("a"), col("b")) =!= col("want")).count() == 0)
    val n = Seq((Array(1L, 2L))).toDF("a")
      .select(sic(lit(null).cast("array<bigint>"), col("a")).as("c"))
      .head()
    assert(n.isNullAt(0))
  }

  test("null ELEMENT raises on both eval paths (r6: was silent garbage)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // interpreted path
    val withNull = Literal.create(Seq[java.lang.Long](1L, null, 3L),
      ArrayType(LongType, containsNull = true))
    val other = Literal.create(Seq[java.lang.Long](1L, 2L),
      ArrayType(LongType, containsNull = true))
    val e = intercept[IllegalArgumentException] {
      SortedIntersectCount(withNull, other).eval(null)
    }
    assert(e.getMessage.contains("null array element"))
    // codegen path (through a real plan)
    import spark.implicits._
    val df = Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L)))
      .toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(sic(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("null array element") ||
      Option(ex.getCause).exists(_.getMessage.contains("null array element")))
  }

  test("null in the UNVISITED tail raises too (r6 ADVICE: tail sweep)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // left side [1] exhausts immediately; the null sits in the tail of
    // the right side the merge loop never visits
    val short = Literal.create(Seq[java.lang.Long](1L),
      ArrayType(LongType, containsNull = true))
    val tailNull = Literal.create(Seq[java.lang.Long](5L, 6L, null),
      ArrayType(LongType, containsNull = true))
    val e = intercept[IllegalArgumentException] {
      SortedIntersectCount(short, tailNull).eval(null)
    }
    assert(e.getMessage.contains("null array element"))
    // null INSIDE an equal run (r7 review: the run-skip loops used to
    // getLong unchecked slots, so a null after a matched 0 could be
    // consumed as a raw-bytes 0 and extend the run silently)
    val runNull = Literal.create(Seq[java.lang.Long](0L, null, 7L),
      ArrayType(LongType, containsNull = true))
    val other0 = Literal.create(Seq[java.lang.Long](0L, 7L),
      ArrayType(LongType, containsNull = true))
    assert(intercept[IllegalArgumentException] {
      SortedIntersectCount(runNull, other0).eval(null)
    }.getMessage.contains("null array element"))
    // and on EMPTY vs all-null input (loop body never runs at all)
    val empty = Literal.create(Seq.empty[java.lang.Long],
      ArrayType(LongType, containsNull = true))
    assert(intercept[IllegalArgumentException] {
      SortedIntersectCount(empty, tailNull).eval(null)
    }.getMessage.contains("null array element"))
    // codegen path
    import spark.implicits._
    val df = Seq((Seq[java.lang.Long](1L), Seq[java.lang.Long](5L, 6L, null)))
      .toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(sic(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("null array element") ||
      Option(ex.getCause).exists(_.getMessage.contains("null array element")))
  }

  test("SQL registration: sorted_intersect_count usable from expr()") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val got = Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L))).toDF("a", "b")
      .selectExpr("sorted_intersect_count(a, b) AS c").head().getLong(0)
    assert(got == 2L)
  }
}
