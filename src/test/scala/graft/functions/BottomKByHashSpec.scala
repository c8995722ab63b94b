package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BottomKByHashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bk(xs: Seq[String], k: Int): Seq[String] =
    Seq(Tuple1(xs)).toDF("a")
      .select(GraftFunctions.bottomk_by_hash(col("a"), k).as("s"))
      .head.getSeq[String](0)

  test("set semantics: order and duplicates don't change the sketch") {
    val base = bk(Seq("a", "b", "c", "d", "e"), 3)
    assert(bk(Seq("e", "d", "c", "b", "a"), 3) == base)
    assert(bk(Seq("a", "a", "b", "c", "d", "e", "e"), 3) == base)
    assert(base.size == 3)
  }

  test("k >= distinct size returns every distinct element") {
    val out = bk(Seq("x", "y", "x"), 10)
    assert(out.toSet == Set("x", "y"))
  }

  test("sketch elements come from the input; nulls skipped; empty ok") {
    assert(bk(Nil, 4).isEmpty)
    val withNull = Seq(Tuple1(Seq("p", null, "q")))
      .toDF("a").select(GraftFunctions.bottomk_by_hash(col("a"), 2).as("s"))
      .head.getSeq[String](0)
    assert(withNull.toSet.subsetOf(Set("p", "q")))
  }

  test("identical sets share the sketch; overlap degrades gracefully") {
    val a = bk((1 to 40).map(i => s"sh$i"), 12)
    val b = bk((1 to 40).map(i => s"sh$i"), 12)
    assert(a == b)
    val c = bk((5 to 44).map(i => s"sh$i"), 12)
    assert(a.intersect(c).nonEmpty)
  }
}
