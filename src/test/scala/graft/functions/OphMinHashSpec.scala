package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OphMinHashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sig(texts: Seq[String], k: Int = 16): Seq[Long] =
    Seq(Tuple1(texts)).toDF("a")
      .select(GraftFunctions.oph_minhash_sig(col("a"), k).as("s"))
      .head.getSeq[Long](0)

  test("deterministic, set semantics, fixed width") {
    val a = sig(Seq("x y z", "p q", "m"))
    assert(a == sig(Seq("m", "x y z", "p q")))
    assert(a == sig(Seq("m", "m", "x y z", "p q")))
    assert(a.size == 16)
  }

  test("identical sets collide; disjoint sets differ") {
    assert(sig(Seq("aa", "bb", "cc")) == sig(Seq("cc", "aa", "bb")))
    assert(sig(Seq("aa", "bb", "cc")) != sig(Seq("dd", "ee", "ff")))
  }

  test("densification fills every bin once any element exists; empty stays MaxValue") {
    // one element fills one bin; rotation must propagate it everywhere
    val one = sig(Seq("only"), 32)
    assert(!one.contains(Long.MaxValue))
    assert(sig(Nil, 32).forall(_ == Long.MaxValue))
    val withNull = Seq(Tuple1(Seq("x", null, "y")))
      .toDF("a").select(GraftFunctions.oph_minhash_sig(col("a"), 8).as("s"))
      .head.getSeq[Long](0)
    assert(withNull == sig(Seq("x", "y"), 8))
  }

  test("interpreted eval agrees with codegen and SQL registration") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT oph_minhash_sig(array('x','y'), 8) AS s")
      .head.getSeq[Long](0)
    assert(viaSql == sig(Seq("x", "y"), 8))
  }

  test("similar sets agree on most bins (MinHash estimator property)") {
    val a = sig((1 to 200).map(i => s"sh_$i"), 64)
    val b = sig((1 to 190).map(i => s"sh_$i") ++ (1 to 10).map(i => s"zz_$i"), 64)
    val agree = a.zip(b).count { case (x, y) => x == y }
    // J = 190/210 ~ 0.905; allow generous slack for binning variance
    assert(agree >= 64 * 6 / 10, s"agreement $agree/64 too low")
    val c = sig((1 to 200).map(i => s"other_$i"), 64)
    val agreeDisjoint = a.zip(c).count { case (x, y) => x == y }
    assert(agreeDisjoint <= 64 / 4, s"disjoint sets agree $agreeDisjoint/64")
  }
}
