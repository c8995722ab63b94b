package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimHashSignatureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sig(toks: Seq[String]): Long =
    Seq(Tuple1(toks)).toDF("t")
      .select(GraftFunctions.simhash_sig(col("t")).as("s")).head.getLong(0)

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("deterministic; identical token bags share the signature") {
    val a = sig(Seq("x", "y", "z", "x"))
    assert(a == sig(Seq("x", "y", "z", "x")))
    // order-insensitive (bag semantics)
    assert(a == sig(Seq("z", "x", "x", "y")))
  }

  test("similar bags land close, dissimilar bags far (SimHash property)") {
    val base = (1 to 100).map(i => s"tok$i")
    val near = base.updated(0, "CHANGED")
    val far = (1 to 100).map(i => s"other$i")
    assert(hamming(sig(base), sig(near)) < hamming(sig(base), sig(far)))
    assert(hamming(sig(base), sig(near)) <= 12)
  }

  test("empty array yields 0; nulls skipped") {
    assert(sig(Nil) == 0L)
    val withNull = Seq(Tuple1(Seq("x", null, "y"))).toDF("t")
      .select(GraftFunctions.simhash_sig(col("t")).as("s")).head.getLong(0)
    assert(withNull == sig(Seq("x", "y")))
  }

  test("SQL registration") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT simhash_sig(array('a','b')) AS s").head.getLong(0)
    assert(v == sig(Seq("a", "b")))
  }
}
