package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WordShinglesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sh(text: String, n: Int = 3): Seq[String] =
    Seq(text).toDF("t")
      .select(GraftFunctions.word_shingles(col("t"), n).as("s"))
      .head.getSeq[String](0)

  test("basic 3-shingles in order") {
    assert(sh("a b c d e") == Seq("a b c", "b c d", "c d e"))
  }

  test("fewer tokens than n yields one shingle of what's there") {
    assert(sh("a b") == Seq("a b"))
    assert(sh("solo") == Seq("solo"))
  }

  test("duplicates collapse to first occurrence") {
    assert(sh("x y x y x y") == Seq("x y x", "y x y"))
  }

  test("consecutive/leading/trailing separators are skipped") {
    assert(sh("  a   b  c ") == Seq("a b c"))
    assert(sh("").isEmpty)
    assert(sh("   ").isEmpty)
  }

  test("matches the HOF composition on real corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = split(col("text"), " ")
    val hof = array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 3, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
    val diff = docs.select(
      GraftFunctions.word_shingles(col("text"), 3).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("unicode text shingles cleanly (byte-level tokenization on space only)") {
    assert(sh("héllo wörld déjà vu", 2) == Seq("héllo wörld", "wörld déjà", "déjà vu"))
  }

  test("SQL registration") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT word_shingles('a b c d', 2) AS s").head.getSeq[String](0)
    assert(viaSql == Seq("a b", "b c", "c d"))
  }
}
