package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases of the near-dup pipeline on constructed corpora. */
class DedupEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("blank documents: an exact-duplicate pair of empty texts is still found (0/0 = 1.0)") {
    val corpus = Seq(
      (1L, ""), (2L, ""),              // blank duplicates
      (3L, "   "),                      // whitespace-only, pairs with blanks (same empty set)
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta"), // normal duplicates
      (20L, "totally different words here")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.minHashNearDups(corpus, numHashes = 64, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.contains((1L, 2L, 1.0)), s"blank pair missing from $pairs")
    assert(pairs.contains((10L, 11L, 1.0)), s"normal dup pair missing from $pairs")
    // whitespace-only text has the same (empty) shingle set as blank
    assert(pairs.contains((1L, 3L, 1.0)) && pairs.contains((2L, 3L, 1.0)))
    // the unrelated doc pairs with nothing
    assert(!pairs.exists(p => p._1 == 20L || p._2 == 20L))
  }

  test("single-token documents dedup correctly") {
    val corpus = Seq((1L, "solo"), (2L, "solo"), (3L, "other")).toDF("doc_id", "text")
    val pairs = DedupOps.minHashNearDups(corpus, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
