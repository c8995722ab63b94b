package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Invariants of the deterministic sampling family (value-level
  * equivalence vs DuckDB is the driver's t2 gate). */
class SampleOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sp01 Bernoulli rate lands near 10% and is identical across runs") {
    val total = spark.read.parquet(s"$sf/documents.parquet").count().toDouble
    val n = run("sp01_hash_sample").count().toDouble
    // md5 is uniform; 3-sigma band for p=0.1 at this corpus size
    val sigma = math.sqrt(0.1 * 0.9 / total)
    assert(math.abs(n / total - 0.1) < 3 * sigma + 0.01,
      s"rate ${n / total} too far from 0.1")
    val a = run("sp01_hash_sample").collect().map(_.getLong(0)).sorted
    val b = run("sp01_hash_sample").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("sp01 is map-only: no shuffle exchange in the plan") {
    val p = run("sp01_hash_sample").queryExecution.executedPlan.treeString
    assert(!p.contains("Exchange"), p)
  }

  test("sp02 takes at most 20 docs per language and exactly 20 where available") {
    val byLang = run("sp02_stratified_sample")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    corpus.foreach { case (lang, n) =>
      assert(byLang.getOrElse(lang, 0L) == math.min(20L, n), s"lang $lang")
    }
  }

  test("sp03 global top-k uses a partial TakeOrdered, not a global sort") {
    val qe = run("sp03_bottomk_sample").queryExecution
    assert(qe.executedPlan.treeString.contains("TakeOrderedAndProject"))
    assert(run("sp03_bottomk_sample").count() == 50)
  }

  test("sp04 weighted sample: never selects empty docs; favors long docs vs uniform") {
    val sel = run("sp04_weighted_sample")
    assert(sel.filter(col("n_chars") <= 0).count() == 0)
    val avgSel = sel.agg(avg("n_chars")).head.getDouble(0)
    val avgAll = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") > 0).agg(avg("n_chars")).head.getDouble(0)
    // weight = n_chars, so the length-biased sample must sit above the
    // corpus mean (size-biased expectation; huge margin at any seed)
    assert(avgSel > avgAll, s"selected mean $avgSel <= corpus mean $avgAll")
  }
}
