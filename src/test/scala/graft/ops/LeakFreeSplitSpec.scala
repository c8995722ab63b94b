package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd23 — the cluster-keyed train/test split. The property the split
  * exists for: NO near-dup cluster may straddle train and test
  * (evaluation leakage), under a retry-stable pure hash. */
class LeakFreeSplitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def lake = graft.Tables(spark, sf, "documents").select("doc_id", "text")
  // duplicate-injected corpus with CHAINED clusters (dd05's shape): three
  // copies, edges only between consecutive copies — so leak-freeness
  // genuinely requires the transitive closure, not just pair agreement
  private def corpus = lake
    .unionByName(lake.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    .unionByName(lake.select((col("doc_id") + 200000L).as("doc_id"), col("text")))

  private def split(c: org.apache.spark.sql.DataFrame) = {
    val edges = DedupOps.exactJaccardPairs(c).select("a", "b")
    val cc = DedupOps.connectedComponents(c.select(col("doc_id").as("id")), edges)
    (edges, cc.select(col("id").as("doc_id"), col("label").as("canonical"),
      when(pmod(graft.functions.GraftFunctions.md5_low60(
        col("label").cast("string")), lit(10)) < 8, lit("train"))
        .otherwise(lit("test")).as("split")))
  }

  test("no cluster straddles: every canonical maps to exactly one split") {
    val (_, assigned) = split(corpus)
    val straddlers = assigned.groupBy("canonical")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1)
    assert(straddlers.count() == 0)
    // and therefore no EDGE crosses the boundary either
    val (edges, _) = split(corpus)
    val bySplit = assigned.select(col("doc_id"), col("split"))
    val crossing = edges
      .join(bySplit.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(bySplit.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .filter(col("sa") =!= col("sb"))
    assert(crossing.count() == 0)
    // both splits are populated and roughly 80/20 on this corpus
    val frac = assigned.filter(col("split") === "train").count().toDouble /
      assigned.count()
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
  }

  test("negative control: a per-DOC hash split would leak on this corpus") {
    // hashing doc_id instead of the canonical must place the two ends
    // of at least one near-dup edge in different splits — proving the
    // cluster key is load-bearing, not vacuously satisfied
    val (edges, _) = split(corpus)
    def docSplit(idCol: String) = pmod(graft.functions.GraftFunctions
      .md5_low60(col(idCol).cast("string")), lit(10)) < 8
    val leaked = edges.filter(docSplit("a") =!= docSplit("b"))
    assert(leaked.count() > 0, "corpus has no cross-hash edges — control lost its teeth")
  }

  test("retry-stable: recomputation is bit-identical") {
    val (_, a) = split(corpus)
    val (_, b) = split(corpus)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
