package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Results must not depend on parallelism: the same query at different
  * shuffle-partition counts must produce identical row sets. Guards the
  * determinism contract behind every oracle hash-match (a 1000-executor
  * cluster is "just" a bigger partition count). Representative queries:
  * one per nondeterminism risk class — window tie-break, distributed
  * double aggregation, iterative convergence, sketch candidates, top-k
  * selection, percentile interpolation. */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val names = Seq(
    "sp02_stratified_sample", // window tie-break
    "vs05_kmeans_step",       // distributed double means
    "dd05_dup_clusters",      // iterative fixpoint
    "dd02_minhash_lsh",       // LSH candidates + verify
    "sp04_weighted_sample",   // global top-k by float priority
    "ev10_iqr_outliers",      // percentile interpolation + fences
    "sp06_weighted_mix",      // hash-gated explode replication
    "pp01_training_pipeline", // multi-stage composition (gate→dedup→split)
    "tx13_perplexity",        // double sums across a shuffled join
    "vs06_recall_eval",       // two rankings joined on tie-broken top-k
    "vs09_pq_codes",          // argmin over integer-quantized distances
    "tx16_pmi",               // double-scored global top-k (pmi DESC, bigram)
    "ev19_interpolate",       // IGNORE-NULLS neighbor windows + interpolation
    "tx17_sequence_pack",     // global running sum over doc order
    "dd12_semantic_dedup",    // cell-confined pairwise cosine thresholding
    "mm07_shard_pack",        // global byte running-sum cut + ordered digest
    "q49_winsorize",          // percentile fences + clamped double sum
    "ev27_session_paths",     // session cumsum + sorted-struct path assembly
    "dd13_prefix_dedup",      // digest window survivor pick
    "sp12_shuffled_shards",   // global md5 permutation + ordered manifest digest
    "ev30_rfm_segments",      // float-ordered (tie-broken) ntile boundaries
    "q55_partial_agg_merge",  // double sums merged across independent partials
    "vs15_norm_audit",        // double norm sums (avg) across partitions
    "q56_equiheight_histogram", // rankKeys decile cutoffs over the fact table
    "sp11_curriculum_shards", // two-phase prefix rank + snake assignment
    "tx26_zipf_fit",          // counts-of-counts rank-range expansion
    "ev31_pareto_concentration") // rankKeys top-20% cutoff membership

  test("results identical at shuffle.partitions = 3 vs 8") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      val got = names.map { n =>
        conf.set("spark.sql.shuffle.partitions", "3")
        val a = rows(SparkEntry.queries(n)(spark, sf))
        conf.set("spark.sql.shuffle.partitions", "8")
        val b = rows(SparkEntry.queries(n)(spark, sf))
        (n, a == b, a.size)
      }
      val bad = got.filterNot(_._2)
      assert(bad.isEmpty, s"parallelism-dependent results: ${bad.map(_._1)}")
      assert(got.forall(_._3 > 0))
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }
}
