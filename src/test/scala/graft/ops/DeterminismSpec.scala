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
    "vs09_pq_codes",          // native pq_block_codes argmin (map-only)
    "vs10_mutual_knn",        // IVF-celled candidates + mutual top-3
    "dd03_simhash",           // banded simhash candidates + exact verify
    "tx16_pmi",               // double-scored global top-k (pmi DESC, bigram)
    "ev19_interpolate",       // IGNORE-NULLS neighbor windows + interpolation
    "tx17_sequence_pack",     // global running sum over doc order
    "dd12_semantic_dedup",    // cell-confined pairwise cosine thresholding
    "mm07_shard_pack",        // global byte running-sum cut + ordered digest
    "q49_winsorize",          // percentile fences + clamped double sum
    "ev27_session_paths",     // session cumsum + sorted-struct path assembly
    "dd13_prefix_dedup",      // digest window survivor pick
    "sp12_shuffled_shards",   // global md5 permutation + mergeable manifest hash sum
    "ev30_rfm_segments",      // float-ordered (tie-broken) ntile boundaries
    "q55_partial_agg_merge",  // double sums merged across independent partials
    "vs15_norm_audit",        // double norm sums (avg) across partitions
    "q56_equiheight_histogram", // rankKeys decile cutoffs over the fact table
    "sp11_curriculum_shards", // two-phase prefix rank + snake assignment
    "tx26_zipf_fit",          // counts-of-counts rank-range expansion
    "ev31_pareto_concentration") // rankKeys top-20% cutoff membership

  test("vs05 cluster MEMBERSHIP identical across partition counts") {
    // The r2–r4 vs05 hash-fails were membership flips, which the output
    // means can mask dimension-by-dimension. Diff the assignment itself:
    // same (vec_id → cid) map regardless of input partitioning or
    // shuffle parallelism (integer-exact L2 admits no fold-order or ulp
    // sensitivity by construction).
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      def membership(inputParts: Int, shuffleParts: String): Seq[String] = {
        conf.set("spark.sql.shuffle.partitions", shuffleParts)
        val e = spark.read.parquet(s"$sf/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .repartition(inputParts)
        val c = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        rows(VectorOps.assignClustersL2Exact(e, c).select("vec_id", "cid"))
      }
      val a = membership(2, "3")
      val b = membership(13, "8")
      assert(a.nonEmpty && a == b, "vs05 assignment is parallelism-dependent")
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

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
