package graft

import org.scalatest.funsuite.AnyFunSuite

/** Enforces the quality floors the committed SKETCH_QUALITY.json
  * artifact advertises for the 5 rows-only sketch queries — same
  * computation ([[SketchQuality.metrics]]), so the artifact can't
  * drift from what the suite guarantees. */
class SketchQualitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val m: Map[String, Map[String, Double]] =
    SketchQuality.metrics(spark, sf).map { case (k, v) => k -> v.toMap }.toMap

  test("near-dup sketches: exact-verified precision 1.0, recall >= 0.95 vs the dd06 tier") {
    // ALL THREE near-dup sketches end in the exact-Jaccard verify
    // stage (dd03 since the r5 calibration — no pure Hamming threshold
    // cleared p>=0.97 at r>=0.95), so false pairs are structurally
    // impossible: precision must be EXACTLY 1.0, not approximately.
    for (name <- Seq("dd02_minhash_lsh", "dd03_simhash", "dd04_ngram_jaccard")) {
      val p = m(name)("precision_vs_dd06")
      val r = m(name)("recall_vs_dd06")
      assert(p == 1.0, s"$name precision $p (verify stage admitted a false pair)")
      assert(r >= 0.95, s"$name recall $r")
      assert(m(name)("n_pairs") > 0, name)
    }
    // dd02/dd04 candidate generation is recall-total on this corpus
    assert(m("dd02_minhash_lsh")("recall_vs_dd06") == 1.0)
    assert(m("dd04_ngram_jaccard")("recall_vs_dd06") == 1.0)
  }

  test("ev14 GK quantiles: rank error within 1% (GK bound is 1/accuracy = 0.01%)") {
    // rank error is the GK contract; value distance to the INTERPOLATED
    // exact percentile includes irreducible order-statistic gaps and is
    // recorded in the artifact informationally only
    for (k <- Seq("p50", "p95"))
      assert(m("ev14_approx_quantiles")(s"max_rank_err_$k") <= 0.01,
        m("ev14_approx_quantiles").toString)
  }

  test("q18 HLL++ distinct counts: within 1% relative error of exact") {
    assert(m("q18_approx_distinct")("max_rel_err") <= 0.01,
      m("q18_approx_distinct").toString)
  }
}
