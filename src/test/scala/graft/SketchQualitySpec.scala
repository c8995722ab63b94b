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

  test("near-dup sketches: precision >= 0.9 and recall >= 0.95 vs the exact dd06 tier") {
    for (name <- Seq("dd02_minhash_lsh", "dd03_simhash", "dd04_ngram_jaccard")) {
      val p = m(name)("precision_vs_dd06")
      val r = m(name)("recall_vs_dd06")
      assert(p >= 0.9, s"$name precision $p")
      assert(r >= 0.95, s"$name recall $r")
      assert(m(name)("n_pairs") > 0, name)
    }
    // dd02/dd04 verify candidates exactly, so they admit NO false pairs
    assert(m("dd02_minhash_lsh")("precision_vs_dd06") == 1.0)
    assert(m("dd04_ngram_jaccard")("precision_vs_dd06") == 1.0)
  }

  test("ev14 GK quantiles: within 5% relative (or 0.5 absolute) of exact percentiles") {
    for (k <- Seq("p50", "p95")) {
      val ok = m("ev14_approx_quantiles")(s"max_rel_err_$k") <= 0.05 ||
        m("ev14_approx_quantiles")(s"max_abs_err_$k") <= 0.5
      assert(ok, m("ev14_approx_quantiles").toString)
    }
  }

  test("q18 HLL++ distinct counts: within 5% relative error of exact") {
    assert(m("q18_approx_distinct")("max_rel_err") <= 0.05,
      m("q18_approx_distinct").toString)
  }
}
