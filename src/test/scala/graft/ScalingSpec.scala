package graft

import org.scalatest.funsuite.AnyFunSuite

/** Asserts the sub-quadratic runtime growth the SCALING.json artifact
  * advertises — same computation ([[Scaling.measure]]), re-measured
  * live so the artifact can't drift from what the suite guarantees.
  * Bounds are deliberately loose (timing under the shared local[4]
  * test session is noisy): an all-pairs regression shows up as an
  * exponent near 2 (100× runtime at 10× input), far above every
  * threshold here; measured values on an idle box are 0.0–0.7.
  */
class ScalingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("headline kernels scale sub-quadratically over 1x/3x/10x slices") {
    val m = Scaling.measure(spark, "/root/testdata/sf0.1", reps = 2)
    assert(m.map(_._1).toSet == Set("dd02_minhash_lsh", "dd06_exact_ppjoin",
      "dd17_index_probe", "vs02_ivf_probe", "tx33_text_probe"))
    for ((name, points, exp) <- m) {
      assert(points.forall(_._2 > 0), s"$name: non-positive timing $points")
      assert(exp <= 1.7, s"$name exponent $exp (points $points) — " +
        "approaching all-pairs growth")
    }
    // the O(batch) probe claim: a FIXED batch against a 10x lake must
    // stay well below linear growth in the lake (idle-box measurement
    // is flat at ~-0.03; 0.8 leaves room for load noise, while an
    // accidental O(lake) re-shingle regression — the bug r7 caught —
    // measures ~1.0)
    val dd17 = m.find(_._1 == "dd17_index_probe").get._3
    assert(dd17 <= 0.8, s"dd17 probe exponent $dd17 — probe cost is " +
      "growing with the lake, not the batch")
  }
}
