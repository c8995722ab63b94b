package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** vs27's planted-ground-truth retrieval eval: each probe doc has a
  * LEXICAL twin (its text, a donor's embedding) and a SEMANTIC twin
  * (a donor's text, its embedding), so each leg alone is blind to half
  * the truth by construction, and reciprocal-rank fusion must recover
  * both sides — the classic hybrid-retrieval finding, here pinned as
  * an inequality over the bit-exact metric pipeline.
  */
class RetrievalEvalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("RRF recall@10 >= each leg's, and beats the best leg strictly") {
    val out = graft.SparkEntry.queries("vs27_retrieval_recall")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("bm25", "dense", "rrf"))
    assert(out("rrf") >= out("bm25"), s"rrf ${out("rrf")} < bm25 ${out("bm25")}")
    assert(out("rrf") >= out("dense"), s"rrf ${out("rrf")} < dense ${out("dense")}")
    // the construction's whole point: fusion recovers relevants BOTH
    // single legs miss, so it must be strictly better than the best
    // leg on this corpus (0.9 vs 0.5 at sf0.001), not merely equal
    assert(out("rrf") > math.max(out("bm25"), out("dense")),
      s"fusion did not beat the best leg: $out")
    // and each leg found at least one of ITS visible twins — a leg at
    // zero would make the inequality vacuous
    assert(out("bm25") > 0 && out("dense") > 0, s"degenerate legs: $out")
  }
}
