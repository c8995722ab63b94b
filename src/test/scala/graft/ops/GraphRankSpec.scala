package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[DedupOps.authorityRank]] — integer-grid weighted PageRank over a
  * similarity graph. The invariants pinned here are the ones the
  * dd19 oracle's unrolled CTEs rely on:
  *
  *  1. automorphism symmetry: structurally interchangeable nodes get
  *     the SAME integer rank (an exact-copy doc and its shifted twin
  *     have identical neighborhoods, so any rank difference would be
  *     nondeterminism);
  *  2. isolated nodes sit exactly on the closed-form teleport floor;
  *  3. connected nodes strictly exceed that floor and total mass never
  *     exceeds the 1e12 grid (floor losses only shrink it);
  *  4. a triangle with one heavier edge ranks its two heavy-edge
  *     endpoints above the third — the weighting is live, not
  *     decorative.
  */
class GraphRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val Scale = 1000000000000L

  /** Teleport-only fixpoint for a node with no in-edges: every
    * iteration resets it to (0.15 * Scale) / n (integer division). */
  private def teleportFloor(n: Long): Long = (Scale * 15 / 100) / n

  test("exact-copy twins get identical integer ranks; isolated nodes sit on the teleport floor") {
    import spark.implicits._
    // 2 two-cliques (1<->11, 2<->12) + two isolated nodes, n = 6
    val nodes = Seq(1L, 2L, 11L, 12L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 11L, 10000L), (2L, 12L, 9000L)).toDF("a", "b", "w")
    val pr = DedupOps.authorityRank(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) == pr(11L) && pr(2L) == pr(12L))
    // clique rank is weight-INDEPENDENT for a 2-clique (w cancels in
    // w/ow), so both cliques converge to the same integer value
    assert(pr(1L) == pr(2L))
    assert(pr(3L) == teleportFloor(6) && pr(4L) == teleportFloor(6))
    assert(pr(1L) > pr(3L), "connected nodes must exceed the teleport floor")
    assert(pr.values.sum <= Scale, "mass must stay within the 1e12 grid")
  }

  test("triangle with one heavy edge ranks its endpoints above the third node") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L, 10000L), (1L, 3L, 1000L), (2L, 3L, 1000L))
      .toDF("a", "b", "w")
    val pr = DedupOps.authorityRank(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) == pr(2L), "1 and 2 are interchangeable by symmetry")
    assert(pr(1L) > pr(3L), "heavy-edge endpoints must out-rank the light node")
  }

  test("rank is invariant under input partitioning") {
    import spark.implicits._
    val nodes = (1L to 40L).toDF("doc_id")
    val pairs = (1L to 19L).map(i => (i, i + 1, 5000L + i)).toDF("a", "b", "w")
    val once = DedupOps.authorityRank(nodes, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val again = DedupOps.authorityRank(
      nodes.repartition(7), pairs.repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(once.sameElements(again))
  }
}
