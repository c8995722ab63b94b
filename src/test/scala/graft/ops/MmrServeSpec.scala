package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** vs34 — MMR-diversified serving: the HOF-fold greedy must equal a
  * plain-Scala replay of the MMR definition over the same slate, obey
  * the greedy's structural invariants, and actually diversify (differ
  * from the pure-relevance top-k). */
class MmrServeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val e = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  private lazy val cents = e.filter(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("v").as("cv"))
  private lazy val probes =
    VectorOps.assignClusters(e.filter(col("vec_id").between(100, 102)), cents)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("cid").as("pcid"))

  private lazy val served: Seq[(Long, Long, Long, Long)] =
    VectorOps.mmrServe(spark, VectorOps.baseIvfIndexDir(spark, sf), probes,
        kSlate = 50, kOut = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  /** Bit-exact mirror of CosineSimilarity.nullSafeEval (left-to-right
    * accumulation, dot / (sqrt(na)*sqrt(nb))). */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  private def q6(c: Double): Long = math.floor(c * 1e6 + 0.5).toLong

  /** The greedy replayed in plain Scala from the collected assignment —
    * slate = top-50 by (raw cos desc, nid) within the probe's home
    * cell, then 10 picks maximizing 7·rel_q − 3·maxsim_q, tie min nid. */
  private lazy val replay: Seq[(Long, Long, Long, Long)] = {
    val asg = VectorOps.assignClusters(e, cents).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    val pr = probes.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    pr.flatMap { case (pid, pv, pcid) =>
      val slate = asg.filter { case (nid, _, cid) => cid == pcid && nid != pid }
        .map { case (nid, v, _) => (nid, cos(pv, v), v) }
        .sortBy { case (nid, c, _) => (-c, nid) }.take(50)
        .map { case (nid, c, v) => (nid, q6(c), v) }
      var sel = Vector.empty[(Long, Long, Array[Double])] // (nid, key, v)
      (1 to 10).foreach { _ =>
        val rem = slate.filter(c => !sel.exists(_._1 == c._1))
        if (rem.nonEmpty) {
          val best = rem.map { case (nid, relq, v) =>
            val ms = if (sel.isEmpty) 0L else sel.map(s => q6(cos(v, s._3))).max
            (7L * relq - 3L * ms, nid, v)
          }.minBy { case (key, nid, _) => (-key, nid) }
          sel = sel :+ ((best._2, best._1, best._3))
        }
      }
      sel.zipWithIndex.map { case ((nid, key, _), i) => (pid, (i + 1).toLong, nid, key) }
    }.toSeq
  }

  test("engine fold == plain-Scala MMR replay, row for row") {
    assert(served.toSet == replay.toSet)
    assert(served.size == replay.size)
  }

  test("greedy invariants: keys non-increasing, first pick = relevance argmax, picks distinct") {
    served.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2)
      // a later pick's key can never exceed an earlier one: the winner
      // at step n dominated every candidate whose key only shrinks as
      // the selected set grows
      byRank.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
      assert(rows.map(_._3).distinct.size == rows.size)
      assert(byRank.map(_._2) == (1L to rows.size.toLong))
    }
    served.groupBy(_._1).foreach { case (p, rows) =>
      // step 1 has an empty selected set: its pick IS the relevance argmax
      assert(rows.minBy(_._2)._3 == replayRelevanceRanked(p).head)
    }
  }

  test("diversification bites: at least one probe's MMR set differs from relevance top-10") {
    val mmrSets = served.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(mmrSets.exists { case (p, s) => replayRelevanceRanked(p).take(10).toSet != s })
  }

  /** Pure-relevance ranking (cos desc, nid) of each probe's home cell. */
  private lazy val replayRelevanceRanked: Map[Long, Seq[Long]] = {
    val asg = VectorOps.assignClusters(e, cents).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    probes.collect().map { r =>
      val (pid, pv, pcid) = (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2))
      pid -> asg.filter { case (nid, _, cid) => cid == pcid && nid != pid }
        .map { case (nid, v, _) => (nid, cos(pv, v)) }
        .sortBy { case (nid, c) => (-c, nid) }.map(_._1).toSeq
    }.toMap
  }
}
