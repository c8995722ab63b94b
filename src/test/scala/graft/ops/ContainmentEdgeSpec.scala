package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** tx14's prefix-filtered containment must equal the brute-force
  * definition (every pair, exact shingle-set intersection) — the same
  * recall-1.0 discipline DedupEdgeSpec pins for dd06's Jaccard prefix
  * filter, here for the ASYMMETRIC C(A,B) = |A∩B|/|A| >= 0.9 variant
  * where only the contained side prefixes.
  */
class ContainmentEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference tier: all pairs, exact word-3-shingle containment. */
  private def bruteForce(u: DataFrame): Set[(Long, Long, Double)] = {
    val sets = u.collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, text) =>
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        val shs =
          if (toks.isEmpty) Set.empty[String]
          else if (toks.length <= 3) Set(toks.mkString(" "))
          else toks.sliding(3).map(_.mkString(" ")).toSet
        (id, shs)
      }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets
      (b, sb) <- sets
      if a < b
      i = (sa intersect sb).size
      if 10L * i >= 9L * sa.size
    } yield (a, b,
      BigDecimal(i.toDouble / sa.size).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet
  }

  private def engine(u: DataFrame): Set[(Long, Long, Double)] =
    TextOps.containmentPairs(u).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered containment equals brute force on a random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def doc() = Seq.fill(6 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 60L).map(i => (i, doc()))
    // seed true containments: full copies and truncated copies
    val dups = base.take(12).map { case (id, t) => (id + 1000L, t) }
    val truncated = base.slice(12, 24).map { case (id, t) =>
      val toks = t.split(" ")
      (id + 2000L, toks.take(math.max(4, (toks.length * 0.95).toInt)).mkString(" "))
    }
    val u = (base ++ dups ++ truncated).toDF("doc_id", "text")
    val want = bruteForce(u)
    val got = engine(u)
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "seeded corpus must produce containment pairs")
  }

  test("hot boilerplate shingles do not break exactness (and pairs stay exact)") {
    // every doc shares the same 12-token boilerplate header — the
    // shape that sends a full-posting pair join quadratic; the df-ASC
    // prefix keeps exactness while the rare tail shingles drive
    // candidate generation
    val boiler = "terms of service apply to all users of this web site"
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "pink")
    def tail() = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 40L).map(i => (i, s"$boiler ${tail()}"))
    val dups = base.take(10).map { case (id, t) => (id + 500L, t) }
    val u = (base ++ dups).toDF("doc_id", "text")
    assert(engine(u) == bruteForce(u))
  }

  test("tiny documents (<= 3 tokens, single-shingle sets) are exact") {
    val u = Seq(
      (1L, "solo"), (2L, "solo"), (3L, "pair of tokens"),
      (4L, "pair of tokens"), (5L, "other thing entirely")
    ).toDF("doc_id", "text")
    val got = engine(u)
    assert(got == bruteForce(u))
    assert(got.contains((1L, 2L, 1.0)) && got.contains((3L, 4L, 1.0)))
  }
}
