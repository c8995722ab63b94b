package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** mm16 payload near-dedup: the planted trailer-edited re-uploads
  * must all be recovered at the >= 0.8 tier (MinHash banding collides
  * a j >= 0.8 pair with prob >= 1-(1-0.8^4)^16 ≈ 0.9996 — the reason
  * the sketch is MinHash, not SimHash: the dd03 kernel's Hamming<=5
  * gate measured only 25/50 planted recall here, see the mm16 note). */
class MediaNearDupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("mm16: every eligible planted trailer edit is recovered; no pair below tier") {
    val pairs = q("mm16_payload_neardup").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Double]("jaccard")))
    assert(pairs.nonEmpty)
    // verify admits nothing under the tier
    assert(pairs.forall(_._3 >= 0.8), "verify must gate at the 0.8 tier")
    // every planted pair whose TRUE window Jaccard clears the tier is
    // found (the banding-miss probability at j >= 0.8 is ~4e-4/pair)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("p"))
      .filter(length(col("p")) > 0)
    def shs(payload: org.apache.spark.sql.Column) = {
      val hx = lower(hex(payload))
      // window count = ceil(n/4); `/` is double division, truncating
      // cast = floor on positive values
      val m = ((length(payload).cast("long") + lit(3L)) / lit(4L)).cast("long")
      array_distinct(transform(sequence(lit(0L), m - lit(1L)),
        i => hx.substr((i * lit(8L) + 1).cast("int"), lit(16))))
    }
    val truth = docs
      .select(col("doc_id"), shs(col("p")).as("sa"),
        shs(concat(col("p"), encode(lit(" v2edit"), "UTF-8"))).as("sb"))
      .select(col("doc_id"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val eligible = truth.filter(_._2 >= 0.8).keySet
    assert(eligible.nonEmpty, "fixture must plant recoverable pairs")
    val foundPlanted = pairs.collect {
      case (a, b, _) if b - a == 100000L => a
    }.toSet
    val missed = eligible -- foundPlanted
    assert(missed.isEmpty,
      s"planted pairs with true window-Jaccard >= 0.8 not recovered: $missed")
  }

  test("mm17: incremental probe == one-shot mm16 restricted to batch-involving pairs") {
    // the IncrementalLshSpec identity on the media side: the persisted
    // index + combined-cap probe must reproduce the full-recompute
    // answer exactly, not approximately
    def pairSet(name: String) = q(name).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Double]("jaccard"))).toSet
    val oneShot = pairSet("mm16_payload_neardup")
      .filter { case (_, b, _) => b >= 100000L }
    val probe = pairSet("mm17_payload_index_probe")
    assert(probe == oneShot,
      s"probe diverges from one-shot: extra=${probe -- oneShot} missing=${oneShot -- probe}")
    assert(probe.nonEmpty)
  }
}
