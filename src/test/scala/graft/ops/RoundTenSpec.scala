package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 composition pins (the per-family specs cover st20/mm16/
  * mm17; this covers pp11's cross-stage accounting). */
class RoundTenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("pp11: census conserves the funnel and the tiers actually bite") {
    val rows = q("pp11_media_pipeline").collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nDocs = docs.count()
    val nTenth = docs.filter(col("doc_id") % 10 === 0).count()
    val nFifteenth = docs.filter(col("doc_id") % 15 === 0).count()
    var raw = 0L; var exact = 0L; var fin = 0L
    rows.foreach { r =>
      val (nr, ne, nf) = (r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_exact_kept"), r.getAs[Long]("n_final_kept"))
      assert(nr >= ne && ne >= nf && nf > 0,
        s"funnel must be monotone per source: $r")
      assert(r.getAs[Long]("patch_sum") > 0)
      raw += nr; exact += ne; fin += nf
    }
    // raw = lake + exact re-uploads + re-encodes (texts are non-empty
    // on this fixture, so the octet filter drops nothing)
    assert(raw == nDocs + nTenth + nFifteenth)
    // the exact tier folds AT LEAST every planted +100000 copy (more
    // if the lake holds natural exact dups)
    assert(raw - exact >= nTenth, "exact tier must fold the re-uploads")
    // the near tier folds at least one planted re-encode: every 15th
    // asset's trailer edit near-matches its source unless too short
    assert(exact > fin, "near tier must fold re-encodes")
  }
}
