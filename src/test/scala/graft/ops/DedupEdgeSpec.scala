package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases of the near-dup pipeline on constructed corpora. */
class DedupEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("blank documents: an exact-duplicate pair of empty texts is still found (0/0 = 1.0)") {
    val corpus = Seq(
      (1L, ""), (2L, ""),              // blank duplicates
      (3L, "   "),                      // whitespace-only, pairs with blanks (same empty set)
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta"), // normal duplicates
      (20L, "totally different words here")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.minHashNearDups(corpus, numHashes = 64, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.contains((1L, 2L, 1.0)), s"blank pair missing from $pairs")
    assert(pairs.contains((10L, 11L, 1.0)), s"normal dup pair missing from $pairs")
    // whitespace-only text has the same (empty) shingle set as blank
    assert(pairs.contains((1L, 3L, 1.0)) && pairs.contains((2L, 3L, 1.0)))
    // the unrelated doc pairs with nothing
    assert(!pairs.exists(p => p._1 == 20L || p._2 == 20L))
  }

  test("single-token documents dedup correctly") {
    val corpus = Seq((1L, "solo"), (2L, "solo"), (3L, "other")).toDF("doc_id", "text")
    val pairs = DedupOps.minHashNearDups(corpus, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  /** Reference tier for the prefix-filter equivalence check: the naive
    * unfiltered inverted-index posting join (every shared shingle
    * generates its pair) — exact by construction, quadratic in hot
    * postings. */
  private def naiveJaccardPairs(corpus: org.apache.spark.sql.DataFrame) = {
    val sets = corpus.select(col("doc_id"),
        graft.functions.GraftFunctions.word_shingles(col("text"), 3).as("shs"))
      .filter(size(col("shs")) > 0)
    val post = sets.select(col("doc_id"),
      size(col("shs")).cast("long").as("n"), explode(col("shs")).as("s0"))
      .select(col("doc_id"), col("n"), xxhash64(col("s0")).as("sh"))
    val pairs = post.groupBy("sh")
      .agg(sort_array(collect_set(struct(col("doc_id"), col("n")))).as("ids"))
      .select(graft.functions.GraftFunctions.pair_sized(col("ids")))
      .groupBy("a", "b", "na", "nb")
      .agg(count(lit(1)).as("i"))
    val j = col("i").cast("double") /
      (col("na") + col("nb") - col("i")).cast("double")
    pairs.filter(j >= 0.8)
      .select(col("a"), col("b"), round(j, 4).as("jaccard"))
  }

  test("prefix-filtered exact Jaccard equals the unfiltered posting join (recall 1.0)") {
    // real corpus + shifted duplicates: same shape dd06 runs on
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val corpus = base.unionByName(
      base.withColumn("doc_id", col("doc_id") + 100000L))
    val got = graft.ops.DedupOps.exactJaccardPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = naiveJaccardPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"prefix filter changed the result: " +
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.nonEmpty)
  }

  test("prefix filter is exact on a hot-shingle corpus and prunes the hot postings") {
    // 60 docs sharing one boilerplate sentence (a hot shingle block)
    // plus per-doc unique tails; 3 true near-dup pairs planted. The
    // boilerplate shingles have df=60 — a naive posting join pairs all
    // C(60,2) docs through them; the df-ordered prefixes are the rare
    // tail shingles, so only genuinely similar pairs become candidates.
    val boiler = "terms of service apply to all users of this site"
    val docs = (0 until 60).map { i =>
      val tail = if (i % 20 == 19) s"unique tail ${i - 1} alpha beta gamma delta"
      else s"unique tail $i alpha beta gamma delta"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val got = graft.ops.DedupOps.exactJaccardPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = naiveJaccardPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got.map(p => (p._1, p._2)) == Set((18L, 19L), (38L, 39L), (58L, 59L)))
  }
}
