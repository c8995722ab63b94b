package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed-form invariants for the BPE trainer ([[Bpe]]) — properties
  * that must hold for ANY corpus, complementing the tx43/tx44 oracle
  * hash gate.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet")

  test("greedy-scan merge application handles self-overlapping pairs like BPE") {
    import spark.implicits._
    // the space-doubling trick's whole reason to exist: sequential
    // non-overlapping replace must reproduce BPE's greedy left-to-right
    // scan on runs of the same token
    val in = Seq("a a a", "a a a a", "b a a b", "a", "a b a b a").toDF("s")
    val out = in.select(Bpe.applyMergeForTest(col("s"), "a a", "aa").as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("aa a", "aa aa", "b aa b", "a", "a b a b a"))
    val out2 = in.select(Bpe.applyMergeForTest(col("s"), "a b", "ab").as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(out2 == Seq("a a a", "a a a a", "b a ab", "a", "ab ab a"))
  }

  test("merge table: 6 steps, merged == pair sans space, winning counts non-increasing") {
    val (_, merges) = Bpe.train(docs, 6)
    assert(merges.map(_.step) == (1L to 6L))
    merges.foreach { m =>
      assert(m.merged == m.pair.replace(" ", ""))
      assert(m.pair.count(_ == ' ') == 1, s"pair must be exactly two tokens: '${m.pair}'")
      assert(m.cnt > 0)
    }
    // after merging the argmax pair, no new pair can occur more often
    // than the pair just consumed did, and existing counts never grow —
    // so the winning count is monotonically non-increasing
    assert(merges.sliding(2).forall {
      case Seq(a, b) => b.cnt <= a.cnt
      case _         => true
    })
  }

  test("trained dict tokenizes every word to a concatenation-preserving token seq") {
    val (dict, _) = Bpe.train(docs, 6)
    // tokens must spell the word back exactly, for every vocab entry
    val bad = dict.filter(replace(col("s"), lit(" "), lit("")) =!= col("word")).count()
    assert(bad == 0, "merge application must never change a word's character content")
    // training strictly compresses: some word must now tokenize to
    // fewer tokens than its character count
    val gained = dict.filter(
      size(split(col("s"), " ")) < length(col("word"))).count()
    assert(gained > 0, "6 merges over a real corpus must shorten at least one word")
  }

  test("training is deterministic across runs") {
    assert(Bpe.train(docs, 6)._2 == Bpe.train(docs, 6)._2)
  }

  test("tokenizeExpr (apply path) == trained dict on the training vocabulary") {
    // the two tokenization paths — tx44's dict lookup and tx46's
    // merge-sequence replay — must agree on every trained word, or
    // the apply path has drifted from training
    val (dict, merges) = Bpe.train(docs, 6)
    val bad = dict.withColumn("s2",
        Bpe.tokenizeExpr(col("word"), merges))
      .filter(col("s2") =!= col("s")).count()
    assert(bad == 0, "merge-sequence replay must reproduce the trained dict exactly")
  }

  test("tokenizeExpr transfers to unseen words: chars preserved, merges fire in order") {
    import spark.implicits._
    val (_, merges) = Bpe.train(docs, 6)
    // words that cannot occur in the corpus (it is lowercase-alpha
    // word soup with no 'zq' bigrams): the chain must still produce a
    // valid tokenization that spells the word back
    val unseen = Seq("zzqqzz", "q", "zq").toDF("word")
      .select(col("word"), Bpe.tokenizeExpr(col("word"), merges).as("s"))
    assert(unseen.filter(replace(col("s"), lit(" "), lit("")) =!= col("word"))
      .count() == 0)
    // a fabricated word CONTAINING the first learned merge's pair must
    // have that merge applied (transfer is not a no-op)
    val m1 = merges.head
    val carrier = Seq("zq" + m1.merged + "qz").toDF("word")
      .select(Bpe.tokenizeExpr(col("word"), merges).as("s"))
      .head().getString(0)
    assert(carrier.split(" ").contains(m1.merged) ||
      // a later merge may have absorbed it further — the merged token
      // must at least appear as a substring of some final token
      carrier.split(" ").exists(_.contains(m1.merged)),
      s"'${m1.merged}' should survive in the tokenization, got '$carrier'")
  }

  test("empty corpus: zero merges, empty merge table with the contract schema") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val (dict, merges) = Bpe.train(empty, 6)
    assert(merges.isEmpty)
    assert(dict.count() == 0)
    import spark.implicits._
    val table = merges.toDS().toDF()
    assert(table.columns.toSeq == Seq("step", "pair", "merged", "cnt"))
  }
}
