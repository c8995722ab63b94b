package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the step between tx29's
  * single pair-merge and a production tokenizer build (the BPE of
  * Sennrich et al., arXiv:1508.07909, as run by HF tokenizers /
  * SentencePiece-BPE trainers over a corpus word-count dictionary).
  *
  * Scale architecture: the corpus contributes exactly ONE pass — the
  * word-frequency aggregation (one shuffle, corpus-scale). Every merge
  * iteration after that runs on the VOCAB-bounded dictionary (millions
  * of rows at 100 TB, never the corpus): one tiny pair-count aggregate
  * + one map-only rewrite per step. That asymmetry is precisely why
  * distributed BPE trainers are feasible at lake scale, and this
  * kernel keeps it: K merges = 1 corpus shuffle + K dictionary-sized
  * jobs.
  *
  * Determinism: pair counts are exact BIGINT sums; the per-step argmax
  * is totally ordered (count DESC, then pair ASC in binary collation),
  * so the learned merge table is engine- and partition-count-exact —
  * DuckDB replays the whole loop as chained CTE stages
  * ([[oracleStages]]).
  *
  * Merge application uses the SPACE-DOUBLING trick so that greedy
  * left-to-right, non-overlapping `replace` gives exactly BPE's greedy
  * scan even for self-overlapping pairs ("a a a" must become "aa a",
  * and "a a a a" must become "aa aa"): double every separator, wrap in
  * sentinels, replace " a  b " with " ab ", collapse. Both engines'
  * `replace` scans left-to-right without rescanning replacements, so
  * the rewrite is bit-identical (the same portability fact TextOps.cnt
  * already relies on).
  *
  * Deviation from classic BPE, documented: no end-of-word marker
  * ("</w>") is appended — merges are within-word either way, and the
  * marker only matters for detokenization, which this engine does not
  * perform.
  */
object Bpe {

  /** One learned merge: at `step`, the winning adjacent pair "a b"
    * (single-space separated), its merged token, and the exact
    * frequency-weighted occurrence count that won the argmax. */
  final case class MergeRow(step: Long, pair: String, merged: String, cnt: Long)

  /** Greedy left-to-right application of one merge to a space-separated
    * token string, via the space-doubling trick (see object doc). */
  private def applyMerge(s: Column, pair: String, merged: String): Column =
    trim(replace(
      replace(
        concat(lit(" "), replace(s, lit(" "), lit("  ")), lit(" ")),
        lit(" " + pair.replace(" ", "  ") + " "),
        lit(" " + merged + " ")),
      lit("  "), lit(" ")))

  /** The word-frequency dictionary with each word's initial
    * character-level tokenization: (word, f, s) where `s` is the
    * space-joined token string. Vocab-bounded. */
  private def initialDict(docs: DataFrame): DataFrame =
    docs
      .select(explode(filter(split(col("text"), " "), x => x =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("f"))
      .withColumn("s", trim(regexp_replace(col("word"), "(.)", "$1 ")))

  /** Train `k` merges over a corpus with a `text` column. Returns the
    * final dictionary (word, f, s — `s` now the learned tokenization)
    * and the merge table in step order. EAGER (QueryDef contract):
    * each iteration runs one dictionary aggregate and one 1-row argmax
    * collect while constructing the result. Stops early if no adjacent
    * pair remains (in particular: empty corpus ⇒ zero merges, the
    * final dict is the empty initial dict — no throw). */
  def train(docs: DataFrame, k: Int): (DataFrame, Seq[MergeRow]) = {
    // vocab-bounded by construction; localCheckpoint keeps the loop's
    // lineage flat (each step would otherwise reference the previous
    // plan twice — once via the argmax, once via the rewrite)
    var dict = initialDict(docs).localCheckpoint()
    val merges = Seq.newBuilder[MergeRow]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val toks = split(col("s"), " ")
      val pairCnt = dict
        .select(col("f"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy("pair").agg(sum("f").as("cnt"))
      // bounded: the per-step argmax is exactly ONE row (LIMIT 1 over
      // the vocab-bounded pair counts), collected to drive the rewrite
      // with literals — the codebook idiom, K times
      val best = pairCnt.orderBy(desc("cnt"), asc("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += MergeRow(step.toLong, pair, merged, cnt)
        val next = dict
          .withColumn("s", applyMerge(col("s"), pair, merged))
          .localCheckpoint()
        // the new dict is materialized (localCheckpoint is eager), so
        // the superseded round's blocks can be freed now — k leaked
        // dict copies per train() call otherwise (callers run train 4x
        // back-to-back under the bench's min-of-3)
        Pin.releaseCheckpoint(dict)
        dict = next
        step += 1
      }
    }
    (dict, merges.result())
  }

  /** The learned merge table as a DataFrame (step, pair, merged, cnt).
    * Empty corpus ⇒ empty frame with the same schema. */
  def mergeTable(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    train(graft.Tables(spark, dir, "documents"), k)._2.toDS().toDF()
  }

  /** Greedy-scan merge application, exposed for the spec's overlap
    * pins ("a a a" → "aa a", "a a a a" → "aa aa"). */
  private[ops] def applyMergeForTest(s: Column, pair: String, merged: String): Column =
    applyMerge(s, pair, merged)

  /** The true BPE APPLY path: tokenize any word — including words the
    * training corpus never saw — by re-playing the learned merge
    * SEQUENCE in order over its character-level split. This is how a
    * trained tokenizer transfers to new data (tx44's dict join only
    * covers the training vocabulary); map-only, a chain of k literal
    * replaces, no join anywhere. */
  def tokenizeExpr(word: Column, merges: Seq[MergeRow]): Column =
    merges.foldLeft(trim(regexp_replace(word, "(.)", "$1 "))) {
      (s, m) => applyMerge(s, m.pair, m.merged)
    }

  /** DuckDB replay of the training loop: the shared `WITH` prefix —
    * word dict `wd`, char-level `d0`, then for each step i the pair
    * counts `p_i`, the 1-row argmax `m_i` (count DESC, pair ASC), and
    * the rewritten dict `d_i` via the same space-doubling replace.
    * Callers append their own final SELECT over `m_1..m_k` / `d_k`.
    * `corpusWhere` restricts the TRAINING corpus (e.g.
    * " WHERE doc_id % 2 = 0" for tx46's transfer split); application
    * stages downstream may still range over the full lake. */
  /** The DuckDB char-level init fragment (word → space-joined chars),
    * shared by [[oracleStages]] and [[oracleApplyStages]] so the two
    * replay paths can never drift apart on the backreference spelling
    * (r9 ADVICE: one side wrote `\\1` in an s-interpolated string, the
    * other `\1` raw — same SQL, asymmetric source). Raw triple-quoted:
    * the `\1` reaches DuckDB verbatim. */
  private val charInitSql =
    """trim(regexp_replace(word, '(.)', '\1 ', 'g'))"""

  def oracleStages(k: Int, corpusWhere: String = ""): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH wd AS (
              |  SELECT word, CAST(count(*) AS BIGINT) AS f
              |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
              |        FROM documents$corpusWhere)
              |  GROUP BY word),
              |d0 AS (SELECT word, f, $charInitSql AS s FROM wd)""".stripMargin
    for (i <- 1 to k) {
      sb ++= s""",
                |p$i AS (
                |  SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
                |    SELECT f, toks[ix] || ' ' || toks[ix + 1] AS pair
                |    FROM (SELECT f, string_split(s, ' ') AS toks FROM d${i - 1}) t,
                |         unnest(range(1, len(toks))) u(ix))
                |  GROUP BY pair),
                |m$i AS (
                |  SELECT CAST($i AS BIGINT) AS step, pair, replace(pair, ' ', '') AS merged, cnt
                |  FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
                |d$i AS (
                |  SELECT word, f,
                |    trim(replace(replace(' ' || replace(s, ' ', '  ') || ' ',
                |        (SELECT ' ' || replace(pair, ' ', '  ') || ' ' FROM m$i),
                |        (SELECT ' ' || merged || ' ' FROM m$i)),
                |      '  ', ' ')) AS s
                |  FROM d${i - 1})""".stripMargin
    }
    sb.toString
  }

  /** DuckDB replay of [[tokenizeExpr]]: APPLY the k learned merges
    * (the `m_1..m_k` stages of [[oracleStages]]) in order to the
    * distinct words of the FULL lake — `aw`/`a0` char-init, then one
    * rewrite stage per merge, ending at `a_k` with `(word, s)`.
    * Unseen words (absent from the restricted training corpus) flow
    * through the same chain — the transfer path tx46 grades. */
  def oracleApplyStages(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
              |aw AS (
              |  SELECT DISTINCT word
              |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
              |        FROM documents)),
              |a0 AS (SELECT word, $charInitSql AS s FROM aw)""".stripMargin
    for (i <- 1 to k) {
      sb ++= s""",
                |a$i AS (
                |  SELECT word,
                |    trim(replace(replace(' ' || replace(s, ' ', '  ') || ' ',
                |        (SELECT ' ' || replace(pair, ' ', '  ') || ' ' FROM m$i),
                |        (SELECT ' ' || merged || ' ' FROM m$i)),
                |      '  ', ' ')) AS s
                |  FROM a${i - 1})""".stripMargin
    }
    sb.toString
  }
}
