package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** End-to-end training-data preparation — the ops composed the way a
  * real corpus build runs them, in one declarative plan:
  *
  *   quality gate (tx12's integer-exact Gopher rules)
  *     → exact dedup (dd01's fingerprint + first-survivor window)
  *       → deterministic train/test split (sp05's hash split)
  *         → per-(lang, split) audit counts
  *
  * Everything stays inside one Catalyst plan: the gate is a map-side
  * filter that pushes into the scan, dedup is the single fingerprint
  * shuffle, the split adds no shuffle (pure hash of the id), and the
  * audit is map-side-combinable. At 100 TB this whole pipeline is a
  * scan + ONE shuffle + a small aggregate — no materialization between
  * stages unless the operator (checkpoint/localCheckpoint) is asked
  * for. The id_sum checksum makes the oracle compare sensitive to
  * MEMBERSHIP, not just counts.
  */
object Pipeline {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "pp01_training_pipeline",
      Some("""WITH m AS (
             |  SELECT doc_id, lang, text,
             |    CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
             |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
             |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
             |    CAST(length(text) AS BIGINT) AS len,
             |    CAST(CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 1 ELSE 0 END
             |       + CASE WHEN ' ' || text || ' ' LIKE '% and %' THEN 1 ELSE 0 END
             |       + CASE WHEN ' ' || text || ' ' LIKE '% of %' THEN 1 ELSE 0 END
             |       + CASE WHEN ' ' || text || ' ' LIKE '% to %' THEN 1 ELSE 0 END
             |       + CASE WHEN ' ' || text || ' ' LIKE '% a %' THEN 1 ELSE 0 END AS BIGINT) AS n_stop
             |  FROM documents),
             |kept AS (
             |  SELECT doc_id, lang, text FROM m
             |  WHERE n_words BETWEEN 10 AND 1000
             |    AND n_chars >= 2 * n_words AND n_chars <= 12 * n_words
             |    AND 5 * n_digits <= len AND n_stop >= 2),
             |dedup AS (
             |  SELECT doc_id, lang FROM (
             |    SELECT doc_id, lang,
             |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |    FROM kept) r WHERE rn = 1),
             |sp AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN md5(CAST(doc_id AS VARCHAR))
             |           < 'cccccccccccccccccccccccccccccccd'
             |         THEN 'train' ELSE 'test' END AS split
             |  FROM dedup)
             |SELECT lang, split, count(*) AS n,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM sp GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val padded = concat(lit(" "), col("text"), lit(" "))
        val flag = (c: Column) => when(c, 1L).otherwise(0L)
        val m = docs(s, d).select(
          col("doc_id"), col("lang"), col("text"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"),
          length(replace(col("text"), lit(" "), lit(""))).cast("long").as("n_chars"),
          (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
            .cast("long").as("n_digits"),
          length(col("text")).cast("long").as("len"),
          Seq("the", "and", "of", "to", "a")
            .map(sw => flag(padded.contains(s" $sw ")))
            .reduce(_ + _).as("n_stop"))
        val kept = m.filter(
          col("n_words").between(10, 1000) &&
            col("n_chars") >= lit(2) * col("n_words") &&
            col("n_chars") <= lit(12) * col("n_words") &&
            lit(5) * col("n_digits") <= col("len") &&
            col("n_stop") >= 2)
          .select("doc_id", "lang", "text")
        val w = Window.partitionBy(md5(encode(col("text"), "UTF-8"))).orderBy("doc_id")
        val dedup = kept
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "lang")
        val hkey = md5(col("doc_id").cast("string").cast("binary"))
        dedup
          .withColumn("split",
            when(hkey < lit("cccccccccccccccccccccccccccccccd"), "train")
              .otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n"), sum("doc_id").cast("long").as("id_sum"))
      })
  )
}
