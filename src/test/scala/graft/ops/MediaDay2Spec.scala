package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pp12 day-2 media curation: the INCREMENTAL path (persisted digest
  * store anti-join + persisted payload-index probe + batch-involving
  * closure) must equal the DAY-1 FULL RECOMPUTE (pp11's composition
  * over lake ∪ arrivals) restricted to the day's arrivals — the
  * MediaNearDupSpec set-identity discipline extended to the whole
  * pipeline, here at a second SF (the oracle gate pins sf0.01). */
class MediaDay2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("incremental day-2 census == full-recompute census restricted to arrivals") {
    val lakeAll = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("payload"))
    val arrivals = lakeAll.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"),
        col("source"), col("payload"))
      .unionByName(lakeAll.filter(pmod(col("doc_id"), lit(15)) === 0)
        .select((col("doc_id") + lit(200000L)).as("doc_id"), col("source"),
          concat(col("payload"), encode(lit(" v2edit"), "UTF-8")).as("payload")))
      .filter(length(col("payload")) > 0)

    // ---- full recompute: pp11's three stages over lake ∪ arrivals
    val u = lakeAll.filter(length(col("payload")) > 0).unionByName(arrivals)
    val sv = u.withColumn("fp", md5(col("payload")))
      .withColumn("rn",
        row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("fp", "rn")
    val pairs = MultimodalOps.payloadNearDups(sv.select("doc_id", "payload"))
      .select("a", "b")
    val cc = DedupOps.connectedComponents(
      sv.select(col("doc_id").as("id")), pairs)
    val keptFull = sv.join(cc, sv("doc_id") === cc("id"))
      .filter(col("label") === col("doc_id"))
      .select(col("doc_id"), col("source"),
        length(col("payload")).cast("long").as("n"))
    def census(raw: org.apache.spark.sql.DataFrame,
        ex: org.apache.spark.sql.DataFrame,
        kept: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long, Long)] = {
      val r = raw.groupBy("source").agg(count(lit(1)).as("n_arrived"))
      val e = ex.groupBy("source").agg(count(lit(1)).as("n_exact_kept"))
      val f = kept.groupBy("source")
        .agg(count(lit(1)).as("n_final_kept"),
          sum(expr("((n % 1920 + 31) DIV 32) * ((n % 1080 + 31) DIV 32)"))
            .cast("long").as("patch_sum"))
      r.join(e, Seq("source"), "left").join(f, Seq("source"), "left")
        .select(col("source"), col("n_arrived"),
          coalesce(col("n_exact_kept"), lit(0L)),
          coalesce(col("n_final_kept"), lit(0L)),
          coalesce(col("patch_sum"), lit(0L)))
        .collect()
        .map(r2 => (r2.getString(0), r2.getLong(1), r2.getLong(2),
          r2.getLong(3), r2.getLong(4))).toSet
    }
    val fullCensus = census(arrivals,
      sv.filter(col("doc_id") >= 100000L),
      keptFull.filter(col("doc_id") >= 100000L))

    // ---- incremental path: the registered pp12 query itself
    val got = graft.SparkEntry.queries("pp12_media_day2_pipeline")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    assert(got == fullCensus,
      s"incremental day-2 diverges from full recompute: " +
        s"extra=${got -- fullCensus} missing=${fullCensus -- got}")
    assert(got.nonEmpty)
    // the plants guarantee work at every tier: arrivals exist, some
    // fold exactly, and the near tier folds at least one re-encode
    assert(got.exists(_._2 > 0))
  }
}
