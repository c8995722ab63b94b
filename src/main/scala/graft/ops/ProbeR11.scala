package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the r11 optimization round (guide
  * §1.4: time sub-plans against the noop sink). NOT part of the
  * library; deleted before round close. */
object ProbeR11 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val workers = if (cpus >= 16) cpus - 2 else cpus
    val spark = SparkSession.builder()
      .master(s"local[$workers]")
      .config("spark.sql.shuffle.partitions", workers)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => DataFrame): Unit = {
      // warm-up + min of 3, noop sink
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val m = Seq.fill(3)(once()).min
      println(f"[probe] $name%-28s $m%.3f")
    }


    val docs = graft.Tables(spark, d, "documents")
      .select("doc_id", "text", "n_chars")

    // pp06 stages
    val all = docs.select("doc_id", "text", "n_chars")
    val takedown = all.filter(col("doc_id") % 13 === 0).select("doc_id", "text")
    val survivors = all.filter(col("doc_id") % 13 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"), col("text"), col("n_chars"))

    time("pp06.survivors") { survivors }
    val idx = DedupOps.baseLshIndex(spark, d)
    time("pp06.lshBandIndex(takedown)") { DedupOps.lshBandIndex(takedown) }
    time("pp06.indexDelete(plan only)") {
      DedupOps.lshIndexDelete(spark.table(idx), DedupOps.lshBandIndex(takedown))
    }
    // the verb includes the bucketed write; time it via the real call
    def timeU(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f (1 run)")
    }
    timeU("pp06.delete+write") {
      DedupOps.writeLshIndexRows(
        DedupOps.lshIndexDelete(spark.table(idx),
          DedupOps.lshBandIndex(takedown)),
        "probe_pp06_idx", graft.core.Scratch.dir("probe_pp06_") + "/idx")
    }
    val pairs = DedupOps.lshIndexProbe(
      batch.select("doc_id", "text"), spark.table("probe_pp06_idx"),
      survivors.select("doc_id", "text")
        .unionByName(batch.select("doc_id", "text")))
    time("pp06.probe") { pairs }
    val admitted = batch.join(
      pairs.select(col("b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    val corpus = survivors.unionByName(admitted)
    time("pp06.corpus") { corpus }
    time("pp06.edges") { DedupOps.exactJaccardPairs(corpus.select("doc_id", "text")) }
    val corpusP = Pin.once(corpus)
    val edges = DedupOps.exactJaccardPairs(corpusP.select("doc_id", "text")).select("a", "b")
    time("pp06.cc(after pin+edges)") {
      DedupOps.connectedComponents(corpusP.select(col("doc_id").as("id")), edges)
    }
    // CC round-by-round timing (inline replica)
    {
      val nodes = corpusP.select(col("doc_id").as("id"))
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] cc.$name%-26s ${(System.nanoTime() - t0) / 1e9}%.3f")
        r
      }
      val sym = t("sym_ckpt") {
        edges.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
          .localCheckpoint(false)
      }
      var labels = nodes.select(col("id"), col("id").as("label"))
        .localCheckpoint(false)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
      var prevSum = t("initial_sum") { labelSum(labels) }
      var converged = false
      var round = 0
      while (!converged) {
        round += 1
        val prop = sym.join(labels, sym("dst") === labels("id"))
          .select(col("src").as("id"), col("label"))
        val next = labels.unionByName(prop)
          .groupBy("id").agg(min("label").as("label"))
          .localCheckpoint(false)
        val curSum = t(s"round$round") { labelSum(next) }
        converged = curSum.compareTo(prevSum) == 0
        prevSum = curSum
        Pin.releaseCheckpoint(labels)
        labels = next
      }
      println(s"[probe] cc.rounds=$round")
    }

    // mm16 stages
    val media = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val edited = media.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"),
        concat(col("payload"), encode(lit(" v2edit"), "UTF-8")).as("payload"))
    val assets = media.unionByName(edited)
    time("mm16.full") { MultimodalOps.payloadNearDups(assets) }

    // sp22 stages
    val base2 = docs.select("doc_id", "text")
    val u2 = base2.unionByName(base2.select(
      (col("doc_id") + lit(100000L)).as("doc_id"), col("text")))
    time("sp22.edges") { DedupOps.exactJaccardPairs(u2) }
    spark.stop()
  }
}
