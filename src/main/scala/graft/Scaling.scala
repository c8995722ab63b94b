package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextIndex, VectorOps}

/** Measured scaling EXPONENTS for the headline sub-quadratic claims
  * (r7 verdict task 6): ScaleStressSpec proves the answers stay exact
  * at 10× input; this harness measures how the RUNTIME grows, turning
  * "bucketed, never all-pairs" from plan shape into observed behavior.
  *
  * Method: each kernel runs on nested corpus slices of ~1×/3×/10×
  * (prefix slices of the sf dir's own tables — natural data, no
  * synthetic duplication that would skew bucket occupancy), 1 warm-up
  * + min-of-`reps` per point (the bench's JIT discipline), forced via
  * `queryExecution.toRdd.count()`. The reported exponent is the
  * endpoint log-log slope ln(t_10x/t_1x)/ln(n_10x/n_1x). Fixed
  * per-job overhead (scheduling, the full-file scan under the slice
  * filter) deflates small-corpus exponents toward 0 — conservative
  * for the claim being tested, which is an UPPER bound (< 2, i.e.
  * not all-pairs; ScalingSpec asserts <= 1.7 with noise margin).
  *
  * Kernels and their expected regimes:
  *   - dd02 (MinHash-LSH near-dedup): signature pass O(n) + band-key
  *     equi-join on capped buckets — near-linear.
  *   - dd06 (exact PPJoin): df-ASC prefix-filtered posting join —
  *     super-linear in candidate mass but far below the all-pairs n².
  *   - dd17 (indexed probe, FIXED batch vs growing lake): O(batch +
  *     touched postings) — near-flat in lake size; the index build is
  *     fixture, not measured.
  *   - vs02 (IVF cell probe, fixed 5-probe batch): per-cell scan
  *     grows with cell size at a fixed 8-cell codebook — sub-linear
  *     to linear; the oracle-side assignment is part of the plan.
  *   - tx33 (BM25 index probe, FIXED query vs growing indexed lake):
  *     O(query-term posting mass). On THIS corpus's ~30-word
  *     vocabulary every doc holds most terms, so posting mass is a
  *     constant fraction of the lake and the expected regime is
  *     near-LINEAR — the claim under test is sub-quadratic plus the
  *     constant-factor story (the probe reads 4 long columns of the
  *     query's partitions, never text); at real-corpus vocabularies
  *     query postings are a vanishing lake fraction.
  */
object Scaling {

  /** (kernel name, points as (n, min seconds), endpoint exponent). */
  def measure(spark: SparkSession, sfDir: String,
      reps: Int = 3): Seq[(String, Seq[(Long, Double)], Double)] = {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    val nVecs = emb.agg(max("vec_id")).head().getLong(0) + 1
    val docSizes = Seq(nDocs / 10, 3 * nDocs / 10, nDocs)
    val vecSizes = Seq(nVecs / 10, 3 * nVecs / 10, nVecs)

    def dslice(n: Long) = docs.filter(col("doc_id") < n)
    def withCopy(n: Long) = dslice(n).unionByName(dslice(n)
      .select((col("doc_id") + lit(100000L)).as("doc_id"), col("text")))
    def vslice(n: Long) = emb.filter(col("vec_id") < n)

    // dd17's fixtures: one persisted index per lake size (input state,
    // not the verb — same rationale as the registered query's cache),
    // and a FIXED probe batch so only the lake grows.
    val idxTable = docSizes.map { n =>
      val t = s"scaling_lsh_idx_$n"
      DedupOps.writePortableLshIndex(dslice(n), t,
        graft.core.Scratch.dir(s"graft_scaling_idx_${n}_") + "/index")
      n -> t
    }.toMap
    val batch = docs
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < docSizes.head)
      .select((col("doc_id") + lit(100000L)).as("doc_id"), col("text"))

    // tx33's fixtures: one persisted BM25 index per lake size, with a
    // FIXED query so only the posting store grows.
    val txtIdxDir = docSizes.map { n =>
      val dirN = graft.core.Scratch.dir(s"graft_scaling_txtidx_${n}_") + "/index"
      TextIndex.buildTextIndex(dslice(n), dirN)
      n -> dirN
    }.toMap
    val fixedQuery = TextIndex.queryTerms(docs, 42)

    val kernels: Seq[(String, Seq[Long], Long => DataFrame)] = Seq(
      ("dd02_minhash_lsh", docSizes,
        n => DedupOps.minHashNearDupsPortable(withCopy(n))),
      ("dd06_exact_ppjoin", docSizes,
        n => DedupOps.exactJaccardPairs(withCopy(n))),
      ("dd17_index_probe", docSizes,
        n => DedupOps.lshIndexProbe(batch, spark.table(idxTable(n)),
          dslice(n).unionByName(batch))),
      ("tx33_text_probe", docSizes,
        n => TextIndex.probeTextIndex(spark, txtIdxDir(n), fixedQuery, 10)),
      ("vs02_ivf_probe", vecSizes, { n =>
        val e = vslice(n)
        val centroids = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        val asg = VectorOps.assignClusters(e, centroids)
        val probes = asg.filter(col("vec_id").between(100, 104))
          .select(col("vec_id").as("probe_id"), col("v").as("pv"),
            col("cid").as("pcid"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy(col("c").desc, col("neighbor_id"))
        asg.join(broadcast(probes),
            col("cid") === col("pcid") && col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            VectorOps.cosine(col("pv"), col("v")).as("c"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
      }))

    kernels.map { case (name, sizes, mk) =>
      val points = sizes.map { n =>
        def once(): Double = {
          val t0 = System.nanoTime()
          mk(n).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up: this (name, n) plan's codegen/JIT
        n -> Seq.fill(reps)(once()).min
      }
      val ((n1, t1), (nk, tk)) = (points.head, points.last)
      val exponent = math.log(tk / t1) / math.log(nk.toDouble / n1)
      (name, points, exponent)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outFile = args.lift(1).getOrElse("SCALING.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val workers = if (cpus >= 16) cpus - 2 else cpus
    val spark = SparkSession.builder()
      .master(s"local[$workers]")
      .config("spark.sql.shuffle.partitions", workers)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = measure(spark, sfDir)
    val notes = "Endpoint log-log runtime exponents over ~1x/3x/10x " +
      "nested natural-data slices, warmed min-of-3 per point " +
      "(ScalingSpec asserts <= 1.7: sub-quadratic = not all-pairs). " +
      "Fixed per-job overhead deflates exponents at these corpus " +
      "sizes; the assertion is an upper bound, so that bias is " +
      "conservative. dd17 probes a FIXED batch against a growing " +
      "indexed lake; its near-flat exponent is the O(batch) claim."
    val json = m.map { case (name, points, exp) =>
      val ps = points.map { case (n, t) =>
        f"""{"n": $n, "sec": $t%.3f}""" }.mkString("[", ", ", "]")
      f"""  "$name": {"points": $ps, "exponent": $exp%.3f}"""
    }.mkString("{\n", ",\n",
      s",\n  \"_notes\": \"$notes\",\n  \"sf_dir\": \"$sfDir\"\n}\n")
    Files.writeString(Paths.get(outFile), json)
    println(s"[scaling] wrote $outFile")
    spark.stop()
  }
}
