package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants for the round-3 closing additions (ev40, sp15,
  * q59, tx25, tx26, vs17, st06) beyond the oracle hash gate: each test
  * pins a property the DuckDB value-compare can't express (leakage
  * freedom, monotonicity, equivalence to a direct recompute under a
  * different plan).
  */
class Round3AdditionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sp15 group k-fold: no source straddles a fold (leakage-free), folds disjoint+exhaustive") {
    val folds = SparkEntry.queries("sp15_group_kfold")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // disjoint+exhaustive on docs
    assert(folds.agg(sum("n_docs")).head.getLong(0) == docs.count())
    // each distinct source contributes to exactly one fold
    val totalSources = docs.select("source").distinct().count()
    assert(folds.agg(sum("n_sources")).head.getLong(0) == totalSources)
  }

  test("q59 retractable agg: delta-maintained state equals direct recompute") {
    val maintained = SparkEntry.queries("q59_retractable_agg")(spark, sf)
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .filter(year(col("o_orderdate")) >= 1997)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n"))
    val joined = maintained.select(col("o_orderpriority"), col("n").as("nm"))
      .join(direct, "o_orderpriority", "full_outer")
      .filter(col("nm").isNull || col("n").isNull || col("nm") =!= col("n"))
    assert(joined.count() == 0)
  }

  test("vs17 multiprobe recall: probing 2 cells never loses recall vs 1 cell") {
    val r = SparkEntry.queries("vs17_multiprobe_recall")(spark, sf)
    assert(r.filter(col("hit_p2") < col("hit_p1")).count() == 0)
    assert(r.count() == 5) // one row per probe
  }

  test("tx25 feature scale: per-lang z-scores have mean ~0 and unit population variance") {
    val z = SparkEntry.queries("tx25_feature_scale")(spark, sf)
    val stats = z.groupBy("lang")
      .agg(avg("z").as("m"), avg(col("z") * col("z")).as("m2"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { row =>
      assert(math.abs(row.getAs[Double]("m")) < 0.01, s"lang mean z off: $row")
      assert(math.abs(row.getAs[Double]("m2") - 1.0) < 0.05, s"lang var z off: $row")
    }
  }

  test("ev40 trend slope is invariant to input partitioning (exact-integer closed form)") {
    val a = SparkEntry.queries("ev40_trend_slope")(spark, sf).collect().toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = SparkEntry.queries("ev40_trend_slope")(spark, sf).collect().toSet
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("tx26 zipf slope is negative (frequency decays with rank) and covers the vocab") {
    val r = SparkEntry.queries("tx26_zipf_fit")(spark, sf).head()
    assert(r.getAs[Double]("zipf_slope") < 0.0)
    assert(r.getAs[Long]("n_terms") > 10)
  }

  test("tx27 KL divergence: non-negative (up to 1e-6 log-grid rounding) for every lang") {
    val kl = SparkEntry.queries("tx27_kl_divergence")(spark, sf).collect()
    assert(kl.nonEmpty)
    kl.foreach(r => assert(r.getAs[Double]("kl") >= -1e-4, s"negative KL: $r"))
  }

  test("mm12 modality alignment: paired counts reconcile with the actual id intersection") {
    val a = SparkEntry.queries("mm12_modality_align")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val paired = docs.join(embs, col("doc_id") === col("vec_id")).count()
    assert(a.agg(sum("n_paired")).head.getLong(0) == paired)
    assert(a.agg(sum("n_docs")).head.getLong(0) == docs.count())
  }

  test("sp16 temporal split: train strictly precedes eval (no temporal leakage)") {
    val r = SparkEntry.queries("sp16_temporal_split")(spark, sf).collect()
      .map(x => x.getAs[String]("split") -> x).toMap
    assert(r.keySet == Set("train", "eval"))
    assert(r("train").getAs[Long]("max_us") < r("eval").getAs[Long]("min_us"))
  }

  test("vs18 centroid separation: full upper triangle of the 8-centroid codebook") {
    val r = SparkEntry.queries("vs18_centroid_separation")(spark, sf)
    assert(r.count() == 28) // C(8,2)
    assert(r.filter(col("cos") > 0.9999).count() == 0, "degenerate (near-identical) centroids")
  }

  test("vs19 PQ distortion: covers every vector; reconstruction beats a random direction") {
    val r = SparkEntry.queries("vs19_pq_distortion")(spark, sf)
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(r.agg(sum("n")).head.getLong(0) == total)
    // random 64-dim directions have E[cos] = 0; a working PQ decode is far above
    r.collect().foreach(x =>
      assert(x.getAs[Double]("avg_recon_cos") > 0.3, s"poor reconstruction: $x"))
  }

  test("pp04 eval build: splits cover exactly dd10's uncontaminated corpus docs") {
    val pp = SparkEntry.queries("pp04_eval_build")(spark, sf)
    val clean = SparkEntry.queries("dd10_decontaminate")(spark, sf)
      .filter(col("contaminated") === 0)
    assert(pp.agg(sum("n_docs")).head.getLong(0) == clean.count())
    assert(pp.agg(sum("id_sum")).head.getLong(0) ==
      clean.agg(sum("doc_id")).head.getLong(0))
  }

  test("ev41 user CCDF: monotone non-increasing, anchored at the distinct-user count") {
    val r = SparkEntry.queries("ev41_user_ccdf")(spark, sf)
      .collect().sortBy(_.getAs[Long]("threshold"))
    assert(r.map(_.getAs[Long]("threshold")).toSeq == Seq(1L, 2L, 5L, 10L, 20L, 50L, 100L))
    // every user has >= 1 event, so the threshold-1 bucket is ALL users
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(r.head.getAs[Long]("n_users_ge") == users)
    assert(r.head.getAs[Double]("share") == 1.0)
    // CCDF is non-increasing in the threshold
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_users_ge") >= b.getAs[Long]("n_users_ge"))
      assert(a.getAs[Double]("share") >= b.getAs[Double]("share"))
    }
  }

  test("sp17 systematic resample: exactly k=1000 slots, per-doc count within 1 of expectation") {
    val r = SparkEntry.queries("sp17_systematic_resample")(spark, sf)
    assert(r.agg(sum("n_copies")).head.getLong(0) == 1000L)
    // systematic (stride) resampling never deviates from k*w/W by a full slot
    val w = spark.read.parquet(s"$sf/documents.parquet")
      .agg(sum("n_chars")).head.getLong(0)
    r.collect().foreach { row =>
      val exp = 1000.0 * row.getAs[Long]("weight") / w
      val n = row.getAs[Long]("n_copies")
      assert(n >= math.floor(exp) && n <= math.floor(exp) + 1, s"slot count off: $row exp=$exp")
    }
  }

  test("pp05 mixture schedule: equal per-source targets, epochs = ceil(target/tokens)") {
    val r = SparkEntry.queries("pp05_mixture_schedule")(spark, sf).collect()
    assert(r.map(_.getAs[Long]("target_tokens")).distinct.length == 1)
    r.foreach { row =>
      val t = row.getAs[Long]("target_tokens"); val tok = row.getAs[Long]("tokens")
      assert(row.getAs[Long]("epochs") == (t + tok - 1) / tok)
      assert(row.getAs[Double]("sample_rate") > 0.0)
    }
  }

  test("vs20 filtered ANN: 10 neighbors per probe, every neighbor passes the lang filter") {
    val r = SparkEntry.queries("vs20_filtered_ann")(spark, sf)
    assert(r.groupBy("probe_id").count().filter(col("count") =!= 10).count() == 0)
    val en = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en").select(col("doc_id"))
    assert(r.join(en, r("neighbor_id") === en("doc_id"), "left_anti").count() == 0)
  }

  test("tx29 pair-merge step equals a direct window-ranked recompute") {
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
      .select(split(trim(col("text")), "\\s+").as("a"))
      .filter(size(col("a")) > 1)
      .select(explode(transform(sequence(lit(1), size(col("a")) - 1),
        i => concat(element_at(col("a"), i), lit(" "),
          element_at(col("a"), i + 1)))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("pair"))).cast("long"))
      .filter(col("rnk") <= 20)
      .select(col("pair"), col("n"), col("rnk"))
    val agg = SparkEntry.queries("tx29_pair_merge_step")(spark, sf)
    assert(agg.collect().toSet == direct.collect().toSet)
  }

  test("ev42 session histogram: buckets cover every ev03 session, shares sum to ~1") {
    val h = SparkEntry.queries("ev42_session_histogram")(spark, sf)
    val totalSessions = SparkEntry.queries("ev03_sessionize")(spark, sf)
      .agg(sum("n_sessions")).head.getLong(0)
    assert(h.agg(sum("n_sessions")).head.getLong(0) == totalSessions)
    val shareSum = h.agg(sum("share")).head.getDouble(0)
    assert(math.abs(shareSum - 1.0) < 0.001, s"shares sum to $shareSum")
  }

  test("st06 streaming distinct users equals the batch COUNT(DISTINCT) per hour") {
    val stream = SparkEntry.queries("st06_stream_distinct_users")(spark, sf)
    val ev = graft.Tables.events(spark, sf)
    val batch = ev.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"))
      .agg(countDistinct("user_id").as("n_users"))
    assert(stream.collect().toSet == batch.collect().toSet)
  }

  test("q62 engine recursion labels every chain member with its root") {
    val r = SparkEntry.queries("q62_recursive_cte")(spark, sf)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // 4 copies of every doc, and — the chain being built from EXACT
    // copies — each node's canonical must be its base id (node mod 1e5)
    assert(r.count() == 4 * nDocs)
    assert(r.filter(col("canonical") =!= col("doc_id") % 100000L).count() == 0)
  }

  test("vs21 Hamming neighbors are sign-similar: top-1 beats the corpus-mean distance") {
    val h = SparkEntry.queries("vs21_hamming_topk")(spark, sf)
    // 64-bit random-sign signatures: unrelated vectors sit near 32 bits
    // apart; a meaningful nearest neighbor must be well inside that
    val top1max = h.filter(col("rnk") === 1)
      .agg(max("hamming")).head.getLong(0)
    assert(top1max < 32, s"a rank-1 Hamming neighbor at $top1max is no better than random")
    // ranking is consistent: per probe, distance is non-decreasing in rank
    val bad = h.selectExpr("probe_id", "rnk", "hamming",
        "lag(hamming) OVER (PARTITION BY probe_id ORDER BY rnk) AS prev")
      .filter(col("prev").isNotNull && col("hamming") < col("prev"))
    assert(bad.count() == 0)
  }

  test("vs22 two-stage retrieval recalls most of the brute-force top-10") {
    val brute = SparkEntry.queries("vs01_topk_bruteforce")(spark, sf)
      .select("probe_id", "neighbor_id")
    val twoStage = SparkEntry.queries("vs22_hamming_rerank")(spark, sf)
      .select("probe_id", "neighbor_id")
    // 64-bit sign screen -> top-50 -> float re-rank recovers 34/50 of
    // the exact top-10 on this corpus; gate at >= 25 so the invariant
    // reads "meaningful recall", not a frozen dataset accident
    val overlap = twoStage.intersect(brute).count()
    assert(overlap >= 25, s"two-stage recall collapsed: $overlap/50")
  }

  test("ev43 TWAP lies within each user's [min, max] value envelope") {
    val twap = SparkEntry.queries("ev43_time_weighted_avg")(spark, sf)
    val env = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id")
      .agg(min(round(col("value"), 2)).as("lo"), max(round(col("value"), 2)).as("hi"))
    // a time-weighted mean of held values can never leave the envelope
    // (1e-4 slack for the final 4dp round)
    val out = twap.join(env, "user_id")
      .filter(col("twap") < col("lo") - 0.0001 || col("twap") > col("hi") + 0.0001)
    assert(out.count() == 0)
  }

  test("dd16 chunks reassemble to the token stream; boundaries survive a prefix edit") {
    import spark.implicits._
    val tokens = (0 until 200).map(i => s"t$i")
    val v1 = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
    val v2 = Seq((2L, ("zzz" +: tokens).mkString(" "))).toDF("doc_id", "text")
    val c1 = DedupOps.contentDefinedChunks(v1).orderBy("cid")
      .select("ctext").as[String].collect()
    // reassembly: chunks in cid order concatenate back to the exact stream
    assert(c1.mkString(" ") == tokens.mkString(" "))
    assert(c1.length > 2, s"expected multiple chunks, got ${c1.length}")
    // content-defined resilience: a 1-token PREFIX insertion shifts every
    // position, but once past the first boundary the trailing windows are
    // identical, so all later chunk identities survive (a fixed-size
    // blocker would lose every block). Only the first chunk may differ.
    val c2 = DedupOps.contentDefinedChunks(v2).orderBy("cid")
      .select("ctext").as[String].collect()
    assert(c1.toSet.intersect(c2.toSet).size >= c1.length - 1,
      s"prefix edit invalidated more than the head chunk")
  }
}
