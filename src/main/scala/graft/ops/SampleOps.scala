package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Deterministic sampling operators for training-data pipelines.
  *
  * Every op keys its randomness on `md5(doc_id)` instead of `rand()`:
  * at 100 TB a sample must be (a) reproducible run-to-run, (b) stable
  * under task retries and partition recomputation — a lost executor
  * re-draws `rand()` and silently changes the sample — and (c)
  * consistent across engines, so the DuckDB oracle can check it
  * exactly. (The reference `shanytc/parquet-merger` has no sampling at
  * all — `src/main.rs` merges whole files — so this family is part of
  * the north-star extension surface.)
  *
  * Scale shapes:
  *  - sp01 Bernoulli: map-only scan, zero shuffles; predicate is a
  *    string compare on a codegen'd md5 — pushes through any plan.
  *  - sp02 stratified quota: ONE shuffle (window partitionBy stratum);
  *    each stratum's rows hash-partition to one task, top-k by window.
  *  - sp03 global uniform k: sort+limit compiles to
  *    TakeOrderedAndProject — per-partition partial top-k, then a
  *    driver-side merge of k-element heaps; no global sort at scale.
  *  - sp04 weighted priority: identical shape to sp03; the priority is
  *    hash/weight, so P(selected) grows with the weight while staying
  *    exactly reproducible (division of a 52-bit-exact integer by a
  *    BIGINT weight is correctly-rounded IEEE on both engines).
  */
object SampleOps {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** sp21's α = 0.5 temperature apportionment, shared with pp07 (which
    * SELECTS the mixture these quotas prescribe). Returns
    * (lang, n_docs, weight, quota, rate) — Σquota = total/4 exactly. */
  private[ops] def temperatureQuotas(s: SparkSession, d: String): DataFrame = {
    import graft.ops.PrefixSum.onePart
    val t = docs(s, d).groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n"))
    val tot = t.agg(sum("n").cast("long").as("total"))
      .withColumn("b", expr("total DIV 4"))
    val w = t.withColumn("wt",
      floor(sqrt(col("n").cast("double")) * lit(1000000) + lit(0.5))
        .cast("long"))
    val ws = w.agg(sum("wt").cast("long").as("wsum"))
    val x = w.crossJoin(broadcast(tot)).crossJoin(broadcast(ws))
      .withColumn("p", expr("CAST(b AS DECIMAL(38,0)) * CAST(wt AS DECIMAL(38,0))"))
      .withColumn("f", expr("p DIV CAST(wsum AS DECIMAL(38,0))"))
      .withColumn("r", expr("CAST(p - CAST(f AS DECIMAL(38,0)) * wsum AS BIGINT)"))
    val lv = x.agg(max("b").as("b"), sum("f").as("sf"))
      .select((col("b") - col("sf")).cast("long").as("leftover"))
    val wnd = Window.partitionBy(onePart(col("lang")))
      .orderBy(col("r").desc, col("lang"))
    val quota = (col("f") + when(col("rn") <= col("leftover"), lit(1L))
      .otherwise(lit(0L))).cast("long")
    x.withColumn("rn", row_number().over(wnd))
      .crossJoin(broadcast(lv))
      .select(col("lang"), col("n").as("n_docs"),
        col("wt").as("weight"), quota.as("quota"),
        round(quota.cast("double") / col("n"), 6).as("rate"))
  }

  /** events with `ts` normalized to TIMESTAMP (see Tables.normalizeTs). */
  private def evTs(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  /** Portable per-row hash key: lowercase-hex md5 of the decimal doc_id
    * string — byte-identical between Spark and DuckDB. */
  private def hkey: Column = md5(col("doc_id").cast("string").cast("binary"))

  /** First 13 hex digits of the key as an exact BIGINT (52 bits, exact
    * in a double). Spark side: conv(hex,16,10). */
  private def hval: Column = conv(substring(hkey, 1, 13), 16, 10).cast("long")

  /** DuckDB equivalent of [[hval]]: 13-digit hex→int via strpos digit
    * arithmetic (DuckDB 1.0 has no hex-parse builtin). */
  private val oracleHval: String = {
    val digits = (1 to 13)
      .map(i => s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1) * ${math.pow(16, 13 - i).toLong}")
      .mkString(" + ")
    s"CAST($digits AS BIGINT)"
  }

  // 10% of the md5 hex space: keys below 0x1999...a (26/256 would be the
  // 2-digit version; the full-width threshold is exact to 128 bits).
  private val P10Threshold = "1999999999999999999999999999999a"

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sp01_hash_sample",
      Some(s"""SELECT doc_id, lang, n_chars
             |FROM (SELECT *, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
             |WHERE h < '$P10Threshold'""".stripMargin),
      (s, d) =>
        docs(s, d)
          .withColumn("h", hkey)
          .filter(col("h") < lit(P10Threshold))
          .select("doc_id", "lang", "n_chars")),

    QueryDef(
      "sp02_stratified_sample",
      Some("""SELECT doc_id, lang
             |FROM (
             |  SELECT doc_id, lang,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 20""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy(hkey, col("doc_id"))
        docs(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select("doc_id", "lang")
      }),

    QueryDef(
      "sp03_bottomk_sample",
      Some("""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
             |FROM documents ORDER BY h LIMIT 50""".stripMargin),
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), hkey.as("h"))
          .orderBy("h")
          .limit(50)),

    QueryDef(
      "sp04_weighted_sample",
      Some(s"""SELECT doc_id, n_chars
             |FROM (
             |  SELECT doc_id, n_chars,
             |    $oracleHval / CAST(n_chars AS DOUBLE) AS priority
             |  FROM (SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
             |        FROM documents WHERE n_chars > 0))
             |ORDER BY priority, doc_id LIMIT 50""".stripMargin),
      (s, d) =>
        docs(s, d)
          .filter(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars"),
            (hval.cast("double") / col("n_chars").cast("double")).as("priority"))
          .orderBy("priority", "doc_id")
          .limit(50)
          .select("doc_id", "n_chars")),

    QueryDef(
      "sp05_train_test_split",
      // Deterministic 80/20 train/test split on the id hash — the split
      // a 100 TB pipeline can re-derive on any engine at any time with
      // guaranteed disjointness (a row's side is a pure function of its
      // id; no split manifest to store or drift). Map-only + a 2-group
      // aggregate; id_sum is the cross-engine membership checksum.
      Some("""SELECT split, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccccccccccccccccccccccccccccccd'
             |         THEN 'train' ELSE 'test' END AS split
             |  FROM documents)
             |GROUP BY split""".stripMargin),
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"),
            when(hkey < lit("cccccccccccccccccccccccccccccccd"), lit("train"))
              .otherwise(lit("test")).as("split"))
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))),

    QueryDef(
      "sp06_weighted_mix",
      // Deterministic data-mixture construction (source up/down-
      // sampling, the w-weighted replication step of training-corpus
      // mixing): source idx < 5 gets weight 2.5, the rest 0.5. Each doc
      // materializes floor(w) copies plus one more iff its id hash
      // falls below frac(w) — so expected replication is exactly w,
      // membership is a pure function of the id (retry-stable,
      // engine-reproducible), and the materialization is a map-side
      // explode, no shuffle until the audit aggregate. The oracle
      // computes the same counts arithmetically (sum of k) — checking
      // the explode produced exactly k replicas per doc.
      Some("""WITH k AS (
             |  SELECT source, doc_id,
             |    CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 2 ELSE 0 END
             |    + CASE WHEN md5(CAST(doc_id AS VARCHAR))
             |             < '80000000000000000000000000000000'
             |           THEN 1 ELSE 0 END AS k
             |  FROM documents)
             |SELECT source, CAST(sum(k) AS BIGINT) AS n_out,
             |  CAST(count(CASE WHEN k >= 1 THEN 1 END) AS BIGINT) AS n_docs_kept
             |FROM k GROUP BY source""".stripMargin),
      (s, d) => {
        val base = when(substring(col("source"), 4, 10).cast("int") < 5, 2).otherwise(0)
        val extra = when(hkey < lit("80000000000000000000000000000000"), 1).otherwise(0)
        docs(s, d)
          .select(col("source"), col("doc_id"), (base + extra).as("k"))
          .filter(col("k") >= 1)
          // the actual replica materialization: k rows per doc
          .select(col("source"), col("doc_id"),
            explode(sequence(lit(1), col("k"))).as("rep"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_out"),
            countDistinct(col("doc_id")).as("n_docs_kept"))
      }),

    QueryDef(
      "sp07_systematic_sample",
      // Systematic (every k-th) sampling on the id — the schema-free
      // companion to sp01's hash Bernoulli: exact 1-in-20 rate with a
      // fixed phase, zero randomness, zero shuffles before the audit
      // aggregate. Appropriate when ids are assignment-order and a
      // stratified-by-position sample is wanted.
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  CAST(min(doc_id) AS BIGINT) AS first_id
             |FROM documents WHERE doc_id % 20 = 3""".stripMargin),
      (s, d) =>
        docs(s, d)
          .filter(pmod(col("doc_id"), lit(20)) === 3)
          .agg(count(lit(1)).as("n"), sum("doc_id").cast("long").as("id_sum"),
            min("doc_id").cast("long").as("first_id"))),

    QueryDef(
      "sp08_cluster_sample",
      // Two-stage cluster sampling: stage 1 hash-samples 20% of the
      // CLUSTERS (source feeds), stage 2 subsamples docs at 50% within
      // the kept clusters. Sampling whole sources preserves intra-feed
      // correlation structure (dedup rates, style) that row-Bernoulli
      // destroys — the design a crawl-corpus ablation needs. Both
      // stages are md5-hex string thresholds (deterministic, portable,
      // recompute-stable) evaluated in the scan — map-only until the
      // per-cluster audit aggregate, and cluster membership never
      // requires a shuffle because the key is IN the row.
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |WHERE md5(source) < '33333333333333333333333333333333'
             |  AND md5(CAST(doc_id AS VARCHAR)) < '80000000000000000000000000000000'
             |GROUP BY source""".stripMargin),
      (s, d) =>
        docs(s, d)
          .filter(md5(col("source")) < lit("33333333333333333333333333333333")
            && md5(col("doc_id").cast("string")) <
               lit("80000000000000000000000000000000"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("sum_chars"))),

    QueryDef(
      "sp09_balanced_sample",
      // Class-balanced downsampling: cap every language at 30 docs so
      // no class dominates training — the rebalancing step after
      // quality filtering. Selection is a per-class hash rank
      // (row_number over md5(doc_id), tie-broken by doc_id): uniform
      // "random" within the class but deterministic and retry-stable,
      // and the id_sum checksum pins the EXACT membership, not just the
      // counts. One window shuffle partitioned by class — no global
      // sort, no skew (classes partition independently).
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM (SELECT lang, doc_id,
             |        row_number() OVER (PARTITION BY lang
             |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |      FROM documents) t
             |WHERE rn <= 30 GROUP BY lang""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs(s, d)
          .select(col("lang"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 30)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"), sum("doc_id").cast("long").as("id_sum"))
      }),

    QueryDef(
      "sp10_temperature_mix",
      // Temperature-based source rebalancing (the multilingual-corpus
      // mixing rule: sample each source proportionally to a SUBLINEAR
      // power of its size, so head sources stop drowning the tail).
      // Quota_s = min(n_s, 10·floor(sqrt(n_s))) — sqrt is exact for
      // these magnitudes (k <= 2^26 keeps floor(sqrt) boundary-safe),
      // so the quota is engine-portable integer math. Selection is the
      // sp09 hash-rank (uniform within source, deterministic,
      // retry-stable); id_sum pins exact membership. One count
      // aggregate + one per-source window — the quota side is a
      // broadcast join, never a shuffle of the corpus.
      Some("""WITH n AS (
             |  SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
             |q AS (
             |  SELECT source, n_s,
             |    least(n_s, 10 * CAST(floor(sqrt(n_s)) AS BIGINT)) AS quota
             |  FROM n),
             |r AS (
             |  SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |SELECT r.source, CAST(any_value(q.n_s) AS BIGINT) AS n_total,
             |  CAST(any_value(q.quota) AS BIGINT) AS quota,
             |  CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM r JOIN q USING (source)
             |WHERE r.rn <= q.quota
             |GROUP BY r.source""".stripMargin),
      (s, d) => {
        val base = docs(s, d).select(col("source"), col("doc_id"))
        val quota = base.groupBy("source").agg(count(lit(1)).as("n_s"))
          .withColumn("quota",
            least(col("n_s"), lit(10) * floor(sqrt(col("n_s"))).cast("long")))
        val w = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        base
          .withColumn("rn", row_number().over(w))
          .join(broadcast(quota), "source")
          .filter(col("rn") <= col("quota"))
          .groupBy("source")
          .agg(first(col("n_s")).cast("long").as("n_total"),
            first(col("quota")).cast("long").as("quota"),
            count(lit(1)).as("n_kept"),
            sum("doc_id").cast("long").as("id_sum"))
      }),

    QueryDef(
      "sp11_curriculum_shards",
      // Curriculum sharding: order the corpus by a quality key and deal
      // it into k shards SNAKE-draft style (shard order reverses every
      // round), so every shard gets the same count ±1 AND a matched
      // quality profile — plain modulo assignment gives shard 0 the
      // best doc of every round and a systematically hotter shard.
      // The global rank is the two-phase distributed prefix COUNT
      // ([[PrefixSum.byLongKey]] with value 1, keyed on negated quality
      // so DESC order becomes an ascending Long key): quality-range
      // buckets rank in parallel + broadcast bucket offsets — no
      // single-partition window. Pure integer assignment math follows;
      // per-shard audit pins membership via id_sum.
      Some("""WITH r AS (
             |  SELECT doc_id, n_chars,
             |    row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r0
             |  FROM documents),
             |a AS (
             |  SELECT doc_id, n_chars,
             |    CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8
             |         ELSE 7 - (r0 % 8) END AS shard
             |  FROM r)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_chars,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM a GROUP BY 1""".stripMargin),
      (s, d) => {
        val src = docs(s, d).select(col("doc_id"), col("n_chars"))
          .withColumn("negc", -col("n_chars").cast("long"))
        PrefixSum.byLongKey(src, "negc", Seq(col("doc_id")),
            lit(1L), "r0", inclusive = false)
          .withColumn("shard",
            when(expr("(r0 DIV 8) % 2") === 0, col("r0") % 8)
              .otherwise(lit(7) - col("r0") % 8))
          .groupBy(col("shard").cast("long").as("shard"))
          .agg(count(lit(1)).as("n"),
            sum("n_chars").cast("long").as("sum_chars"),
            round(sum("n_chars").cast("double") / count(lit(1)), 2)
              .as("avg_chars"),
            sum("doc_id").cast("long").as("id_sum"))
      }),

    QueryDef(
      "sp12_shuffled_shards",
      // Reproducible global shuffle + sharding — the "shuffle the
      // corpus once per epoch" step of a training run, made a pure
      // function of the data: order = md5(doc_id) (a fixed permutation,
      // stable under retries and re-runs), shard = round-robin over the
      // shuffled order. The per-shard manifest pins the EXACT
      // within-shard sequence, not just membership — as a MERGEABLE
      // position-salted hash sum: Σ h48(rk || ':' || doc_id) mod 2⁴⁸.
      // Any id change, omission, or position swap shifts the sum (up to
      // the 2⁻⁴⁸-per-pair collision class the hashed joins already
      // accept), and the aggregate is a commutative map-side-combinable
      // sum — O(1) buffer per task, where an md5-of-LISTAGG manifest
      // (the previous form) would buffer a whole shard's id list
      // (n/8 rows) inside ONE aggregation row: the single-task shape
      // this repo bans. Summed in DECIMAL(38) on both engines (a 1e12-
      // row shard sums to ~2⁸⁸ « 10³⁸, where BIGINT would wrap
      // engine-divergently). The global rank is the two-phase
      // distributed prefix count ([[PrefixSum.byHexKey]]: 256
      // hash-prefix buckets in parallel + broadcast offsets — no
      // single-partition window); integer assignment follows.
      Some("""WITH r AS (
             |  SELECT doc_id,
             |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
             |      doc_id) - 1 AS rk
             |  FROM documents)
             |SELECT CAST(rk % 8 AS BIGINT) AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  CAST(sum(CAST(CAST('0x' || substr(md5(
             |        CAST(rk AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),
             |      1, 12) AS BIGINT) AS HUGEINT)) % 281474976710656
             |    AS BIGINT) AS manifest_chk
             |FROM r GROUP BY 1""".stripMargin),
      (s, d) => {
        val src = docs(s, d).select(col("doc_id"))
          .withColumn("h", md5(col("doc_id").cast("string")))
        val h48 = conv(substring(md5(concat(col("rk").cast("string"), lit(":"),
          col("doc_id").cast("string"))), 1, 12), 16, 10)
          .cast("decimal(38,0)")
        PrefixSum.byHexKey(src, "h", Seq(col("doc_id")),
            lit(1L), "rk", inclusive = false)
          .groupBy((col("rk") % 8).cast("long").as("shard"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("doc_id").cast("long").as("id_sum"),
            (sum(h48) % lit(281474976710656L)).cast("long").as("manifest_chk"))
      }),

    QueryDef(
      "sp13_kfold_assign",
      // k-fold cross-validation assignment: fold = integer hash of the
      // id mod 5 — a pure function of the row (retry-stable, no stored
      // fold manifest; any worker can re-derive membership). Folds are
      // disjoint and exhaustive BY CONSTRUCTION; the per-fold census +
      // id_sum pins exact membership so train/eval splits are
      // reproducible across engines and reruns. Map-only + one tiny
      // rollup.
      Some("""WITH f AS (
             |  SELECT doc_id, lang,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      % 5 AS fold
             |  FROM documents)
             |SELECT CAST(fold AS BIGINT) AS fold,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM f GROUP BY 1""".stripMargin),
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), col("lang"),
            (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
              .cast("long") % 5).cast("long").as("fold"))
          .groupBy("fold")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            countDistinct("lang").cast("long").as("n_langs"),
            sum("doc_id").cast("long").as("id_sum"))),

    QueryDef(
      "sp14_budget_fill",
      // Budgeted corpus selection: take documents in descending-quality
      // order until a 100k-character budget fills — the "best data
      // that fits the compute budget" selector behind every
      // token-budgeted training run. One quality-ordered running sum —
      // the two-phase distributed prefix sum ([[PrefixSum.byLongKey]]
      // on the negated quality key), not a single-partition window;
      // a doc is IN iff the budget
      // still had room BEFORE it (strictly integral boundary — the
      // straddling doc is admitted, matching the greedy fill). Output
      // pins membership (id_sum) and the realized budget.
      Some("""WITH r AS (
             |  SELECT doc_id, lang, n_chars,
             |    coalesce(sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS prior_chars
             |  FROM documents),
             |sel AS (SELECT * FROM r WHERE prior_chars < 100000)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars_taken,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM sel GROUP BY lang""".stripMargin),
      (s, d) => {
        val src = docs(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .withColumn("negc", -col("n_chars").cast("long"))
        PrefixSum.byLongKey(src, "negc", Seq(col("doc_id")),
            col("n_chars"), "prior_chars", inclusive = false)
          .filter(col("prior_chars") < 100000L)
          .groupBy("lang")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("n_chars").cast("long").as("chars_taken"),
            sum("doc_id").cast("long").as("id_sum"))
      }),

    QueryDef(
      "sp15_group_kfold",
      // GROUP-aware k-fold (GroupKFold): the fold is a pure function of
      // the document's SOURCE, not its id — every doc from one source
      // lands in the same fold, so near-duplicate documents from a
      // common origin can never straddle a train/eval boundary (the
      // classic contamination leak sp13's row-level folds can't
      // prevent). Disjoint-by-construction; the census pins per-fold
      // source and doc membership (id_sum) for reproducibility. Same
      // map-only integer-hash discipline as sp13 — no stored manifest.
      Some("""WITH f AS (
             |  SELECT doc_id, source,
             |    CAST('0x' || substr(md5(source), 1, 8) AS BIGINT) % 5 AS fold
             |  FROM documents)
             |SELECT CAST(fold AS BIGINT) AS fold,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM f GROUP BY 1""".stripMargin),
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), col("source"),
            (conv(substring(md5(col("source").cast("binary")), 1, 8), 16, 10)
              .cast("long") % 5).cast("long").as("fold"))
          .groupBy("fold")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            countDistinct("source").cast("long").as("n_sources"),
            sum("doc_id").cast("long").as("id_sum")))
      ,

    QueryDef(
      "sp16_temporal_split",
      // TEMPORAL train/eval split — for forecasting/recommendation
      // data the only split that doesn't leak: train strictly before
      // the cutoff, eval at/after it (here the calendar split point
      // 2021-03-01 over the event stream). The census pins each
      // side's span as exact epoch-µs integers, so max(train) <
      // min(eval) — the no-leakage invariant — is auditable from the
      // output itself. Map-only partition of the scan; the cutoff
      // pushes down to the parquet reader on both branches.
      Some("""SELECT CASE WHEN ts < TIMESTAMP '2024-01-22' THEN 'train'
             |    ELSE 'eval' END AS split,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
             |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
             |FROM events GROUP BY 1""".stripMargin),
      (s, d) =>
        evTs(s, d)
          .groupBy(when(col("ts") < lit("2024-01-22").cast("timestamp"), "train")
            .otherwise("eval").as("split"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            countDistinct("user_id").cast("long").as("n_users"),
            min(unix_micros(col("ts"))).cast("long").as("min_us"),
            max(unix_micros(col("ts"))).cast("long").as("max_us"))),

    QueryDef(
      "sp17_systematic_resample",
      // Importance resampling WITHOUT randomness: systematic (stride)
      // resampling of k=1000 slots by weight (n_chars as the token-mass
      // proxy). Lay the docs on a [0, W) number line in doc_id order;
      // slot i lands at u_i=(2i+1)·W/(2k); a doc's copy count is how
      // many slots fall in its weight interval — the classic low-
      // variance resampler from particle filtering, here as the
      // deterministic answer to "sample training docs ∝ weight". All
      // arithmetic is BIGINT (slots-below-x via (2kx+W−1) DIV 2W), so
      // the oracle hash-matches and Σcopies = k by construction (spec'd).
      // The running sum IS the two-pass per-partition prefix sum
      // ([[PrefixSum.byLongKey]], tx17's packer discipline) — no
      // single-partition window — and the heavy tail shows up as copy
      // counts, not shuffled rows.
      Some("""WITH w AS (
             |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             |    CAST(sum(n_chars) OVER (ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
             |  FROM documents),
             |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM documents),
             |c AS (
             |  SELECT doc_id, weight,
             |    least(1000, (2000 * hi + tw - 1) // (2 * tw)) -
             |    least(1000, (2000 * (hi - weight) + tw - 1) // (2 * tw)) AS n_copies
             |  FROM w, tot)
             |SELECT doc_id, weight, CAST(n_copies AS BIGINT) AS n_copies
             |FROM c WHERE n_copies > 0""".stripMargin),
      (s, d) => {
        val tot = docs(s, d).agg(sum("n_chars").cast("long").as("tw"))
        PrefixSum.byLongKey(
            docs(s, d).select(col("doc_id"), col("n_chars").cast("long").as("weight")),
            "doc_id", Nil, col("weight"), "hi", inclusive = true)
          .crossJoin(broadcast(tot))
          .withColumn("n_copies",
            least(lit(1000L), expr("(2000 * hi + tw - 1) DIV (2 * tw)")) -
            least(lit(1000L), expr("(2000 * (hi - weight) + tw - 1) DIV (2 * tw)")))
          .filter(col("n_copies") > 0)
          .select(col("doc_id"), col("weight"), col("n_copies").cast("long").as("n_copies"))
      }),

    QueryDef(
      "sp18_poisson_bootstrap",
      // Online Poisson bootstrap (Chamandy et al., "Estimating
      // uncertainty for massive data streams", Google 2012): each doc's
      // replicate count k ~ Poisson(1), drawn DETERMINISTICALLY by
      // inverse-CDF on the 52-bit hash uniform, so every engine —
      // and every task retry — re-derives the identical resample.
      // This is how you bootstrap a 100 TB corpus: no global resample
      // index, one map-side k per row (P(k=0)=e⁻¹ drops the row,
      // k≥2 replicates it), then a generate-series explode. The CDF
      // thresholds are double literals, byte-identical in both
      // engines; u is an exact-integer / 2⁵² correctly-rounded divide.
      // Shape: map-only scan + explode — zero shuffles before the
      // consumer, and the expected output mass equals the input mass.
      Some(s"""WITH u AS (
             |  SELECT doc_id, source, $oracleHval / 4503599627370496.0 AS u
             |  FROM (SELECT doc_id, source,
             |          substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS h
             |        FROM documents)),
             |k AS (
             |  SELECT doc_id, source,
             |    CAST(u >= 0.36787944117144233 AS INT) + CAST(u >= 0.7357588823428847 AS INT)
             |    + CAST(u >= 0.9196986029286058 AS INT) + CAST(u >= 0.9810118431238463 AS INT)
             |    + CAST(u >= 0.9963401531726563 AS INT) + CAST(u >= 0.9994058151824183 AS INT)
             |    + CAST(u >= 0.999916758850712 AS INT) + CAST(u >= 0.9999897508033253 AS INT)
             |      AS k
             |  FROM u)
             |SELECT doc_id, source, CAST(unnest(generate_series(1, k)) AS BIGINT) AS rep
             |FROM k WHERE k >= 1""".stripMargin),
      (s, d) => {
        val u = (hval.cast("double") / lit(4503599627370496.0)).as("u")
        val cdf = Seq(0.36787944117144233, 0.7357588823428847,
          0.9196986029286058, 0.9810118431238463, 0.9963401531726563,
          0.9994058151824183, 0.999916758850712, 0.9999897508033253)
        docs(s, d)
          .select(col("doc_id"), col("source"), u)
          .withColumn("k", cdf.map(t => (col("u") >= t).cast("int")).reduce(_ + _))
          .filter(col("k") >= 1)
          .select(col("doc_id"), col("source"),
            explode(sequence(lit(1L), col("k").cast("long"))).as("rep"))
      }),

    QueryDef(
      "sp19_sequence_packing",
      // SEQUENCE PACKING for a fixed training context: the standard
      // GPT-style concat-then-chunk — documents laid out in canonical
      // corpus order (doc_id here; compose with sp12's md5 permutation
      // for per-epoch shuffled packing), token stream cut into B=256
      // token contexts. Unlike first-fit bin packing (inherently
      // sequential, a scheduler not an operator), concat-then-chunk is
      // a pure function of the exclusive token prefix sum, so it
      // distributes: the prefix is the two-phase rank
      // ([[PrefixSum.byLongKey]] — per-bucket partials + broadcast
      // offsets, no single-partition window), and every doc's context
      // span [p DIV B, (p+t-1) DIV B] follows map-side. Output: the
      // boundary-crossing census (spans = #context boundaries a doc
      // straddles — what attention-masking/bin-packing variants trade
      // against), with the global context count and fill factor
      // (tail waste only, by construction) on each row. All integer
      // arithmetic; the one float is the final rounded fill ratio.
      // Token definition shared with tx02 (whitespace split).
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS t
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, t,
             |    coalesce(sum(t) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
             |  FROM t),
             |tot AS (SELECT CAST(sum(t) AS BIGINT) AS total_tokens,
             |               CAST((sum(t) + 255) // 256 AS BIGINT) AS n_bins
             |        FROM t),
             |x AS (
             |  SELECT doc_id, t,
             |    CASE WHEN t = 0 THEN 0
             |         ELSE ((p + t - 1) // 256) - (p // 256) END AS spans
             |  FROM p)
             |SELECT CAST(spans AS BIGINT) AS spans,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(t) AS BIGINT) AS sum_tokens,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  n_bins, total_tokens,
             |  round(CAST(total_tokens AS DOUBLE) / (n_bins * 256), 4) AS fill
             |FROM x, tot GROUP BY 1, 5, 6, 7""".stripMargin),
      (s, d) => {
        val t = docs(s, d).select(col("doc_id"),
          size(filter(split(col("text"), " "), x => x =!= ""))
            .cast("long").as("t"))
        val p = PrefixSum.byLongKey(t, "doc_id", Seq.empty,
          col("t"), "p", inclusive = false)
        val tot = t.agg(sum("t").cast("long").as("total_tokens"))
          .withColumn("n_bins", expr("(total_tokens + 255) DIV 256"))
        p.withColumn("spans",
            when(col("t") === 0, lit(0L))
              .otherwise(expr("((p + t - 1) DIV 256) - (p DIV 256)")))
          .crossJoin(broadcast(tot))
          .groupBy(col("spans").cast("long").as("spans"),
            col("n_bins"), col("total_tokens"))
          .agg(count(lit(1)).as("n_docs"),
            sum("t").cast("long").as("sum_tokens"),
            sum("doc_id").cast("long").as("id_sum"))
          .withColumn("fill", round(col("total_tokens").cast("double")
            / (col("n_bins") * 256), 4))
          .select("spans", "n_docs", "sum_tokens", "id_sum",
            "n_bins", "total_tokens", "fill")
      }),

    QueryDef(
      "sp20_quota_apportion",
      // EXACT QUOTA APPORTIONMENT (largest-remainder / Hamilton
      // method) — the integer complement of pp05's rate-based mixture
      // schedule: distribute a hard budget B (= half the corpus) over
      // the (source, lang) cells PROPORTIONALLY such that the quotas
      // are integers and Σquota = B EXACTLY — floor shares first, then
      // the B − Σfloor leftover units go to the cells with the largest
      // remainders (ties broken on the cell key). Rate-based sampling
      // (pp05, sp06) hits a budget only in expectation; a packing job
      // that must emit exactly B sequences needs these integer quotas.
      // Scale discipline: one map-combinable cell rollup; the
      // apportionment itself runs on the CELL table (a bounded domain
      // — sources × langs, thousands at most; the onePart window
      // marks the intentional single partition), and all shares are
      // computed in DECIMAL(38,0)/HUGEINT so B·n products cannot wrap
      // at lake scale (B·n ≈ 5e22 at T = 1e12 docs), with Spark's
      // decimal DIV returning the exact integral part — bit-equal to
      // DuckDB's HUGEINT floor division.
      Some("""WITH t AS (
             |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
             |               CAST(sum(n) // 2 AS BIGINT) AS b FROM t),
             |x AS (
             |  SELECT source, lang, n,
             |    CAST((CAST(b AS HUGEINT) * n) // total AS BIGINT) AS f,
             |    CAST(CAST(b AS HUGEINT) * n
             |      - ((CAST(b AS HUGEINT) * n) // total) * total AS BIGINT) AS r
             |  FROM t, tot),
             |l AS (SELECT CAST(b - (SELECT sum(f) FROM x) AS BIGINT) AS leftover
             |      FROM tot),
             |rk AS (
             |  SELECT source, lang, n, f,
             |    row_number() OVER (ORDER BY r DESC, source, lang) AS rn
             |  FROM x)
             |SELECT source, lang, n AS n_docs,
             |  CAST(f + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
             |FROM rk, l""".stripMargin),
      (s, d) => {
        import graft.ops.PrefixSum.onePart
        val t = docs(s, d).groupBy("source", "lang")
          .agg(count(lit(1)).cast("long").as("n"))
        val tot = t.agg(sum("n").cast("long").as("total"))
          .withColumn("b", expr("total DIV 2"))
        val x = t.crossJoin(broadcast(tot))
          .withColumn("p", expr("CAST(b AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))"))
          .withColumn("f", expr("p DIV CAST(total AS DECIMAL(38,0))"))
          .withColumn("r", expr("CAST(p - CAST(f AS DECIMAL(38,0)) * total AS BIGINT)"))
        val lv = x.agg(max("b").as("b"), sum("f").as("sf"))
          .select((col("b") - col("sf")).cast("long").as("leftover"))
        val w = Window.partitionBy(onePart(col("source")))
          .orderBy(col("r").desc, col("source"), col("lang"))
        x.withColumn("rn", row_number().over(w))
          .crossJoin(broadcast(lv))
          .select(col("source"), col("lang"), col("n").as("n_docs"),
            (col("f") + when(col("rn") <= col("leftover"), lit(1L))
              .otherwise(lit(0L))).cast("long").as("quota"))
      }),

    QueryDef(
      "sp21_temperature_mix",
      // TEMPERATURE-SCALED MULTILINGUAL MIXTURE (the XLM-R α-sampling,
      // arXiv:1911.02116 §3.1): sampling mass per language ∝ n_lang^α
      // with α = 0.5, which UPSAMPLES low-resource languages relative
      // to their corpus share (the output's per-lang `rate` is
      // strictly decreasing in n_docs). The fractional weights are
      // integerized exactly: wt = floor(sqrt(n)·10⁶ + 0.5) — IEEE
      // sqrt is correctly rounded, so both engines compute the
      // identical BIGINT — and the hard budget B = total/4 is
      // apportioned over the weights with sp20's largest-remainder
      // method (Σquota = B exactly; DECIMAL(38,0)/HUGEINT products so
      // B·wt cannot wrap at lake scale). Scale shape: one
      // map-combinable per-lang rollup; the apportionment runs on the
      // bounded LANGUAGE table (the onePart window marks the
      // intentional single partition over ~dozens of rows).
      Some("""WITH t AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
             |               CAST(sum(n) // 4 AS BIGINT) AS b FROM t),
             |w AS (SELECT lang, n,
             |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wt
             |      FROM t),
             |ws AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM w),
             |x AS (SELECT lang, n, wt,
             |        CAST((CAST(b AS HUGEINT) * wt) // wsum AS BIGINT) AS f,
             |        CAST(CAST(b AS HUGEINT) * wt
             |          - ((CAST(b AS HUGEINT) * wt) // wsum) * wsum AS BIGINT) AS r
             |      FROM w, tot, ws),
             |l AS (SELECT CAST(b - (SELECT sum(f) FROM x) AS BIGINT) AS leftover
             |      FROM tot),
             |rk AS (SELECT lang, n, wt, f,
             |         row_number() OVER (ORDER BY r DESC, lang) AS rn
             |       FROM x)
             |SELECT lang, n AS n_docs, wt AS weight,
             |  CAST(f + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota,
             |  round(CAST(f + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS DOUBLE) / n, 6) AS rate
             |FROM rk, l""".stripMargin),
      (s, d) => temperatureQuotas(s, d)),

    QueryDef(
      "sp22_kfold_split",
      // LEAK-FREE K-FOLD cross-validation splits — dd23's cluster-
      // keyed discipline generalized from one 80/20 cut to k = 5
      // rotating folds: the fold key is the near-dup CLUSTER canonical
      // (dd06's exact J >= 0.8 edges closed under dd05's min-label
      // CC), hashed onto 0..4 with the portable md5 — so a document
      // and all its near-duplicates land in the SAME fold and no
      // evaluation fold is ever contaminated by a training twin, for
      // every one of the k rotations at once (the property a per-doc
      // fold hash cannot give; RoundEightSpec proves both copies of
      // every doc share a fold). Retry-stable and manifest-free like
      // every sp-family op: fold = pure function of content-derived
      // cluster id. Output is the per-fold census (docs, clusters,
      // id checksum); the per-doc frame is the same plan minus the
      // final rollup.
      Some("""WITH u AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text FROM documents
             |), tk AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM u),
             |sh AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(
             |      range(1, greatest(len(toks) - 2, 1) + 1),
             |      i -> array_to_string(
             |             list_slice(toks, i, least(i + 2, len(toks))), ' '))) AS shs
             |  FROM tk WHERE len(toks) > 0),
             |post AS (SELECT doc_id, unnest(shs) AS s FROM sh),
             |inter AS (
             |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
             |  FROM post x JOIN post y ON x.s = y.s AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2),
             |sz AS (SELECT doc_id, len(shs) AS n FROM sh),
             |edges AS (
             |  SELECT a, b FROM inter
             |  JOIN sz sa ON sa.doc_id = a
             |  JOIN sz sb ON sb.doc_id = b
             |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
             |sym AS (SELECT a AS src, b AS dst FROM edges
             |        UNION ALL SELECT b, a FROM edges),
             |reach AS (
             |  WITH RECURSIVE r(node, lbl) AS (
             |    SELECT doc_id, doc_id FROM u
             |    UNION
             |    SELECT s.src, r.lbl FROM r JOIN sym s ON s.dst = r.node)
             |  SELECT node, lbl FROM r),
             |cc AS (SELECT node AS doc_id, min(lbl) AS canonical
             |       FROM reach GROUP BY node)
             |SELECT CAST(CAST(concat('0x',
             |    substr(md5(CAST(canonical AS VARCHAR)), 1, 15)) AS BIGINT)
             |    % 5 AS BIGINT) AS fold,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT canonical) AS BIGINT) AS n_clusters,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM cc GROUP BY 1""".stripMargin),
      (s, d) => {
        val base = docs(s, d).select("doc_id", "text")
        val u = base.unionByName(base.select(
          (col("doc_id") + lit(100000L)).as("doc_id"), col("text")))
        val edges = DedupOps.exactJaccardPairs(u).select("a", "b")
        val cc = DedupOps.connectedComponents(
          u.select(col("doc_id").as("id")), edges)
        cc.select(col("id").as("doc_id"), col("label"))
          .withColumn("fold",
            pmod(DedupOps.portableHash60(col("label").cast("string")), lit(5)))
          .groupBy(col("fold").cast("long").as("fold"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("label").as("n_clusters"),
            sum("doc_id").cast("long").as("id_sum"))
      }),

    QueryDef(
      "sp23_span_corruption",
      // SPAN-CORRUPTION MASK PLANNING (the T5 denoising objective,
      // arXiv:1910.10683 §3.1.4: ~15% of tokens masked in multi-token
      // spans, mean length 3) made DISTRIBUTED-DETERMINISTIC: T5's
      // sequential sampler is replaced by a pure per-position hash
      // plan — position i starts a span iff md5(doc:i) % 20 = 0
      // (density 1/20), its length is 1 + md5(doc:i:len) % 5 (1..5,
      // mean 3 ⇒ expected mask mass ≈ 15%), overlapping spans merge
      // by taking the distinct covered-position set. Same row, same
      // mask — on any partitioning, any retry, any engine — which is
      // what makes mid-epoch resume and cross-run ablations
      // reproducible. Map-only: every step is per-doc array algebra
      // (span merge is a bounded per-doc set op), zero shuffles.
      // Output: per-doc mask census + the canonical mask fingerprint
      // a downstream tokenizer pass re-derives positions from.
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |t2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM tk
             |       WHERE len(toks) > 0),
             |m AS (
             |  SELECT doc_id, n,
             |    list_sort(list_distinct(flatten(list_transform(
             |      list_filter(range(1, n + 1), i ->
             |        CAST(concat('0x', substr(md5(doc_id || ':' || i), 1, 15)) AS BIGINT) % 20 = 0),
             |      s -> range(s, least(
             |             s + CAST(concat('0x', substr(md5(doc_id || ':' || s || ':len'), 1, 15)) AS BIGINT) % 5,
             |             n) + 1))))) AS masked
             |  FROM t2)
             |SELECT doc_id, n AS n_tokens,
             |  CAST(len(masked) AS BIGINT) AS n_masked,
             |  CAST(len(list_filter(masked, p -> NOT list_contains(masked, p - 1))) AS BIGINT) AS n_spans,
             |  md5(coalesce(array_to_string(masked, ','), '')) AS mask_fp
             |FROM m""".stripMargin),
      (s, d) => {
        def h(parts: Column*): Column = pmod(
          graft.functions.GraftFunctions.md5_low60(concat(parts: _*)),
          lit(20))
        def hlen(id: Column, st: Column): Column = pmod(
          graft.functions.GraftFunctions.md5_low60(concat(
            id.cast("string"), lit(":"), st.cast("string"), lit(":len"))),
          lit(5))
        val t2 = docs(s, d)
          .select(col("doc_id"),
            filter(split(col("text"), " "), x => x =!= "").as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), size(col("toks")).cast("long").as("n"))
        val m = t2.withColumn("masked", array_sort(array_distinct(flatten(
          transform(
            filter(sequence(lit(1L), col("n")), i =>
              h(col("doc_id").cast("string"), lit(":"),
                i.cast("string")) === 0),
            st => sequence(st,
              least(st + hlen(col("doc_id"), st), col("n"))))))))
        m.select(col("doc_id"), col("n").as("n_tokens"),
          size(col("masked")).cast("long").as("n_masked"),
          size(filter(col("masked"), p =>
            !array_contains(col("masked"), p - 1))).cast("long").as("n_spans"),
          md5(concat_ws(",",
            transform(col("masked"), p => p.cast("string")))).as("mask_fp"))
      }),

    QueryDef(
      "sp24_curriculum_stages",
      // CURRICULUM STAGING — order the corpus by a difficulty signal
      // (token count: the short→long shape of curriculum learning,
      // Bengio et al., ICML 2009) and cut it into 4
      // EXACT quartile stages with ntile semantics, WITHOUT a
      // single-partition global sort: the 3 boundary keys at ntile's
      // exact cutoff ranks come from the bracket-refine
      // order-statistic selector ([[GridQuantile.ntileCutKeys]],
      // q56/ev30's machinery — integer (n_words, doc_id) keys, so the
      // selection is engine-exact), and every row then buckets by
      // comparing against 3 LITERALS map-side. Census per (stage,
      // lang) with id_sum pins exact stage MEMBERSHIP, not just
      // counts: three narrow passes, zero row-scale shuffles beyond
      // the census rollup — the plan a 100 TB curriculum cut needs.
      Some("""WITH m AS (
             |  SELECT doc_id, lang,
             |    CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, lang, n_words,
             |    ntile(4) OVER (ORDER BY n_words, doc_id) AS stage
             |  FROM m)
             |SELECT CAST(stage AS BIGINT) AS stage, lang,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(min(n_words) AS BIGINT) AS min_words,
             |  CAST(max(n_words) AS BIGINT) AS max_words,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM r GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val src = docs(s, d).select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"))
        val (_, keys) =
          graft.ops.GridQuantile.ntileCutKeys(src, "n_words", "doc_id", 4)
        val v = col("n_words").cast("double")
        val stage = keys.map { case (kv, kt) =>
          when(v > kv || (v === kv && col("doc_id") > kt), 1L).otherwise(0L)
        }.reduceOption(_ + _).getOrElse(lit(0L)) + 1L
        src.groupBy(stage.as("stage"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            min("n_words").as("min_words"),
            max("n_words").as("max_words"),
            sum("doc_id").cast("long").as("id_sum"))
      })
  )
}
