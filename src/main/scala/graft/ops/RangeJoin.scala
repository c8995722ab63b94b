package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Banded (bucketized) interval join — the scale-safe plan for range
  * predicates Spark would otherwise execute as a broadcast nested-loop
  * or cartesian join.
  *
  * A naive `a JOIN b ON a.k = b.k AND abs(a.t - b.t) <= W` gives
  * Catalyst only the equi-key `k`; every same-key pair is then tested
  * against the range — O(n²) per key, fatal for a hot key at 100 TB.
  * Banding adds a derived equi-key: bucket `t` into width-W bins, have
  * one side also probe its ±1 neighbor bins, and join on
  * `(k, bin)` — a plain shuffled hash join. Any pair within W is in
  * the same or adjacent bins (|t_a - t_b| <= W ⇒ |bin_a - bin_b| <= 1),
  * so recall is exact; the residual range filter runs only inside
  * 3-bin neighborhoods, so per-key work is O(n · density), not O(n²).
  * Each pair matches exactly one of the three probe bins (bins are
  * disjoint), so no dedup pass is needed.
  *
  * (The reference `shanytc/parquet-merger` has no joins at all —
  * `src/main.rs` is file concatenation — so this operator belongs to
  * the north-star extension surface.)
  */
object RangeJoin {

  /** Pairs (a, b) of rows from `df` sharing `key` with
    * |timeA - timeB| <= window, a.id < b.id. `time` and `window` must
    * share a unit (integral). */
  def bandedSelfJoin(df: DataFrame, key: String, id: String, time: String,
      window: Long): DataFrame = {
    // exact integral floor-div: (t - pmod) is an exact multiple of
    // `window`, so the double division is exact — no float-boundary
    // misbinning (floor(t/W) as double can land one bin off within an
    // ulp of a bin edge)
    val bin = (t: Column) =>
      ((t - pmod(t, lit(window))) / lit(window)).cast("long")
    val post = df.select(col(key), col(id).as("a"), col(time).as("ta"),
      bin(col(time)).as("bin"))
    val probe = df.select(col(key), col(id).as("b"), col(time).as("tb"),
      explode(array(bin(col(time)) - 1, bin(col(time)), bin(col(time)) + 1)).as("bin"))
    post.join(probe, Seq(key, "bin"))
      .filter(col("a") < col("b") && abs(col("ta") - col("tb")) <= window)
      .select(col(key), col("a"), col("b"), abs(col("ta") - col("tb")).as("dt"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "rj01_range_join",
      // Co-occurrence pairs: events of the same user within 5 minutes.
      // Oracle states the range join directly; the Spark plan is the
      // banded equi-join (recall-exact, see module doc).
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events)
             |SELECT x.user_id, CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(min(abs(x.tus - y.tus)) AS BIGINT) AS min_dt_us
             |FROM e x JOIN e y
             |  ON x.user_id = y.user_id AND x.event_id < y.event_id
             |  AND abs(x.tus - y.tus) <= 300000000
             |GROUP BY x.user_id""".stripMargin),
      (s, d) => {
        // normalized timestamp → exact epoch-micro integers (identical
        // to DuckDB's epoch_us on the same instants)
        val e = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
        bandedSelfJoin(e, key = "user_id", id = "event_id", time = "tus",
          window = 300000000L)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"), min(col("dt")).as("min_dt_us"))
      }),

    QueryDef(
      "rj02_asof_tolerance",
      // As-of join WITH max staleness (attribution windows: the click
      // must be within 1 hour before the purchase, else no match).
      // Same union + running-max single-window plan as ev06 — the
      // tolerance is a post-filter on the carried value, since any
      // older click is older still. One shuffle on user_id; nothing
      // quadratic. Oracle: DuckDB ASOF LEFT JOIN + the same staleness
      // CASE (integral microsecond arithmetic, engine-exact).
      Some("""SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
             |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
             |       THEN epoch_us(c.ts) END AS click_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin),
      (s, d) => {
        val base = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            when(col("event_type") === "click", 0).otherwise(1).as("side"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "side")
          .rowsBetween(Long.MinValue, 0)
        base
          .withColumn("last_click", max(when(col("side") === 0, col("ts_us"))).over(w))
          .filter(col("side") === 1)
          .select(col("user_id"), col("event_id"), col("ts_us").as("purchase_us"),
            when(col("ts_us") - col("last_click") <= 3600000000L, col("last_click"))
              .as("click_us"))
      }),

    QueryDef(
      "q36_fuzzy_match",
      // Fuzzy string matching (entity resolution): pairs of distinct
      // source labels within edit distance 2. The pair search is the
      // banded equi-join on LENGTH (levenshtein(a,b) <= 2 implies
      // |len(a)-len(b)| <= 2, so length-binning with ±1 probes has
      // total recall) — the same O(n·density) blocking discipline as
      // rj01, never an all-pairs cross; at larger label corpora you
      // would compound the block key with a prefix/phonetic bucket.
      // Levenshtein itself is the standard DP in both engines.
      Some("""WITH s AS (SELECT DISTINCT source FROM documents)
             |SELECT a.source AS a, b.source AS b,
             |  CAST(levenshtein(a.source, b.source) AS BIGINT) AS dist
             |FROM s a JOIN s b ON a.source < b.source
             |WHERE levenshtein(a.source, b.source) <= 2""".stripMargin),
      (s, d) => {
        val labels = docs(s, d).select(col("source")).distinct()
          .select(col("source"), lit(0L).as("blk"),
            length(col("source")).cast("long").as("len"))
        bandedSelfJoin(labels, key = "blk", id = "source", time = "len", window = 2L)
          .filter(levenshtein(col("a"), col("b")) <= 2)
          .select(col("a"), col("b"),
            levenshtein(col("a"), col("b")).cast("long").as("dist"))
      }),

    QueryDef(
      "rj03_interval_overlap",
      // Interval-OVERLAP join (rj01 joins points within a band; this
      // joins interval PAIRS that intersect): cross-user session
      // concurrency. Each session [start, end] explodes to its covered
      // 1-hour bins — overlapping intervals must share a bin, so the
      // pair search is an equi-join on bin (never a nested-loop range
      // join), the exact overlap predicate runs only inside bins, and
      // a distinct collapses pairs that share several bins. Overlap
      // durations are exact integer µs. Scale: cost is Σ bin-density²,
      // bounded by concurrency, not corpus size.
      Some("""WITH x AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT user_id, sess, min(us) AS s_us, max(us) AS e_us
             |  FROM (
             |    SELECT user_id, us,
             |      sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |    FROM x) t
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT a.user_id AS ua, a.sess AS sa,
             |    greatest(a.s_us, b.s_us) AS o_start,
             |    least(a.e_us, b.e_us) AS o_end
             |  FROM sess a JOIN sess b
             |    ON a.user_id < b.user_id
             |   AND a.s_us <= b.e_us AND b.s_us <= a.e_us)
             |SELECT CAST(count(*) AS BIGINT) AS n_overlaps,
             |  CAST(sum(o_end - o_start) AS BIGINT) AS total_overlap_us,
             |  CAST(max(o_end - o_start) AS BIGINT) AS max_overlap_us,
             |  CAST(count(DISTINCT ua) AS BIGINT) AS n_users_with_overlap
             |FROM pairs""".stripMargin),
      (s, d) => sessionOverlapStats(
        Tables.events(s, d).select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))))
  )

  /** 30-min-gap sessionization of (user_id, event_id, us) rows:
    * (user_id, sess, s_us, e_us). rj03's first stage, exposed for the
    * ScaleStressSpec closed form (session count / duration totals). */
  def sessionizeUs(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e.withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(min("us").as("s_us"), max("us").as("e_us"))
  }

  /** rj03's kernel on arbitrary (user_id, event_id, us) events:
    * sessionize, explode sessions to covered 1-hour bins (overlapping
    * intervals must share a bin, so the pair search is an equi-join on
    * bin), run the exact overlap predicate inside bins only, collapse
    * multi-bin pairs with distinct, and roll up the concurrency audit
    * row. Cost is Σ bin-density², bounded by concurrency, not corpus
    * size; ScaleStressSpec proves the kernel exact under a 10×
    * user-shifted corpus via a combinatorial closed form. */
  def sessionOverlapStats(e: DataFrame): DataFrame = {
    val H = 3600000000L
    val sess = sessionizeUs(e)
    val binned = sess.select(col("user_id"), col("sess"),
      col("s_us"), col("e_us"),
      explode(sequence(expr(s"s_us DIV $H"), expr(s"e_us DIV $H")))
        .as("bin"))
    val a = binned.select(col("bin"), col("user_id").as("ua"),
      col("sess").as("sa"), col("s_us").as("as_us"), col("e_us").as("ae_us"))
    val b = binned.select(col("bin"), col("user_id").as("ub"),
      col("sess").as("sb"), col("s_us").as("bs_us"), col("e_us").as("be_us"))
    a.join(b, Seq("bin"))
      .filter(col("ua") < col("ub") &&
        col("as_us") <= col("be_us") && col("bs_us") <= col("ae_us"))
      .select(col("ua"), col("sa"), col("ub"), col("sb"),
        greatest(col("as_us"), col("bs_us")).as("o_start"),
        least(col("ae_us"), col("be_us")).as("o_end"))
      .distinct()
      .agg(count(lit(1)).cast("long").as("n_overlaps"),
        sum(col("o_end") - col("o_start")).cast("long")
          .as("total_overlap_us"),
        max(col("o_end") - col("o_start")).cast("long")
          .as("max_overlap_us"),
        countDistinct("ua").cast("long").as("n_users_with_overlap"))
  }

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
}
