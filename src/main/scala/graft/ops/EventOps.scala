package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Event-stream style operators over the `events` table: time bucketing,
  * JSON extraction (`props` is a JSON text column), sessionization, and
  * share-of-total analytics. The reference has no streaming/event surface
  * (SURVEY §2.10 ABSENT); these are the batch shapes of the standard
  * event-pipeline queries. Timestamps never appear raw in an output —
  * they are formatted to strings (engine-portable) or reduced to epoch
  * micros (exact integers) so the DuckDB hash compare is stable.
  */
object EventOps {

  /** The `events` table with `ts` normalized to TIMESTAMP (LTZ) — see
    * [[graft.Tables.normalizeTs]] for the per-encoding rules (nanos-Long
    * legacy reader, TIMESTAMP_NTZ micros, already-LTZ). */
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** Distinct (user_id, day_idx) activity pairs — the input grain for
    * the rolling-distinct engagement metrics (ev18 WAU, ev38 MAU). */
  private def userDays(s: SparkSession, d: String) =
    ev(s, d)
      .select(col("user_id"),
        datediff(to_date(date_trunc("day", col("ts"))),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("day_idx"))
      .distinct()

  /** Exact rolling-`w`-day distinct-user count per day, WITHOUT a
    * global distinct window (which would drag the users×days pairs
    * through one task — the r4 ADVICE row-scale shape). Decomposition:
    *
    *   1. a user active on day a contributes to days [a, a+w−1]; merge
    *      each user's overlapping intervals with a PER-USER window
    *      (partitioned by user_id — scales with the user base);
    *   2. disjoint intervals become +1 at start / −1 at end+1 DELTAS,
    *      summed per day — day-grained, calendar-bounded cardinality;
    *   3. the rolling distinct count at day d is the running sum of
    *      deltas ≤ d: a single ordered pass over CALENDAR rows (the
    *      legitimately-bounded onePart category), with ud's own days
    *      injected as 0-deltas so every output day has a row.
    *
    * Returns (day_idx, `out`) for every day in the coverage span;
    * callers join to the days they report. */
  private[ops] def rollingDistinctDays(ud: org.apache.spark.sql.DataFrame, w: Int,
      out: String): org.apache.spark.sql.DataFrame = {
    val uw = Window.partitionBy("user_id").orderBy("day_idx")
    val prevEnd = max(col("day_idx") + lit(w - 1))
      .over(uw.rowsBetween(Window.unboundedPreceding, -1))
    val intervals = ud
      .withColumn("newg",
        when(prevEnd.isNull || col("day_idx") > prevEnd, 1L).otherwise(0L))
      .withColumn("g", sum(col("newg")).over(uw))
      .groupBy(col("user_id"), col("g"))
      .agg(min("day_idx").as("s"), (max("day_idx") + lit(w - 1)).as("e"))
    val deltas = intervals.select(col("s").as("day_idx"), lit(1L).as("dlt"))
      .unionAll(intervals.select((col("e") + 1).as("day_idx"), lit(-1L).as("dlt")))
      .unionAll(ud.select(col("day_idx"), lit(0L).as("dlt")))
      .groupBy("day_idx").agg(sum("dlt").as("dlt"))
    val dw = Window.partitionBy(PrefixSum.onePart(col("day_idx")))
      .orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    deltas.select(col("day_idx"), sum(col("dlt")).over(dw).cast("long").as(out))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev01_hourly_counts",
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, d) =>
        ev(s, d)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))),

    QueryDef(
      "ev02_json_extract",
      // avg_k = sum(k)/count(k): count(expr) skips nulls in both
      // engines, so rows without a "k" prop stay out of the average
      // (exact integer sum / exact count ⇒ boundary-safe rounding)
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             |        / count(json_extract_string(props, '$.k')), 4) AS avg_k
             |FROM events GROUP BY event_type""".stripMargin),
      (s, d) =>
        ev(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
            round(sum("k").cast("double") / count(col("k")), 4).as("avg_k"))),

    // map-typed JSON: parse props to map<string,bigint>, explode entries
    QueryDef(
      "ev07_map_explode",
      Some("""SELECT k, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_v
             |FROM (SELECT unnest(json_keys(props)) AS k, props FROM events) t
             |GROUP BY k""".stripMargin),
      (s, d) =>
        ev(s, d)
          .select(explode(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType))))
          .toDF("k", "v")
          .groupBy("k")
          .agg(count(lit(1)).as("n"), sum("v").cast("long").as("sum_v"))),

    QueryDef(
      "ev03_sessionize",
      Some("""WITH x AS (
             |  SELECT user_id, event_id,
             |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events)
             |SELECT user_id, count(*) AS n_events,
             |  CAST(1 + sum(new_sess) AS BIGINT) AS n_sessions
             |FROM x GROUP BY user_id""".stripMargin),
      (s, d) => {
        val w  = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val us = unix_micros(col("ts").cast("timestamp"))
        ev(s, d)
          .select(col("user_id"), col("event_id"),
            when(us - lag(us, 1).over(w) > 1800000000L, 1L).otherwise(0L).as("new_sess"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), (lit(1) + sum("new_sess")).cast("long").as("n_sessions"))
      }),

    QueryDef(
      "ev04_type_share",
      Some("""SELECT event_type, n, round(n / CAST(total AS DOUBLE), 6) AS share FROM (
             |  SELECT event_type, count(*) AS n, sum(count(*)) OVER () AS total
             |  FROM events GROUP BY event_type) t""".stripMargin),
      (s, d) =>
        ev(s, d)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("total", sum("n").over(Window.partitionBy(PrefixSum.onePart(col("event_type")))))
          .select(col("event_type"), col("n"),
            round(col("n") / col("total").cast("double"), 6).as("share"))),

    // As-of join (the canonical time-series operator Spark lacks as a
    // built-in): for each purchase, the user's most recent click at or
    // before it. Composed scalably as a union + running max over one
    // window — a single shuffle on user_id, no range-join explosion.
    // Oracle: DuckDB's native ASOF LEFT JOIN.
    QueryDef(
      "ev06_asof_join",
      Some("""SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
             |  epoch_us(c.ts) AS click_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin),
      (s, d) => {
        val base = ev(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            when(col("event_type") === "click", 0).otherwise(1).as("side"))
        // clicks (side 0) sort before purchases at equal ts, so an
        // equal-timestamp click is visible to the purchase ("at or
        // before"); running max carries the latest click time forward.
        val w = Window.partitionBy("user_id").orderBy("ts_us", "side")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base
          .withColumn("click_us", max(when(col("side") === 0, col("ts_us"))).over(w))
          .filter(col("side") === 1)
          .select(col("user_id"), col("event_id"),
            col("ts_us").as("purchase_us"), col("click_us"))
      }),

    QueryDef(
      "ev05_user_topdays",
      Some("""SELECT user_id, day, n, rn FROM (
             |  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    count(*) AS n,
             |    CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY count(*) DESC, strftime(date_trunc('day', ts), '%Y-%m-%d')) AS BIGINT) AS rn
             |  FROM events GROUP BY 1, 2) t
             |WHERE rn <= 2""".stripMargin),
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(col("user_id"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("day"))
        daily
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 2)
      }),

    QueryDef(
      "ev08_funnel",
      // Ordered conversion funnel view→click→purchase: each stage's
      // timestamp must strictly follow the previous stage's first
      // occurrence. Three equi-joins + min-aggregations (each
      // map-side-combinable); the single-row stage counts meet in
      // broadcast cross joins — no collect, no window over all events.
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
             |s1 AS (SELECT user_id, min(tus) AS t1 FROM e
             |       WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(tus) AS t2 FROM e JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND tus > t1 GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, min(tus) AS t3 FROM e JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND tus > t2 GROUP BY e.user_id)
             |SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
             |  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_view_click,
             |  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_view_click_purchase""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
        val s1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("tus").as("t1"))
        val s2 = e.join(s1, "user_id")
          .filter(col("event_type") === "click" && col("tus") > col("t1"))
          .groupBy("user_id").agg(min("tus").as("t2"))
        val s3 = e.join(s2, "user_id")
          .filter(col("event_type") === "purchase" && col("tus") > col("t2"))
          .groupBy("user_id").agg(min("tus").as("t3"))
        s1.agg(count(lit(1)).as("n_view"))
          .crossJoin(s2.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(s3.agg(count(lit(1)).as("n_view_click_purchase")))
      }),

    QueryDef(
      "ev09_retention",
      // Cohort retention (D1/D7): users bucketed by first-active day;
      // retained = active exactly cohort+1 / cohort+7 days later. Two
      // shuffles (distinct user-days, cohort min) + one equi-join;
      // date arithmetic stays integral (DATE + int), day rendered as a
      // string only at the output boundary.
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
             |  FROM events),
             |coh AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
             |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
             |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users,
             |  CAST(count(DISTINCT CASE WHEN a.day = cohort + 1
             |                           THEN a.user_id END) AS BIGINT) AS d1,
             |  CAST(count(DISTINCT CASE WHEN a.day = cohort + 7
             |                           THEN a.user_id END) AS BIGINT) AS d7
             |FROM coh c JOIN act a USING (user_id)
             |GROUP BY cohort""".stripMargin),
      (s, d) => {
        val act = ev(s, d)
          .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
          .distinct()
        val coh = act.groupBy("user_id").agg(min("day").as("cohort"))
        act.join(coh, "user_id")
          .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            countDistinct(when(col("day") === date_add(col("cohort"), 1),
              col("user_id"))).as("d1"),
            countDistinct(when(col("day") === date_add(col("cohort"), 7),
              col("user_id"))).as("d7"))
      }),

    QueryDef(
      "ev10_iqr_outliers",
      // Robust (IQR-fence) outlier detection per event type — quality
      // filtering by distribution, not fixed thresholds. Exact
      // percentiles (portable, cf. q21) feed a broadcast 5-row fence
      // join; min/max outliers are raw parquet doubles (bit-identical
      // passthrough), the count is integral. Fence arithmetic is
      // written in the same operation order on both engines.
      Some("""WITH q AS (
             |  SELECT event_type,
             |    quantile_cont(value, 0.25) AS q1,
             |    quantile_cont(value, 0.75) AS q3
             |  FROM events GROUP BY 1)
             |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers,
             |  min(e.value) AS min_out, max(e.value) AS max_out
             |FROM events e JOIN q USING (event_type)
             |WHERE e.value > q3 + 1.5 * (q3 - q1)
             |   OR e.value < q1 - 1.5 * (q3 - q1)
             |GROUP BY e.event_type""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
        val fences = e.groupBy("event_type").agg(
          percentile(col("value"), lit(0.25)).as("q1"),
          percentile(col("value"), lit(0.75)).as("q3"))
        e.join(broadcast(fences), "event_type")
          .filter(col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1")) ||
            col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_outliers"),
            min("value").as("min_out"), max("value").as("max_out"))
      }),

    QueryDef(
      "ev11_zscore_anomaly",
      // Volume-anomaly detection: per event type, flag days whose count
      // deviates >= 2 sigma from the trailing 7-day window. Mean and
      // variance are built from exact integer window sums (n, sum,
      // sum-of-squares) cast to double and combined with the SAME
      // operation order on both engines — bit-identical z, so the
      // |z| >= 2 selection and the 4dp rounding are both engine-exact.
      // One shuffle (daily rollup); the window rides the same partitioning.
      Some("""WITH dc AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |w AS (
             |  SELECT event_type, day, n,
             |    CAST(count(*) OVER tw AS DOUBLE) AS cnt,
             |    CAST(sum(n) OVER tw AS DOUBLE) AS s,
             |    CAST(sum(n * n) OVER tw AS DOUBLE) AS ss
             |  FROM dc
             |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
             |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
             |z AS (
             |  SELECT event_type, day, n,
             |    (n - s / cnt) / sqrt((ss - s * s / cnt) / (cnt - 1)) AS zv,
             |    (ss - s * s / cnt) / (cnt - 1) AS variance, cnt
             |  FROM w)
             |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
             |  CAST(n AS BIGINT) AS n, round(zv, 4) AS z
             |FROM z
             |WHERE cnt >= 7 AND variance > 0 AND abs(zv) >= 2""".stripMargin),
      (s, d) => {
        val dc = ev(s, d)
          .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        val tw = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
        val z = dc.select(col("event_type"), col("day"), col("n"),
          count(lit(1)).over(tw).cast("double").as("cnt"),
          sum("n").over(tw).cast("double").as("s"),
          sum(col("n") * col("n")).over(tw).cast("double").as("ss"))
          .withColumn("variance",
            (col("ss") - col("s") * col("s") / col("cnt")) / (col("cnt") - 1))
          .withColumn("zv",
            (col("n") - col("s") / col("cnt")) /
              sqrt((col("ss") - col("s") * col("s") / col("cnt")) / (col("cnt") - 1)))
        z.filter(col("cnt") >= 7 && col("variance") > 0 && abs(col("zv")) >= 2)
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n").cast("long").as("n"), round(col("zv"), 4).as("z"))
      }),

    QueryDef(
      "ev13_value_histogram",
      // Equi-width value histogram per event type — the distribution
      // profile a monitoring/quality pipeline keeps. Bucketing is
      // floor(value/width) clamped to [0, 19]: floor on IDENTICAL
      // parquet doubles is engine-exact, so bucket assignment is too
      // (no width_bucket, whose edge semantics differ across engines).
      // One map-side-combinable aggregation — the 100 TB shape.
      Some("""SELECT event_type,
             |  CAST(least(greatest(floor(value / 5.0), 0), 19) AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  round(sum(value), 2) AS sum_v
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, d) =>
        ev(s, d)
          .groupBy(col("event_type"),
            least(greatest(floor(col("value") / 5.0), lit(0)), lit(19))
              .cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))),

    QueryDef(
      "ev15_windowed_funnel",
      // Time-BOUNDED conversion funnel: each stage must follow the
      // previous within 24h (ev08's unbounded variant admits any later
      // event — unrealistic for attribution). Same staged min-join
      // shape, with integral microsecond window bounds; the scalar
      // stage counts meet in broadcast crosses.
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
             |s1 AS (SELECT user_id, min(tus) AS t1 FROM e
             |       WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(tus) AS t2 FROM e JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND tus > t1
             |         AND tus <= t1 + 86400000000 GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, min(tus) AS t3 FROM e JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND tus > t2
             |         AND tus <= t2 + 86400000000 GROUP BY e.user_id)
             |SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
             |  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click_24h,
             |  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_24h""".stripMargin),
      (s, d) => {
        val dayUs = 86400000000L
        val e = ev(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
        val s1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("tus").as("t1"))
        val s2 = e.join(s1, "user_id")
          .filter(col("event_type") === "click" && col("tus") > col("t1") &&
            col("tus") <= col("t1") + dayUs)
          .groupBy("user_id").agg(min("tus").as("t2"))
        val s3 = e.join(s2, "user_id")
          .filter(col("event_type") === "purchase" && col("tus") > col("t2") &&
            col("tus") <= col("t2") + dayUs)
          .groupBy("user_id").agg(min("tus").as("t3"))
        s1.agg(count(lit(1)).as("n_view"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click_24h")))
          .crossJoin(s3.agg(count(lit(1)).as("n_purchase_24h")))
      }),

    QueryDef(
      "ev16_gap_fill",
      // Calendar densification (gap fill): every day in each type's
      // [min, max] range gets a row, zero-filled where no events
      // landed — the step before any trailing-window statistic (ev11's
      // z-scores silently skip missing days without it). The calendar
      // is a per-type sequence explode (bounded by the date span, not
      // the event count) left-joined back to the daily rollup.
      Some("""WITH dc AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT event_type, min(day) AS lo, max(day) AS hi
             |      FROM dc GROUP BY 1),
             |cal AS (SELECT event_type,
             |          CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
             |            CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
             |        FROM b)
             |SELECT c.event_type, strftime(c.day, '%Y-%m-%d') AS day,
             |  CAST(coalesce(dc.n, 0) AS BIGINT) AS n
             |FROM cal c LEFT JOIN dc
             |  ON dc.event_type = c.event_type AND dc.day = c.day""".stripMargin),
      (s, d) => {
        val dc = ev(s, d)
          .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        val cal = dc.groupBy("event_type")
          .agg(min("day").as("lo"), max("day").as("hi"))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
        cal.join(dc, Seq("event_type", "day"), "left")
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            coalesce(col("n"), lit(0L)).cast("long").as("n"))
      }),

    QueryDef(
      "ev17_multi_touch",
      // Multi-touch attribution: each purchase's value splits EQUALLY
      // across the same user's clicks in the preceding hour; per user,
      // the total credited value. The pair search is a user-key
      // equi-join with an integral time-range residual (rj01's banded
      // discipline applies at scale); credit = value / n_clicks is a
      // ratio of a raw parquet double by an exact integer — identical
      // division both engines, summed then rounded at the boundary.
      Some("""WITH p AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS pus, value
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS cus
             |  FROM events WHERE event_type = 'click'),
             |pairs AS (
             |  SELECT p.user_id, p.event_id, p.value, count(*) AS n_clicks
             |  FROM p JOIN c ON p.user_id = c.user_id
             |    AND c.cus <= p.pus AND c.cus > p.pus - 3600000000
             |  GROUP BY 1, 2, 3)
             |SELECT user_id,
             |  CAST(count(*) AS BIGINT) AS n_attributed,
             |  round(sum(value), 2) AS credited_value
             |FROM pairs GROUP BY user_id""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"), col("value"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("tus").as("pus"), col("value"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("tus").as("cus"))
        p.join(c, Seq("user_id"))
          .filter(col("cus") <= col("pus") && col("cus") > col("pus") - 3600000000L)
          .groupBy("user_id", "event_id", "value")
          .agg(count(lit(1)).as("n_clicks"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_attributed"),
            round(sum("value"), 2).as("credited_value"))
      }),

    QueryDef(
      "ev18_rolling_wau",
      // Rolling 7-day distinct active users (WAU) — the engagement
      // metric every product pipeline reports. Spark has no DISTINCT
      // window aggregate, and composing one as collect_set over a
      // global RANGE frame drags the users×days pairs through a single
      // task (r4 ADVICE: row-scale, not calendar-bounded). Rewritten
      // scale-first via [[rollingDistinctDays]]: per-USER coverage
      // intervals (partitioned windows), then a +1/−1 delta prefix over
      // DAY-grained rows — only the calendar passes through one task.
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(date_trunc('day', ts) AS DATE)) AS day_idx
             |  FROM events)
             |SELECT DISTINCT CAST(day_idx AS BIGINT) AS day_idx,
             |  CAST(count(DISTINCT user_id) OVER (ORDER BY day_idx
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS wau
             |FROM ud""".stripMargin),
      (s, d) => {
        val ud = userDays(s, d)
        ud.select(col("day_idx")).distinct()
          .join(rollingDistinctDays(ud, 7, "wau"), Seq("day_idx"))
          .select(col("day_idx"), col("wau"))
      }),

    // Mergeable approx-quantile sketch (Greenwald-Khanna via
    // percentile_approx) — the single-pass, bounded-memory tier above
    // Approximate quantiles via the portable bottom-k-by-hash sample
    // (graft.functions.BottomKSample): a deterministic, mergeable O(k)
    // uniform sample per group — EXACT when the group holds < k rows
    // (every audit-SF floor), rank error ~sqrt(q(1-q)/k) (~0.5% at the
    // median for k = 10⁴) above it, and — unlike GK/t-digest summaries,
    // whose merge-order-dependent internals no external engine can
    // replay — re-derivable by any engine with md5 plus a rank window,
    // so the sketch is oracle-checked bit-for-bit (r7; the builtin
    // percentile_approx GK tier keeps its rank-error floor in
    // SKETCH_QUALITY under ev14_native_gk). The interpolation is the
    // standard pos = q·(n-1) order-statistic form, written identically
    // in both engines; sf0.1's 20k-row groups exercise the SAMPLED
    // tier under the bit-parity gate, not just the exact one.
    // Guarantee bounds (r7 advice): (1) the kernel's TreeSet collapses
    // duplicate (hv, value) pairs where the oracle's rank window keeps
    // both — md5_low60's 60-bit space makes a same-value collision a
    // birthday event at ~2^30 rows PER GROUP, so bit-parity and the
    // exact-below-k sample size are scale-bounded there (the sampled
    // tier's ~sqrt(q(1-q)/k) rank error is unaffected: dropping one of
    // two identical (hash, value) pairs perturbs ranks by ≤1);
    // (2) both tiers state the same null contract explicitly — the
    // kernel skips NULL values, the oracle filters them before ranking.
    QueryDef(
      "ev14_approx_quantiles",
      Some("""WITH h AS (
             |  SELECT event_type, value,
             |    CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM events WHERE value IS NOT NULL),
             |r AS (
             |  SELECT event_type, value,
             |    row_number() OVER (PARTITION BY event_type ORDER BY hv, value) AS rn
             |  FROM h),
             |s AS (
             |  SELECT event_type, list_sort(list(value)) AS vs
             |  FROM r WHERE rn <= 10000 GROUP BY 1),
             |p AS (
             |  SELECT event_type, vs,
             |    0.5e0 * (len(vs) - 1) AS q50, 0.95e0 * (len(vs) - 1) AS q95
             |  FROM s)
             |-- e0 literals force DOUBLE position arithmetic: a plain
             |-- 0.95 is DECIMAL in DuckDB, whose exact fraction can
             |-- differ from Spark's double product by ~1 ulp right at a
             |-- round-4 boundary (r7 review)
             |SELECT event_type,
             |  round(CASE WHEN q50 = floor(q50) THEN vs[CAST(floor(q50) AS INT) + 1]
             |        ELSE vs[CAST(floor(q50) AS INT) + 1] + (q50 - floor(q50))
             |             * (vs[CAST(floor(q50) AS INT) + 2] - vs[CAST(floor(q50) AS INT) + 1]) END, 4)
             |    + 0.0 AS p50_approx,
             |  round(CASE WHEN q95 = floor(q95) THEN vs[CAST(floor(q95) AS INT) + 1]
             |        ELSE vs[CAST(floor(q95) AS INT) + 1] + (q95 - floor(q95))
             |             * (vs[CAST(floor(q95) AS INT) + 2] - vs[CAST(floor(q95) AS INT) + 1]) END, 4)
             |    + 0.0 AS p95_approx
             |FROM p""".stripMargin),
      (s, d) => {
        def interp(q: Double) = {
          val n = size(col("vs"))
          val pos = lit(q) * (n - 1).cast("double")
          val lo = floor(pos).cast("int")
          val base = element_at(col("vs"), lo + 1)
          round(
            when(pos === floor(pos), base)
              .otherwise(base +
                (pos - floor(pos)) * (element_at(col("vs"), lo + 2) - base)),
            4) + lit(0.0)
        }
        ev(s, d)
          .groupBy("event_type")
          .agg(graft.functions.GraftFunctions.bottomk_sample(
            graft.functions.GraftFunctions.md5_low60(col("event_id").cast("string")),
            col("value"), 10000).as("vs"))
          .select(col("event_type"),
            interp(0.5).as("p50_approx"), interp(0.95).as("p95_approx"))
      }),

    QueryDef(
      "ev19_interpolate",
      // Linear interpolation of gaps in an hourly series — the
      // resampling companion to ev16's zero-fill: empty buckets get the
      // line between their non-null neighbors (edges clamp to the
      // nearest anchor). Time is integer epoch-hours (truncation IS the
      // bucketing — no date_trunc roundtrip), anchors are the ROUNDED
      // hourly sums, and the interpolation fraction is a ratio of exact
      // integers, so both engines interpolate identical doubles.
      // IGNORE NULLS last/first_value over the calendar spine finds the
      // neighbors in two windows — no self-join, no explode of gap
      // ranges; at 100 TB the spine partitions by (series, coarse
      // epoch) and only window boundaries need stitching.
      Some("""WITH h AS (
             |  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |    round(sum(value), 2) AS v
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |cal AS (SELECT unnest(generate_series(mn, mx)) AS hr
             |        FROM (SELECT min(hr) AS mn, max(hr) AS mx FROM h)),
             |j AS (SELECT c.hr, h.v FROM cal c LEFT JOIN h USING (hr)),
             |w AS (SELECT hr, v,
             |    last_value(v IGNORE NULLS) OVER (ORDER BY hr
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
             |      OVER (ORDER BY hr
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |    first_value(v IGNORE NULLS) OVER (ORDER BY hr
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
             |      OVER (ORDER BY hr
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |  FROM j)
             |SELECT hr,
             |  round(CASE WHEN v IS NOT NULL THEN v
             |    WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
             |    ELSE pv + (nv - pv) * CAST(hr - pd AS DOUBLE)
             |              / CAST(nd - pd AS DOUBLE) END, 4) AS filled,
             |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
             |FROM w""".stripMargin),
      (s, d) => {
        // normalized timestamp → exact epoch-hour integers
        val raw = Tables.events(s, d)
        val hrCol = expr("unix_micros(ts) DIV 3600000000")
        val h = raw.filter(col("event_type") === "purchase")
          .groupBy(hrCol.cast("long").as("hr"))
          .agg(round(sum("value"), 2).as("v"))
        val cal = h.agg(min("hr").as("mn"), max("hr").as("mx"))
          .select(explode(sequence(col("mn"), col("mx"))).as("hr"))
        val wAsc = Window.partitionBy(PrefixSum.onePart(col("hr")))
          .orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
        val wDesc = Window.partitionBy(PrefixSum.onePart(col("hr")))
          .orderBy("hr").rowsBetween(0, Window.unboundedFollowing)
        val hrIfV = when(col("v").isNotNull, col("hr"))
        cal.join(h, Seq("hr"), "left")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(wAsc))
          .withColumn("pd", last(hrIfV, ignoreNulls = true).over(wAsc))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(wDesc))
          .withColumn("nd", first(hrIfV, ignoreNulls = true).over(wDesc))
          .select(col("hr"),
            round(
              when(col("v").isNotNull, col("v"))
                .when(col("pv").isNull, col("nv"))
                .when(col("nv").isNull, col("pv"))
                .otherwise(col("pv") + (col("nv") - col("pv"))
                  * (col("hr") - col("pd")).cast("double")
                  / (col("nd") - col("pd")).cast("double")), 4).as("filled"),
            when(col("v").isNull, 1).otherwise(0).as("was_gap"))
      }),

    QueryDef(
      "ev20_mad_outliers",
      // Median-absolute-deviation anomaly gate — the robust companion
      // to ev10's IQR fences and ev11's z-scores: MAD ignores the very
      // outliers it hunts (mean/stddev don't). Two exact-percentile
      // passes per type (median, then median of |x-med|); both are
      // interpolated from identical parquet doubles in both engines, so
      // the 3-MAD comparison is boundary-consistent. Output is the
      // per-type audit (counts + rounded estimators), not the row dump.
      Some("""WITH m AS (
             |  SELECT event_type, quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY 1),
             |dev AS (
             |  SELECT e.event_type, e.value, m.med,
             |    abs(e.value - m.med) AS ad
             |  FROM events e JOIN m USING (event_type)),
             |md AS (
             |  SELECT event_type, quantile_cont(ad, 0.5) AS mad
             |  FROM dev GROUP BY 1)
             |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
             |  round(any_value(dev.med), 4) AS med,
             |  round(any_value(md.mad), 4) AS mad,
             |  CAST(sum(CASE WHEN dev.ad > 3 * md.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM dev JOIN md USING (event_type)
             |GROUP BY dev.event_type""".stripMargin),
      (s, d) => {
        val e = ev(s, d).select(col("event_type"), col("value"))
        val m = e.groupBy("event_type")
          .agg(percentile(col("value"), lit(0.5)).as("med"))
        val dev = e.join(broadcast(m), "event_type")
          .withColumn("ad", abs(col("value") - col("med")))
        val md = dev.groupBy("event_type")
          .agg(percentile(col("ad"), lit(0.5)).as("mad"))
        dev.join(broadcast(md), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(first(col("med")), 4).as("med"),
            round(first(col("mad")), 4).as("mad"),
            sum(when(col("ad") > lit(3) * col("mad"), 1L).otherwise(0L))
              .cast("long").as("n_outliers"))
      }),

    QueryDef(
      "ev21_interarrival",
      // Per-user inter-arrival statistics — the cadence profile behind
      // rate limiting, bot detection, and session-gap tuning. Gaps are
      // exact epoch-microsecond differences (one lag window per user);
      // min/max/count are integral, and the mean divides two exact
      // integers, so a 3dp round is portable. One window shuffle plus
      // the rollup — no self-join.
      Some("""WITH g AS (
             |  SELECT user_id,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events)
             |SELECT user_id, CAST(count(gap_us) AS BIGINT) AS n_gaps,
             |  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
             |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
             |  round(sum(gap_us) / CAST(count(gap_us) AS DOUBLE) / 1e6, 3)
             |    AS avg_gap_s
             |FROM g WHERE gap_us IS NOT NULL
             |GROUP BY user_id""".stripMargin),
      (s, d) => {
        val w  = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val us = unix_micros(col("ts").cast("timestamp"))
        ev(s, d)
          .select(col("user_id"), (us - lag(us, 1).over(w)).as("gap_us"))
          .filter(col("gap_us").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"),
            min("gap_us").cast("long").as("min_gap_us"),
            max("gap_us").cast("long").as("max_gap_us"),
            round(sum("gap_us") / count(lit(1)).cast("double") / lit(1e6), 3)
              .as("avg_gap_s"))
      }),

    QueryDef(
      "ev22_ewma",
      // Normalized EWMA (pandas adjust=true semantics) of daily volume
      // per event type with alpha = 1/2: smoothed_t =
      // sum_j(x_j * 0.5^(t-j)) / sum_j(0.5^(t-j)) over observed days
      // j <= t. The dyadic alpha makes every weight an EXACT power of
      // two, daily totals are 2dp-rounded before weighting (hash-stable
      // per ev01), and the weighted sums round at 3dp — insensitive to
      // summation order for these magnitudes. The triangular self-join
      // is per-type over ~100s of day rows (the rollup shrinks data
      // BEFORE the quadratic step — at 100 TB the join input is days,
      // not events).
      Some("""WITH dtot AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    round(sum(value), 2) AS tot
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT event_type, day, tot,
             |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
             |  FROM dtot)
             |SELECT t.event_type, strftime(t.day, '%Y-%m-%d') AS day,
             |  round(any_value(t.tot), 2) AS tot,
             |  round(sum(j.tot * pow(0.5, t.rn - j.rn))
             |      / sum(pow(0.5, t.rn - j.rn)), 3) AS ewma
             |FROM r t JOIN r j
             |  ON j.event_type = t.event_type AND j.rn <= t.rn
             |GROUP BY t.event_type, t.day""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
        val r = ev(s, d)
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("day"))
          .agg(round(sum("value"), 2).as("tot"))
          .withColumn("rn", row_number().over(w))
        val t = r.select(col("event_type"), col("day"), col("tot"), col("rn"))
        val j = r.select(col("event_type").as("event_type_j"),
          col("tot").as("tot_j"), col("rn").as("rn_j"))
        t.join(j, col("event_type_j") === col("event_type") && col("rn_j") <= col("rn"))
          .groupBy(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"))
          .agg(round(first(col("tot")), 2).as("tot"),
            round(sum(col("tot_j") * pow(lit(0.5), col("rn") - col("rn_j")))
              / sum(pow(lit(0.5), col("rn") - col("rn_j"))), 3).as("ewma"))
      }),

    QueryDef(
      "ev23_session_durations",
      // Session DURATION distribution — ev03 counts sessions; this one
      // materializes each session (gap-threshold cumulative-sum id),
      // measures its exact microsecond span, and rolls the corpus up to
      // duration percentiles and the share of single-event sessions.
      // Two window passes (lag, then running sum) reuse the same
      // (user_id; ts, event_id) sort — ONE shuffle, Catalyst collapses
      // the frames — then a global exact-percentile rollup over one row
      // per session.
      Some("""WITH x AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |sid AS (
             |  SELECT user_id, us,
             |    sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM x),
             |sess AS (
             |  SELECT user_id, sid, count(*) AS n_events,
             |    max(us) - min(us) AS dur_us
             |  FROM sid GROUP BY 1, 2)
             |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_singleton,
             |  CAST(max(dur_us) AS BIGINT) AS max_dur_us,
             |  round(quantile_cont(dur_us, 0.5), 4) AS p50_dur_us,
             |  round(quantile_cont(dur_us, 0.9), 4) AS p90_dur_us
             |FROM sess""".stripMargin),
      (s, d) => {
        val wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ws = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val us = unix_micros(col("ts").cast("timestamp"))
        ev(s, d)
          .select(col("user_id"), col("event_id"), us.as("us"),
            when(us - lag(us, 1).over(wl) > 1800000000L, 1L).otherwise(0L)
              .as("new_sess"))
          .withColumn("sid", sum("new_sess").over(ws))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("n_events"),
            (max("us") - min("us")).as("dur_us"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("long")
              .as("n_singleton"),
            max("dur_us").cast("long").as("max_dur_us"),
            round(percentile(col("dur_us"), lit(0.5)), 4).as("p50_dur_us"),
            round(percentile(col("dur_us"), lit(0.9)), 4).as("p90_dur_us"))
      }),

    QueryDef(
      "ev24_dow_hour_profile",
      // Day-of-week × hour activity heatmap — the seasonality profile
      // behind capacity planning and anomaly baselines. One hash
      // aggregation to the 7×24 grid, then two windows over the tiny
      // grid (share-of-day, peak rank). dow is ISO weekday 0=Monday
      // (Spark `weekday` ≡ DuckDB `isodow - 1`); share = exact-int /
      // exact-int so rounding is boundary-consistent.
      Some("""WITH g AS (
             |  SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
             |    CAST(hour(ts) AS BIGINT) AS hr,
             |    count(*) AS n, round(sum(value), 2) AS sum_value
             |  FROM events GROUP BY 1, 2)
             |SELECT dow, hr, n, sum_value,
             |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY dow), 4)
             |    AS day_share,
             |  CAST(row_number() OVER (PARTITION BY dow ORDER BY n DESC, hr)
             |    AS BIGINT) AS peak_rank
             |FROM g""".stripMargin),
      (s, d) => {
        val wd = Window.partitionBy("dow")
        ev(s, d)
          .groupBy(weekday(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .withColumn("day_share",
            round(col("n").cast("double") / sum("n").over(wd), 4))
          .withColumn("peak_rank",
            row_number().over(wd.orderBy(col("n").desc, col("hr"))).cast("long"))
      }),

    QueryDef(
      "ev25_cusum_drift",
      // CUSUM drift detection over the daily event rate — the
      // changepoint screen run before trusting a data feed. To keep the
      // cumulative sum exact the deviation is SCALED by the day count:
      // dev_d = n_d·D − T (pure integers — no running float error, no
      // rounding drift across engines), which is D× the usual
      // (n_d − mean). The peak |CUSUM| day marks the most likely
      // changepoint. Day rollup is one aggregation; the running sum and
      // the global peak run over one row per day.
      Some("""WITH dcnt AS (
             |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    count(*) AS n
             |  FROM events GROUP BY 1),
             |x AS (
             |  SELECT day, n, count(*) OVER () AS nd, sum(n) OVER () AS total
             |  FROM dcnt),
             |cus AS (
             |  SELECT day, n,
             |    sum(n * nd - total) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cusum_scaled
             |  FROM x)
             |SELECT day, CAST(n AS BIGINT) AS n,
             |  CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
             |  CAST(CASE WHEN abs(cusum_scaled) =
             |      max(abs(cusum_scaled)) OVER () THEN 1 ELSE 0 END AS BIGINT)
             |    AS is_peak
             |FROM cus""".stripMargin),
      (s, d) => {
        val wAll = Window.partitionBy(PrefixSum.onePart(col("day")))
        val wRun = Window.partitionBy(PrefixSum.onePart(col("day"))).orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
            .as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("nd", count(lit(1)).over(wAll))
          .withColumn("total", sum("n").over(wAll))
          .withColumn("cusum_scaled",
            sum(col("n") * col("nd") - col("total")).over(wRun))
          .select(col("day"), col("n"),
            col("cusum_scaled").cast("long").as("cusum_scaled"),
            when(abs(col("cusum_scaled")) ===
              max(abs(col("cusum_scaled"))).over(wAll), 1L).otherwise(0L)
              .cast("long").as("is_peak"))
      }),

    QueryDef(
      "ev26_markov_transitions",
      // First-order Markov transition matrix over per-user event
      // sequences — the behavioral-model summary (next-event
      // prediction, anomalous-flow detection) built from ONE lag
      // window + one aggregation. p is an exact-integer ratio computed
      // with the same IEEE division in both engines. Scale: the window
      // shuffles once on user_id; the transition matrix is |types|²
      // rows — driver-size regardless of corpus size.
      Some("""WITH seq AS (
             |  SELECT event_type AS next_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |t AS (
             |  SELECT prev_type, next_type, count(*) AS n
             |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
             |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
             |  round(CAST(n AS DOUBLE) /
             |    sum(n) OVER (PARTITION BY prev_type), 4) AS p
             |FROM t""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev(s, d)
          .select(col("event_type").as("next_type"),
            lag(col("event_type"), 1).over(w).as("prev_type"))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "next_type")
          .agg(count(lit(1)).as("n"))
          .select(col("prev_type"), col("next_type"),
            col("n").cast("long").as("n"),
            round(col("n").cast("double") /
              sum("n").over(Window.partitionBy("prev_type")), 4).as("p"))
      }),

    QueryDef(
      "ev27_session_paths",
      // Session path mining: the first three event types of every
      // 30-minute-gap session (ev03's exact session rule) concatenated
      // into a path string, then counted — the "how do journeys start"
      // rollup behind funnel design. The lag window and the running-sum
      // session id share ONE window sort; the path aggregation is a
      // sorted-struct collect (q45's total-order LISTAGG discipline).
      Some("""WITH x AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |s AS (
             |  SELECT user_id, event_type, ts, event_id,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |  FROM x),
             |r AS (
             |  SELECT user_id, sess, event_type,
             |    row_number() OVER (PARTITION BY user_id, sess
             |      ORDER BY ts, event_id) AS rn
             |  FROM s),
             |p AS (
             |  SELECT user_id, sess,
             |    string_agg(event_type, '>' ORDER BY rn) AS path
             |  FROM r WHERE rn <= 3 GROUP BY 1, 2)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
             |FROM p GROUP BY 1""".stripMargin),
      (s, d) => {
        val w  = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val us = unix_micros(col("ts").cast("timestamp"))
        ev(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
            when(us - lag(us, 1).over(w) > 1800000000L, 1L).otherwise(0L).as("new_sess"))
          .withColumn("sess",
            sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn",
            row_number().over(Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")))
          .filter(col("rn") <= 3)
          .groupBy("user_id", "sess")
          .agg(array_join(
            transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), ">").as("path"))
          .groupBy("path")
          .agg(count(lit(1)).cast("long").as("n_sessions"))
      }),

    QueryDef(
      "ev28_first_touch",
      // First-touch attribution — ev17's counterpart: each purchase's
      // full value goes to the user's EARLIEST click in the preceding
      // 24h (min over the window pairs, not an equal split). Same
      // user-key equi-join + integral time-range residual; the argmin
      // is a plain min aggregate so no window sort is added. Purchases
      // with no qualifying click stay unattributed (inner join drops
      // them) — the count makes that explicit.
      Some("""WITH p AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS pus, value
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS cus
             |  FROM events WHERE event_type = 'click'),
             |att AS (
             |  SELECT p.user_id, p.event_id, p.value, min(c.cus) AS first_cus
             |  FROM p JOIN c ON p.user_id = c.user_id
             |    AND c.cus <= p.pus AND c.cus > p.pus - 86400000000
             |  GROUP BY 1, 2, 3)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_attributed,
             |  round(sum(value), 2) AS credited_value,
             |  CAST(min(first_cus) AS BIGINT) AS earliest_touch_us
             |FROM att GROUP BY user_id""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"), col("value"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("tus").as("pus"), col("value"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("tus").as("cus"))
        p.join(c, Seq("user_id"))
          .filter(col("cus") <= col("pus") && col("cus") > col("pus") - 86400000000L)
          .groupBy("user_id", "event_id", "value")
          .agg(min("cus").as("first_cus"))
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n_attributed"),
            round(sum("value"), 2).as("credited_value"),
            min("first_cus").cast("long").as("earliest_touch_us"))
      }),

    QueryDef(
      "ev29_conversion_latency",
      // Time-to-convert distribution: each purchase's delay from the
      // same user's MOST RECENT prior view within 7 days, rolled into
      // exact-integer-µs percentiles per event count. The asof pair
      // search is the user-key equi-join + max aggregate (ev28's shape
      // pointed backwards); delays are exact integers so the
      // percentile interpolation (ev10/ev20's proven discipline) is
      // the only float step.
      Some("""WITH p AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS pus
             |  FROM events WHERE event_type = 'purchase'),
             |v AS (
             |  SELECT user_id, epoch_us(ts) AS vus
             |  FROM events WHERE event_type = 'view'),
             |pairs AS (
             |  SELECT p.user_id, p.event_id, p.pus - max(v.vus) AS delay_us
             |  FROM p JOIN v ON p.user_id = v.user_id
             |    AND v.vus <= p.pus AND v.vus > p.pus - 604800000000
             |  GROUP BY 1, 2, p.pus)
             |SELECT CAST(count(*) AS BIGINT) AS n_conversions,
             |  CAST(min(delay_us) AS BIGINT) AS min_us,
             |  round(quantile_cont(delay_us, 0.5), 4) AS p50_us,
             |  round(quantile_cont(delay_us, 0.9), 4) AS p90_us,
             |  CAST(max(delay_us) AS BIGINT) AS max_us
             |FROM pairs""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("tus").as("pus"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("tus").as("vus"))
        p.join(v, Seq("user_id"))
          .filter(col("vus") <= col("pus") && col("vus") > col("pus") - 604800000000L)
          .groupBy("user_id", "event_id", "pus")
          .agg((col("pus") - max("vus")).as("delay_us"))
          .agg(count(lit(1)).cast("long").as("n_conversions"),
            min("delay_us").cast("long").as("min_us"),
            round(percentile(col("delay_us"), lit(0.5)), 4).as("p50_us"),
            round(percentile(col("delay_us"), lit(0.9)), 4).as("p90_us"),
            max("delay_us").cast("long").as("max_us"))
      }),

    QueryDef(
      "ev30_rfm_segments",
      // RFM segmentation — recency / frequency / monetary quartiles
      // per user, the classic behavioral-cohort operator, with ntile(4)
      // semantics (total-order tie-break on user_id) reproduced WITHOUT
      // ntile's single-partition window: the three quartile boundary
      // KEYS (value, user_id) at ntile's exact cutoff ranks come from
      // the bracket-refine order-statistic selector
      // ([[GridQuantile.rankKeys]] — q49's machinery), and each user's
      // bucket is then a map-side comparison against 3 literal keys.
      // The rollup is ONE hash aggregation over the events scan; the
      // selector passes run over |users| rollup rows, not |events|, and
      // nothing row-scale funnels through one task at 100 TB.
      Some("""WITH u AS (
             |  SELECT user_id, max(epoch_us(ts)) AS last_us,
             |    count(*) AS freq, round(sum(value), 2) AS money
             |  FROM events GROUP BY user_id),
             |q AS (
             |  SELECT user_id,
             |    ntile(4) OVER (ORDER BY last_us, user_id) AS r_q,
             |    ntile(4) OVER (ORDER BY freq, user_id) AS f_q,
             |    ntile(4) OVER (ORDER BY money, user_id) AS m_q
             |  FROM u)
             |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
             |  CAST(m_q AS BIGINT) AS m_q,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(user_id) AS BIGINT) AS id_sum
             |FROM q GROUP BY 1, 2, 3""".stripMargin),
      (s, d) => {
        val u = Pin.once( // 3 selector passes + assignment reuse it
          ev(s, d)
            .groupBy("user_id")
            .agg(max(unix_micros(col("ts"))).as("last_us"),
              count(lit(1)).as("freq"),
              round(sum("value"), 2).as("money")))
        // fused count+bracket selector per metric (ntile(4) cutoff keys)
        // reduceOption: zero cutoff keys (empty input) degrades to a
        // constant bucket over an empty frame instead of throwing
        def quartile(valueCol: String): Column =
          GridQuantile.ntileCutKeys(u, valueCol, "user_id", 4)._2
            .map { case (kv, kt) =>
              val v = col(valueCol).cast("double")
              when(v > kv || (v === kv && col("user_id") > kt), 1L).otherwise(0L)
            }.reduceOption(_ + _).getOrElse(lit(0L)) + 1L
        u.select(col("user_id"), quartile("last_us").as("r_q"),
            quartile("freq").as("f_q"), quartile("money").as("m_q"))
          .groupBy("r_q", "f_q", "m_q")
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum("user_id").cast("long").as("id_sum"))
      }),

    QueryDef(
      "ev31_pareto_concentration",
      // Activity concentration (Pareto/80-20 audit): what share of all
      // events do the top-20% most active users generate? Exact
      // integer arithmetic throughout — the user count, the ceil(0.2n)
      // cutoff, both event sums — with ONE final division. Membership
      // in the top 20% is decided WITHOUT a global rank window: the
      // exact order-statistic key at the cutoff rank comes from the
      // bracket-refine selector ([[GridQuantile.rankKeys]], ev30's
      // machinery, on the negated count so DESC becomes ASC), and each
      // user then compares against 3 literals map-side; ties break on
      // user_id so cutoff membership is deterministic.
      Some("""WITH u AS (
             |  SELECT user_id, count(*) AS n_ev FROM events GROUP BY user_id),
             |r AS (
             |  SELECT user_id, n_ev,
             |    row_number() OVER (ORDER BY n_ev DESC, user_id) AS rk,
             |    count(*) OVER () AS n_users,
             |    sum(n_ev) OVER () AS total_ev
             |  FROM u)
             |SELECT CAST(max(n_users) AS BIGINT) AS n_users,
             |  CAST(max(total_ev) AS BIGINT) AS total_events,
             |  CAST((max(n_users) + 4) // 5 AS BIGINT) AS n_top,
             |  CAST(sum(CASE WHEN 5 * rk <= max_nu + 4 THEN n_ev ELSE 0 END)
             |    AS BIGINT) AS top_events,
             |  round(CAST(sum(CASE WHEN 5 * rk <= max_nu + 4 THEN n_ev ELSE 0 END)
             |    AS DOUBLE) / max(total_ev), 4) AS top_share
             |FROM (SELECT *, n_users AS max_nu FROM r) t""".stripMargin),
      (s, d) => {
        val u = Pin.once( // stats + selector + final reuse it
          ev(s, d).groupBy("user_id").agg(count(lit(1)).as("n_ev"))
            .withColumn("neg", -col("n_ev")))
        val stats = u.agg(count(lit(1)), sum("n_ev")).head()
        val n = stats.getLong(0)
        // empty input: the selector has no rank to pick and sum() is
        // null — short-circuit to the (lazily) empty result frame
        if (n == 0)
          u.filter(lit(false)).select(
            lit(0L).as("n_users"), lit(0L).as("total_events"),
            lit(0L).as("n_top"), lit(0L).as("top_events"),
            lit(0.0).as("top_share"))
        else {
          val totalEv = stats.getLong(1)
          val nTop = (n + 4) / 5
          // key at rank nTop of the (n_ev DESC, user_id) total order;
          // top-20% membership = key <= cutoff in (neg, user_id) ASC
          val (kv, kt) = GridQuantile.rankKeys(u, "neg", "user_id", Seq(nTop), n).head
          val v = col("neg").cast("double")
          val member = v < kv || (v === kv && col("user_id") <= kt)
          val topEv = sum(when(member, col("n_ev")).otherwise(0L))
          u.agg(
            lit(n).cast("long").as("n_users"),
            lit(totalEv).cast("long").as("total_events"),
            lit(nTop).cast("long").as("n_top"),
            topEv.cast("long").as("top_events"),
            round(topEv.cast("double") / lit(totalEv), 4).as("top_share"))
        }
      }),

    QueryDef(
      "ev32_cohort_matrix",
      // The full weekly cohort-retention TRIANGLE (ev09 reports only
      // D1/D7): users grouped by first-active week, each later week's
      // active share of the cohort. Weeks are integral epoch-day // 7
      // indices — no engine week-truncation semantics involved.
      // Shape: one rollup to distinct (user, week), a min-aggregate
      // for the cohort key, a broadcast-size cohort census, and the
      // triangle itself is |weeks|² rows.
      Some("""WITH e AS (
             |  SELECT DISTINCT user_id,
             |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
             |  FROM events),
             |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
             |sz AS (SELECT cohort_wk, count(*) AS cohort_n FROM c GROUP BY 1),
             |a AS (SELECT e.user_id, cohort_wk, wk - cohort_wk AS offs
             |      FROM e JOIN c USING (user_id))
             |SELECT CAST(a.cohort_wk AS BIGINT) AS cohort_wk,
             |  CAST(offs AS BIGINT) AS week_offset,
             |  CAST(count(*) AS BIGINT) AS n_active,
             |  CAST(max(cohort_n) AS BIGINT) AS cohort_size,
             |  round(CAST(count(*) AS DOUBLE) / max(cohort_n), 4) AS retention
             |FROM a JOIN sz USING (cohort_wk)
             |GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val e = ev(s, d)
          .select(col("user_id"),
            expr("CAST(datediff(to_date(ts), DATE '1970-01-01') DIV 7 AS INT)")
              .as("wk"))
          .distinct()
        val c = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        val sz = c.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_n"))
        e.join(c, "user_id")
          .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offs"))
          .join(broadcast(sz), "cohort_wk")
          .groupBy(col("cohort_wk").cast("long").as("cohort_wk"),
            col("offs").cast("long").as("week_offset"))
          .agg(count(lit(1)).cast("long").as("n_active"),
            max("cohort_n").cast("long").as("cohort_size"),
            round(count(lit(1)).cast("double") / max("cohort_n"), 4)
              .as("retention"))
      }),

    QueryDef(
      "ev33_seasonal_anomaly",
      // Seasonality-ADJUSTED anomaly detection: each (date, hour) cell
      // compares against the mean of its own (dow, hour) baseline
      // (ev24's grid across weeks) instead of a global mean — the flag
      // that survives "Mondays are always busy". The gate is integral
      // (n·cell_days > 2·cell_total ⟺ n > 2·mean) so no float
      // boundary exists anywhere. One rollup to date×hour, one window
      // over the tiny grid.
      Some("""WITH g AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(isodow(ts) - 1 AS BIGINT) AS dow,
             |    CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
             |  FROM events GROUP BY 1, 2, 3),
             |w AS (
             |  SELECT day, dow, hr, n,
             |    sum(n) OVER (PARTITION BY dow, hr) AS cell_total,
             |    count(*) OVER (PARTITION BY dow, hr) AS cell_days
             |  FROM g)
             |SELECT strftime(day, '%Y-%m-%d') AS day, hr,
             |  CAST(n AS BIGINT) AS n,
             |  CAST(cell_total AS BIGINT) AS cell_total,
             |  CAST(cell_days AS BIGINT) AS cell_days,
             |  CAST(CASE WHEN n * cell_days > 2 * cell_total
             |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
             |FROM w""".stripMargin),
      (s, d) => {
        val wc = Window.partitionBy("dow", "hr")
        ev(s, d)
          .groupBy(to_date(col("ts")).as("day"),
            weekday(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .agg(count(lit(1)).as("n"))
          .withColumn("cell_total", sum("n").over(wc))
          .withColumn("cell_days", count(lit(1)).over(wc))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("hr"), col("n").cast("long").as("n"),
            col("cell_total").cast("long").as("cell_total"),
            col("cell_days").cast("long").as("cell_days"),
            when(col("n") * col("cell_days") > lit(2) * col("cell_total"), 1L)
              .otherwise(0L).cast("long").as("is_anomaly"))
      }),

    QueryDef(
      "ev35_activity_streaks",
      // Longest consecutive-day streak per user — the gaps-and-islands
      // pattern (engagement/retention's favorite metric): island id =
      // day index minus per-user day rank, a pure-integer invariant
      // that is constant exactly across consecutive runs. One distinct
      // rollup + one window + two tiny aggregations; everything
      // integral.
      Some("""WITH d AS (
             |  SELECT DISTINCT user_id,
             |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di
             |  FROM events),
             |g AS (
             |  SELECT user_id, di,
             |    di - row_number() OVER (PARTITION BY user_id ORDER BY di)
             |      AS island
             |  FROM d),
             |st AS (
             |  SELECT user_id, island, count(*) AS len
             |  FROM g GROUP BY 1, 2)
             |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
             |  CAST(count(*) AS BIGINT) AS n_streaks,
             |  CAST(sum(len) AS BIGINT) AS active_days
             |FROM st GROUP BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("di")
        ev(s, d)
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01")))
              .cast("long").as("di"))
          .distinct()
          .withColumn("island", col("di") - row_number().over(w))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").cast("long").as("max_streak"),
            count(lit(1)).cast("long").as("n_streaks"),
            sum("len").cast("long").as("active_days"))
      }),

    QueryDef(
      "ev36_seasonal_backtest",
      // Backtesting the seasonal-naive forecaster (each hour predicted
      // by the mean of its OTHER (dow, hour) siblings — leave-one-out,
      // so the evaluation never sees its own target). The error is
      // kept INTEGRAL by scaling: |n·(days−1) − (total−n)| is
      // (days−1)·|n − LOO-mean|, summed per cell and normalized once
      // at the end. Cells with a single day have no LOO baseline and
      // are excluded by the days >= 2 gate. This is the sanity check
      // run before trusting ev33's anomaly flags.
      Some("""WITH g AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(isodow(ts) - 1 AS BIGINT) AS dow,
             |    CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
             |  FROM events GROUP BY 1, 2, 3),
             |w AS (
             |  SELECT dow, hr, n,
             |    sum(n) OVER (PARTITION BY dow, hr) AS total,
             |    count(*) OVER (PARTITION BY dow, hr) AS days
             |  FROM g)
             |SELECT dow, hr, CAST(max(days) AS BIGINT) AS days,
             |  CAST(sum(abs(n * (days - 1) - (total - n))) AS BIGINT)
             |    AS scaled_abs_err,
             |  round(CAST(sum(abs(n * (days - 1) - (total - n))) AS DOUBLE)
             |    / (max(days) * (max(days) - 1)), 4) AS mae
             |FROM w WHERE days >= 2 GROUP BY dow, hr""".stripMargin),
      (s, d) => {
        val wc = Window.partitionBy("dow", "hr")
        ev(s, d)
          .groupBy(to_date(col("ts")).as("day"),
            weekday(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .agg(count(lit(1)).as("n"))
          .withColumn("total", sum("n").over(wc))
          .withColumn("days", count(lit(1)).over(wc))
          .filter(col("days") >= 2)
          .groupBy("dow", "hr")
          .agg(max("days").cast("long").as("days"),
            sum(abs(col("n") * (col("days") - 1) - (col("total") - col("n"))))
              .cast("long").as("scaled_abs_err"),
            round(sum(abs(col("n") * (col("days") - 1) - (col("total") - col("n"))))
              .cast("double") /
              (max("days") * (max("days") - 1)), 4).as("mae"))
      }),

    QueryDef(
      "ev37_bot_screen",
      // Automation/bot screening — the traffic-quality gate a training
      // pipeline runs before trusting behavioral data: per user, the
      // sustained rate (events/hour over the active span) and the
      // fastest inter-arrival gap, with INTEGRAL flag gates
      // (n·3600e6 > 100·span ⟺ rate > 100/h; min_gap < 1e6 ⟺
      // sub-second bursts). One lag window (shared sort with the span
      // aggregate) + one rollup; flags avoid float boundaries
      // entirely.
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) AS us,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |  FROM events),
             |u AS (
             |  SELECT user_id, count(*) AS n_events,
             |    max(us) - min(us) AS span_us, min(gap) AS min_gap_us
             |  FROM g GROUP BY user_id)
             |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
             |  CAST(span_us AS BIGINT) AS span_us,
             |  CAST(min_gap_us AS BIGINT) AS min_gap_us,
             |  CAST(CASE WHEN n_events >= 50 AND span_us > 0
             |    AND n_events * 3600000000 > 100 * span_us
             |    THEN 1 ELSE 0 END AS BIGINT) AS high_rate,
             |  CAST(CASE WHEN min_gap_us IS NOT NULL AND min_gap_us < 1000000
             |    THEN 1 ELSE 0 END AS BIGINT) AS has_burst
             |FROM u""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val us = unix_micros(col("ts"))
        ev(s, d)
          .select(col("user_id"), us.as("us"),
            (us - lag(us, 1).over(w)).as("gap"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            (max("us") - min("us")).as("span_us"),
            min("gap").as("min_gap_us"))
          .select(col("user_id"), col("n_events").cast("long").as("n_events"),
            col("span_us").cast("long").as("span_us"),
            col("min_gap_us").cast("long").as("min_gap_us"),
            when(col("n_events") >= 50 && col("span_us") > 0 &&
              col("n_events") * 3600000000L > lit(100L) * col("span_us"), 1L)
              .otherwise(0L).cast("long").as("high_rate"),
            when(col("min_gap_us").isNotNull && col("min_gap_us") < 1000000L, 1L)
              .otherwise(0L).cast("long").as("has_burst"))
      }),

    QueryDef(
      "ev38_stickiness",
      // DAU/MAU stickiness — the canonical engagement ratio: each
      // day's distinct actives over the trailing-30-day distinct
      // actives. DAU is a plain per-day count over the distinct pairs;
      // MAU reuses ev18's per-user interval-coverage decomposition
      // ([[rollingDistinctDays]]) so nothing row-scale crosses a
      // single task. Exact integers until the final ratio.
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(date_trunc('day', ts) AS DATE)) AS day_idx
             |  FROM events)
             |SELECT DISTINCT CAST(day_idx AS BIGINT) AS day_idx,
             |  CAST(count(DISTINCT user_id) OVER (ORDER BY day_idx
             |    RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS BIGINT) AS dau,
             |  CAST(count(DISTINCT user_id) OVER (ORDER BY day_idx
             |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS mau,
             |  round(CAST(count(DISTINCT user_id) OVER (ORDER BY day_idx
             |      RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS DOUBLE) /
             |    count(DISTINCT user_id) OVER (ORDER BY day_idx
             |      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 4) AS stickiness
             |FROM ud""".stripMargin),
      (s, d) => {
        val ud = userDays(s, d)
        // DAU is a plain per-day distinct count (ud is already distinct
        // pairs); MAU rides the same per-user coverage machinery as
        // ev18 with a 30-day horizon.
        val dau = ud.groupBy("day_idx").agg(count(lit(1)).cast("long").as("dau"))
        dau.join(rollingDistinctDays(ud, 30, "mau"), Seq("day_idx"))
          .select(col("day_idx"), col("dau"), col("mau"),
            round(col("dau").cast("double") / col("mau"), 4).as("stickiness"))
      }),

    QueryDef(
      "ev39_alert_episodes",
      // Alert debouncing: consecutive anomalous hours collapse into
      // EPISODES (ev33's integral anomaly gate feeding ev35's
      // gaps-and-islands invariant on the hour index) — what an
      // on-call pipeline pages on: one alert per episode with start,
      // duration, and peak, not one page per hour. Everything
      // integral.
      Some("""WITH g AS (
             |  SELECT date_trunc('hour', ts) AS h, count(*) AS n
             |  FROM events GROUP BY 1),
             |w AS (
             |  SELECT h, n,
             |    epoch_us(h) // 3600000000 AS hi,
             |    sum(n) OVER () AS total, count(*) OVER () AS cells
             |  FROM g),
             |a AS (
             |  SELECT hi, n FROM w WHERE n * cells > 2 * total),
             |i AS (
             |  SELECT hi, n,
             |    hi - row_number() OVER (ORDER BY hi) AS island
             |  FROM a)
             |SELECT CAST(min(hi) AS BIGINT) AS start_hour_idx,
             |  CAST(count(*) AS BIGINT) AS n_hours,
             |  CAST(max(n) AS BIGINT) AS peak_events,
             |  CAST(sum(n) AS BIGINT) AS total_events
             |FROM i GROUP BY island""".stripMargin),
      (s, d) => {
        // keyed on the pre-aggregation column: `hi` is a lateral alias
        // in the same select and may not appear in its own window spec
        val wAll = Window.partitionBy(PrefixSum.onePart(col("n")))
        ev(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
          .select(expr("unix_micros(h) DIV 3600000000").as("hi"), col("n"),
            sum("n").over(wAll).as("total"),
            count(lit(1)).over(wAll).as("cells"))
          .filter(col("n") * col("cells") > lit(2) * col("total"))
          .withColumn("island",
            col("hi") - row_number().over(
              Window.partitionBy(PrefixSum.onePart(col("hi"))).orderBy("hi")))
          .groupBy("island")
          .agg(min("hi").cast("long").as("start_hour_idx"),
            count(lit(1)).cast("long").as("n_hours"),
            max("n").cast("long").as("peak_events"),
            sum("n").cast("long").as("total_events"))
          .drop("island")
      }),

    QueryDef(
      "ev40_trend_slope",
      // Per-type volume TREND: ordinary-least-squares slope of daily
      // event counts against the epoch-day index — the "is this
      // metric growing or decaying, and how fast" estimator behind
      // capacity planning and drift alerts. The closed form
      // slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) keeps EVERY term an
      // exact BIGINT (x = epoch day, y = count); both engines perform
      // ONE identical double division at the end — no float
      // accumulation anywhere, so the hash match is order-independent.
      // Two tiny shuffles (day rollup, per-type fold); map-side
      // combinable at any scale.
      Some("""WITH dd AS (
             |  SELECT event_type,
             |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             |    count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |s AS (
             |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * y) AS sxy, sum(x * x) AS sxx
             |  FROM dd GROUP BY 1)
             |SELECT event_type, CAST(n AS BIGINT) AS n_days,
             |  CAST(sy AS BIGINT) AS total_events,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE)
             |        / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0 AS slope
             |FROM s WHERE n * sxx - sx * sx <> 0""".stripMargin),
      (s, d) =>
        ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("x"))
          .agg(count(lit(1)).as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .filter(col("n") * col("sxx") - col("sx") * col("sx") =!= 0)
          .select(col("event_type"), col("n").cast("long").as("n_days"),
            col("sy").cast("long").as("total_events"),
            // + 0.0 normalizes a -0.0 slope (flat-trend boundary; the
            // driver hash is bit-level — r6 negative-near-zero audit)
            (round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
              6) + lit(0.0)).as("slope"))),

    QueryDef(
      "ev41_user_ccdf",
      // Heavy-tail audit: the CCDF of per-user activity — what share
      // of users exceed each activity threshold. This is the curve
      // that decides salting/skew strategy (q48's diagnostic as a
      // distribution) and per-user fairness caps. One user rollup,
      // then a single-row aggregate of 7 conditional counts unpivoted
      // with stack() — no cross join, no second pass; shares are
      // ratios of exact integers. At 100 TB: one map-combinable
      // shuffle on user_id, then driver-sized rows.
      Some("""WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
             |s AS (SELECT count(*) AS nu,
             |  sum(CASE WHEN n >= 1 THEN 1 ELSE 0 END) AS c1,
             |  sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS c2,
             |  sum(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS c5,
             |  sum(CASE WHEN n >= 10 THEN 1 ELSE 0 END) AS c10,
             |  sum(CASE WHEN n >= 20 THEN 1 ELSE 0 END) AS c20,
             |  sum(CASE WHEN n >= 50 THEN 1 ELSE 0 END) AS c50,
             |  sum(CASE WHEN n >= 100 THEN 1 ELSE 0 END) AS c100
             |  FROM u)
             |SELECT CAST(1 AS BIGINT) AS threshold, CAST(c1 AS BIGINT) AS n_users_ge,
             |  round(CAST(c1 AS DOUBLE) / nu, 4) AS share FROM s
             |UNION ALL SELECT 2, CAST(c2 AS BIGINT), round(CAST(c2 AS DOUBLE) / nu, 4) FROM s
             |UNION ALL SELECT 5, CAST(c5 AS BIGINT), round(CAST(c5 AS DOUBLE) / nu, 4) FROM s
             |UNION ALL SELECT 10, CAST(c10 AS BIGINT), round(CAST(c10 AS DOUBLE) / nu, 4) FROM s
             |UNION ALL SELECT 20, CAST(c20 AS BIGINT), round(CAST(c20 AS DOUBLE) / nu, 4) FROM s
             |UNION ALL SELECT 50, CAST(c50 AS BIGINT), round(CAST(c50 AS DOUBLE) / nu, 4) FROM s
             |UNION ALL SELECT 100, CAST(c100 AS BIGINT), round(CAST(c100 AS DOUBLE) / nu, 4) FROM s""".stripMargin),
      (s, d) => {
        val thresholds = Seq(1, 2, 5, 10, 20, 50, 100)
        val u = ev(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
        val aggs = count(lit(1)).as("nu") +:
          thresholds.map(t => sum(when(col("n") >= t, 1L).otherwise(0L)).as(s"c$t"))
        val one = u.agg(aggs.head, aggs.tail: _*)
        val stackArgs = thresholds
          .map(t => s"CAST($t AS BIGINT), c$t, round(CAST(c$t AS DOUBLE) / nu, 4)")
          .mkString(", ")
        one.selectExpr(
          s"stack(${thresholds.size}, $stackArgs) AS (threshold, n_users_ge, share)")
          .select(col("threshold"), col("n_users_ge").cast("long").as("n_users_ge"),
            col("share"))
      }),

    QueryDef(
      "ev42_session_histogram",
      // Engagement-depth distribution: ev03's sessions bucketed by
      // events-per-session ('1','2','3-5','6-10','11+') with each
      // bucket's share of all sessions. The session id is the running
      // sum of ev03's gap flags (same single user_id shuffle — the lag
      // and the cumsum share one window ordering), the per-session
      // rollup is map-side-combinable on (user, sess), and the
      // histogram is a 5-row aggregate. Shares are ratios of exact
      // integers. This is the curve that tells a pipeline whether
      // "session" is even a meaningful unit before sessionized
      // features are built at 100 TB.
      Some("""WITH x AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |s AS (SELECT user_id, sum(new_sess) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS UNBOUNDED PRECEDING) AS sess_id FROM x),
             |g AS (SELECT user_id, sess_id, count(*) AS n FROM s GROUP BY 1, 2),
             |t AS (SELECT count(*) AS ns FROM g),
             |b AS (SELECT CASE WHEN n = 1 THEN '1' WHEN n = 2 THEN '2'
             |        WHEN n <= 5 THEN '3-5' WHEN n <= 10 THEN '6-10'
             |        ELSE '11+' END AS bucket FROM g)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions,
             |  round(CAST(count(*) AS DOUBLE) / ns, 4) AS share
             |FROM b, t GROUP BY bucket, ns""".stripMargin),
      (s, d) => {
        val w  = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val us = unix_micros(col("ts").cast("timestamp"))
        val sess = ev(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            when(us - lag(us, 1).over(w) > 1800000000L, 1L).otherwise(0L).as("new_sess"))
          .withColumn("sess_id",
            sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sess_id").agg(count(lit(1)).as("n"))
        val tot = sess.agg(count(lit(1)).as("ns"))
        sess
          .select(when(col("n") === 1, "1").when(col("n") === 2, "2")
            .when(col("n") <= 5, "3-5").when(col("n") <= 10, "6-10")
            .otherwise("11+").as("bucket"))
          .crossJoin(broadcast(tot))
          .groupBy("bucket", "ns")
          .agg(count(lit(1)).cast("long").as("n_sessions"),
            round(count(lit(1)).cast("double") / col("ns"), 4).as("share"))
          .select(col("bucket"), col("n_sessions"), col("share"))
      }),

    QueryDef(
      "ev43_time_weighted_avg",
      // Time-weighted average value per user (TWAP): each event's value
      // holds until the user's next event, so the mean weights values
      // by their HOLDING TIME, not their count — the correct "average
      // level" for irregular series (prices, gauge metrics, queue
      // depths), where a per-event avg over-weights bursts. Exactness
      // discipline: values quantize to integer cents via round(v*100)
      // (both engines round the IDENTICAL double away from zero), gaps
      // are exact epoch-µs leads, and the value·time integral sums as
      // DECIMAL(38,0) — worst-case products overflow int64, and a
      // 100 TB rollup can't accept either overflow or float
      // order-dependence. One division at the very end; one window
      // shuffle (lead) + the rollup.
      Some("""WITH o AS (
             |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vq,
             |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      - epoch_us(ts) AS dt_us
             |  FROM events)
             |SELECT user_id, CAST(sum(dt_us) AS BIGINT) AS span_us,
             |  round(CAST(sum(CAST(vq AS DECIMAL(38,0)) * dt_us) AS DOUBLE)
             |    / (100.0 * sum(dt_us)), 4) AS twap
             |FROM o WHERE dt_us IS NOT NULL
             |GROUP BY user_id HAVING sum(dt_us) > 0""".stripMargin),
      (s, d) => {
        val w  = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val us = unix_micros(col("ts").cast("timestamp"))
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        ev(s, d)
          .select(col("user_id"),
            round(col("value") * 100).cast("long").as("vq"),
            (lead(us, 1).over(w) - us).as("dt_us"))
          .filter(col("dt_us").isNotNull)
          .groupBy("user_id")
          .agg(sum("dt_us").cast("long").as("span_us"),
            round(sum(col("vq").cast(dec) * col("dt_us")).cast("double")
              / (lit(100.0) * sum("dt_us")), 4).as("twap"))
          .filter(col("span_us") > 0)
      }),

    QueryDef(
      "ev44_bitmap_distinct",
      // EXACT count-distinct as a two-level bitmap rollup (Spark 3.5+
      // bitmap_* surface): ids land in 32768-bit buckets
      // (bitmap_bucket_number / bitmap_bit_position), each
      // (type, bucket) group ORs its positions into one 4 KB bitmap,
      // and the per-type distinct count is the sum of per-bucket
      // popcounts. Unlike count(DISTINCT) — whose final merge must see
      // every distinct VALUE on one task — the second stage ships only
      // fixed-size bitmaps (≤1 per occupied bucket), so the reduce
      // side is O(id-range/32768 · 4 KB) regardless of row count, and
      // bitmaps are the natural precomputable/mergeable distinct
      // sketch for a 100 TB cube (exact, unlike HLL q18). The oracle
      // is DuckDB's native count(DISTINCT).
      Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY event_type""".stripMargin),
      (s, d) =>
        ev(s, d)
          .groupBy(col("event_type"),
            expr("bitmap_bucket_number(user_id)").as("bkt"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
          .groupBy("event_type")
          .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_users"))),

    QueryDef(
      "ev45_scd2_intervals",
      // SCD Type-2 dimension build: compress each user's event-type
      // change log into validity intervals [valid_from, valid_to) —
      // the standard warehouse shape for "what was the user's state at
      // time T" joins (the as-of join ev06 consumes exactly this).
      // Consecutive same-type events collapse; an interval closes when
      // the next CHANGE row begins; the open current interval carries
      // the -1 sentinel (NULL would be engine-portable but not
      // hash-stable across sort orders). Two window passes over one
      // hash-partition by user — no second shuffle, both windows share
      // the (user_id § us, event_id) sort. Exact integers end to end.
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
             |  FROM events),
             |c AS (
             |  SELECT user_id, event_type, us, event_id,
             |    lag(event_type) OVER (
             |      PARTITION BY user_id ORDER BY us, event_id) AS prev
             |  FROM e),
             |ch AS (
             |  SELECT user_id, event_type, us, event_id FROM c
             |  WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type, CAST(us AS BIGINT) AS valid_from_us,
             |  CAST(coalesce(lead(us) OVER (
             |    PARTITION BY user_id ORDER BY us, event_id), -1) AS BIGINT)
             |    AS valid_to_us
             |FROM ch""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        ev(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .select(col("user_id"), col("event_type"),
            col("us").cast("long").as("valid_from_us"),
            coalesce(lead("us", 1).over(w), lit(-1L)).cast("long")
              .as("valid_to_us"))
      })
  )
}
