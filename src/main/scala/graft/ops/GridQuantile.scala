package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated per-group quantiles via BRACKET-AND-REFINE — the
  * scale path for `percentile` over high-cardinality numerics.
  *
  * Why not the built-in exact `percentile`: its aggregation buffer
  * holds EVERY input value — O(rows-per-group) heap on the map side
  * and all raw values serialized through the exchange; with few groups
  * a 100 TB column lands one group's worth of doubles on one reducer.
  *
  * Plan (2 scans, all aggregates map-combinable, shuffles of
  * O(groups·accuracy) rows only):
  *   1. per group: exact n + `approx_percentile` at q ± 4/accuracy —
  *      the GK sketch guarantees rank error ≤ n/accuracy, so the two
  *      probes bracket BOTH ranks the interpolation needs with margin.
  *   2. per group: exact count below the bracket lo (rebases ranks)
  *      and `collect_list` of only the ≈ 8n/accuracy in-bracket
  *      values; sort that small array and index the exact rank values
  *      out of it.
  * The refined values are EXACT parquet doubles and the bracket is
  * correct by the sketch's deterministic error bound, so results are
  * identical to the built-in `percentile` run-to-run.
  *
  * Parity: reproduces `Percentile.getPercentile` arithmetic exactly —
  * position p = (n-1)·q; lower = floor(p), higher = ceil(p) (longs);
  * result = lowerVal when higher == lower else
  * (higher−p)·lowerVal + (p−lower)·higherVal, left-to-right in
  * doubles — the arithmetic DuckDB `quantile_cont` hash-parity was
  * established against (ev10/ev20 pattern). Nulls are skipped, as
  * `percentile` skips them.
  *
  * Sizing at scale: in-bracket survivors ≈ 8n/accuracy rows per group
  * ride a `collect_list`, so pick accuracy ≈ n / 10⁴ (e.g. 10⁶ for
  * 10¹⁰ rows/group ⇒ ~10⁵-element arrays); GK sketch memory grows
  * ~O(accuracy·log n) on the map side, which is the explicit trade
  * against survivor volume.
  */
object GridQuantile {

  /** One row per group: `groupCols` ++ one double column per entry of
    * `qs` (output name → quantile in [0, 1]). Null values are ignored;
    * all-null/empty groups do not appear (as with groupBy+percentile).
    */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)],
      accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "use a literal group for global quantiles")
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 })
    val g = groupCols.map(col)
    val margin = 4.0 / accuracy
    val src = df.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)

    // pass 1: exact n + sketch brackets [bl, bh] per quantile
    val probes = qs.flatMap { case (_, q) =>
      Seq(math.max(0.0, q - margin), math.min(1.0, q + margin))
    }
    val brackets = src.groupBy(g: _*).agg(
      count(lit(1)).as("__n"),
      approx_percentile(col("__v"),
        array(probes.map(lit): _*), lit(accuracy)).as("__bk"))

    // Bracket coverage is provable only when the ±4/accuracy quantile
    // margin is ≥ ~2 RANKS past the sketch's ±n/accuracy rank error:
    // ε(3n−4) ≥ 2, i.e. n ≥ (2·accuracy+4)/3. Below that a group's
    // whole value set is itself bounded by ~⅔·accuracy values, so
    // collecting it all is the same O(accuracy) cost as a bracket.
    val smallN = col("__n") < lit(2L * accuracy / 3 + 2)

    // pass 2: rank rebase + tiny in-bracket survivor arrays, one agg
    val refined = src.join(broadcast(brackets), groupCols)
    val perQ = qs.zipWithIndex.flatMap { case ((name, _), i) =>
      val bl = element_at(col("__bk"), 2 * i + 1)
      val bh = element_at(col("__bk"), 2 * i + 2)
      Seq(
        sum(when(!smallN && col("__v") < bl, 1L).otherwise(0L)).as(s"__cb_$name"),
        sort_array(collect_list(
          when(smallN || (col("__v") >= bl && col("__v") <= bh), col("__v"))))
          .as(s"__sv_$name"))
    } :+ max(col("__n")).as("__n")
    val agg = refined.groupBy(g: _*).agg(perQ.head, perQ.tail: _*)

    val interps = qs.map { case (name, q) =>
      val p = (col("__n") - 1).cast("double") * lit(q)
      val lower = floor(p)
      val higher = ceil(p)
      // value at 0-indexed global rank r = survivors[r - countBelow]
      // (element_at is 1-based; ANSI throws loudly if the sketch's
      // error bound were ever violated rather than mis-hashing)
      def at(r: Column): Column = element_at(
        col(s"__sv_$name"), (r - col(s"__cb_$name") + 1).cast("int"))
      when(higher === lower, at(lower))
        .otherwise(
          (higher.cast("double") - p) * at(lower)
            + (p - lower.cast("double")) * at(higher))
        .as(name)
    }
    agg.select(g ++ interps: _*)
  }

  /** Exact order-statistic COMPOSITE KEYS `(value, tie)` at the given
    * 1-based ranks of the `(valueCol, tieCol)` lexicographic total order
    * — the primitive that replaces a global `ntile`/`row_number` window:
    * cutoff keys come out of the same bracket-and-refine discipline as
    * [[perGroup]] (sketch bracket on the value, exact count-below rebase,
    * tiny in-bracket survivor array), and bucket membership then becomes
    * a map-side key comparison instead of a single-partition rank.
    *
    * Only the requested keys (O(ranks)) reach the driver; the survivor
    * arrays stay in executors. `valueCol` is compared as double (exact
    * for integers < 2^53 and for any value both engines round alike);
    * ties within equal values are resolved by `tieCol` (a Long).
    *
    * `n` must be `df.count()` (callers already have it). Requires
    * 1 <= rank <= n.
    *
    * EAGER: the selectors in this object run driver-side jobs (bracket
    * agg + refine agg + `.head()`) at CALL time, not at action time —
    * a QueryDef built on them executes those passes during
    * construction. Callers must handle n == 0 themselves (here: by not
    * calling; byFraction: by the (0, empty) return).
    *
    * Single-task bound of the refine agg: the no-group final merge
    * concentrates every survivor array — ~8·n/accuracy rows PER
    * REQUESTED RANK (e.g. ~0.72% of n for 9 deciles at accuracy
    * 10⁴) — in one task. Sub-linear in n but not constant: at large n
    * raise `accuracy` proportionally (survivors shrink as 1/accuracy;
    * the GK sketch grows only ~O(accuracy·log n) map-side), keeping
    * the merge task O(ranks·10⁴) rows by the accuracy ≈ n/10⁴ sizing
    * rule above. */
  /** [[rankKeys]] when the caller knows the target ranks only as
    * FRACTIONS of the (unknown) row count — ntile cutoffs, top-p%
    * boundaries. Fuses the count into the bracket pass (one scan
    * saved vs count-then-rankKeys: stats+bracket, refine — the minimum
    * for exact order statistics without a global sort): probes sit at
    * `fractions ± margin`, and `mkRanks(n)` supplies the exact integer
    * ranks once n is known. Each rank must stay within 4 rows of its
    * fraction (ntile(B) cutoffs stray up to B/4 rows from i·n/B, so
    * B <= 16 is covered; ceil-of-fraction ranks stray < 1), which the
    * raised small-n fallback threshold absorbs inside the sketch
    * margin. Returns (n, keys). */
  def rankKeysByFraction(df: DataFrame, valueCol: String, tieCol: String,
      fractions: Seq[Double], mkRanks: Long => Seq[Long],
      accuracy: Int = 10000): (Long, Seq[(Double, Long)]) = {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0))
    val margin = 4.0 / accuracy
    val src = df.select(col(valueCol).cast("double").as("__v"),
      col(tieCol).cast("long").as("__t"))
    val probes = fractions.flatMap { f =>
      Seq(math.max(0.0, f - margin), math.min(1.0, f + margin))
    }
    val first = src.agg(count(lit(1)).as("__n"),
      approx_percentile(col("__v"), array(probes.map(lit): _*), lit(accuracy))
        .as("__bk")).head()
    val n = first.getLong(0)
    // Empty input: no rank exists — return (0, no keys) and let the
    // caller short-circuit to its empty result (membership exprs built
    // from zero keys classify everything into bucket 1, which is
    // harmless because the source is empty too).
    if (n == 0) return (0L, Seq.empty)
    val ranks = mkRanks(n)
    require(ranks.length == fractions.length &&
      ranks.forall(r => r >= 1 && r <= n))
    ranks.zip(fractions).foreach { case (r, f) =>
      require(math.abs(r - f * n) <= 4.0 + 1e-9,
        s"rank $r strays more than 4 rows from fraction $f of $n")
    }
    // bracket coverage needs margin·n >= sketch-rank-error (n/accuracy)
    // + 2 + the <=4-row rank/fraction drift: with margin - eps = 3/acc,
    // n >= 2·accuracy gives 3n/acc >= 6 >= 2 + 4. Below that the whole
    // input is O(accuracy) values: collect it instead
    val row =
      if (n < 2L * accuracy) {
        val keys = sort_array(collect_list(struct(col("__v"), col("__t"))))
        val picks = ranks.zipWithIndex.map { case (r, i) =>
          element_at(keys, r.toInt).as(s"__k_$i")
        }
        src.agg(picks.head, picks.tail: _*).head()
      } else {
        val bk = first.getSeq[Double](1)
        val perR = ranks.indices.flatMap { i =>
          val (bl, bh) = (bk(2 * i), bk(2 * i + 1))
          Seq(
            sum(when(col("__v") < bl, 1L).otherwise(0L)).as(s"__cb_$i"),
            sort_array(collect_list(
              when(col("__v") >= bl && col("__v") <= bh,
                struct(col("__v"), col("__t"))))).as(s"__sv_$i"))
        }
        val picks = ranks.zipWithIndex.map { case (r, i) =>
          element_at(col(s"__sv_$i"), (lit(r) - col(s"__cb_$i")).cast("int"))
            .as(s"__k_$i")
        }
        src.agg(perR.head, perR.tail: _*).select(picks: _*).head()
      }
    (n, ranks.indices.map { i =>
      val k = row.getStruct(i)
      (k.getDouble(0), k.getLong(1))
    })
  }

  /** ntile(buckets) cutoff keys — the boundary (value, tie) at the
    * exact end rank of each of the first buckets-1 ntile groups —
    * via [[rankKeysByFraction]]; bucket membership is then
    * `1 + count(key > cutoff_i)`. Returns (n, keys). */
  def ntileCutKeys(df: DataFrame, valueCol: String, tieCol: String,
      buckets: Int, accuracy: Int = 10000): (Long, Seq[(Double, Long)]) =
    rankKeysByFraction(df, valueCol, tieCol,
      (1 until buckets).map(_.toDouble / buckets),
      n => (1L until buckets.toLong).map(i => i * (n / buckets) + math.min(i, n % buckets)),
      accuracy)

  def rankKeys(df: DataFrame, valueCol: String, tieCol: String,
      ranks: Seq[Long], n: Long, accuracy: Int = 10000): Seq[(Double, Long)] = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 1 && r <= n))
    val margin = 4.0 / accuracy
    val src = df.select(col(valueCol).cast("double").as("__v"),
      col(tieCol).cast("long").as("__t"))
    val smallN = n < 2L * accuracy / 3 + 2
    val row =
      if (smallN) {
        val keys = sort_array(collect_list(struct(col("__v"), col("__t"))))
        val picks = ranks.zipWithIndex.map { case (r, i) =>
          element_at(keys, r.toInt).as(s"__k_$i")
        }
        src.agg(picks.head, picks.tail: _*).head()
      } else {
        val probes = ranks.flatMap { r =>
          val q = r.toDouble / n
          Seq(math.max(0.0, q - margin), math.min(1.0, q + margin))
        }
        val bk = src.agg(approx_percentile(col("__v"),
          array(probes.map(lit): _*), lit(accuracy)).as("__bk")).head()
          .getSeq[Double](0)
        val perR = ranks.zipWithIndex.flatMap { case (_, i) =>
          val (bl, bh) = (bk(2 * i), bk(2 * i + 1))
          Seq(
            sum(when(col("__v") < bl, 1L).otherwise(0L)).as(s"__cb_$i"),
            sort_array(collect_list(
              when(col("__v") >= bl && col("__v") <= bh,
                struct(col("__v"), col("__t"))))).as(s"__sv_$i"))
        }
        val picks = ranks.zipWithIndex.map { case (r, i) =>
          element_at(col(s"__sv_$i"), (lit(r) - col(s"__cb_$i")).cast("int"))
            .as(s"__k_$i")
        }
        src.agg(perR.head, perR.tail: _*).select(picks: _*).head()
      }
    ranks.indices.map { i =>
      val k = row.getStruct(i)
      (k.getDouble(0), k.getLong(1))
    }
  }
}
