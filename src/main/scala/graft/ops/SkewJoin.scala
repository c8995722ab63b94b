package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins at scale. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) covers most
  * cases at runtime; this explicit salted join is for the pathological
  * hot-key joins AQE can't split (e.g. a single key holding >10% of a
  * 100 TB fact table) and for engines/pipelines where the salt must be
  * part of the deterministic plan.
  *
  * Mechanics: the left (large, skewed) side gets a deterministic salt in
  * [0, saltFactor) derived from non-key columns via xxhash64 — NOT a
  * rand(), so retried tasks and replayed stages salt identically. The
  * right side is replicated saltFactor times. The join key becomes
  * (key, salt): the hot key's rows spread over saltFactor reducers.
  */
object SkewJoin {

  /** Inner equi-join `left.keys == right.keys` with the left side's hot
    * keys spread over `saltFactor` partitionable sub-keys. The salt is
    * derived from row CONTENT (all columns by default) — never from
    * rand() or row ids, which change when a lost partition of a
    * non-deterministically-ordered input is recomputed mid-shuffle and
    * would duplicate/lose join rows. Content-hashing is recompute-
    * stable; its one degenerate case — a hot key whose rows are fully
    * identical — means the rows are literal duplicates, where
    * correctness still holds and AQE skew-split is the right tool. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val hashCols = (if (saltCols.nonEmpty) saltCols else left.columns.toSeq).map(col)
    val salted = left.withColumn("__graft_salt",
      pmod(xxhash64(hashCols: _*), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__graft_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(replicated, keys :+ "__graft_salt")
      .drop("__graft_salt")
  }
}
