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
    * keys spread over `saltFactor` partitionable sub-keys. The salt
    * hashes `saltCols` (default: all non-key columns) MIXED WITH a
    * per-row id, so the spread holds even when a hot key's rows carry
    * identical payloads (a constant-payload hot key would otherwise
    * collapse to one salt and defeat the whole join). The row id is
    * stable under task retry (same split ⇒ same ids), so salting stays
    * deterministic for replays. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val hashCols = (if (saltCols.nonEmpty) saltCols
                    else left.columns.filterNot(keys.contains).toSeq)
      .map(col) :+ monotonically_increasing_id()
    val salted = left.withColumn("__graft_salt",
      pmod(xxhash64(hashCols: _*), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__graft_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(replicated, keys :+ "__graft_salt")
      .drop("__graft_salt")
  }
}
