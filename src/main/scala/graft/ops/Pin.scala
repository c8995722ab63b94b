package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared row-pinning for multi-pass operators (PrefixSum phases,
  * dd06's three shingle uses, tx09's tf reuse, ev30/ev31's selector
  * passes): the input must show the SAME rows to every pass without
  * recomputing its upstream plan.
  *
  * A DETERMINISTIC plan is `persist`ed lazily — the first real pass
  * computes its result AND populates the cache in ONE job (no separate
  * materialization job), and an eviction-forced recompute is
  * value-identical by determinism. Only a NONDETERMINISTIC plan pays
  * an eager `localCheckpoint` job, because its recompute could change
  * rows between passes.
  *
  * Release policy: engine queries consume each result before the next
  * is built (Verify and Bench are sequential), so caches from EARLIER
  * queries are dead weight — left alone they accumulate across a
  * 228-query pass and later queries pay the GC bill (the r4→r5 st03
  * slowdown, and dd06's 2× first-run outlier). Each pin therefore
  * releases all but the most recent `Keep` pinned frames. `Keep` is
  * sized above the maximum pins a single query performs (ev30 pins its
  * user table and GridQuantile pins per-metric inputs), so a pin can
  * never unpersist a sibling that the SAME query still needs — and
  * even that worst case would only recompute, not corrupt, because
  * only deterministic plans enter the queue.
  */
object Pin {

  private val Keep = 6
  private val cached = new java.util.ArrayDeque[DataFrame]

  /** Pin `df`'s rows across multiple consuming passes. */
  def once(df: DataFrame): DataFrame = {
    val nondet = df.queryExecution.analyzed.exists(
      _.expressions.exists(_.exists(!_.deterministic)))
    if (nondet) df.localCheckpoint(true)
    else cached.synchronized {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      cached.addLast(p)
      while (cached.size > Keep) cached.removeFirst().unpersist(false)
      p
    }
  }
}
