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
  * releases all but the most recent `Keep` pinned frames. The actual
  * pinning callers are PrefixSum.materialize (one pin per
  * byHexKey/byLongKey call), dd06's shingle reuse
  * (`DedupOps.scala`), tx09's tf reuse and tx14's token-set reuse
  * (`TextOps.scala`), and ev30/ev31's selector passes
  * (`EventOps.scala`) — at most 3 pins live within any single query,
  * so `Keep` = 6 means a pin can never unpersist a sibling that the
  * SAME query still needs (PinBudgetSpec pins this bound). Even that
  * worst case would only recompute, not corrupt, for integer/string
  * plans; NOTE the recompute-safety argument is weaker for
  * shuffle-order-dependent float aggregates (e.g. round(sum(double)))
  * which Spark flags `deterministic` yet may differ in ulps on an
  * eviction-forced recompute — acceptable only because the per-query
  * pin count stays under `Keep`, which is exactly what PinBudgetSpec
  * enforces.
  *
  * Bench runs each query 1+3 times on an identical plan: Spark's
  * CacheManager dedups the cache entry across reruns, so a naive
  * deque would hold several entries aliasing ONE cache entry and
  * evicting the oldest alias would unpersist data the newest pin
  * still references (silently measuring recompute, not cache). A
  * re-pin of an already-cached plan therefore REFRESHES the existing
  * deque entry's position instead of inserting a duplicate.
  */
object Pin {

  private val Keep = 6
  private val cached = new java.util.ArrayDeque[DataFrame]

  /** DEQUE pins observed since the last [[resetBudget]] — test-only
    * observability for PinBudgetSpec's "no query exceeds Keep" pin
    * (atomic: queries are built single-threaded, but a counter that is
    * only MOSTLY correct is worse than none). Counts only the
    * persist/deque branch: a nondeterministic-plan `localCheckpoint`
    * never enters the deque, so it cannot evict a sibling and is
    * outside the eviction-safety bound the budget protects (r6
    * ADVICE — counting it would over-fail a safe query). */
  private val pinCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def pinsSinceReset: Int = pinCount.get()
  private[graft] def resetBudget(): Unit = pinCount.set(0)

  /** Pin `df`'s rows across multiple consuming passes. */
  def once(df: DataFrame): DataFrame = {
    val nondet = df.queryExecution.analyzed.exists(
      _.expressions.exists(_.exists(!_.deterministic)))
    if (nondet) checkpointed(df)
    else cached.synchronized {
      pinCount.incrementAndGet()
      // Dataset.storageLevel consults the CacheManager by plan
      // equivalence over the NORMALIZED plan, so it detects a cache
      // entry created via a DIFFERENT Dataset instance with the same
      // plan. The deque dedup below must match with the SAME plan form
      // the CacheManager keys on (queryExecution.normalized) — with
      // `analyzed`, two plans the CacheManager dedups could fail the
      // deque match, leaving a stale alias whose eviction unpersists
      // an entry a newer pin still references (r6 ADVICE).
      val wasCached = df.storageLevel != StorageLevel.NONE
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      if (wasCached) {
        val it = cached.iterator()
        while (it.hasNext)
          if (it.next().queryExecution.normalized
                .sameResult(p.queryExecution.normalized)) it.remove()
      }
      cached.addLast(p)
      while (cached.size > Keep) cached.removeFirst().unpersist(false)
      p
    }
  }

  /** The block-holding RDD of a localCheckpoint'ed frame. A
    * checkpointed Dataset's plan is a [[LogicalRDD]] leaf over the
    * internal row RDD that actually owns the stored blocks;
    * `df.rdd.unpersist()` builds a NEW deserializing wrapper RDD and
    * unpersists THAT (no blocks, so it is a silent no-op — the bug the
    * pre-r11 connectedComponents release had). Extracting the leaf RDD
    * is the only handle that really frees the blocks. */
  private def checkpointRdd(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Release a frame produced by [[checkpointed]] (or any
    * `localCheckpoint`) whose consumers are all done — loop-style
    * callers (connectedComponents, Bpe.train) release each superseded
    * round themselves, which is why this is public to the package. */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(false))

  /** Eagerly `localCheckpoint` a deterministic-or-not plan and bound
    * the STORED BLOCKS' lifetime the way [[once]] bounds persist
    * entries. Unlike a persist, an evicted checkpoint cannot recompute
    * (the lineage is truncated), so entries are only reaped `KeepCk`
    * checkpoints later — by which time the bench/Verify's sequential
    * consume-then-build discipline guarantees the frame is dead (at
    * most ~2 checkpoints are live inside any single query; see the
    * Pin release-policy note above). Without this, every kernel
    * invocation leaks its blocks until a JVM GC lets the
    * ContextCleaner find them — across a 298-query bench pass the
    * leaked blocks fill the storage pool and evict the LIVE frames,
    * which then re-read from disk or recompute mid-measurement (the
    * r11-baseline dd19/dd20 4-6x full-run-only spikes). */
  private val KeepCk = 6
  private val ckpts = new java.util.ArrayDeque[DataFrame]
  def checkpointed(df: DataFrame): DataFrame = ckpts.synchronized {
    val c = df.localCheckpoint(true)
    ckpts.addLast(c)
    while (ckpts.size > KeepCk) releaseCheckpoint(ckpts.removeFirst())
    c
  }
}
