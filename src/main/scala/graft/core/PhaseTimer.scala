package graft.core

/** Opt-in wall-clock phase accounting for LIFECYCLE queries (r9
  * verdict task 4). Index-lifecycle queries construct a store, mutate
  * it, and probe it inside one body, so a whole-query timer charges
  * O(index-build) to what is an O(batch) verb — a cold first run can
  * read as a 38s "query" (vs26 r9 driver trace) when the verb itself
  * is 2s. Query bodies label their eager stages with [[phase]]; the
  * bench enables collection, resets per run, and publishes the split
  * next to the total so SCALING.json's per-verb exponents have a
  * corroborating artifact.
  *
  * Disabled (the default — Verify, tests, library callers) the
  * wrapper is a no-op closure call: zero overhead on the correctness
  * path. Accumulation is additive per label (a body may enter the
  * same phase several times, e.g. one append per landing batch).
  *
  * Charging is EXCLUSIVE (r10 ADVICE): a phase is charged only the
  * wall time NOT already charged to other labeled phases that
  * complete inside its window. The case that needs this is the
  * streaming wrapper — `phase("stream")` wraps `awaitTermination()`
  * on the driver while `foreachBatch` concurrently runs
  * phase-labeled helpers (append/expire) on the stream thread; an
  * inclusive charge would double-count that labeled work and push
  * the published phase SUM above the query total. With exclusivity
  * the invariant holds by construction: sum of labels <= total
  * elapsed (up to sub-ms bookkeeping races between concurrent
  * closers), and "stream" reads as pure loop/commit overhead.
  * Disjoint sequential phases (the common case) are unaffected —
  * nothing else accrues during their window, so the subtraction is
  * zero.
  *
  * Only EAGER stages can be labeled: the returned DataFrame's own
  * execution happens in the caller, so the serve/probe plan shows up
  * as (total − sum of labeled phases). The bench publishes the raw
  * phase map next to the query total and leaves that remainder to
  * the reader — it does NOT emit a synthetic "serve" label.
  */
object PhaseTimer {
  @volatile private var on = false
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  /** Total nanos charged to ANY label since the last reset — what an
    * enclosing phase subtracts to charge itself exclusively. */
  private val charged = new java.util.concurrent.atomic.AtomicLong(0L)

  def enable(): Unit = on = true
  def reset(): Unit = { acc.clear(); charged.set(0L) }

  /** Phase totals in seconds, insertion-order-free. */
  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.doubleValue() }.toMap
  }

  /** Run `body`, charging to `name` (when enabled) the wall time not
    * already charged to phases that completed inside this window. */
  def phase[T](name: String)(body: => T): T =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      val c0 = charged.get()
      try body
      finally {
        val elapsed = System.nanoTime() - t0
        val inner = charged.get() - c0
        val own = math.max(0L, elapsed - inner)
        charged.addAndGet(own)
        acc.merge(name, Double.box(own / 1e9),
          (a, b) => Double.box(a.doubleValue() + b.doubleValue()))
      }
    }
}
