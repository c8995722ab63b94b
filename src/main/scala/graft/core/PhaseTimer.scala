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
  * Only EAGER stages can be labeled: the returned DataFrame's own
  * execution happens in the caller, so the serve/probe plan shows up
  * as (total − sum of labeled phases) — the bench reports that
  * remainder explicitly as "serve".
  */
object PhaseTimer {
  @volatile private var on = false
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def enable(): Unit = on = true
  def reset(): Unit = acc.clear()

  /** Phase totals in seconds, insertion-order-free. */
  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.doubleValue() }.toMap
  }

  /** Run `body`, charging its wall time to `name` when enabled. */
  def phase[T](name: String)(body: => T): T =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      try body
      finally acc.merge(name, Double.box((System.nanoTime() - t0) / 1e9),
        (a, b) => Double.box(a.doubleValue() + b.doubleValue()))
    }
}
