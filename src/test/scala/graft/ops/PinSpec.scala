package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Pin]]'s re-pin semantics (r5 ADVICE): Spark's CacheManager
  * dedups cache entries by plan, so a naive deque would hold two
  * entries aliasing ONE cache entry and evicting the older alias would
  * unpersist data the newer pin still references — under Bench's
  * warm-up + min-of-3 reruns that silently timed recomputes on the
  * supposedly-cached path. A re-pin must REFRESH the existing entry's
  * deque position instead.
  */
class PinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("re-pinning an identical plan refreshes its eviction position, not duplicates it") {
    val a = spark.range(1000).toDF("id").filter(col("id") % 7 === 1)
    val p1 = Pin.once(a)
    p1.count() // materialize the cache entry
    // second pin of the SAME plan (fresh Dataset instance, equal plan)
    Pin.once(spark.range(1000).toDF("id").filter(col("id") % 7 === 1)).count()
    // five more DISTINCT pins: with the pre-r6 duplicate-entry deque
    // this overflowed Keep=6 and evicted the older alias of `a`,
    // unpersisting the entry the newer alias still referenced
    (1 to 5).foreach { i =>
      Pin.once(spark.range(100L + i).toDF("id").filter(col("id") > 0)).count()
    }
    assert(p1.storageLevel != StorageLevel.NONE,
      "re-pinned plan was evicted by its own duplicate deque entry")
  }
}
