package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Source-level audit of the bounded-collect discipline (VERDICT r4
  * item 8): every `.collect()` in the engine moves a DOCUMENTED-BOUNDED
  * row set to the driver (bucket lists, probe sets, band/group lists,
  * per-bucket totals, codebooks) — never row-scale data. The discipline
  * used to live only in comments; this spec makes it structural:
  *
  *  1. a `.collect()` may only appear in a file on the allowlist below
  *     (a NEW file acquiring a collect fails the audit and forces this
  *     conversation);
  *  2. every `.collect()` site must carry the word "bounded" in the 12
  *     source lines above it — the written justification of WHAT bounds
  *     the row count.
  *
  * `collect_list`/`collect_set` (executor-side aggregates) are not
  * driver collects and are excluded by the regex.
  */
class BoundedCollectSpec extends AnyFunSuite {

  /** Engine files allowed to hold driver-side collects, with the bound
    * each one is trusted for (mirrors the README's scale-discipline
    * section). */
  private val allowlist = Set(
    "ops/Upsert.scala",        // <= nBuckets affected-bucket ids
    "ops/Bpe.scala",           // K 1-row merge argmaxes (LIMIT 1)
    "ops/VectorOps.scala",     // probe batches; 8-row codebooks
    "ops/DedupOps.scala",      // <= bands x 64 (band, group) keys
    "ops/PrefixSum.scala",     // <= buckets per-bucket totals
    "streaming/StreamQueries.scala", // catalog table names (sink GC)
    "SketchQuality.scala")     // QA artifact main: sketch-tier pair
                               // sets at audit SFs, not an engine path

  test("every .collect() is allowlisted and carries a bounded-justification") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root), s"run from the repo root: $root")
    val collectRe = "\\.collect\\(\\)".r
    var sites = 0
    val offenders = Seq.newBuilder[String]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val rel = root.relativize(p).toString
        val lines = scala.jdk.CollectionConverters
          .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
        for ((line, idx) <- lines.zipWithIndex
            if collectRe.findFirstIn(line).isDefined) {
          sites += 1
          if (!allowlist(rel))
            offenders += s"$rel:${idx + 1} — file not on the bounded-collect allowlist"
          else {
            val context = lines.slice(math.max(0, idx - 12), idx + 1).mkString("\n")
            if (!context.toLowerCase.contains("bounded"))
              offenders += s"$rel:${idx + 1} — no 'bounded' justification within 12 lines"
          }
        }
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty, bad.mkString("\n"))
    // the audit must actually be seeing the known sites, not a moved tree
    assert(sites >= 6, s"only $sites collect sites found — audit miswired?")
  }
}
