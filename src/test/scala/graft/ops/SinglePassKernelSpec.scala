package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r10 verdict task 4: the near-dup kernels must pay their dominant
  * pass — shingling/windowing + hashing the corpus — exactly ONCE per
  * invocation. Both kernels stage a (signature, hashed-set) projection
  * through an eager localCheckpoint; the returned plan therefore reads
  * stored blocks only. The pin: ZERO file scans anywhere in the
  * returned plan (band path AND both verify joins), which is only
  * possible when every input byte was read — and windowed — in the
  * single staging job. Value identity is pinned elsewhere (the dd02 /
  * mm16 oracle gates and MediaNearDupSpec's planted-recall test);
  * this spec pins the COST SHAPE those gates cannot see.
  */
class SinglePassKernelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("mm16 payload kernel: returned plan re-reads no files (windowing ran once)") {
    val assets = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val result = MultimodalOps.payloadNearDups(assets)
    val scans = PlanAudit.scans(result)
    assert(scans.isEmpty,
      s"payload kernel re-reads files after the staging pass: " +
        scans.map(_.relation.location.rootPaths.mkString(",")).mkString("; "))
    // and the kernel still produces verified pairs off the stored form
    assert(result.columns.toSeq == Seq("a", "b", "jaccard"))
  }

  test("dd02 text kernel: returned plan re-reads no files (shingling ran once)") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val withCopy = corpus.unionByName(corpus
      .select((col("doc_id") + lit(100000L)).as("doc_id"), col("text")))
    val result = DedupOps.minHashNearDupsPortable(withCopy)
    val scans = PlanAudit.scans(result)
    assert(scans.isEmpty,
      s"text kernel re-reads files after the staging pass: " +
        scans.map(_.relation.location.rootPaths.mkString(",")).mkString("; "))
    // exact copies must still verify at jaccard 1.0
    val copies = result.filter(col("b") - col("a") === 100000L &&
      col("jaccard") === 1.0).count()
    assert(copies > 0, "planted exact copies must survive the single-pass verify")
  }
}
