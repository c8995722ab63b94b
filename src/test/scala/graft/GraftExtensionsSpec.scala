package graft

import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path
  * must register every native expression (behavior of the expressions
  * themselves is covered by their own suites). */
class GraftExtensionsSpec extends AnyFunSuite {

  private val expected = Seq("cosine_sim", "minhash_sig", "bottomk_by_hash",
    "word_shingles", "simhash_sig", "oph_minhash_sig", "heavy_hitters",
    "pair_ids", "pair_sized")

  test("injectFunction wires all nine native expressions into a registry") {
    val got = Bridge.extensionFunctionNames(new GraftExtensions, expected)
    assert(got == expected)
  }

  test("extension-built expressions evaluate (cosine_sim via builder)") {
    // the builder the extension registers must produce a working
    // expression tree, not just a name
    val names = Bridge.extensionFunctionNames(new GraftExtensions, Seq("cosine_sim"))
    assert(names.nonEmpty)
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT round(cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)), 6) AS c")
      .head.getDouble(0)
    assert(r == 1.0)
  }
}
