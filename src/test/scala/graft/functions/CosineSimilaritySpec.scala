package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.VectorOps

class CosineSimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairs = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.select(col("vec_id").as("a"), col("v").as("va"))
      .crossJoin(e.filter(col("vec_id") < 20).select(col("vec_id").as("b"), col("v").as("vb")))
  }

  test("codegen expression matches the HOF composition bit-for-bit") {
    val diff = pairs
      .select(
        GraftFunctions.cosine_sim(col("va"), col("vb")).as("c_native"),
        VectorOps.cosineHof(col("va"), col("vb")).as("c_hof"))
      .filter(col("c_native") =!= col("c_hof"))
    assert(diff.count() == 0)
  }

  test("SQL registration: callable via expr/selectExpr") {
    GraftFunctions.register(spark)
    val n = pairs.selectExpr("cosine_sim(va, vb) AS c").filter(col("c").between(-1.001, 1.001)).count()
    assert(n == pairs.count())
  }

  test("identical vectors score 1.0 (within 1 ulp: x/(sqrt(x)*sqrt(x)))") {
    val off = pairs.filter(col("a") === col("b"))
      .select(GraftFunctions.cosine_sim(col("va"), col("vb")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
    assert(off.count() == 0)
  }

  test("null array yields null; interpreted path (eval) agrees with codegen") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d, 2.0d)) AS c").head
    assert(row.isNullAt(0))
    val v = spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c").head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
