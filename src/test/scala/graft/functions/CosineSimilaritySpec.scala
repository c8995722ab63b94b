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

  test("zero-norm vector yields null (not NaN) in both eval paths") {
    GraftFunctions.register(spark)
    // codegen path (literal arrays fold through WholeStageCodegen project)
    val sqlRows = spark.sql(
      """SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS c1,
        |       cosine_sim(array(1.0d, 2.0d), array(0.0d, 0.0d)) AS c2""".stripMargin).head
    assert(sqlRows.isNullAt(0) && sqlRows.isNullAt(1))
    // interpreted path: eval directly on the expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val zero = Literal.create(ArrayData.toArrayData(Array(0.0, 0.0)), ArrayType(DoubleType))
    val one  = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0)), ArrayType(DoubleType))
    assert(CosineSimilarity(zero, one).eval(null) == null)
    assert(CosineSimilarity(one, zero).eval(null) == null)
    // a NaN score would outrank every real score in a desc sort — the
    // null contract keeps zero vectors out of top-k results entirely
    val ranked = spark.sql(
      """SELECT c FROM (SELECT cosine_sim(array(0.0d), array(1.0d)) AS c
        |  UNION ALL SELECT 0.5d) ORDER BY c DESC NULLS LAST LIMIT 1""".stripMargin).head
    assert(ranked.getDouble(0) == 0.5)
  }
}
