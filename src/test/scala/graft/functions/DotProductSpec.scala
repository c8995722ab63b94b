package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.VectorOps

class DotProductSpec extends AnyFunSuite {

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
        GraftFunctions.dot_product(col("va"), col("vb")).as("d_native"),
        VectorOps.dot(col("va"), col("vb")).as("d_hof"))
      .filter(col("d_native") =!= col("d_hof"))
    assert(diff.count() == 0)
  }

  test("SQL registration: callable via selectExpr; simple identity") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(v == 32.0)
  }

  test("null array yields null; interpreted eval agrees with codegen") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d").head
    assert(row.isNullAt(0))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit1 = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0)), ArrayType(DoubleType))
    val lit2 = Literal.create(ArrayData.toArrayData(Array(3.0, 4.0)), ArrayType(DoubleType))
    assert(DotProduct(lit1, lit2).eval(null) == 11.0)
  }

  test("dot-product ranking differs from cosine where norms carry signal") {
    // (1,0) vs candidates (10,0) and (0.9, 0): cosine ties/prefers by
    // direction; MIPS must prefer the large-norm candidate.
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 0.0d), array(10.0d, 0.0d)) AS big,
        |       dot_product(array(1.0d, 0.0d), array(0.9d, 0.0d)) AS small""".stripMargin).head
    assert(r.getDouble(0) > r.getDouble(1))
  }
}
