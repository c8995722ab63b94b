package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[PqBlockCodes]] must reproduce the composed reference pipeline
  * (explode blocks × codebook, integer-quantized per-element distances,
  * argmin by (d2q, cid)) exactly — that equivalence is what let vs09
  * swap it in with an unchanged oracle hash. */
class PqBlockCodesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def refCodes(v: Array[Double], blockDim: Int,
      cb: Seq[(Long, Array[Double])]): Seq[(Long, Long, Long)] =
    (0 until v.length / blockDim).map { b =>
      val scored = cb.map { case (cid, cv) =>
        var d = 0L
        for (i <- 0 until blockDim) {
          val diff = v(b * blockDim + i) - cv(b * blockDim + i)
          d += math.floor(diff * diff * 1e12 + 0.5).toLong
        }
        (cid, d)
      }
      val (cid, d) = scored.minBy { case (cid, d) => (d, cid) }
      (b.toLong, cid, d)
    }

  test("matches the composed reference on random vectors (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 32
    val cb = (0L until 4L).map(i => (i, Array.fill(dim)(rnd.nextGaussian() * 0.3)))
    val vecs = (0 until 50).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian() * 0.3)))
    val df = vecs.toDF("vec_id", "v")
    val got = df.select(col("vec_id"),
        explode(GraftFunctions.pq_block_codes(col("v"), 8, cb.map(_._1).toArray,
          cb.map(_._2).toArray)).as("pq"))
      .select(col("vec_id"), col("pq.block"), col("pq.code"), col("pq.d2q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = vecs.flatMap { case (id, v) =>
      refCodes(v, 8, cb).map { case (b, c, d) => (id, b, c, d) }
    }.toSet
    assert(got == want)
  }

  test("exact-tie breaks toward the smallest cid") {
    import spark.implicits._
    val v = Array(1.0, 2.0)
    // two identical codebook rows -> block distance ties exactly
    val cb = Seq((3L, Array(0.5, 1.5)), (7L, Array(0.5, 1.5)))
    val got = Seq((1L, v)).toDF("vec_id", "v")
      .select(explode(GraftFunctions.pq_block_codes(col("v"), 2,
        cb.map(_._1).toArray, cb.map(_._2).toArray)).as("pq"))
      .select(col("pq.code")).head().getLong(0)
    assert(got == 3L)
  }

  test("null vector yields null; interpreted eval agrees with codegen") {
    import spark.implicits._
    val cb = Seq((0L, Array(0.0, 0.0)))
    val df = Seq((1L, Some(Array(0.25, -0.5))), (2L, None))
      .toDF("vec_id", "v")
    val codes = GraftFunctions.pq_block_codes(col("v"), 2,
      cb.map(_._1).toArray, cb.map(_._2).toArray)
    val rows = df.select(col("vec_id"), codes.as("c")).collect()
    assert(rows.find(_.getLong(0) == 2L).get.isNullAt(1))
    // interpreted path (nullSafeEval) via a fresh expression eval
    val expr = PqBlockCodes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.25, -0.5),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      2, Array(0L), Array(Array(0.0, 0.0)))
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val row = arr.getStruct(0, 3)
    val wantD = math.floor(0.25 * 0.25 * 1e12 + 0.5).toLong +
      math.floor(0.5 * 0.5 * 1e12 + 0.5).toLong
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L && row.getLong(2) == wantD)
  }
}
