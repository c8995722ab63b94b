package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization block codes of an
  * `array<double>` vector against a FIXED codebook — the per-row kernel
  * of vs09 fused into one pass.
  *
  * For each `blockDim`-wide sub-block b of the input vector, finds the
  * codebook row minimizing the INTEGER-QUANTIZED squared L2 distance
  * over that block — per element `floor(diff² · 1e12 + 0.5)` summed as
  * longs, the engine/partition-order-exact discipline vs05/vs09 use
  * (ties break toward the first codebook row, so a cid-ASC-sorted
  * codebook reproduces `ORDER BY d2q, cid`). Output:
  * `array<struct<block:long, code:long, d2q:long>>`, one entry per
  * block.
  *
  * Replaces an explode(4×) → broadcast-crossJoin(8×) → interpreted-HOF
  * scoring → window-argmin pipeline with a single map-side loop nest
  * inside WholeStageCodegen: 4 blocks × 8 centroids × 16 dims per row,
  * no join, no shuffle, no per-candidate intermediate rows. The
  * codebook ships as a plan reference object (bounded: k centroids —
  * the IVF probe-list collect discipline).
  *
  * @param cids     codebook ids, ASCENDING, parallel to `codebook`
  * @param codebook full-width centroid vectors (indexed at the same
  *                 offsets as the input vector: block b element i reads
  *                 position b·blockDim+i of BOTH)
  */
case class PqBlockCodes(
    child: Expression,
    blockDim: Int,
    cids: Array[Long],
    codebook: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(blockDim > 0 && codebook.nonEmpty && cids.length == codebook.length)

  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("block", LongType, nullable = false),
    StructField("code", LongType, nullable = false),
    StructField("d2q", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "pq_block_codes"

  private final val Scale = 1e12

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nBlocks = v.numElements() / blockDim
    val out = new Array[Any](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val base = b * blockDim
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < codebook.length) {
        val cv = codebook(c)
        var d = 0L
        var i = 0
        while (i < blockDim) {
          val diff = v.getDouble(base + i) - cv(base + i)
          d += math.floor(diff * diff * Scale + 0.5).toLong
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(b) = new GenericInternalRow(Array[Any](b.toLong, cids(best), bestD))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][]")
    val cidRef = ctx.addReferenceObj("pqCids", cids, "long[]")
    val rowCls = classOf[GenericInternalRow].getName
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val nB = ctx.freshName("nBlocks")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
        |final int $nB = $v.numElements() / $blockDim;
        |final Object[] $out = new Object[$nB];
        |for (int $b = 0; $b < $nB; $b++) {
        |  final int $base = $b * $blockDim;
        |  int $best = 0; long $bestD = Long.MAX_VALUE;
        |  for (int $c = 0; $c < $cbRef.length; $c++) {
        |    final double[] $cv = $cbRef[$c];
        |    long $d = 0L;
        |    for (int $i = 0; $i < $blockDim; $i++) {
        |      final double $diff = $v.getDouble($base + $i) - $cv[$base + $i];
        |      $d += (long) java.lang.Math.floor($diff * $diff * 1.0E12 + 0.5);
        |    }
        |    if ($d < $bestD) { $bestD = $d; $best = $c; }
        |  }
        |  $out[$b] = new $rowCls(new Object[]{(long) $b, $cidRef[$best], $bestD});
        |}
        |${ev.value} = new $arrCls($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
