package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-permutation MinHash signature with rotation densification —
  * the 100 TB-scale replacement for k-independent-hash MinHash.
  *
  * Classic MinHash ([[MinHashSignature]]) hashes every element k times
  * (k=64 → 64 xxhash64 calls per shingle); at corpus scale the
  * signature pass is pure hash compute and dominates the dedup
  * pipeline. One-permutation hashing (Li, Owen, Zhang, NIPS 2012)
  * hashes each element ONCE, partitions the hash space into k bins
  * (unsigned modulo), and keeps the minimum per bin — k× less compute
  * for the same LSH banding behavior. Empty bins (small documents)
  * borrow the value of the next non-empty bin cyclically, offset by
  * the borrow distance ("densification", Shrivastava & Li, ICML 2014),
  * so banded signatures of near-identical sets still collide and
  * unrelated sets don't collide through shared emptiness.
  *
  * Properties preserved from [[MinHashSignature]]: set semantics
  * (order/multiplicity invariant), nulls skipped, empty/all-null input
  * yields all-MaxValue (densification never manufactures values from
  * nothing), deterministic across runs/partitions — and identical
  * inputs always produce identical signatures, so exact-duplicate
  * recall through LSH banding stays total.
  */
case class OphMinHash(child: Expression, numBins: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numBins > 0 && numBins <= 512, "numBins must be in (0, 512]")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "oph_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numBins)(Long.MaxValue)
    var k = 0
    val n = arr.numElements()
    var any = false
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val s = arr.getUTF8String(k)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        val bin = java.lang.Long.remainderUnsigned(h, numBins.toLong).toInt
        if (h < mins(bin)) mins(bin) = h
        any = true
      }
      k += 1
    }
    if (any) densify(mins)
    new GenericArrayData(mins)
  }

  /** Rotation densification: an empty bin takes the next non-empty
    * bin's minimum (cyclically), perturbed by the borrow distance so
    * two sets that share only emptiness patterns don't band-collide. */
  private def densify(mins: Array[Long]): Unit = {
    val k = mins.length
    var i = 0
    while (i < k) {
      if (mins(i) == Long.MaxValue) {
        var d = 1
        while (d < k && mins((i + d) % k) == Long.MaxValue) d += 1
        if (d < k) mins(i) = mins((i + d) % k) + d
      }
      i += 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val bin = ctx.freshName("bin")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
        |final long[] $mins = new long[$numBins];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |final int $n = $arr.numElements();
        |boolean $any = false;
        |for (int $k = 0; $k < $n; $k++) {
        |  if (!$arr.isNullAt($k)) {
        |    final $utf8 $s = $arr.getUTF8String($k);
        |    final long $h = $xxh.hashUnsafeBytes(
        |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 0L);
        |    final int $bin = (int) java.lang.Long.remainderUnsigned($h, (long) $numBins);
        |    if ($h < $mins[$bin]) $mins[$bin] = $h;
        |    $any = true;
        |  }
        |}
        |if ($any) {
        |  for (int $i = 0; $i < $numBins; $i++) {
        |    if ($mins[$i] == Long.MAX_VALUE) {
        |      int $d = 1;
        |      while ($d < $numBins && $mins[($i + $d) % $numBins] == Long.MAX_VALUE) $d++;
        |      if ($d < $numBins) $mins[$i] = $mins[($i + $d) % $numBins] + $d;
        |    }
        |  }
        |}
        |${ev.value} = new $gad($mins);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
