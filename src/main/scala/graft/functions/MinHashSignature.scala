package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for seeds 0..numHashes-1, the minimum
  * xxhash64 of the input string array's elements — the signature an LSH
  * near-dup pass bands over.
  *
  * Built-in alternatives both lose at scale: `explode` + 64
  * `min(xxhash64(...))` aggregates shuffles every (doc, shingle) pair;
  * `transform`/`array_min` HOFs stay map-side but interpret the lambda
  * per (element × seed). This expression is map-side AND a single
  * codegen'd loop: elements outer, seeds inner, running minima in a
  * local long[].
  *
  * Hash: XXH64 over the UTF8 bytes with the seed = hash index —
  * deterministic across runs/partitions. Null elements are skipped;
  * an empty/all-null array yields Long.MaxValue minima.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0 && numHashes <= 512, "numHashes must be in (0, 512]")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    val n = arr.numElements()
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val s = arr.getUTF8String(k)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, i.toLong)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
        |final long[] $mins = new long[$numHashes];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |final int $n = $arr.numElements();
        |for (int $k = 0; $k < $n; $k++) {
        |  if (!$arr.isNullAt($k)) {
        |    final $utf8 $s = $arr.getUTF8String($k);
        |    for (int $i = 0; $i < $numHashes; $i++) {
        |      final long $h = $xxh.hashUnsafeBytes(
        |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $i);
        |      if ($h < $mins[$i]) $mins[$i] = $h;
        |    }
        |  }
        |}
        |${ev.value} = new $gad($mins);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
