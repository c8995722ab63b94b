package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array (with multiplicity): per token, its
  * XXH64 contributes +1/-1 to each bit position's tally; the signature
  * sets the bits with positive tally. One map-side pass — replaces the
  * explode + 64 per-bit `sum(when(...))` aggregates shape, which
  * shuffles every (doc, token) pair and runs 64 branch expressions per
  * token. Null elements are skipped; an empty array yields 0L.
  *
  * Hashing basis: XXH64 over the UTF-8 bytes with seed 0. NOT
  * bit-compatible with Spark's `xxhash64(...)` SQL function (seed 42,
  * different composition) — fingerprints computed by other means must
  * not be compared against these. */
case class SimHashSignature(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashSignature].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = (Long) $ref.nullSafeEval($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
