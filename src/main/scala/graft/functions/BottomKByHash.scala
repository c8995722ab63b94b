package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The k elements of a string array with the smallest xxhash64 values —
  * a bottom-k sketch. Used as inverted-index posting keys for n-gram
  * near-dup: identical sets produce identical sketches (total recall on
  * exact dups), similar sets overlap proportionally, and posting-list
  * joins shrink quadratically versus indexing every element.
  *
  * One codegen pass with a k-sized insertion buffer (k is tiny);
  * deterministic: ties broken by keeping the first-seen element; null
  * elements skipped; duplicates contribute once (first occurrence).
  */
case class BottomKByHash(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0 && k <= 128, "k must be in (0, 128]")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bottomk_by_hash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val hs = new Array[Long](k)
    val vs = new Array[UTF8String](k)
    var size = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        // insertion sort into the bottom-k buffer; strict < keeps the
        // first-seen element on hash ties (incl. duplicate strings)
        if (size < k || h < hs(size - 1)) {
          var j = if (size < k) size else k - 1
          var dup = false
          // skip if this exact hash+value is already present
          var t = 0
          while (t < size && !dup) { dup = hs(t) == h && vs(t).equals(s); t += 1 }
          if (!dup) {
            while (j > 0 && hs(j - 1) > h) {
              hs(j) = hs(j - 1); vs(j) = vs(j - 1); j -= 1
            }
            // clone: the input ArrayData's buffer may be reused after eval
            hs(j) = h; vs(j) = s.clone()
            if (size < k) size += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](size)
    System.arraycopy(vs, 0, out, 0, size)
    new GenericArrayData(out)
  }

  // Interpreted eval is already a tight loop; fall back to it from
  // generated code via a reference to this expression instance.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bottomK", this, classOf[BottomKByHash].getName)
    val arrCls = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = ($arrCls) $ref.nullSafeEval($arr);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
