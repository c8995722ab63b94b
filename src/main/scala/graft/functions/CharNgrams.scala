package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL character n-grams of a string (duplicates kept, left-to-right) —
  * the profile primitive behind statistical language ID (tx22).
  *
  * The HOF composition (`transform(sequence(1, length-n+1),
  * i => substr(text, i, n))`) evaluates an interpreted lambda plus a
  * codepoint-seeking substr per position — O(len²) byte scans per doc
  * and per-element boxing; profiling showed it dominating tx22. This
  * expression walks the UTF-8 code-point boundaries ONCE and emits each
  * n-gram as a single byte-range copy.
  *
  * Code-point semantics match `substr`/DuckDB's `substr`: offsets are
  * characters, not bytes. Strings shorter than n characters yield an
  * empty array (DuckDB's `range(1, len-n+1)` emits nothing there; the
  * sequence() composition instead runs DESCENDING and emits junk
  * substrings — harmless in tx22's top-5 but wrong, another reason the
  * native expression exists).
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0 && n <= 16, "ngram width must be in (0, 16]")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    // byte offset of each code-point start, plus the end sentinel
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      offs(nChars) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    offs(nChars) = bytes.length
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - n + 1)
    var c = 0
    while (c <= nChars - n) {
      out(c) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(c), offs(c + n)))
      c += 1
    }
    new GenericArrayData(out)
  }

  // interpreted eval is already one tight pass; generated code calls it
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgrams", this, classOf[CharNgrams].getName)
    val arrCls = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = ($arrCls) $ref.nullSafeEval($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
