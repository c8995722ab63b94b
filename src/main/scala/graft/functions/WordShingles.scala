package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a space-separated text, in first-occurrence
  * order — the shingling primitive of the dedup family.
  *
  * The HOF composition (`array_distinct(transform(sequence(...),
  * i => concat_ws(" ", slice(split(text, " "), i+1, n))))`) evaluates
  * four nested interpreted lambdas per shingle; profiling showed it
  * DOMINATING dd04 (more than the candidate joins). This expression
  * tokenizes the UTF-8 bytes once and emits each shingle with a single
  * copy. Consecutive separators collapse (empty tokens are skipped);
  * texts with fewer than n tokens yield one shingle with what's there;
  * empty/blank text yields an empty array.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0 && n <= 16, "shingle width must be in (0, 16]")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token boundaries (byte offsets), skipping empty tokens; primitive
    // int arrays (an ArrayBuffer[Int] would box every offset in the hot
    // path this expression exists to avoid); max tokens = (len+1)/2
    val maxToks = bytes.length / 2 + 1
    val starts = new Array[Int](maxToks)
    val ends = new Array[Int](maxToks)
    var nToks = 0
    var i = 0
    var tokStart = -1
    while (i <= bytes.length) {
      val isSep = i == bytes.length || bytes(i) == ' '.toByte
      if (isSep) {
        if (tokStart >= 0) { starts(nToks) = tokStart; ends(nToks) = i; nToks += 1; tokStart = -1 }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (nToks == 0) return new GenericArrayData(Array.empty[Any])
    val out = new mutable.LinkedHashSet[UTF8String]
    val nShingles = math.max(nToks - n + 1, 1)
    var s = 0
    while (s < nShingles) {
      val last = math.min(s + n - 1, nToks - 1)
      // one copy: bytes from start of token s to end of token `last`,
      // with runs of separators collapsed to single spaces
      val len0 = ends(last) - starts(s)
      val buf = new Array[Byte](len0)
      var w = 0
      var r = starts(s)
      var inSep = false
      while (r < ends(last)) {
        val b = bytes(r)
        if (b == ' '.toByte) {
          if (!inSep) { buf(w) = ' '.toByte; w += 1; inSep = true }
        } else { buf(w) = b; w += 1; inSep = false }
        r += 1
      }
      out += UTF8String.fromBytes(java.util.Arrays.copyOf(buf, w))
      s += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  // interpreted eval is already one tight pass; generated code calls it
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    val arrCls = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = ($arrCls) $ref.nullSafeEval($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
