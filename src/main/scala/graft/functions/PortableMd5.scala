package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The PORTABLE md5-derived hash kernels behind the oracle-exact
  * dd02/dd03/dd04 sketch pipelines (r7).
  *
  * Contract: `low60(x)` is the integer value of the first 15 hex
  * characters of `md5(x)` — i.e. the big-endian first 8 digest bytes
  * shifted right by one nibble — exactly what any engine with `md5`
  * derives: Spark `conv(substring(md5(x), 1, 15), 16, 10)`, DuckDB
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. Non-negative,
  * fits a BIGINT. The seeded MinHash family takes TWO independent
  * 60-bit hashes per digest (hex chars 1–15 and 16–30 of
  * `md5("g:" ++ s)`, `g` rendered in decimal), halving digest count.
  *
  * Why native expressions instead of composing the builtins: Spark's
  * `md5` goes through commons-codec, which looks up a fresh
  * MessageDigest per CALL, then hex-encodes to a string that `conv`
  * re-parses — measured ~1–2 µs per hash. The classic-MinHash
  * signature needs 64 hashes per shingle, and the HOF formulation
  * additionally interprets its lambdas per element: the composed dd02
  * ran 16.7 s and the nested-aggregate dd03 68 s at sf0.1. These
  * kernels reuse a thread-local MessageDigest, digest the raw UTF-8
  * bytes once per (seed, element), and run as tight primitive loops
  * callable from whole-stage codegen — same values, ~50× cheaper.
  * Values are identical to the composed form by construction
  * (PortableMd5Spec pins bit-parity against the builtin composition).
  */
object PortableMd5 {

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))
  private val outBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  /** Decimal "i:" prefixes for the seeded family, precomputed for the
    * seed range any registered pipeline uses. */
  private val MaxSeeds = 512
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(MaxSeeds)(i => s"$i:".getBytes("UTF-8"))

  private def be64(out: Array[Byte], off: Int): Long =
    ((out(off) & 0xFFL) << 56) | ((out(off + 1) & 0xFFL) << 48) |
    ((out(off + 2) & 0xFFL) << 40) | ((out(off + 3) & 0xFFL) << 32) |
    ((out(off + 4) & 0xFFL) << 24) | ((out(off + 5) & 0xFFL) << 16) |
    ((out(off + 6) & 0xFFL) << 8) | (out(off + 7) & 0xFFL)

  /** hex chars 1–15 of the digest in `out` as an integer. */
  private def hi60(out: Array[Byte]): Long = be64(out, 0) >>> 4

  /** hex chars 16–30 of the digest in `out` as an integer: the low
    * nibble of byte 7 followed by bytes 8–14. */
  private def mid60(out: Array[Byte]): Long =
    ((out(7) & 0xFL) << 56) | (be64(out, 8) >>> 8)

  /** low-60-bit md5 of the string's UTF-8 bytes. */
  def low60(s: UTF8String): Long = {
    val md = digests.get()
    val out = outBuf.get()
    md.reset()
    md.update(s.getBytes)
    md.digest(out, 0, 16)
    hi60(out)
  }

  /** Classic per-seed MinHash signature with TWO independent 60-bit
    * hashes per digest: for seed pair g, `m = md5("g:" ++ s)` yields
    * `h_{2g}(s)` = hex chars 1–15 of m and `h_{2g+1}(s)` = hex chars
    * 16–30 — both plain `substr`-of-`md5` derivations any engine
    * reproduces, at half the digest count of one-seed-per-hash. The
    * signature is the per-seed minimum over the array's non-null
    * elements; empty / all-null input yields all-Long.MaxValue (the
    * [[MinHashSignature]] convention). Called from codegen. */
  def minHashSig(arr: ArrayData, numHashes: Int): Array[Long] = {
    // evenness is enforced at CONSTRUCTION by Md5MinHashSig (per-row
    // validation in the hot loop would fail mid-query; r7 review)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    val out = outBuf.get()
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val bytes = arr.getUTF8String(k).getBytes
        var g = 0
        while (g < numHashes / 2) {
          md.reset()
          md.update(prefixes(g))
          md.update(bytes)
          md.digest(out, 0, 16)
          val h1 = hi60(out)
          val h2 = mid60(out)
          if (h1 < mins(2 * g)) mins(2 * g) = h1
          if (h2 < mins(2 * g + 1)) mins(2 * g + 1) = h2
          g += 1
        }
      }
      k += 1
    }
    mins
  }

  /** Portable 60-bit SimHash: per bit b in [0, 60), the sign of the
    * ±1 majority sum of bit b over the token-bag's `low60` hashes
    * (sum > 0 → bit set; ties → clear). Nulls skipped; empty input
    * yields 0. Called from codegen. */
  def simHashSig(arr: ArrayData): Long = {
    val cnt = new Array[Int](60)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val h = low60(arr.getUTF8String(k))
        var b = 0
        while (b < 60) {
          cnt(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      k += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (cnt(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }
}

/** `md5_low60(s)`: the portable 60-bit md5 hash as a scalar. */
case class Md5Low60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_low60"

  override def nullSafeEval(input: Any): Any =
    PortableMd5.low60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PortableMd5.low60($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_minhash_sig(arr, k)`: classic per-seed MinHash signature over
  * the portable seeded md5 family. */
case class Md5MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0 && numHashes <= 512, "numHashes must be in (0, 512]")
  require(numHashes % 2 == 0,
    "numHashes must be even (each md5 digest yields two 60-bit hashes)")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PortableMd5.minHashSig(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad(graft.functions.PortableMd5.minHashSig($arr, $numHashes));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_simhash_sig(tokens)`: portable 60-bit SimHash of a token bag. */
case class Md5SimHashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash_sig"

  override def nullSafeEval(input: Any): Any =
    PortableMd5.simHashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PortableMd5.simHashSig($arr);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
