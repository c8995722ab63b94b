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
  * fits a BIGINT.
  *
  * The MinHash family is Kirsch–Mitzenmacher double hashing (the
  * technique proven for Bloom filters in "Less Hashing, Same
  * Performance", K&M 2006, and standard in MinHash/LSH practice):
  * ONE digest per element, `m = md5("0:" ++ s)`, yields
  * `h1` = hex chars 1–15 and `h2` = hex chars 16–30 of `m`, and the
  * k-th hash is `h_k(s) = (h1 mod P + (k · (h2 mod P)) mod P) mod P`
  * with [[PortableMd5.P]] the largest prime below 2^57. The prime
  * bound is chosen for ENGINE portability, not convenience: with
  * `k ≤ 63` every intermediate (`k·(h2 mod P) ≤ 63·(P−1) < 2^63`,
  * sums `< 2^58`) stays inside exact BIGINT arithmetic, so DuckDB
  * (which ERRORS on int64 overflow) and ANSI-mode Spark replay the
  * family with plain `%` / `*` / `+` on positive operands — no
  * 128-bit types, no wrapping semantics to reconcile. A first cut
  * used 32 digests per element (two 60-bit hashes from each of 32
  * seeded md5s); the KM family computes the same-quality signature
  * from ONE digest — ~30× less hashing on the signature pass, which
  * is the CPU-dominant stage of a corpus-scale MinHash run, and the
  * measured dd02 precision/recall vs the exact tier is unchanged
  * (SketchQualitySpec).
  *
  * Why native expressions instead of composing the builtins: Spark's
  * `md5` goes through commons-codec, which looks up a fresh
  * MessageDigest per CALL, then hex-encodes to a string that `conv`
  * re-parses — measured ~1–2 µs per hash. The HOF formulation
  * additionally interprets its lambdas per element: the composed dd02
  * ran 16.7 s and the nested-aggregate dd03 68 s at sf0.1. These
  * kernels reuse a thread-local MessageDigest, digest the raw UTF-8
  * bytes once per element, and run as tight primitive loops
  * callable from whole-stage codegen — same values, ~50× cheaper.
  * Values are identical to the composed form by construction
  * (PortableMd5Spec pins bit-parity against the builtin composition).
  */
object PortableMd5 {

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))
  private val outBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  /** Largest prime below 2^57 — the modulus of the KM double-hashing
    * family. See the object Scaladoc for why 57 bits: it is the
    * largest range for which `63·(P−1)` still fits a signed 64-bit
    * integer, keeping the oracle's replay in exact BIGINT ops. */
  val P: Long = 144115188075855859L

  /** UTF-8 bytes of the fixed digest prefix of the MinHash family. */
  private val SigPrefix: Array[Byte] = "0:".getBytes("UTF-8")

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

  /** KM double-hashing MinHash signature: ONE digest per element,
    * `m = md5("0:" ++ s)`, `h1` = hex chars 1–15 and `h2` = hex chars
    * 16–30 of m, and hash k is `(h1 mod P + (k·(h2 mod P)) mod P)
    * mod P` — every term a plain `substr`-of-`md5` / BIGINT-arithmetic
    * derivation any engine reproduces (the `k·h2` term is accumulated
    * additively here, which is exactly `(k·(h2 mod P)) mod P` without
    * the multiply). The signature is the per-k minimum over the
    * array's non-null elements; empty / all-null input yields
    * all-Long.MaxValue (the [[MinHashSignature]] convention). Called
    * from codegen. */
  def minHashSig(arr: ArrayData, numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    val out = outBuf.get()
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val bytes = arr.getUTF8String(k).getBytes
        md.reset()
        md.update(SigPrefix)
        md.update(bytes)
        md.digest(out, 0, 16)
        val h1 = hi60(out) % P
        val h2 = mid60(out) % P
        var t = 0L
        var g = 0
        while (g < numHashes) {
          val h = (h1 + t) % P
          if (h < mins(g)) mins(g) = h
          t += h2
          if (t >= P) t -= P
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

/** `md5_minhash_sig(arr, k)`: MinHash signature over the portable
  * KM double-hashing md5 family. */
case class Md5MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // 64 is the replay bound, not a kernel limit: an external engine
  // computes hash k via k·(h2 mod P), and 63·(P−1) is the largest
  // such product that cannot overflow exact BIGINT arithmetic.
  require(numHashes > 0 && numHashes <= 64, "numHashes must be in (0, 64]")

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
