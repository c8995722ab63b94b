package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the PORTABILITY contract of the md5-derived kernels: the
  * native [[Md5Low60]] / [[Md5MinHashSig]] / [[Md5SimHashSig]]
  * expressions must be bit-identical to the builtin composition
  * `conv(substring(md5(x), 1, 15), 16, 10)` — the form any external
  * engine (the DuckDB oracle included) derives. If these ever drift,
  * the dd02/dd03/dd04 oracle checks stop being checks of the shipped
  * kernels. */
class PortableMd5Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(encode(c, "UTF-8")), 1, 15), 16, 10).cast("long")

  test("md5_low60 equals the builtin conv(substring(md5)) composition") {
    // known value: md5('abc') = 900150983cd24fb0..., first 15 hex
    // chars as an integer
    val known = Seq("abc").toDF("s")
      .select(GraftFunctions.md5_low60(col("s"))).head().getLong(0)
    assert(known == 648541476951500027L)
    val corpus = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val diff = corpus
      .select(explode(GraftFunctions.word_shingles(col("text"), 3)).as("s"))
      .filter(GraftFunctions.md5_low60(col("s")) =!= composed(col("s")))
    assert(diff.count() == 0)
    // unicode + empty + separator-heavy strings
    val edge = Seq("", "héllo wörld", "a:b", "0:x", "é世界").toDF("s")
      .filter(GraftFunctions.md5_low60(col("s")) =!= composed(col("s")))
    assert(edge.count() == 0)
  }

  test("md5_minhash_sig equals the composed KM double-hashing derivation") {
    // ONE digest per element: h1 = hex chars 1-15, h2 = hex chars
    // 16-30 of md5("0:" ++ s); hash k = (h1%P + (k*(h2%P))%P) % P —
    // the exact substr-of-md5 + BIGINT-arithmetic forms the DuckDB
    // oracle uses (every intermediate < 2^63, so ANSI Spark and
    // overflow-erroring DuckDB agree)
    def sub60(c: org.apache.spark.sql.Column, pos: Int) =
      conv(substring(md5(encode(c, "UTF-8")), pos, 15), 16, 10).cast("long")
    val P = lit(PortableMd5.P)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
      .select(col("doc_id"), GraftFunctions.word_shingles(col("text"), 3).as("shs"))
      .filter(size(col("shs")) > 0)
    val slow = docs
      .select(col("doc_id"), transform(col("shs"), s => {
        val seeded = concat(lit("0:"), s)
        struct((sub60(seeded, 1) % P).as("h1"), (sub60(seeded, 16) % P).as("h2"))
      }).as("hp"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(15)), g =>
          array_min(transform(col("hp"), t =>
            (t("h1") + (g.cast("long") * t("h2")) % P) % P))).as("mh"))
    val fast = docs.select(col("doc_id"),
      GraftFunctions.md5_minhash_sig(col("shs"), 16).as("mh"))
    assert(fast.except(slow).isEmpty && slow.except(fast).isEmpty)
  }

  test("md5_simhash_sig equals the nested-aggregate composition") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
    val slow = docs
      .select(col("doc_id"), transform(col("toks"), t => composed(t)).as("hs"))
      .select(col("doc_id"),
        expr("""aggregate(sequence(0, 59), 0L, (acc, b) ->
               |  acc + if(aggregate(hs, 0L,
               |           (s, x) -> s + (shiftright(x, b) & 1L) * 2L - 1L) > 0L,
               |         shiftleft(1L, b), 0L))""".stripMargin).as("sim"))
    val fast = docs.select(col("doc_id"),
      GraftFunctions.md5_simhash_sig(col("toks")).as("sim"))
    assert(fast.except(slow).isEmpty && slow.except(fast).isEmpty)
  }

  test("property: MinHash signature is a union-homomorphism (sig(A∪B) = min(sig(A), sig(B)))") {
    // the algebraic fact LSH banding and any distributed merge rest
    // on: per-hash minima over a union are the elementwise minima of
    // the parts' signatures — randomized over 40 corpus splits
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(11)
    def sig(elems: Seq[String]): Seq[Long] = {
      val lit = Literal.create(
        new GenericArrayData(elems.map(UTF8String.fromString).toArray[Any]),
        ArrayType(StringType, containsNull = false))
      Md5MinHashSig(lit, 16).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    }
    for (_ <- 1 to 40) {
      val all = Seq.fill(2 + rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
      val cut = rnd.nextInt(all.size)
      val (a, b) = all.splitAt(cut)
      val fused = sig(all)
      val merged =
        if (a.isEmpty) sig(b) else if (b.isEmpty) sig(a)
        else sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
      assert(fused == merged, s"a=$a b=$b")
    }
  }

  test("property: md5_low60 matches the builtin composition on random unicode strings") {
    val rnd = new scala.util.Random(23)
    // whole code points only — a lone surrogate half would hit
    // engine-specific invalid-UTF8 replacement, which is not the
    // contract under test
    val alphabet = Seq("a", "b", "c", " ", "α", "β", "世", "界", "🚀",
      ",", ":", ";", "\t", "0", "1", "é")
    val strs = Seq.fill(300)(
      Seq.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.size))).mkString)
    val df = strs.toDF("s")
      .filter(GraftFunctions.md5_low60(col("s")) =!= composed(col("s")))
    assert(df.count() == 0)
  }

  test("interpreted eval agrees with codegen; null/empty semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    // interpreted paths (direct eval, no codegen)
    val s = Literal.create(UTF8String.fromString("abc"), StringType)
    assert(Md5Low60(s).eval(null) == 648541476951500027L)
    assert(Md5Low60(Literal.create(null, StringType)).eval(null) == null)
    val arr = Literal.create(
      new GenericArrayData(Array[Any](UTF8String.fromString("x"), null)),
      ArrayType(StringType, containsNull = true))
    val sig = Md5MinHashSig(arr, 4).eval(null).asInstanceOf[ArrayData]
    assert(sig.numElements() == 4)
    // nulls skipped: same as single-element array
    val one = Literal.create(
      new GenericArrayData(Array[Any](UTF8String.fromString("x"))),
      ArrayType(StringType, containsNull = true))
    assert(Md5MinHashSig(one, 4).eval(null).asInstanceOf[ArrayData].toLongArray()
      .sameElements(sig.toLongArray()))
    // empty minhash input -> all MaxValue; empty simhash -> 0
    val empty = Literal.create(new GenericArrayData(Array.empty[Any]),
      ArrayType(StringType, containsNull = true))
    assert(Md5MinHashSig(empty, 4).eval(null).asInstanceOf[ArrayData]
      .toLongArray().forall(_ == Long.MaxValue))
    assert(Md5SimHashSig(empty).eval(null) == 0L)
    // codegen path through a real plan (registered SQL function)
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT md5_low60('abc'), md5_minhash_sig(array('abc'), 2), md5_simhash_sig(array('abc'))")
      .head()
    assert(got.getLong(0) == 648541476951500027L)
    assert(got.getAs[scala.collection.Seq[Long]](1).nonEmpty)
  }
}
