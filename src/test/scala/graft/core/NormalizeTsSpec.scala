package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** [[Tables.normalizeTs]] contract: a LongType ts column is NANOSECONDS,
  * and anything in micros/millis magnitude must fail loudly — the silent
  * 1000× shift (ADVICE r4) is the bug class this pins. */
class NormalizeTsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def longTs(vals: Long*) = {
    import spark.implicits._
    vals.toDF("ts")
  }

  test("nanos-Long normalizes to the truncated micro timestamp") {
    val nanos = 1735689600123456789L // 2025-01-01T00:00:00.123456789
    val out = Tables.normalizeTs(longTs(nanos))
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).head().getString(0)
    assert(out == "2025-01-01 00:00:00.123456")
  }

  test("micros-Long fails loudly instead of silently shifting 1000x") {
    val micros = 1735689600123456L // same instant encoded as MICROS
    // assert_true surfaces as SparkRuntimeException (whose TYPE scalac
    // can't see through the unmanaged jar split — only the companion);
    // catching RuntimeException + message keeps the pin just as tight.
    val e = intercept[RuntimeException] {
      Tables.normalizeTs(longTs(micros)).collect()
    }
    assert(e.getMessage.contains("NANOSECONDS"), s"unexpected error: ${e.getMessage}")
  }

  test("null ts rows pass the guard") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(1735689600123456789L), None).toDF("ts")
    val out = Tables.normalizeTs(df).collect()
    assert(out.length == 2 && out.count(_.isNullAt(0)) == 1)
  }
}
