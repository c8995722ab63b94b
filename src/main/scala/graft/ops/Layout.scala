package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A 100 TB table is usually range-filtered on more than one column
  * (time AND tenant, partkey AND suppkey); sorting by one column makes
  * the other's min/max file statistics useless. Interleaving the bits
  * of both keys into one Z-value and range-partitioning + sorting on it
  * co-locates rows that are close in BOTH dimensions, so every file
  * covers a small rectangle of the key space and parquet min/max
  * pruning skips most files for a range filter on EITHER dimension
  * (verified quantitatively in ZorderSpec).
  *
  * The Z-value is a pure bit-shift/OR composition over built-in
  * expressions — fully codegen'd, map-only; the clustered write is one
  * range-repartition shuffle (Spark samples the Z distribution for
  * balanced file splits) plus a local sort.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at Z-bit 2i, bit i of `b` at 2i+1. Dimensions
    * of unequal width should be scaled by the caller so their top bits
    * align (e.g. `zvalue(a, b * 16, 11)` for a 7-bit `b` against an
    * 11-bit `a`) — otherwise the wider dimension owns all the high
    * Z-bits and the narrow one stops contributing to file splits. */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in (0, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as a DuckDB SQL expression (bit arithmetic is
    * integral and engine-exact, so the two formulations hash-match). */
  def zvalueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Write `df` clustered by `z`: range-partition into `numFiles`
    * splits on the Z-value, sort within each, drop the helper column.
    * One shuffle; the sort is local. */
  def zorderWrite(df: DataFrame, z: Column, path: String, numFiles: Int): Unit =
    df.withColumn("__z__", z)
      .repartitionByRange(numFiles, col("__z__"))
      .sortWithinPartitions("__z__")
      .drop("__z__")
      .write.mode(SaveMode.Overwrite).parquet(path)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q34_zorder_key",
      // The Z-value computation itself, oracle-checked: 11-bit
      // interleave of (l_partkey, l_suppkey). Map-only, integral.
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  CAST(${zvalueSql("l_partkey", "l_suppkey", 11)} AS BIGINT) AS z
              |FROM lineitem""".stripMargin),
      (s, d) =>
        Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            zvalue(col("l_partkey"), col("l_suppkey"), 11).as("z")))
  )
}
