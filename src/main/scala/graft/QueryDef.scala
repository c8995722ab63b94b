package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operation: a Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query
  * over the same parquet tables (driver contract, SURVEY §5.2). Output
  * column names MUST match between `fn` and `oracle` — the driver sorts
  * columns by name before hashing. Ops whose semantics SQL cannot express
  * (LSH internals, file-sink pipelines) leave `oracle` empty and get the
  * driver's weaker rows-only check. */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object Tables {
  /** Read one driver testdata table under the given scale-factor dir. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
