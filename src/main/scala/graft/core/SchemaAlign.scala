package graft.core

import org.apache.spark.sql.types.{DataType, StructType}

/** Schema compatibility + intersection semantics of the reference engine
  * (shanytc/parquet-merger, `src/main.rs`), re-expressed over Spark
  * `StructType`.
  *
  *  - `compatible` mirrors `schemas_compatible` (main.rs:674-686):
  *    positional (name, dataType) equality; field counts must match;
  *    nullability and field metadata are ignored.
  *  - `commonColumns` mirrors `find_common_columns` (main.rs:617-642):
  *    columns present in every schema with an exactly equal dataType, in
  *    the FIRST schema's field order; membership lookup is by name, so
  *    later schemas may order fields differently.
  *  - `projectedSchema` mirrors `create_schema_from_columns`
  *    (main.rs:645-654): projected fields clone the first schema's
  *    fields, including its nullability flags.
  *  - `isInternalColumn` mirrors `is_internal_column` (main.rs:689-691):
  *    pandas-style `__...__` columns, dropped only on the CSV path.
  */
object SchemaAlign {

  def compatible(a: StructType, b: StructType): Boolean =
    a.fields.length == b.fields.length &&
      a.fields.iterator.zip(b.fields.iterator).forall { case (x, y) =>
        x.name == y.name && x.dataType == y.dataType
      }

  /** True when every adjacent pair is compatible — pairwise equality is
    * transitive here, matching the reference's `windows(2)` check
    * (main.rs:564-566). */
  def allCompatible(schemas: Seq[StructType]): Boolean =
    schemas.sliding(2).forall {
      case Seq(a, b) => compatible(a, b)
      case _         => true
    }

  def commonColumns(schemas: Seq[StructType]): Seq[String] = {
    if (schemas.isEmpty) return Nil
    val rest: Seq[Map[String, DataType]] =
      schemas.tail.map(s => s.fields.map(f => f.name -> f.dataType).toMap)
    schemas.head.fields.iterator
      .filter(f => rest.forall(_.get(f.name).contains(f.dataType)))
      .map(_.name)
      .toSeq
  }

  def projectedSchema(first: StructType, columns: Seq[String]): StructType =
    StructType(columns.flatMap(c => first.fields.find(_.name == c)))

  def isInternalColumn(name: String): Boolean =
    name.startsWith("__") && name.endsWith("__")
}
