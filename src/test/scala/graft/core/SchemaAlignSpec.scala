package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaAlignSpec extends AnyFunSuite {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  test("compatible: positional (name, type) equality") {
    assert(SchemaAlign.compatible(
      st("a" -> LongType, "b" -> StringType),
      st("a" -> LongType, "b" -> StringType)))
  }

  test("compatible: order-sensitive (reference zips fields)") {
    assert(!SchemaAlign.compatible(
      st("a" -> LongType, "b" -> StringType),
      st("b" -> StringType, "a" -> LongType)))
  }

  test("compatible: nullability ignored (main.rs:679-683)") {
    val a = StructType(Seq(StructField("a", LongType, nullable = true)))
    val b = StructType(Seq(StructField("a", LongType, nullable = false)))
    assert(SchemaAlign.compatible(a, b))
  }

  test("compatible: field count must match") {
    assert(!SchemaAlign.compatible(st("a" -> LongType), st("a" -> LongType, "b" -> LongType)))
  }

  test("compatible: type mismatch fails") {
    assert(!SchemaAlign.compatible(st("a" -> LongType), st("a" -> IntegerType)))
  }

  test("compatible: metadata ignored") {
    val m = new MetadataBuilder().putString("k", "v").build()
    val a = StructType(Seq(StructField("a", LongType, metadata = m)))
    assert(SchemaAlign.compatible(a, st("a" -> LongType)))
  }

  test("commonColumns: first schema's order, name-based lookup across reorder (B2)") {
    val s1 = st("id" -> LongType, "name" -> StringType, "extra1" -> IntegerType)
    val s2 = st("extra2" -> DoubleType, "name" -> StringType, "id" -> LongType)
    assert(SchemaAlign.commonColumns(Seq(s1, s2)) == Seq("id", "name"))
  }

  test("commonColumns: exact type match required (B3)") {
    val s1 = st("id" -> LongType, "v" -> LongType)
    val s2 = st("id" -> LongType, "v" -> StringType)
    assert(SchemaAlign.commonColumns(Seq(s1, s2)) == Seq("id"))
  }

  test("commonColumns: disjoint schemas yield empty (B3b)") {
    assert(SchemaAlign.commonColumns(Seq(st("a" -> LongType), st("b" -> LongType))).isEmpty)
  }

  test("commonColumns: single schema keeps all") {
    assert(SchemaAlign.commonColumns(Seq(st("a" -> LongType, "b" -> LongType))) == Seq("a", "b"))
  }

  test("projectedSchema keeps first schema's field (incl. nullability)") {
    val s1 = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val p = SchemaAlign.projectedSchema(s1, Seq("b", "a"))
    assert(p.fields.map(_.name).toSeq == Seq("b", "a"))
    assert(!p("a").nullable)
  }

  test("isInternalColumn (main.rs:689-691)") {
    assert(SchemaAlign.isInternalColumn("__index_level_0__"))
    assert(SchemaAlign.isInternalColumn("____"))
    assert(!SchemaAlign.isInternalColumn("_index_"))
    assert(!SchemaAlign.isInternalColumn("__index"))
    assert(!SchemaAlign.isInternalColumn("index__"))
    assert(!SchemaAlign.isInternalColumn("normal"))
  }

  test("allCompatible: pairwise over the window (main.rs:564-566)") {
    val a = st("a" -> LongType)
    assert(SchemaAlign.allCompatible(Seq(a, a, a)))
    assert(SchemaAlign.allCompatible(Seq(a)))
    assert(SchemaAlign.allCompatible(Nil))
    assert(!SchemaAlign.allCompatible(Seq(a, st("b" -> LongType), a)))
  }
}
