package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native i<j pair enumeration over a posting-list bucket — the
  * candidate-generation kernel of the dedup family (dd02/dd04/dd06/
  * tx14).
  *
  * The HOF spelling (`explode(flatten(transform(ids, (x,i) =>
  * transform(slice(ids, i+2, size), y => struct(x, y)))))`) is
  * semantically identical but evaluates its lambdas interpreted AND
  * materializes the full k² pair array (plus k slice copies) per bucket
  * before the explode. At sf0.1 the dd06 buckets expand to 5.3M pairs —
  * the nested-HOF allocation was the hottest interpreted path in the
  * bench. This Generator streams the pairs straight into GenerateExec:
  * one pass, one reused row buffer's worth of allocation per pair, no
  * intermediate arrays.
  *
  * Input arrays are expected pre-sorted (callers sort_array their
  * collect_set), so emitted pairs satisfy a < b in array order.
  */
abstract class PairGenerator extends Generator with CodegenFallback {
  // (not UnaryExpression: its concrete `eval: Any` can't satisfy
  // Generator's abstract `eval: IterableOnce[InternalRow]` in a mixin)
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
}

/** `pair_ids(array<long>)` → rows (a, b) for all i<j combinations. */
case class PairExpandIds(child: Expression) extends PairGenerator {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val ids = v.asInstanceOf[ArrayData].toLongArray()
    val k = ids.length
    if (k < 2) return Iterator.empty
    new Iterator[InternalRow] {
      private var x = 0
      private var y = 1
      override def hasNext: Boolean = x < k - 1
      override def next(): InternalRow = {
        val r = InternalRow(ids(x), ids(y))
        y += 1
        if (y >= k) { x += 1; y = x + 1 }
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `pair_sized(array<struct<id:long, n:long>>)` → rows (a, na, b, nb):
  * pair enumeration with each side's set size riding along, so the
  * downstream similarity denominator needs no join back to the corpus. */
case class PairExpandSized(child: Expression) extends PairGenerator {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("na", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("nb", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val data = v.asInstanceOf[ArrayData]
    val k = data.numElements()
    if (k < 2) return Iterator.empty
    val ids = new Array[Long](k)
    val ns = new Array[Long](k)
    var i = 0
    while (i < k) {
      val st = data.getStruct(i, 2)
      ids(i) = st.getLong(0)
      ns(i) = st.getLong(1)
      i += 1
    }
    new Iterator[InternalRow] {
      private var x = 0
      private var y = 1
      override def hasNext: Boolean = x < k - 1
      override def next(): InternalRow = {
        val r = InternalRow(ids(x), ns(x), ids(y), ns(y))
        y += 1
        if (y >= k) { x += 1; y = x + 1 }
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
