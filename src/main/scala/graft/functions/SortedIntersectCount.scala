package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| of two ASCENDING-sorted
  * `array<bigint>` columns via a two-pointer merge — the exact-verify
  * kernel of the dedup family (dd02/dd03/dd04/dd06/dd15).
  *
  * Why not `size(array_intersect(a, b))`: Spark's `array_intersect`
  * builds a fresh hash set AND materializes the intersection array per
  * row, only for `size` to throw the array away. On dd06's sf0.1
  * verify stage that is ~180k candidate pairs × (hash-set insert +
  * array alloc) — profiled at ~2.0s of the query's 2.5s steady state.
  * The merge loop does the same set count with zero allocation inside
  * WholeStageCodegen, and is branch-predictable on the mostly-disjoint
  * pairs the candidate stages emit.
  *
  * Semantics match `size(array_intersect(a, b))` on sorted inputs:
  * DISTINCT common values are counted (equal runs are skipped on both
  * sides), so inputs need not be duplicate-free, only sorted. Null
  * array → null. PRECONDITIONS (also stated at the SQL registration,
  * `CosineSimilarity.scala`): elements must be NON-NULL — a null slot
  * ANYWHERE in either array raises an error rather than silently
  * reading garbage bytes (r5 ADVICE): the merge loop checks each
  * element it visits, and once one side is exhausted the unvisited
  * tails are null-scanned too (r6 ADVICE — without the tail sweep
  * the guarantee held only for visited elements; the sweep is a
  * branch-predictable isNullAt pass over at most the input length,
  * outside the per-pair hot loop). Arrays must be ASCENDING-sorted,
  * which is NOT checked (a full check would visit consecutive pairs
  * the merge loop skips); unsorted input undercounts. All engine call
  * sites build inputs via `sort_array` over `xxhash64` outputs,
  * satisfying both by construction.
  *
  * The sort the inputs need is paid ONCE per document at signature
  * build (`sort_array` over an ~n-element hash array, n = shingle
  * count), not once per candidate pair — at 100 TB the pair count
  * dwarfs the doc count, which is what makes sort-once + merge-many
  * the right trade.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) {
        throw new IllegalArgumentException(
          "sorted_intersect_count: null array element (inputs must be non-null, ascending-sorted)")
      }
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        cnt += 1
        // count the VALUE once: skip equal runs on both sides — each
        // slot null-checked BEFORE its getLong (an unchecked read of a
        // null slot returns the raw 0 bytes, which could silently
        // extend a 0-run past a null; r7 review)
        while (i < nx && !x.isNullAt(i) && x.getLong(i) == xv) i += 1
        while (j < ny && !y.isNullAt(j) && y.getLong(j) == yv) j += 1
      }
    }
    // tail sweep: the loop above exits once one side is exhausted;
    // nulls in the unvisited remainder must still raise (doc contract)
    while (i < nx) {
      if (x.isNullAt(i)) throw new IllegalArgumentException(
        "sorted_intersect_count: null array element (inputs must be non-null, ascending-sorted)")
      i += 1
    }
    while (j < ny) {
      if (y.isNullAt(j)) throw new IllegalArgumentException(
        "sorted_intersect_count: null array element (inputs must be non-null, ascending-sorted)")
      j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |final int $nx = $a.numElements();
        |final int $ny = $b.numElements();
        |int $i = 0; int $j = 0; long $cnt = 0L;
        |while ($i < $nx && $j < $ny) {
        |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
        |    throw new IllegalArgumentException(
        |      "sorted_intersect_count: null array element (inputs must be non-null, ascending-sorted)");
        |  }
        |  final long $xv = $a.getLong($i);
        |  final long $yv = $b.getLong($j);
        |  if ($xv < $yv) { $i++; }
        |  else if ($xv > $yv) { $j++; }
        |  else {
        |    $cnt++;
        |    while ($i < $nx && !$a.isNullAt($i) && $a.getLong($i) == $xv) { $i++; }
        |    while ($j < $ny && !$b.isNullAt($j) && $b.getLong($j) == $yv) { $j++; }
        |  }
        |}
        |while ($i < $nx) {
        |  if ($a.isNullAt($i)) {
        |    throw new IllegalArgumentException(
        |      "sorted_intersect_count: null array element (inputs must be non-null, ascending-sorted)");
        |  }
        |  $i++;
        |}
        |while ($j < $ny) {
        |  if ($b.isNullAt($j)) {
        |    throw new IllegalArgumentException(
        |      "sorted_intersect_count: null array element (inputs must be non-null, ascending-sorted)");
        |  }
        |  $j++;
        |}
        |${ev.value} = $cnt;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
