package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Mergeable top-k SELECTION by score as a `TypedImperativeAggregate`:
  * keep the k best (score DESC, id ASC) rows seen so far in an O(k)
  * buffer that partial-aggregates map-side and merges associatively.
  *
  * Why it matters at scale: per-group "k nearest" via a ranking window
  * (vs10's original plan) shuffles EVERY scored candidate row —
  * O(N·candidates) — into a per-group sort. This aggregate collapses
  * each map partition's candidates to k entries before the exchange,
  * so the shuffle ships O(groups · k) rows regardless of candidate
  * fan-out. For an all-pairs kNN graph that is the difference between
  * shuffling N² rows and N·k.
  *
  * Unlike [[TopKFreq]] (which folds duplicate keys and is exact only
  * post-groupBy), selection of the k best under a TOTAL order is a
  * commutative, associative, idempotent-free monoid: this aggregate is
  * EXACT for any input shape. Ties are impossible with distinct ids;
  * the (score DESC, id ASC) order is total, so results are engine- and
  * partition-deterministic.
  *
  * Output: array<struct<id bigint, score double>> sorted (score DESC,
  * id ASC).
  */
case class TopKByScore(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Double)]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k > 0 && k <= 100000, "k must be in (0, 100000]")

  // (type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType, DoubleType)

  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Double)] =
    mutable.ArrayBuffer.empty

  /** (i1, s1) ranks strictly better than (i2, s2)? score DESC, id ASC. */
  private def better(i1: Long, s1: Double, i2: Long, s2: Double): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def add(buf: mutable.ArrayBuffer[(Long, Double)], i: Long, s: Double): Unit = {
    if (buf.size < k) { buf += ((i, s)); return }
    // evict the worst tracked entry iff the newcomer beats it (k is
    // small in every engine use; linear scan beats heap constants)
    var wi = 0
    var j = 1
    while (j < buf.size) {
      if (better(buf(wi)._1, buf(wi)._2, buf(j)._1, buf(j)._2)) wi = j
      j += 1
    }
    if (better(i, s, buf(wi)._1, buf(wi)._2)) buf(wi) = ((i, s))
  }

  override def update(
      buf: mutable.ArrayBuffer[(Long, Double)], input: InternalRow): mutable.ArrayBuffer[(Long, Double)] = {
    val iv = id.eval(input)
    val sv = score.eval(input)
    if (iv != null && sv != null)
      add(buf, iv.asInstanceOf[Long], sv.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Long, Double)],
      other: mutable.ArrayBuffer[(Long, Double)]): mutable.ArrayBuffer[(Long, Double)] = {
    other.foreach { case (i, s) => add(buf, i, s) }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Double)]): Any = {
    val entries = buf.sortBy { case (i, s) => (-s, i) }
    new GenericArrayData(entries.map { case (i, s) =>
      new GenericInternalRow(Array[Any](i, s))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, s) => out.writeLong(i); out.writeDouble(s) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Double)]
    var i = 0
    while (i < n) {
      buf += ((in.readLong(), in.readDouble()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), score = newChildren(1))
}
