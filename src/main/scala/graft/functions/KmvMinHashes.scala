package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count synopsis as a
  * `TypedImperativeAggregate`: the k smallest DISTINCT hash values
  * seen, in an O(k) buffer that partial-aggregates map-side and merges
  * associatively (union of synopses, re-capped at k — the textbook KMV
  * merge, Bar-Yossef et al. 2002 / Beyer et al. 2007).
  *
  * Why this sketch alongside the builtin HLL++
  * (`approx_count_distinct`): KMV over the portable
  * [[PortableMd5]]-family hashes is DETERMINISTIC AND ENGINE-PORTABLE
  * — the synopsis is a pure function of the input's distinct hash set,
  * independent of partitioning or merge order, and any engine with
  * `md5` plus a rank window re-derives it exactly. That is what lets
  * q18's registered approximate-distinct be oracle-checked bit-for-bit
  * (hash space 2^60; estimator (k-1)·2^60 / h_(k), exact below k),
  * while HLL++'s register layout stays engine-internal and its
  * accuracy is enforced in SKETCH_QUALITY instead. Standard error is
  * ~1/√(k−2) (k = 1024 → ~3%), and the estimate is EXACT whenever a
  * group has fewer than k distinct values — which also makes the
  * sketch an exact distinct-count below the cap.
  *
  * Nulls are skipped. Output: the synopsis as an ASCENDING
  * array<bigint> of at most k distinct hashes (callers derive the
  * estimate; exposing the synopsis, not a scalar, is what the oracle
  * re-derivation and synopsis-union reuse need).
  */
case class KmvMinHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k > 1 && k <= 65536, "k must be in (1, 65536]")

  // (type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_min_hashes"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
