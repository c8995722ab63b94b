package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate` —
  * the imperative-buffer custom-aggregate tier (mutable state,
  * serialized between partial and final aggregation). Finds candidate
  * frequent items in ONE pass with O(k) memory per group: at 100 TB
  * this replaces a full token groupBy (shuffle of every distinct token)
  * with a k-entry summary that partial-aggregates map-side.
  *
  * Guarantees (classic Misra-Gries): every item with true frequency
  * > n/(k+1) is present in the summary, and each reported count is a
  * lower bound within n/(k+1) of the true count. When k >= number of
  * distinct items the counts are EXACT.
  *
  * Output: map<string,bigint> of candidate -> lower-bound count.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k > 0 && k <= 100000, "k must be in (0, 100000]")

  // analysis-time type check / implicit cast (type inferred:
  // AbstractDataType is private[sql])
  override def inputTypes = Seq(StringType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, cnt) => add(buf, key, cnt) }
    buf
  }

  /** Misra-Gries insert with weight: increment if tracked, insert if
    * room, else decrement everything by the weight that does not fit
    * (the standard mergeable generalization). */
  private def add(buf: mutable.HashMap[UTF8String, Long], key: UTF8String, cnt: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + cnt)
      case None if buf.size < k => buf.update(key.clone(), cnt)
      case None =>
        // decrement all by the k+1-th count (here: the inserted weight,
        // bounded by the current minimum) and drop non-positives
        val dec = math.min(cnt, buf.valuesIterator.min)
        val remaining = cnt - dec
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - dec)
        buf.foreach { case (kk, c) => if (c <= 0) dead += kk }
        dead.foreach(buf.remove)
        if (remaining > 0 && buf.size < k) buf.update(key.clone(), remaining)
    }
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic map ordering: count desc, then key
    val entries = buf.toSeq.sortBy { case (kk, c) => (-c, kk.toString) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1).toArray[Any]),
      new GenericArrayData(entries.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) =>
      val bytes = kk.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
