package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable top-k selection as a `TypedImperativeAggregate` — the
  * ranking analog of [[HeavyHitters]]: keep the k best (count DESC,
  * key ASC) entries seen so far in an O(k) buffer that
  * partial-aggregates map-side and merges associatively.
  *
  * Why it matters at scale: the window formulation of "top 20 tokens"
  * (tx06) plans a GLOBAL sort of the whole vocabulary through one
  * partition. This aggregate ships k-entry buffers instead — each map
  * task reduces its slice to k rows, and the merge is a k-vs-k fold —
  * so the ranking step's shuffle volume is O(k · partitions),
  * independent of vocabulary size.
  *
  * Contract: EXACT when each key reaches the aggregate at most once
  * (i.e. downstream of a per-key aggregation, the only shape the
  * engine uses it in). With duplicate keys a key split across buffers
  * could be evicted before its halves meet, so selection becomes a
  * lower bound — same caveat class as every distributed top-k sketch.
  *
  * Output: array<struct<tok string, n bigint>> sorted (n DESC, tok) —
  * a total order, so results are engine- and partition-deterministic.
  */
case class TopKFreq(
    key: Expression,
    cnt: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k > 0 && k <= 100000, "k must be in (0, 100000]")

  // (type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(StringType, LongType)

  override def children: Seq[Expression] = Seq(key, cnt)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("tok", StringType), StructField("n", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_freq"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** (c1, k1) ranks strictly better than (c2, k2)? count DESC, key ASC. */
  private def better(c1: Long, k1: UTF8String, c2: Long, k2: UTF8String): Boolean =
    c1 > c2 || (c1 == c2 && k1.compareTo(k2) < 0)

  private def add(buf: mutable.HashMap[UTF8String, Long], kk: UTF8String, c: Long): Unit = {
    buf.get(kk) match {
      case Some(old) => buf.update(kk, old + c) // duplicate-key fold (see contract)
      case None if buf.size < k => buf.update(kk.clone(), c)
      case None =>
        // evict the worst tracked entry iff the newcomer beats it
        var wk: UTF8String = null
        var wc = 0L
        buf.foreach { case (bk, bc) =>
          if (wk == null || better(wc, wk, bc, bk)) { wk = bk; wc = bc }
        }
        if (better(c, kk, wc, wk)) {
          buf.remove(wk)
          buf.update(kk.clone(), c)
        }
    }
  }

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val kv = key.eval(input)
    val cv = cnt.eval(input)
    if (kv != null && cv != null) add(buf, kv.asInstanceOf[UTF8String], cv.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (kk, c) => add(buf, kk, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toSeq.sortBy { case (kk, c) => (-c, kk.toString) }
    new GenericArrayData(entries.map { case (kk, c) =>
      new GenericInternalRow(Array[Any](kk, c))
    }.toArray[Any])
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

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), cnt = newChildren(1))
}
