package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Deterministic bottom-k-by-hash SAMPLE of a value column as a
  * `TypedImperativeAggregate`: the values carried by the k
  * lexicographically-smallest (hash, value) pairs seen, returned as an
  * ASCENDING array<double>. O(k) buffer, map-side partial aggregation,
  * associative merge (union, re-capped) — the sampling analog of
  * [[KmvMinHashes]].
  *
  * This is the portable quantile sketch behind the oracle-exact ev14
  * (r7): when a group holds fewer than k rows the sample IS the group
  * (the quantile is exact), and above k it is a uniform random — but
  * DETERMINISTIC and engine-independent — sample of size k, giving
  * rank error ~sqrt(q(1-q)/k) (k = 10⁴ → ~0.5% typical at the
  * median). Any engine with md5 re-derives the identical sample with
  * a rank window ordered by (hash, value), which is what GK/t-digest
  * summaries (merge-order-dependent internals) can never offer; the
  * builtin `percentile_approx` stays as the native tier in
  * SKETCH_QUALITY. Keying the hash on a UNIQUE row id makes the
  * (hash, value) order total in practice; exact duplicate (hash,
  * value) pairs (requires colliding ids) would collapse in the
  * buffer where a rank window keeps both — with 60-bit hashes over
  * unique ids that needs a md5 collision, and the oracle gate would
  * surface it loudly.
  *
  * Null hash or value skips the row. Output sorted by VALUE ascending
  * (ready for order-statistic interpolation).
  */
case class BottomKSample(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Double)]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k > 0 && k <= 100000, "k must be in (0, 100000]")

  // (type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType, DoubleType)

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bottomk_sample"

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Double)] =
    mutable.TreeSet.empty(BottomKSample.PairOrd)

  private def add(buf: mutable.TreeSet[(Long, Double)], h: Long, v: Double): Unit = {
    val p = (h, v)
    if (buf.size < k) buf += p
    else if (BottomKSample.PairOrd.lt(p, buf.last) && !buf.contains(p)) {
      buf += p; buf -= buf.last
    }
  }

  override def update(
      buf: mutable.TreeSet[(Long, Double)], input: InternalRow): mutable.TreeSet[(Long, Double)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: mutable.TreeSet[(Long, Double)],
      other: mutable.TreeSet[(Long, Double)]): mutable.TreeSet[(Long, Double)] = {
    other.foreach { case (h, v) => add(buf, h, v) }
    buf
  }

  override def eval(buf: mutable.TreeSet[(Long, Double)]): Any = {
    val vals = buf.toArray.map(_._2)
    java.util.Arrays.sort(vals) // total for non-NaN doubles
    new GenericArrayData(vals)
  }

  override def serialize(buf: mutable.TreeSet[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    // PairOrd explicitly — the implicit tuple ordering happens to be
    // TotalOrdering today, but a drift would change NaN/-0.0 handling
    // for DESERIALIZED buffers only (r7 review)
    val buf = mutable.TreeSet.empty[(Long, Double)](BottomKSample.PairOrd)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), value = newChildren(1))
}

object BottomKSample {
  /** Lexicographic (hash, value) order — total for non-NaN values,
    * matching the oracle's `ORDER BY hv, value` rank window. Held in
    * the companion so serialized aggregate instances share one
    * static comparator. */
  private[functions] val PairOrd: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)
}
