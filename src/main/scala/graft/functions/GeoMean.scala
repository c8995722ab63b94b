package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the UDAF surface, SURVEY §2.9 ABSENT in the
  * reference): geometric mean via sum-of-logs — partial-aggregation
  * friendly (merge is associative), so Spark computes it map-side like
  * any built-in agg. */
final case class GeoBuf(logSum: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoBuf, Double] {
  override def zero: GeoBuf = GeoBuf(0.0, 0L)
  override def reduce(b: GeoBuf, x: Double): GeoBuf =
    GeoBuf(b.logSum + math.log(x), b.n + 1)
  override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
    GeoBuf(a.logSum + b.logSum, a.n + b.n)
  override def finish(b: GeoBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
  override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
