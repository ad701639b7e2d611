package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregation via the `Aggregator` API (the idiomatic way
  * to add an aggregate function without touching Catalyst internals):
  * geometric mean over positive doubles, computed as exp(mean(ln x)) —
  * numerically stable where a product would overflow.
  *
  * Scale shape: the buffer is (Σ ln x, n) — constant size, associative
  * merge — so Spark runs it with map-side partial aggregation like any
  * built-in; only the 16-byte buffer shuffles. Non-positive inputs are
  * ignored (documented; matches the SQL-replay exp(avg(ln x)) over a
  * positive filter).
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {

  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0.0) (b._1 + math.log(x), b._2 + 1L) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Untyped Column form for DataFrame `agg`. */
  def column(c: Column): Column = udaf(GeoMean).apply(c)
}
