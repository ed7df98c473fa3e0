package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for a weighted mean — the SURVEY §7.4 "typed
  * Aggregator[IN,BUF,OUT]" surface (optional alternative to the SQL
  * expression `sum(v*w)/sum(w)` used by Silhouette/Geo; same math,
  * Dataset-typed API). Buffer is (weighted sum, weight sum); merge is
  * associative+commutative so Spark can combine partials map-side.
  */
object WeightedMean extends Aggregator[(Double, Long), (Double, Long), Double] {

  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)

  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) 0.0 else r._1 / r._2

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Use as `ds.select(WeightedMean.column)` on a Dataset[(value, weight)]. */
  def column: TypedColumn[(Double, Long), Double] = toColumn.name("wmean")
}
