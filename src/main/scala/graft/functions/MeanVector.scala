package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.4): the element-wise mean of an
  * embedding column, as a Spark `Aggregator` with a mutable
  * (sums, count) buffer — partial aggregation (map-side combine) and merge
  * come from the Aggregator contract, so the shuffle carries one buffer per
  * group per partition, not the vectors. */
object MeanVector extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null || v.isEmpty) return b
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    require(sums.length == v.length,
      s"mean_vector: mixed dimensions ${sums.length} vs ${v.length}")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    require(a._1.length == b._1.length,
      s"mean_vector: mixed dimensions ${a._1.length} vs ${b._1.length}")
    var i = 0
    while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Float] =
    if (b._2 == 0L) Array.empty[Float]
    else b._1.map(s => (s / b._2).toFloat)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.kryo[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Float]] = Encoders.kryo[Array[Float]]

  /** Typed column for `ds.groupByKey(...).agg(MeanVector.column)`. */
  def column: TypedColumn[Array[Float], Array[Float]] = toColumn
}
