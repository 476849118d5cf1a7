package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}

/** Typed `Aggregator` computing the elementwise mean of an
  * `array<float>` column in double precision — the §2.10 UDAF surface.
  * Buffer is (elementwise double sums, row count); merge is elementwise
  * addition, so partial aggregation combines map-side exactly like a
  * built-in (the buffer is O(dim), NOT O(rows) — this is the
  * sketch-shaped aggregator design that scales, unlike
  * collect-and-sort aggregates).
  */
object CentroidAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  private def addInto(sums: Array[Double], v: Array[Float]): Array[Double] =
    if (sums.isEmpty) v.map(_.toDouble)
    else {
      var i = 0
      while (i < sums.length && i < v.length) { sums(i) += v(i).toDouble; i += 1 }
      sums
    }

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) =
    (addInto(b._1, a), b._2 + 1)

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
    if (x._2 == 0) y
    else if (y._2 == 0) x
    else {
      var i = 0
      while (i < x._1.length && i < y._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) Array.emptyDoubleArray else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  /** Column form, usable directly in `groupBy().agg(...)`. */
  def asColumn(embedding: Column): Column =
    org.apache.spark.sql.functions.udaf(this, ExpressionEncoder[Array[Float]]())
      .apply(embedding)
}
