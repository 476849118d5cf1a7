package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}

/** Integer-grid Lloyd-update aggregator: the elementwise
  * ⌊v·10⁶⌋-grid mean of an `array<float>` column, per position i
  *
  *   c(i) = (Σ ⌊v(i)·10⁶⌋).toDouble / (10⁶ · n)
  *
  * — EXACTLY the arithmetic of the r3-era posexplode formulation
  * `sum(floor(vf·1e6) :: long).cast(double) / (1e6 · count)`
  * (long sums are order-free and exact below 2⁵³, so recomputed
  * centroids are bit-identical across engines and partition layouts),
  * but in ONE aggregation instead of a join + posexplode + two
  * groupBys: the r14 stage audit priced each of those extra
  * exchange stages at ~100 ms of scheduling floor per Lloyd round
  * across every kmUpdate consumer. Buffer is (O(dim) long sums,
  * count) — the sketch-shaped partial-aggregable design, same as
  * [[CentroidAggregator]].
  */
object GridCentroidAggregator extends Aggregator[Array[Float], (Array[Long], Long), Array[Double]] {

  override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  // FIXED-DIMENSION CONTRACT (r14 advice): the buffer divides every
  // position by the GLOBAL vector count, which is only the
  // per-position mean when all inputs share one length — the old
  // posexplode form would instead average each position over its own
  // count on ragged input. Silent truncation to the shorter array
  // would therefore produce a silently DIFFERENT centroid; fail
  // loudly instead.
  private def requireUniform(have: Int, got: Int): Unit =
    require(have == got,
      s"GridCentroidAggregator requires fixed-dimension vectors: " +
        s"buffer has $have positions, input has $got")

  private def addInto(sums: Array[Long], v: Array[Float]): Array[Long] =
    if (sums.isEmpty) v.map(f => math.floor(f.toDouble * 1e6).toLong)
    else {
      requireUniform(sums.length, v.length)
      var i = 0
      while (i < sums.length) {
        sums(i) += math.floor(v(i).toDouble * 1e6).toLong; i += 1
      }
      sums
    }

  override def reduce(b: (Array[Long], Long), a: Array[Float]): (Array[Long], Long) =
    (addInto(b._1, a), b._2 + 1)

  override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) =
    if (x._2 == 0) y
    else if (y._2 == 0) x
    else {
      requireUniform(x._1.length, y._1.length)
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }

  override def finish(b: (Array[Long], Long)): Array[Double] =
    if (b._2 == 0) Array.emptyDoubleArray
    else b._1.map(s => s.toDouble / (1e6 * b._2))

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  /** Column form, usable directly in `groupBy().agg(...)`. */
  def asColumn(embedding: Column): Column =
    org.apache.spark.sql.functions.udaf(this, ExpressionEncoder[Array[Float]]())
      .apply(embedding)
}
