package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element accessor dispatch shared by the vector expressions: each
  * argument may be `array<float>` or `array<double>` independently
  * (embeddings are float; derived centroids are double). */
private[functions] object VecElem {
  def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  /** Java accessor snippet for codegen. */
  def acc(e: Expression): String = if (isFloat(e)) "getFloat" else "getDouble"
  def get(x: ArrayData, i: Int, float: Boolean): Double =
    if (float) x.getFloat(i).toDouble else x.getDouble(i)
}

/** Native dot product over two `array<float|double>` columns,
  * accumulating in double in ascending index order (the same order as
  * the `aggregate(zip_with(...))` higher-order formulation and DuckDB's
  * unnest-sum oracle, so rounded scores stay cross-engine stable).
  *
  * Exists because Spark's array higher-order functions evaluate their
  * lambda interpreted per element (no whole-stage codegen); this
  * expression generates a tight primitive loop instead — the hot path
  * of every similarity query at 100 TB. Mismatched lengths take the
  * common prefix; null elements are treated as 0 (embeddings carry
  * none).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val lFloat = VecElem.isFloat(left)
  private lazy val rFloat = VecElem.isFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += VecElem.get(x, i, lFloat) * VecElem.get(y, i, rFloat)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.${VecElem.acc(left)}($i) * (double) $b.${VecElem.acc(right)}($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hyperplane LSH bucket of an `array<float>` vector: bit j = sign of
  * Σ_pos v[pos]·h(j,pos) with the arithmetic hyperplane
  * h(j,pos) = ((37j + 101·pos) mod 97)/97 − 0.5 (pos 1-based) — no
  * side table of random planes, so the DuckDB oracle reproduces the
  * exact buckets. Bitwise-matches the HOF `aggregate(zip_with(...))`
  * formulation it replaced (same ascending-index double accumulation).
  */
case class HyperplaneLshBucket(child: Expression, bits: Int)
  extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(a: Any): Any =
    HyperplaneLshBucket.compute(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneLshBucket.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneLshBucket {
  def compute(arr: ArrayData, bits: Int): Long = {
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      while (i < arr.numElements()) {
        val p = i + 1
        acc += arr.getFloat(i).toDouble *
          (((37 * j + 101 * p) % 97).toDouble / 97.0 - 0.5)
        i += 1
      }
      if (acc > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}

/** Native L2 norm of an `array<float|double>` column: sqrt(Σ v[i]²) in
  * double, ascending index order. Same codegen rationale as
  * [[DotProduct]].
  */
case class L2Norm(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  private lazy val cFloat = VecElem.isFloat(child)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = VecElem.get(x, i, cFloat)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.${VecElem.acc(child)}($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
