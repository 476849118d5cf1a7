package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All unordered pairs (i < j) of an array's elements as
  * `array<struct<a, b>>` — the in-row wedge/basket expansion kernel
  * shared by graph_link_predict, graph_jaccard_sim, and basket_rules.
  *
  * Native twin of the
  * `flatten(transform(xs, (x, i) -> transform(slice(xs, i+2, ...),
  * y -> struct(x, y))))` HOF formulation: array higher-order functions
  * evaluate their lambdas INTERPRETED, with per-element lambda-variable
  * binding, and the nested transform+slice shape allocates a sliced
  * array per element — this expression runs one JIT-compiled helper
  * call per row with a tight i<j loop. Preserves order: pairs emit in
  * (i, j) lexicographic position order, so a sorted input array yields
  * sorted pairs exactly like the HOF version.
  *
  * Element-type-generic (long node ids, string brands): the output
  * struct fields `a`/`b` take the input element type.
  */
case class ArrayPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_pairs requires an array argument, got ${other.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType), StructField("b", elemType))),
    containsNull = false)

  override def prettyName: String = "array_pairs"

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val et = elemType
    val n = arr.numElements()
    // Pair count in Long first: Int n*(n-1)/2 overflows (negative) for
    // n ≳ 65536. Callers cap degree/basket size well below this; the
    // guard turns a raw NegativeArraySizeException into a readable
    // error for anyone using the expression generically.
    val pairCount = n.toLong * (n - 1) / 2
    if (pairCount > Int.MaxValue)
      throw new IllegalArgumentException(
        s"array_pairs: $n elements expand to $pairCount pairs, past the JVM array " +
          "limit — cap the array (e.g. a degree cap) before pair expansion")
    val out = new Array[Any](pairCount.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val vi = arr.get(i, et)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(vi, arr.get(j, et))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayPairs", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
