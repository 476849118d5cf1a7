package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** w=3 shingle ids of a whitespace-tokenized text as `array<long>` —
  * the native twin of the HOF pipeline in `graft.operators.LlmText`
  * (split → per-token polynomial char fold mod P → 3-term arithmetic
  * combine), kept bit-identical to the DuckDB oracle SQL:
  * token fold `acc ← (acc·31 + codepoint) mod 1000003`, shingle
  * combine `((t₀·1009 + t₁) mod P · 1009 + t₂) mod P`, and a
  * whole-text fallback for docs shorter than 3 tokens.
  *
  * Exists because the HOF formulation evaluates ~|tokens| interpreted
  * lambda steps per row; this runs as one JIT-compiled helper call per
  * row. Codegen delegates to [[ShingleIds.compute]] rather than
  * inlining the loops — the helper is plain JVM code, so the generated
  * class stays small while the hot loop still JITs.
  */
case class ShingleIds(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_ids"

  override protected def nullSafeEval(input: Any): Any =
    ShingleIds.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleIds.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleIds {
  val P = 1000003L
  val C1 = 1009L
  val W = 3

  /** Polynomial code-point fold — matches Spark
    * `aggregate(transform(filter(split(s, ''), ...), ascii), ...)` and
    * the DuckDB `list_reduce` twin (both are code-point based). */
  def fold(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  def compute(text: UTF8String): ArrayData = {
    // split(" ", -1) keeps empty tokens, matching Spark's split(col, " ").
    val toks = text.toString.split(" ", -1)
    if (toks.length >= W) {
      val t = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) { t(i) = fold(toks(i)); i += 1 }
      val out = new Array[Long](toks.length - W + 1)
      i = 0
      while (i <= toks.length - W) {
        var acc = t(i)
        var k = 1
        while (k < W) { acc = (acc * C1 + t(i + k)) % P; k += 1 }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array(fold(text.toString)))
    }
  }
}

/** Whole-string polynomial code-point fold
  * `acc ← (acc·31 + codepoint) mod 1000003` as one JIT-compiled loop —
  * the native twin of the HOF formulation
  * `aggregate(transform(filter(split(s,''), c -> c <> ''), ascii), 0,
  * (a, x) -> (a*31 + x) % P)` used by the DuckDB oracle (`tidSql` in
  * graft.operators.LlmText). The HOF evaluates one interpreted lambda
  * step per CHARACTER of the input — O(|text|) boxed calls per row on
  * full documents — while this is a single helper call into
  * [[ShingleIds.fold]]. Bit-identical on the corpus: both sides fold
  * code points, and the fold skips nothing the filtered HOF keeps
  * (split('') emits every char; the filter only drops the trailing
  * empty, which the direct loop never produces).
  */
case class TextFoldHash(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "text_fold_hash"

  override protected def nullSafeEval(input: Any): Any =
    ShingleIds.fold(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleIds.fold($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** w-gram token shingles of a whitespace-tokenized text as
  * `array<string>` ("tok1 tok2 ... tokw"); texts shorter than w tokens
  * yield an empty array. Native twin of the
  * `transform(sequence(...), i -> concat_ws(...))` HOF formulation,
  * which evaluates interpreted per shingle — this runs one JIT-compiled
  * helper call per row. */
case class ShingleStrings(child: Expression, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override protected def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleStrings.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {
  def compute(text: UTF8String, w: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < w) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - w + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - w) {
        sb.setLength(0)
        var k = 0
        while (k < w) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** min over `(x·mul + add) mod modulus` of an `array<long>` — one
  * MinHash signature per evaluation, with the affine constants as
  * expression parameters (not child columns). Null/empty arrays yield
  * null. Same codegen-over-helper pattern as [[ShingleIds]].
  */
case class AffineModMin(child: Expression, mul: Long, add: Long, modulus: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "affine_mod_min"
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null
      else AffineModMin.compute(arr, mul, add, modulus)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.AffineModMin.compute($a, ${mul}L, ${add}L, ${modulus}L);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AffineModMin {
  def compute(arr: ArrayData, mul: Long, add: Long, modulus: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < arr.numElements()) {
      val h = (arr.getLong(i) * mul + add) % modulus
      if (h < best) best = h
      i += 1
    }
    best
  }
}

/** `bits`-wide simhash over an `array<long>` of distinct shingle ids,
  * computed IN-ROW: per element h = (id·7+13) mod P, per bit j the
  * vote is the parity of an independent affine rehash
  * ((h·(2j+3)+(5j+7)) mod P) — ±1 summed over the array — and bit j
  * of the packed result is set iff its vote sum is positive. Exactly
  * the arithmetic of the oracle's 48-CASE SQL, but one tight compiled
  * loop per row instead of an exploded 260k-row stream aggregated
  * through 48 sum columns (measured 3.4 s single-task vs ~60 ms
  * in-row at sf0.1 — the explode/agg shape was the cost, not the
  * math; same lesson as TextFoldHash/ArrayPairs). Null/empty arrays
  * yield null (docs with no shingles are absent from the pairing
  * universe, matching the exploded formulation and the oracle).
  */
case class SimhashPack(child: Expression, bits: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null
      else SimhashPack.compute(arr, bits)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SimhashPack.compute($a, $bits);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashPack {
  def compute(arr: ArrayData, bits: Int): Long = {
    val P = ShingleIds.P
    val n = arr.numElements()
    val sums = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = (arr.getLong(i) * 7 + 13) % P
      var j = 0
      while (j < bits) {
        sums(j) += (((h * (2 * j + 3) + (5 * j + 7)) % P) % 2).toInt * 2 - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
