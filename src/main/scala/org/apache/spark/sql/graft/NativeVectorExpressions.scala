package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the standard packaging for
  * third-party native expressions. The public API is
  * `graft.functions.NativeVector`.
  *
  * These are the innermost loops of the O(n²)-per-bucket pair operators
  * (embedding near-dup, brute-force/IVF knn). A Scala UDF pays per-row
  * conversion — Catalyst copies each ArrayData into an Array[Float]
  * before the call, and the call is a black box to whole-stage codegen.
  * A native BinaryExpression with doGenCode reads ArrayData elements in
  * place inside the generated loop: no copy, no virtual call, fused into
  * the surrounding WholeStageCodegen stage. Interpreted eval
  * (nullSafeEval) is semantically identical for non-codegen paths.
  *
  * Math is a left-to-right double multiply-accumulate in both modes, so
  * results stay bit-identical to a single-threaded oracle evaluating the
  * same expression order (the DuckDB gate relies on this).
  *
  * Null elements inside the arrays are not expected (embeddings are
  * dense); lengths may differ — the loop runs over the common prefix.
  */
final case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: several FloatDots can share one generated Java scope
      // (cosine = dot/(√dot·√dot)); fixed local names would collide
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between an `array<float>` (data vector) and an
  * `array<double>` (e.g. a KMeans centroid) — the IVF cell-assignment
  * inner loop. */
final case class FloatDoubleDist2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_double_dist2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDist2 =
    copy(left = newLeft, right = newRight)
}

/** Dot product of an `array<float>` (data vector) against an
  * `array<double>` (e.g. a PQ codebook centroid) — the residual IVF-PQ
  * encoding inner loop, where `argmin_c ||x−t−c||²` reduces to
  * `argmin_c (||t+c||² − 2·x·c)` and `x·c` is the only per-row term. */
final case class FloatDoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_double_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDot =
    copy(left = newLeft, right = newRight)
}

/** Column builders (bridging `private[sql]` ExpressionUtils). */
object NativeVectorColumns {
  def floatDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def floatDoubleDist2(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDoubleDist2(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def floatDoubleDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDoubleDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
