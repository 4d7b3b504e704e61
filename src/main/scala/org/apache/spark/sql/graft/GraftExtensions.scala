package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** Session wiring for graft's native expressions.
  *
  * Two paths, same registrations:
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    at session build (the SparkSessionExtensions contract), or
  *  - `GraftFunctions.register(spark)` on a live session.
  *
  * After either, `spark.sql("select float_dot(a, b) ...")` — and the
  * graft dialect engine, whose function registry falls through to
  * `call_function` — resolve to the codegen'd native expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptions.foreach(ext.injectFunction)
}

object GraftFunctions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("float_dot"),
        info("float_dot",
          "float_dot(a, b) - dot product of two float arrays in double precision"),
        (args: Seq[Expression]) => FloatDot(args(0), args(1))),
      (FunctionIdentifier("float_double_dist2"),
        info("float_double_dist2",
          "float_double_dist2(a, b) - squared L2 of array<float> vs array<double>"),
        (args: Seq[Expression]) => FloatDoubleDist2(args(0), args(1))))

  /** Register on an already-built session (temp function registry). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (ident, _, builder) =>
      spark.asInstanceOf[SparkSession].sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
