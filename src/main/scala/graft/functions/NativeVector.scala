package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.NativeVectorColumns

/** Public facade over the native codegen'd vector expressions (which
  * live under `org.apache.spark.sql.graft` for `private[sql]` access —
  * see NativeVectorExpressions.scala for design notes). */
object NativeVector {
  /** dot(array<float>, array<float>) → double, codegen'd in place. */
  def floatDot(a: Column, b: Column): Column =
    NativeVectorColumns.floatDot(a, b)

  /** squared L2: array<float> vs array<double> (IVF centroids). */
  def floatDoubleDist2(a: Column, b: Column): Column =
    NativeVectorColumns.floatDoubleDist2(a, b)

  /** dot: array<float> vs array<double> (residual PQ encoding). */
  def floatDoubleDot(a: Column, b: Column): Column =
    NativeVectorColumns.floatDoubleDot(a, b)

  /** cosine similarity from three native dots — the single definition
    * behind Vectors.cosineFast and the SQL cosine_sim function. */
  def cosine(a: Column, b: Column): Column =
    floatDot(a, b) /
      (org.apache.spark.sql.functions.sqrt(floatDot(a, a)) *
        org.apache.spark.sql.functions.sqrt(floatDot(b, b)))

  /** squared-L2 argmin cell id; centroid table bound as a reference
    * object (no plan literals). */
  def nearestCentroid(vec: Column, centers: Array[Array[Double]]): Column =
    NativeVectorColumns.nearestCentroid(vec, centers)

  /** all m PQ residual codes in one expression; codebooks + shifted-norm
    * tables ride as reference objects. */
  def pqEncodeResidual(vec: Column, cell: Column,
      normTabs: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column =
    NativeVectorColumns.pqEncodeResidual(vec, cell, normTabs, codebooks)

  /** ADC lookup sum Σ dtab[i·cs + codes[i]]. */
  def adcLookupSum(codes: Column, dtab: Column, codebookSize: Int): Column =
    NativeVectorColumns.adcLookupSum(codes, dtab, codebookSize)
}
