package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Mergeable centered outer-product (co-moment) aggregate:
  *
  *   buf[pack(i,j)] += (x_i − μ_i) · (x_j − μ_j)   for i ≤ j
  *
  * i.e. the packed upper triangle of Σ (x−μ)(x−μ)ᵀ — the scatter matrix
  * a PCA needs, accumulated CENTERED so the covariance never forms as a
  * difference of two large numbers (the uncentered s − n·μμᵀ route
  * cancels catastrophically when the mean dominates the variance).
  *
  * This is the large-d scatter path: one O(d²) buffer per partition,
  * merged pairwise — no per-row d² materialization, no join, and the
  * shuffle carries one packed array per partition instead of n·d cell
  * rows. At d=1024 the buffer is 4.2 MB; partitions stream rows through
  * it and only the partials move.
  *
  * Packing order: row-major upper triangle — (0,0)(0,1)…(0,d−1),
  * (1,1)…(1,d−1), …, (d−1,d−1); `pack(i,j) = i·d − i(i−1)/2 + (j−i)`.
  *
  * Determinism: per-partition accumulation is sequential, but partial
  * merge order follows partition completion — sums are reproducible
  * only to ulp, the same contract as every distributed float sum in the
  * codebase; consumers gate with relative tolerances.
  */
case class CoMomentAgg(
    child: Expression,
    mu: Array[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  private val d = mu.length
  private val len = d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "co_moment"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"co_moment: vector length ${arr.numElements()} != mean length $d")
      val c = new Array[Double](d)
      var i = 0
      while (i < d) {
        c(i) = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - mu(i)
        i += 1
      }
      var idx = 0
      i = 0
      while (i < d) {
        val ci = c(i)
        var j = i
        while (j < d) { buf(idx) += ci * c(j); idx += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    var i = 0
    while (i < len) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](len)
    var i = 0
    while (i < len) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CoMomentAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CoMomentAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CoMomentAgg =
    copy(child = newChildren.head)
}

/** Column builder (bridging `private[sql]` ExpressionUtils, same
  * packaging as [[NativeVectorColumns]]). */
object CoMomentColumns {
  def coMoment(v: Column, mu: Array[Double]): Column =
    ExpressionUtils.column(
      CoMomentAgg(ExpressionUtils.expression(v), mu).toAggregateExpression())
}
