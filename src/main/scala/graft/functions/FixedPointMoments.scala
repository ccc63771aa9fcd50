package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass exact first+second moments of a d-dim FIXED-POINT vector
  * column — the covariance-matrix aggregate PCA/whitening needs, shaped
  * for corpus scale.
  *
  * Input is the already-quantized `array<long>` vector (`round(x*S)` for
  * a power-of-two scale S). All accumulation is INTEGER, so the result
  * is independent of row order and partitioning — the property that lets
  * a DuckDB oracle hash-match a 1000-executor run bit-for-bit, which no
  * floating-point covariance has. Buffer = 1 + d + d(d+1)/2 longs
  * (count, per-dim sums, upper-triangle raw products): O(d^2) per
  * partition regardless of row count, merged by addition, so the plan is
  * partial ObjectHashAggregate -> exchange of ONE buffer per partition
  * -> final merge. The relational alternative (explode to d(d+1)/2 rows
  * per vector, groupBy cell) shuffles 2080x the input at d=64 —
  * this aggregate's wire traffic is constant in the data size.
  *
  * Overflow: update/merge use Math.addExact and the cross products
  * Math.multiplyExact, so saturation is a loud error, never silent
  * corruption — including for inputs outside the documented domain.
  * With |x| <= 2 and S = 2^14 each product is < 2^31, giving headroom
  * for ~2^32 rows per cell; larger corpora lower S (the
  * quantization-precision/row-count tradeoff knob). Callers that can
  * see raw out-of-domain vectors should validate at quantization time
  * ([[graft.operators.Pca]] raises a per-row diagnostic there) so the
  * failure names the offending input, not the aggregate.
  */
case class FixedPointMoments(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {
  require(d > 0, "d must be positive")

  private val nTri = d * (d + 1) / 2
  private val len = 1 + d + nTri

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == d,
        s"fixed_point_moments: expected length $d, got ${arr.numElements()}")
      buf(0) = Math.addExact(buf(0), 1L)
      var i = 0
      var k = 1 + d
      while (i < d) {
        val xi = arr.getLong(i)
        buf(1 + i) = Math.addExact(buf(1 + i), xi)
        var j = i
        while (j < d) {
          buf(k) = Math.addExact(buf(k), Math.multiplyExact(xi, arr.getLong(j)))
          k += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buf(i) = Math.addExact(buf(i), other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val s = new Array[Long](d)
    System.arraycopy(buf, 1, s, 0, d)
    val m2 = new Array[Long](nTri)
    System.arraycopy(buf, 1 + d, m2, 0, nTri)
    InternalRow(buf(0), new GenericArrayData(s), new GenericArrayData(m2))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    var i = 0
    while (i < len) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("m2", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "fixed_point_moments"

  override def withNewMutableAggBufferOffset(newOffset: Int): FixedPointMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FixedPointMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FixedPointMoments =
    copy(child = newChild)
}

object FixedPointMoments {
  /** `fixed_point_moments(quantizedVec, d)` — struct(n, s[d], m2[d(d+1)/2]
    * upper-triangle row-major).
    */
  def fixed_point_moments(c: Column, d: Int): Column =
    ColumnBridge.column(
      FixedPointMoments(ColumnBridge.expression(c), d).toAggregateExpression())
}
