package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable KMV (k-minimum-values) sketch as a native Catalyst
  * aggregate: keeps the k smallest DISTINCT long hashes seen, as a
  * bounded ordered set. The result is the ascending k-min array, from
  * which distinct-count estimates ((k-1)·M / h_k), set-similarity, and
  * union/intersection estimates all derive.
  *
  * This is the custom-AGGREGATE tier of the extension ladder (the
  * engine's other natives are scalar expressions): a
  * `TypedImperativeAggregate` whose partial state is the sketch itself,
  * so the plan is ObjectHashAggregate(partial) → exchange →
  * ObjectHashAggregate(final) and only O(partitions · k) longs cross
  * the wire. The relational formulation (`distinct → orderBy → limit k`,
  * t11) must first shuffle EVERY distinct hash for the global dedup;
  * at corpus scale that exchange is the bottleneck, while the sketch's
  * traffic is constant in the data size. Both produce the identical
  * k-min set (TreeSet dedups exactly like `DISTINCT`), so the DuckDB
  * oracle for the sketch output is the same `ORDER BY h LIMIT k` over
  * distinct hashes — bit-exact, like every estimate in this engine.
  *
  * Buffer ops are O(log k) via a capped TreeSet with early reject of
  * values above the current k-th minimum; serialization is the raw
  * long array (used between partial and final aggregation).
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def add(buf: JTreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: JTreeSet[java.lang.Long],
      input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** `kmv_sketch(hashCol, k)` — ascending array of the k smallest
    * distinct hashes.
    */
  def kmv_sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(c), k).toAggregateExpression())
}
