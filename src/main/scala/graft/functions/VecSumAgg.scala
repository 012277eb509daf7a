package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `vec_sum(arrayCol)` — elementwise int64 sum of fixed-length long arrays
  * as a native mergeable aggregate: map-side partial vectors, reduce-side
  * elementwise add, O(dim) state per group.
  *
  * This is the raster-mosaic / dense-histogram reducer: aggregating a
  * per-row grid (e.g. an 8×8 block-luma vector per image) into a per-tile
  * grid would otherwise need a 64× posexplode fan-out THROUGH the shuffle
  * plus a second shuffle to re-assemble the array — at 10^12 rows that is
  * 64×10^12 shuffled rows vs. one partial vector per (task, group) here.
  *
  * All arithmetic is exact int64 (caller is responsible for staying under
  * 2^63 — a luma-sum grid at 10^12 images × 255 max is ~2^48, fine);
  * mismatched input lengths raise rather than silently truncate.
  */
case class VecSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "vec_sum"
  // non-array / wrong-element-type args fail at ANALYSIS with a clean type
  // error instead of a runtime unboxing crash inside update(); the builders
  // below insert an explicit Cast so array<int> still coerces
  // (ExpectsInputTypes is unusable here — AbstractDataType is private[sql])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  /** Empty = "no input yet"; sized lazily on first update/merge so one
    * aggregate works for any (consistent) dimension.
    */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], v: Array[Long]): Array[Long] = {
    if (buf.isEmpty) v.clone()
    else {
      require(buf.length == v.length,
        s"vec_sum: mismatched lengths ${buf.length} vs ${v.length}")
      var i = 0
      while (i < v.length) { buf(i) += v(i); i += 1 }
      buf
    }
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else addInto(buffer, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray())
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buffer else addInto(buffer, other)

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}

object VecSumAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  /** Wrap the argument in an explicit cast to array<bigint>: array<int>
    * coerces, non-castable types fail AT ANALYSIS with a cast error (the
    * identity cast on array<bigint> folds away in the optimizer).
    */
  def coerced(e: Expression): VecSumAgg =
    VecSumAgg(Cast(e, ArrayType(LongType)))
  /** Column builder: `vecSum(col)` over `array<bigint>`. */
  def vecSum(v: Column): Column = column(coerced(expression(v)).toAggregateExpression())
}
