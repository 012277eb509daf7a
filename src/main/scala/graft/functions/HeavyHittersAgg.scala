package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.SpaceSaving

/** `heavy_hitters(col, k, m)` — mergeable SpaceSaving top-m summary as a
  * native aggregate: map-side partial summaries, reduce-side merge,
  * O(k) state per group. Returns array<struct<item, est_count, max_err>>
  * ordered by count desc (use with explode/inline for flat rows).
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int = 200,
    m: Int = 20,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with UnaryLike[Expression] {

  require(k >= m && m >= 1)

  override def prettyName: String = "heavy_hitters"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est_count", LongType),
    StructField("max_err", LongType))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(k)

  override def update(buffer: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSaving, other: SpaceSaving): SpaceSaving = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSaving): Any = {
    val rows: Array[Any] = buffer.topK(m).map { case (item, c, err) =>
      (InternalRow(UTF8String.fromString(item), c, err): Any)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: SpaceSaving): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSaving = SpaceSaving.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHittersAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def heavyHitters(c: Column, k: Int = 200, m: Int = 20): Column =
    column(HeavyHittersAgg(expression(c.cast("string")), k, m).toAggregateExpression())
}
