package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.core.KllSketch

/** `kll_quantile(col, q, k)` — mergeable KLL quantile sketch as a native
  * aggregate (graft.core.KllSketch): map-side partial sketches, reduce-side
  * sketch merge, O(k·log(n/k)) state per group. This is the D7 scale path
  * (upstream's t-digest `estimatedQuantiles` role); the exact `percentile`
  * reducers stay for oracle parity on small/medium groups.
  */
case class KllQuantileAgg(
    child: Expression,
    q: Double,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] with UnaryLike[Expression] {

  require(q >= 0.0 && q <= 1.0, "quantile in [0,1]")

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // input is cast to double by the builder (KllAgg.kllQuantile)

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buffer: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllSketch, other: KllSketch): KllSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllSketch): Any =
    if (buffer.count == 0L) null else buffer.quantile(q)

  override def serialize(buffer: KllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantileAgg =
    copy(child = newChild)
}

object KllAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def kllQuantile(c: Column, q: Double, k: Int = 200): Column =
    column(KllQuantileAgg(expression(c.cast("double")), q, k).toAggregateExpression())
}
