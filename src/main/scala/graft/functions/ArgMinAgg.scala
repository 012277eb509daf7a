package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `argmin_longs(struct<long, …>)` — the lexicographically smallest struct
  * of longs in the group (deterministic argmin: put the ordering keys
  * first, a unique id second, payload after).
  *
  * Exists because `min(struct(...))` plans as SortAggregate (struct
  * buffers aren't hash-aggregable), inserting a sort ∝ input rows on BOTH
  * sides of the exchange. A TypedImperativeAggregate runs in
  * ObjectHashAggregateExec: map-side partial argmin in a hash table, the
  * shuffle carries ONE buffered row per (task, group), no sort node
  * anywhere (same reasoning as [[KnnTopKAgg]], which replaces the
  * row_number window for k > 1; this is the k = 1, with-payload shape).
  */
case class ArgMinLongsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // lazy: the child is unresolved at construction; checked on first use
  private lazy val n: Int = child.dataType match {
    case StructType(fs) if fs.nonEmpty && fs.forall(_.dataType == LongType) =>
      fs.length
    case other => throw new IllegalArgumentException(
      s"argmin_longs child must be a struct of longs, got $other")
  }

  override def prettyName: String = "argmin_longs"
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  @inline private def less(a: Array[Long], b: Array[Long]): Boolean = {
    var i = 0
    while (i < a.length) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  override def createAggregationBuffer(): Array[Long] = null

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v == null) return buffer
    val cand = new Array[Long](n)
    var i = 0
    while (i < n) { cand(i) = v.getLong(i); i += 1 }
    if (buffer == null || less(cand, buffer)) cand else buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other == null) buffer
    else if (buffer == null || less(other, buffer)) other
    else buffer

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null
    else InternalRow.fromSeq(buffer.toIndexedSeq)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMinLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMinLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArgMinLongsAgg =
    copy(child = newChild)
}

object ArgMinLongsAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def argminLongs(c: Column): Column =
    column(ArgMinLongsAgg(expression(c)).toAggregateExpression())
}
