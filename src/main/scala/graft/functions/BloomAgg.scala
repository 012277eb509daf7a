package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import graft.core.Bloom

/** `bloom_agg(keyCol, numBits, numHashes)` — mergeable Bloom filter build as
  * a native aggregate: map-side partial filters, reduce-side bitwise-OR
  * merge (idempotent — safe under retries), O(numBits) state per group.
  * Returns the serialized filter (BinaryType) so it can ride a broadcast
  * join column and be probed zero-copy by [[BloomContainsExpr]].
  *
  * The grouped form is the scale deployment (Dedup.bloomNew): key-space
  * buckets each build their own filter, so total filter size is spread over
  * B rows instead of one driver-sized blob, and the batch side joins on the
  * bucket id — broadcast for small B, shuffle for huge corpora.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int = 7,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bloom] with UnaryLike[Expression] {

  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Bloom = new Bloom(numBits, numHashes)

  override def update(buffer: Bloom, input: InternalRow): Bloom = {
    val v = child.eval(input)
    if (v != null) buffer.put(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Bloom, other: Bloom): Bloom = { buffer.merge(other); buffer }

  override def eval(buffer: Bloom): Any = buffer.serialize()

  override def serialize(buffer: Bloom): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): Bloom = Bloom.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_contains(filterBytes, key)` — zero-copy probe of a serialized
  * Bloom filter column (header + bits read straight off the byte array;
  * no deserialization, no per-row allocation). Codegen emits a static call
  * into graft.core.Bloom.probe, same kernel the spec and build path use.
  */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override protected def nullSafeEval(f: Any, k: Any): Any =
    Bloom.probe(f.asInstanceOf[Array[Byte]], k.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) =>
      s"${ev.value} = graft.core.Bloom$$.MODULE$$.probe($f, $k);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}

object BloomAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def bloom(key: Column, numBits: Int, numHashes: Int = 7): Column =
    column(BloomAgg(expression(key), numBits, numHashes).toAggregateExpression())
  def bloomContains(filter: Column, key: Column): Column =
    column(BloomContainsExpr(expression(filter), expression(key)))
}
