package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core.TextHash

/** Static bridges so the generated code is one static call per row (keeps the
  * expressions inside whole-stage codegen; no boxing beyond the array).
  */
object TextHashBridge {
  def charHash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    TextHash.charHash(s.toString)

  private def tokenHashes(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = TextHash.charHash(arr.getUTF8String(i).toString); i += 1 }
    out
  }

  def simhash(arr: ArrayData): Long = TextHash.simhash(tokenHashes(arr))

  def minhashSig(arr: ArrayData): ArrayData =
    new GenericArrayData(TextHash.minhashSig(tokenHashes(arr)))

  def minOrNeg(arr: ArrayData): Long = {
    val hs = tokenHashes(arr)
    if (hs.isEmpty) -1L else hs.min
  }
}

/** `char_hash(str)` — the shared rolling hash (TextHash.charHash). */
case class CharHashExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "char_hash"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.charHash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.charHash($c)")
  override protected def withNewChildInternal(c: Expression): CharHashExpr = copy(child = c)
}

/** `simhash(array<string>)` — 31-bit SimHash of a token array. */
case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimhashExpr = copy(child = c)
}

/** `minhash_sig(array<string>)` — k=32 MinHash signature of a shingle array. */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.minhashSig(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression): MinhashSigExpr = copy(child = c)
}

/** `min_shingle_hash(array<string>)` — winnowing-style doc fingerprint:
  * min charHash over the shingles (−1 for an empty array).
  */
case class MinShingleHashExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "min_shingle_hash"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.minOrNeg(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.minOrNeg($c)")
  override protected def withNewChildInternal(c: Expression): MinShingleHashExpr = copy(child = c)
}

/** Hyperplane-LSH bucket ids for a quantized vector: one bucket per table,
  * `planes` sign bits each. The plane matrix ((tables·planes) × dims int64
  * components) is built ONCE on the driver and rides the codegen references
  * array — the per-row work is a single static call over primitive arrays,
  * replacing a ~3000-term inline expression that overflowed Janino's 64 KB
  * method limit (observed; this is why it's an Expression, not a Column
  * combinator).
  */
object HyperplaneBridge {
  def buckets(vec: ArrayData, planeMatrix: Array[Array[Long]], planes: Int,
              tables: Int): ArrayData = {
    val v = vec.toLongArray()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var pl = 0
      while (pl < planes) {
        val row = planeMatrix(t * planes + pl)
        var dot = 0L
        var d = 0
        val n = math.min(v.length, row.length)
        while (d < n) { dot += v(d) * row(d); d += 1 }
        if (dot >= 0) bucket |= (1L << pl)
        pl += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class HyperplaneBucketsExpr(child: Expression, planeMatrix: Array[Array[Long]],
                                 planes: Int, tables: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"
  override protected def nullSafeEval(v: Any): Any =
    HyperplaneBridge.buckets(v.asInstanceOf[ArrayData], planeMatrix, planes, tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", planeMatrix, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBridge$$.MODULE$$.buckets($c, $m, $planes, $tables)")
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketsExpr =
    copy(child = c)
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def charHash(c: Column): Column = column(CharHashExpr(expression(c)))
  def simhash(tokens: Column): Column = column(SimhashExpr(expression(tokens)))
  def minhashSig(shingles: Column): Column = column(MinhashSigExpr(expression(shingles)))
  def minShingleHash(shingles: Column): Column = column(MinShingleHashExpr(expression(shingles)))
  def hyperplaneBuckets(quantVec: Column, planeMatrix: Array[Array[Long]],
                        planes: Int, tables: Int): Column =
    column(HyperplaneBucketsExpr(expression(quantVec), planeMatrix, planes, tables))
}
