package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.TextHash

/** Property: the primitive shingle_hashes kernel is EXACTLY the rolling
  * charHash of the space-joined shingle strings (the contract the DuckDB
  * oracle SQL is generated from), incl. sort + distinct semantics.
  * Deterministic seeded loops (repo convention — no scalatest+scalacheck
  * bridge jar in the offline cache).
  */
class TextKernelPropSpec extends AnyFunSuite {

  private def randToks(r: Random): List[String] =
    List.fill(r.nextInt(40))(
      (1 to (1 + r.nextInt(8))).map(_ => (('a' + r.nextInt(26)).toChar)).mkString)

  private def viaStrings(toks: List[String], n: Int): Array[Long] =
    toks.sliding(n).filter(_.length == n).map(_.mkString(" "))
      .toArray.distinct.map(TextHash.charHash).sorted

  test("shingle_hashes == sorted distinct charHash of shingle strings") {
    val r = new Random(101)
    for (_ <- 1 to 3000) {
      val toks = randToks(r)
      val n = 1 + r.nextInt(5)
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = ShingleBridge.shingleHashes(arr, n).asInstanceOf[ArrayData].toLongArray()
      assert(got.toSeq === viaStrings(toks, n).toSeq, s"toks=$toks n=$n")
    }
  }

  test("minhash from hashes matches TextHash.minhashSig; simhash permutation-invariant") {
    val r = new Random(102)
    for (_ <- 1 to 2000) {
      val hs = Array.fill(1 + r.nextInt(60))(math.abs(r.nextLong()) % TextHash.P)
      val arr = new GenericArrayData(hs)
      val got = ShingleBridge.minhashFromHashes(arr).asInstanceOf[ArrayData].toLongArray()
      assert(got.toSeq === TextHash.minhashSig(hs).toSeq)
      assert(TextHash.simhash(hs) === TextHash.simhash(hs.reverse))
    }
  }
}
