package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the KLL sketch: arbitrary insert/merge interleavings
  * vs the exact quantile of the same multiset (deterministic Det harness,
  * GeoCoreSpec convention).
  */
class KllPropSpec extends AnyFunSuite {

  private def exactQ(vs: Array[Double], q: Double): Double = {
    val s = vs.sorted
    s(math.min(s.length - 1, math.max(0, math.ceil(q * s.length).toInt - 1)))
  }

  private def rankErr(vs: Array[Double], est: Double, q: Double): Double = {
    val s = vs.sorted
    math.abs(s.count(_ <= est).toDouble / s.length - q)
  }

  test("random insert/merge trees stay within 3% rank error") {
    Det.forAll(30, 71) { r =>
      val n = 1000 + r.nextInt(20000)
      val vs = Array.fill(n)(r.nextDouble() * math.pow(10, r.nextInt(6)))
      // random partition into 1..12 chunks, each its own sketch, folded in
      // random order — exercises asymmetric merges (big into small etc.)
      val chunks = r.nextInt(12) + 1
      val parts = vs.grouped(math.max(1, n / chunks) + 1).map { c =>
        val s = new KllSketch(200); c.foreach(s.insert); s
      }.toBuffer
      while (parts.length > 1) {
        val i = r.nextInt(parts.length)
        val a = parts.remove(i)
        val j = r.nextInt(parts.length)
        parts(j).merge(a)
      }
      val s = parts.head
      assert(s.count === n)
      for (q <- Seq(0.1, 0.5, 0.9)) {
        assert(rankErr(vs, s.quantile(q), q) <= 0.03, s"n=$n q=$q")
      }
    }
  }

  test("serialize at arbitrary points preserves behaviour") {
    Det.forAll(20, 72) { r =>
      val n = 500 + r.nextInt(5000)
      val vs = Array.fill(n)(r.nextGaussian() * 100)
      var s = new KllSketch(128)
      vs.zipWithIndex.foreach { case (v, i) =>
        s.insert(v)
        if (i % 997 == 0) s = KllSketch.deserialize(s.serialize()) // mid-stream roundtrip
      }
      assert(s.count === n)
      assert(rankErr(vs, s.quantile(0.5), 0.5) <= 0.03)
    }
  }

  test("sorted and reverse-sorted streams (adversarial compaction order)") {
    for (dir <- Seq(1, -1)) {
      val vs = (0 until 50000).map(i => (i * dir).toDouble).toArray
      val s = new KllSketch(200)
      vs.foreach(s.insert)
      for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99))
        assert(rankErr(vs, s.quantile(q), q) <= 0.02, s"dir=$dir q=$q")
    }
  }

  test("duplicates-heavy stream: quantile lands on an existing value") {
    val r = new Random(5)
    val vs = Array.fill(30000)((r.nextInt(5) * 10).toDouble)
    val s = new KllSketch(200)
    vs.foreach(s.insert)
    val est = s.quantile(0.5)
    assert(vs.contains(est)) // sketch only ever returns observed values
    assert(rankErr(vs, est, 0.5) <= 0.25) // atoms: rank jumps are inherent
    assert(math.abs(est - exactQ(vs, 0.5)) <= 10.0) // at most one atom off
  }
}
