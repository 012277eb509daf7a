package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {

  test("no false negatives: every inserted key probes true (object + serialized form)") {
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(5000)(rnd.nextLong())
    val b = new Bloom(Bloom.sizeFor(keys.length, 16), 7)
    keys.foreach(b.put)
    val bytes = b.serialize()
    keys.foreach { k =>
      assert(b.mightContain(k), s"false negative (object) for $k")
      assert(Bloom.probe(bytes, k), s"false negative (zero-copy probe) for $k")
    }
  }

  test("zero-copy probe == deserialized mightContain on arbitrary keys") {
    val rnd = new scala.util.Random(11)
    val b = new Bloom(1024, 5)
    (0 until 300).foreach(_ => b.put(rnd.nextLong()))
    val bytes = b.serialize()
    val back = Bloom.deserialize(bytes)
    assert(back.numBits === 1024 && back.numHashes === 5)
    (0 until 20000).foreach { _ =>
      val k = rnd.nextLong()
      assert(Bloom.probe(bytes, k) === back.mightContain(k))
    }
  }

  test("merge tree == bulk build (OR is associative/commutative/idempotent)") {
    val rnd = new scala.util.Random(23)
    val keys = Array.fill(2000)(rnd.nextLong())
    val bits = Bloom.sizeFor(keys.length, 16)
    val bulk = new Bloom(bits, 7)
    keys.foreach(bulk.put)
    // 4-way split merged in a skewed tree, one shard merged twice (retry)
    val shards = keys.grouped(500).map { g =>
      val s = new Bloom(bits, 7); g.foreach(s.put); s
    }.toArray
    val acc = new Bloom(bits, 7)
    acc.merge(shards(0)); acc.merge(shards(1))
    val right = new Bloom(bits, 7)
    right.merge(shards(2)); right.merge(shards(3)); right.merge(shards(2))
    acc.merge(right)
    assert(acc.words.toSeq === bulk.words.toSeq)
    intercept[IllegalArgumentException] { acc.merge(new Bloom(128, 7)) }
  }

  test("false-positive rate at 16 bits/key, k=7 stays below 1%") {
    val rnd = new scala.util.Random(41)
    val n = 10000
    val b = new Bloom(Bloom.sizeFor(n, 16), 7)
    val in = Array.fill(n)(rnd.nextLong())
    in.foreach(b.put)
    val inSet = in.toSet
    var fp = 0; var probes = 0
    while (probes < 100000) {
      val k = rnd.nextLong()
      if (!inSet.contains(k)) { if (b.mightContain(k)) fp += 1; probes += 1 }
    }
    val rate = fp.toDouble / probes
    assert(rate < 0.01, s"FP rate $rate (theory ~4e-4 at 16 bits/key)")
  }

  test("sizeFor: multiple of 64, 64-bit floor, Int.MaxValue clamp") {
    assert(Bloom.sizeFor(1, 1) === 64)
    assert(Bloom.sizeFor(100, 16) % 64 === 0)
    assert(Bloom.sizeFor(100, 16) >= 1600)
    assert(Bloom.sizeFor(Long.MaxValue / 4, 16) > 0) // no overflow
  }
}
