package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core.Vp8l.EncOptions

/** VP8L codec roundtrip matrix: every decoder path (simple + normal prefix
  * codes, color cache, LZ77 with the 2D distance map, meta prefix groups,
  * all four transforms, all 14 predictors, pixel bundling) is exercised by
  * an encode→decode byte-exactness proof. Table constants are pinned to the
  * public spec's leading entries.
  */
class Vp8lSpec extends AnyFunSuite {

  private def rt(argb: Array[Int], w: Int, h: Int, opts: EncOptions, tag: String): Unit = {
    val enc = Vp8l.encodeArgb(argb, w, h, opts)
    val (dw, dh, dec) = Vp8l.decodeArgb(enc)
    assert(dw == w && dh == h, s"$tag: dims")
    assert(java.util.Arrays.equals(dec, argb), s"$tag: pixels")
  }

  private def randArgb(r: Random, n: Int, opaque: Boolean = true): Array[Int] =
    Array.fill(n)(if (opaque) 0xff000000 | (r.nextInt() & 0xffffff) else r.nextInt())

  /** Piecewise-smooth image: gradients + plateaus (predictor-friendly). */
  private def gradient(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val v = (x * 3 + y * 5) & 0xff
      0xff000000 | (v << 16) | (((v + x) & 0xff) << 8) | ((v + y) & 0xff)
    }

  /** K-color image with long runs (palette/LZ77-friendly). */
  private def blocky(r: Random, w: Int, h: Int, k: Int): Array[Int] = {
    val pal = Array.fill(k)(0xff000000 | (r.nextInt() & 0xffffff))
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      val run = 1 + r.nextInt(17)
      val c = pal(r.nextInt(k))
      var j = 0
      while (j < run && i < out.length) { out(i) = c; i += 1; j += 1 }
    }
    out
  }

  test("distance table: 120 entries, pinned to the spec's leading entries, in-window") {
    val t = Vp8l.DistTable
    assert(t.length == 120)
    val specHead = Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0))
    assert(t.take(40).toSeq == specHead)
    assert(t.forall { case (dx, dy) => dx >= -7 && dx <= 8 && dy >= 0 && dy <= 7 })
    assert(t.toSeq.distinct.size == 120)
    val norms = t.map { case (dx, dy) => dx * dx + dy * dy }
    assert(norms.sliding(2).forall(p => p(0) <= p(1)), "norm-sorted")
  }

  test("prefixCode is the exact inverse of the prefix-value rule") {
    for (v <- 1 to 5000) {
      val (c, eb, ev) = Vp8l.prefixCode(v)
      val back = if (c < 4) c + 1 else ((2 + (c & 1)) << eb) + ev + 1
      assert(back == v, s"v=$v → ($c,$eb,$ev)")
      assert(ev >= 0 && (eb == 0 || (ev >> eb) == 0))
    }
  }

  test("huffLengths: complete Kraft sum and limit respected") {
    val r = new Random(7)
    for (trial <- 0 until 50) {
      val n = 2 + r.nextInt(300)
      val freq = Array.fill(n)(if (r.nextInt(3) == 0) 0L else (1L << r.nextInt(20)))
      if (freq.count(_ > 0) >= 2) {
        val lens = Vp8l.huffLengths(freq, 15)
        assert(lens.max <= 15, s"trial $trial limit")
        val kraft = lens.filter(_ > 0).map(l => math.pow(2, -l)).sum
        assert(math.abs(kraft - 1.0) < 1e-9, s"trial $trial kraft=$kraft")
      }
    }
  }

  test("roundtrip: random noise across sizes and entropy options") {
    val r = new Random(42)
    for (((w, h), i) <- Seq((1, 1), (3, 2), (7, 5), (16, 16), (33, 17), (64, 64)).zipWithIndex) {
      val img = randArgb(r, w * h)
      rt(img, w, h, EncOptions(subtractGreen = false, cacheBits = 0, lz77 = false), s"plain $w x $h")
      rt(img, w, h, EncOptions(), s"default $w x $h")
      rt(img, w, h, EncOptions(cacheBits = 1 + (i % 11), lz77 = true), s"cache $w x $h")
    }
  }

  test("roundtrip: non-opaque alpha") {
    val r = new Random(43)
    rt(randArgb(r, 33 * 9, opaque = false), 33, 9, EncOptions(), "alpha")
  }

  test("roundtrip: all 14 predictor modes on gradient + noise images") {
    val r = new Random(44)
    val grad = gradient(33, 17)
    val noise = randArgb(r, 33 * 17)
    for (m <- 0 to 13) {
      rt(grad, 33, 17, EncOptions(predictorMode = Some(m), predictorBits = 2), s"pred$m grad")
      rt(noise, 33, 17, EncOptions(subtractGreen = false, predictorMode = Some(m),
        predictorBits = 4, cacheBits = 0), s"pred$m noise")
    }
  }

  test("roundtrip: color transform (signed 3.5 fixed-point deltas)") {
    val r = new Random(45)
    val img = gradient(40, 21)
    for (deltas <- Seq((0, 0, 0), (16, -16, 8), (-128, 127, -64), (91, 33, -7))) {
      rt(img, 40, 21, EncOptions(subtractGreen = false, colorDeltas = Some(deltas),
        colorBits = 3), s"ct$deltas grad")
      rt(randArgb(r, 40 * 21), 40, 21, EncOptions(colorDeltas = Some(deltas)), s"ct$deltas noise")
    }
  }

  test("roundtrip: palette with every bundling width (2/4/16/200 colors)") {
    val r = new Random(46)
    for ((k, tag) <- Seq((2, "1bpp"), (3, "2bpp"), (11, "4bpp"), (200, "8bpp"))) {
      val img = blocky(r, 37, 13, k) // 37 not divisible by the pack width
      rt(img, 37, 13, EncOptions(subtractGreen = false, palette = true, cacheBits = 0),
        s"palette $tag")
    }
  }

  test("roundtrip: meta prefix codes (two huffman groups, checkerboard tiles)") {
    val r = new Random(47)
    rt(randArgb(r, 40 * 24), 40, 24,
      EncOptions(metaBits = Some(3)), "meta noise")
    rt(gradient(65, 33), 65, 33,
      EncOptions(metaBits = Some(4), cacheBits = 4), "meta grad")
  }

  test("roundtrip: stacked transforms (subtract-green → color → predictor)") {
    val img = gradient(48, 26)
    rt(img, 48, 26, EncOptions(subtractGreen = true, predictorMode = Some(7),
      colorDeltas = Some((12, -5, 20)), cacheBits = 6, metaBits = Some(3)), "stacked")
  }

  test("gray roundtrip is byte-exact and compresses structured pixels") {
    val r = new Random(48)
    val w = 64; val h = 32
    val px = graft.fixtures.ImageCodec.pixelsFromHash(r.nextLong(), w, h)
    val enc = Vp8l.encodeGray(px, w, h)
    val (dw, dh, dec) = Vp8l.decodeGray(enc)
    assert(dw == w && dh == h && java.util.Arrays.equals(dec, px))
    assert(enc.length < w * h, s"blocky gray should compress: ${enc.length} vs ${w * h}")
    // and pure noise still roundtrips
    val noise = Array.fill(w * h)(r.nextInt().toByte)
    val (_, _, dec2) = Vp8l.decodeGray(Vp8l.encodeGray(noise, w, h))
    assert(java.util.Arrays.equals(dec2, noise))
  }
}
