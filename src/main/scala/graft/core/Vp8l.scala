package graft.core

import scala.collection.mutable

/** VP8L (lossless WebP) codec — decoder + encoder, pure JVM, zero deps.
  *
  * Implements the public "WebP Lossless Bitstream Specification" (RFC 9649
  * §3–5): RIFF/VP8L container, LSB-first bitstream, canonical prefix codes
  * (simple + normal forms with the 19-symbol code-length code), color cache,
  * LZ77 with the 120-entry 2D distance mapping, meta prefix codes (huffman
  * groups via an entropy subimage), and all four transforms — PREDICTOR (14
  * modes with the spec's edge rules), COLOR_TRANSFORM (signed 3.5 fixed-point
  * channel mixing), SUBTRACT_GREEN, and COLOR_INDEXING (palette, with ≤16-
  * color pixel bundling).
  *
  * The encoder is a real compressor (histogram-driven canonical Huffman,
  * greedy LZ77 with hash chains, optional transforms) whose output exercises
  * every decoder path; roundtrip specs (Vp8lSpec) prove byte-exactness per
  * feature. Closes the H12 webp gap (SURVEY.md §2) — decode is now REAL for
  * webp/VP8L; only avif remains a documented stub.
  *
  * Ref (behavior, public): reference repo is empty — upstream conventions
  * from the spec; oshdb has no image kernels (graft extension surface).
  */
object Vp8l {

  // ------------------------------------------------------------------
  // bit I/O — VP8L reads bits LSB-first within each byte
  // ------------------------------------------------------------------

  final class BitReader(buf: Array[Byte], startByte: Int) {
    private var bitPos: Long = startByte.toLong * 8
    private val endBit: Long = buf.length.toLong * 8

    /** Peek up to 24 bits (zero-padded past end of stream). */
    def peek(n: Int): Int = {
      val byteIdx = (bitPos >>> 3).toInt
      val shift = (bitPos & 7).toInt
      var v = 0L
      var i = 0
      while (i < 5 && byteIdx + i < buf.length) {
        v |= (buf(byteIdx + i) & 0xffL) << (8 * i); i += 1
      }
      ((v >>> shift) & ((1L << n) - 1)).toInt
    }

    def consume(n: Int): Unit = {
      bitPos += n
      require(bitPos <= endBit, "vp8l: read past end of stream")
    }

    def readBits(n: Int): Int = { val v = peek(n); consume(n); v }
  }

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0

    def writeBits(v: Int, n: Int): Unit = {
      require(n >= 1 && n <= 24, s"vp8l: writeBits n=$n")
      acc |= (v.toLong & ((1L << n) - 1)) << nbits
      nbits += n
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }

    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write((acc & 0xff).toInt); acc = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** Reverse the low `n` bits of `v` (canonical codes are written to the
    * stream most-significant code bit first; the stream is LSB-first).
    */
  private def revBits(v: Int, n: Int): Int = {
    var r = 0; var i = 0
    while (i < n) { r = (r << 1) | ((v >>> i) & 1); i += 1 }
    r
  }

  // ------------------------------------------------------------------
  // canonical prefix codes
  // ------------------------------------------------------------------

  /** Decode table for a canonical prefix code given per-symbol code lengths.
    * Single-used-symbol codes are "trivial": the symbol is implied, zero
    * bits are consumed (spec: simple code with one symbol; libwebp treats
    * normal codes with one nonzero length the same way).
    */
  final class HuffTable private (val trivialSym: Int, maxLen: Int, table: Array[Int]) {
    def read(br: BitReader): Int = {
      if (trivialSym >= 0) return trivialSym
      val e = table(br.peek(maxLen))
      require(e != 0, "vp8l: invalid prefix code bits")
      br.consume(e & 0xf)
      e >>> 4
    }
  }

  object HuffTable {
    def apply(lengths: Array[Int]): HuffTable = {
      var used = 0; var only = -1; var maxLen = 0
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0) { used += 1; only = s; if (lengths(s) > maxLen) maxLen = lengths(s) }
        s += 1
      }
      require(used > 0, "vp8l: empty prefix code")
      if (used == 1) return new HuffTable(only, 0, null)
      require(maxLen <= 15, "vp8l: code length > 15")
      // canonical assignment (DEFLATE convention): codes in (length, symbol) order
      val blCount = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) blCount(l) += 1)
      val nextCode = new Array[Int](maxLen + 2)
      var code = 0
      var l = 1
      var kraft = 0L
      while (l <= maxLen) {
        code = (code + blCount(l - 1)) << 1
        nextCode(l) = code
        kraft += blCount(l).toLong << (maxLen - l)
        l += 1
      }
      require(kraft == (1L << maxLen), "vp8l: prefix code not complete")
      val table = new Array[Int](1 << maxLen)
      s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) {
          val c = nextCode(len); nextCode(len) += 1
          val rev = revBits(c, len)
          var idx = rev
          while (idx < table.length) { table(idx) = (s << 4) | len; idx += 1 << len }
        }
        s += 1
      }
      new HuffTable(-1, maxLen, table)
    }

    /** Simple 2-symbol code in stream order: code 0 → sym0, code 1 → sym1. */
    def simple2(sym0: Int, sym1: Int): HuffTable = {
      val t = new Array[Int](2)
      t(0) = (sym0 << 4) | 1
      t(1) = (sym1 << 4) | 1
      new HuffTable(-1, 1, t)
    }
  }

  /** Order in which code-length-code lengths are stored (spec §5.2.2). */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal form) for `alphabetSize`. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): HuffTable = {
    if (br.readBits(1) == 1) { // simple
      val numSymbols = br.readBits(1) + 1
      val sym0 = if (br.readBits(1) == 1) br.readBits(8) else br.readBits(1)
      require(sym0 < alphabetSize, "vp8l: simple code symbol out of range")
      if (numSymbols == 1) {
        val lens = new Array[Int](alphabetSize); lens(sym0) = 1
        HuffTable(lens) // trivial
      } else {
        val sym1 = br.readBits(8)
        require(sym1 < alphabetSize && sym1 != sym0, "vp8l: bad simple code")
        HuffTable.simple2(sym0, sym1)
      }
    } else { // normal: lengths coded with the 19-symbol code-length code
      val numCl = 4 + br.readBits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.readBits(3); i += 1 }
      val clTable = HuffTable(clLens)
      var maxSymbol =
        if (br.readBits(1) == 1) {
          val nb = 2 + 2 * br.readBits(3)
          2 + br.readBits(nb)
        } else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8 // spec default when repeat-16 precedes any literal
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val s = clTable.read(br)
        if (s < 16) {
          lens(sym) = s; sym += 1
          if (s != 0) prev = s
        } else {
          val (v, rep) = s match {
            case 16 => (prev, 3 + br.readBits(2))
            case 17 => (0, 3 + br.readBits(3))
            case _  => (0, 11 + br.readBits(7))
          }
          require(sym + rep <= alphabetSize, "vp8l: code length repeat overflow")
          var k = 0
          while (k < rep) { lens(sym) = v; sym += 1; k += 1 }
        }
      }
      HuffTable(lens)
    }
  }

  // ------------------------------------------------------------------
  // LZ77 prefix values and the 2D distance mapping
  // ------------------------------------------------------------------

  /** length/distance prefix decode (spec §4.2.2): codes 0–3 are the values
    * 1–4; higher codes carry extra bits.
    */
  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.readBits(extra) + 1
    }

  /** Inverse of [[prefixValue]]: (code, extraBits, extraValue) for v ≥ 1. */
  private[core] def prefixCode(v: Int): (Int, Int, Int) = {
    val x = v - 1
    if (x < 4) (x, 0, 0)
    else {
      val h = 31 - Integer.numberOfLeadingZeros(x)
      val eb = h - 1
      val c = if (x < (3 << eb)) 2 * eb + 2 else 2 * eb + 3
      (c, eb, x - ((2 + (c & 1)) << eb))
    }
  }

  /** The 120-entry distance-code → (dx, dy) neighborhood map (spec §4.2.2).
    * The spec's table is exactly the 120 offsets {dy 1..7, dx -7..8} ∪
    * {dy 0, dx 1..8} ordered by squared euclidean distance, then larger dy
    * first, then positive dx before negative — generated here by that rule
    * and pinned by Vp8lSpec against the spec's leading entries.
    */
  private[core] val DistTable: Array[(Int, Int)] = {
    val cands = (for { dy <- 0 to 7; dx <- -7 to 8; if dy > 0 || dx > 0 } yield (dx, dy))
    cands.sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }.toArray
  }

  /** distance code value → scan-order pixel distance (≥ 1). */
  private def planeToDist(v: Int, xs: Int): Int =
    if (v > 120) v - 120
    else {
      val (dx, dy) = DistTable(v - 1)
      val d = dy * xs + dx
      if (d < 1) 1 else d
    }

  /** scan-order distance → smallest distance code value for this width. */
  private def distToPlane(xs: Int): collection.Map[Int, Int] = {
    val m = mutable.HashMap.empty[Int, Int]
    var i = 0
    while (i < 120) {
      val (dx, dy) = DistTable(i)
      val d = dy * xs + dx
      if (d >= 1 && !m.contains(d)) m(d) = i + 1
      i += 1
    }
    m
  }

  private def cacheHash(argb: Int, bits: Int): Int = (0x1e35a7bd * argb) >>> (32 - bits)

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  // ------------------------------------------------------------------
  // pixel helpers (ARGB packed in Int)
  // ------------------------------------------------------------------

  @inline private def addPx(a: Int, b: Int): Int =
    (((((a >>> 24) & 0xff) + ((b >>> 24) & 0xff)) & 0xff) << 24) |
      (((((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) & 0xff) << 16) |
      (((((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) & 0xff) << 8) |
      ((((a & 0xff) + (b & 0xff)) & 0xff))

  @inline private def subPx(a: Int, b: Int): Int =
    (((((a >>> 24) & 0xff) - ((b >>> 24) & 0xff)) & 0xff) << 24) |
      (((((a >>> 16) & 0xff) - ((b >>> 16) & 0xff)) & 0xff) << 16) |
      (((((a >>> 8) & 0xff) - ((b >>> 8) & 0xff)) & 0xff) << 8) |
      ((((a & 0xff) - (b & 0xff)) & 0xff))

  @inline private def avg2(a: Int, b: Int): Int =
    (((((a >>> 24) & 0xff) + ((b >>> 24) & 0xff)) >> 1) << 24) |
      (((((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) >> 1) << 16) |
      (((((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) >> 1) << 8) |
      ((((a & 0xff) + (b & 0xff)) >> 1))

  @inline private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    @inline def ch(sh: Int) =
      clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    @inline def ch(sh: Int) = {
      val a = (ave >>> sh) & 0xff; val b = (tl >>> sh) & 0xff
      clamp255(a + (a - b) / 2) // C-style truncation toward zero (spec)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    @inline def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    var pL = 0; var pT = 0
    var sh = 0
    while (sh < 32) {
      val pred = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pL += math.abs(pred - ch(l, sh))
      pT += math.abs(pred - ch(t, sh))
      sh += 8
    }
    if (pL < pT) l else t
  }

  /** The 14 spatial predictors (spec §4.2.1.1). */
  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = mode match {
    case 0  => 0xff000000
    case 1  => l
    case 2  => t
    case 3  => tr
    case 4  => tl
    case 5  => avg2(avg2(l, tr), t)
    case 6  => avg2(l, tl)
    case 7  => avg2(l, t)
    case 8  => avg2(tl, t)
    case 9  => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => clampAddSubtractFull(l, t, tl)
    case 13 => clampAddSubtractHalf(l, t, tl)
    case m  => throw new IllegalArgumentException(s"vp8l: predictor mode $m")
  }

  /** signed 3.5 fixed-point color-transform delta (spec §4.2.1.2); both the
    * multiplier and the channel value are interpreted as signed int8.
    */
  @inline private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  // ------------------------------------------------------------------
  // decoder
  // ------------------------------------------------------------------

  private sealed trait Transform {
    def inverse(px: Array[Int], xs: Int, ys: Int): (Array[Int], Int)
  }

  private final case class PredictorT(bits: Int, txs: Int, modes: Array[Int]) extends Transform {
    def inverse(px: Array[Int], xs: Int, ys: Int): (Array[Int], Int) = {
      require(xs == txs, "vp8l: predictor width mismatch")
      val tilesX = subSize(xs, bits)
      var pos = 0
      var y = 0
      while (y < ys) {
        var x = 0
        while (x < xs) {
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) px(pos - 1)                 // top row: L
            else if (x == 0) px(pos - xs)                // left column: T
            else {
              val mode = (modes((y >> bits) * tilesX + (x >> bits)) >>> 8) & 0xff
              // TR for the rightmost column is px(pos-xs+1) = current row's
              // leftmost pixel (spec's contiguous-buffer rule)
              predict(mode, px(pos - 1), px(pos - xs), px(pos - xs - 1), px(pos - xs + 1))
            }
          px(pos) = addPx(px(pos), pred)
          pos += 1; x += 1
        }
        y += 1
      }
      (px, xs)
    }
  }

  private final case class ColorT(bits: Int, txs: Int, elems: Array[Int]) extends Transform {
    def inverse(px: Array[Int], xs: Int, ys: Int): (Array[Int], Int) = {
      require(xs == txs, "vp8l: color transform width mismatch")
      val tilesX = subSize(xs, bits)
      var pos = 0
      var y = 0
      while (y < ys) {
        var x = 0
        while (x < xs) {
          val cte = elems((y >> bits) * tilesX + (x >> bits))
          val g2r = cte & 0xff
          val g2b = (cte >>> 8) & 0xff
          val r2b = (cte >>> 16) & 0xff
          val p = px(pos)
          val g = (p >>> 8) & 0xff
          var r = (p >>> 16) & 0xff
          var b = p & 0xff
          r = (r + ctDelta(g2r, g)) & 0xff
          b = (b + ctDelta(g2b, g)) & 0xff
          b = (b + ctDelta(r2b, r)) & 0xff // uses the restored red
          px(pos) = (p & 0xff00ff00) | (r << 16) | b
          pos += 1; x += 1
        }
        y += 1
      }
      (px, xs)
    }
  }

  private case object SubGreenT extends Transform {
    def inverse(px: Array[Int], xs: Int, ys: Int): (Array[Int], Int) = {
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = (p >>> 8) & 0xff
        val r = (((p >>> 16) & 0xff) + g) & 0xff
        val b = ((p & 0xff) + g) & 0xff
        px(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      (px, xs)
    }
  }

  private final case class IndexT(origXs: Int, widthBits: Int, palette: Array[Int])
      extends Transform {
    def inverse(px: Array[Int], xs: Int, ys: Int): (Array[Int], Int) = {
      val out = new Array[Int](origXs * ys)
      val bpp = 8 >> widthBits
      val mask = (1 << bpp) - 1
      var y = 0
      while (y < ys) {
        var x = 0
        while (x < origXs) {
          val packed = (px(y * xs + (x >> widthBits)) >>> 8) & 0xff
          val bitOff = (x & ((1 << widthBits) - 1)) * bpp
          val idx = (packed >>> bitOff) & mask
          out(y * origXs + x) = if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      (out, origXs)
    }
  }

  /** Decode one image stream (spec §5): transforms only at level 0, color
    * cache at every level, meta prefix codes only at level 0.
    */
  private def decodeImageStream(br: BitReader, xsize0: Int, ys: Int, isLevel0: Boolean): Array[Int] = {
    var xs = xsize0
    val transforms = mutable.ListBuffer.empty[Transform]
    if (isLevel0) {
      val seen = mutable.Set.empty[Int]
      while (br.readBits(1) == 1) {
        val ttype = br.readBits(2)
        require(seen.add(ttype), s"vp8l: duplicate transform $ttype")
        ttype match {
          case 0 =>
            val bits = br.readBits(3) + 2
            val sub = decodeImageStream(br, subSize(xs, bits), subSize(ys, bits), isLevel0 = false)
            transforms += PredictorT(bits, xs, sub)
          case 1 =>
            val bits = br.readBits(3) + 2
            val sub = decodeImageStream(br, subSize(xs, bits), subSize(ys, bits), isLevel0 = false)
            transforms += ColorT(bits, xs, sub)
          case 2 =>
            transforms += SubGreenT
          case 3 =>
            val psize = br.readBits(8) + 1
            val raw = decodeImageStream(br, psize, 1, isLevel0 = false)
            var i = 1
            while (i < psize) { raw(i) = addPx(raw(i), raw(i - 1)); i += 1 }
            val widthBits =
              if (psize <= 2) 3 else if (psize <= 4) 2 else if (psize <= 16) 1 else 0
            transforms += IndexT(xs, widthBits, raw)
            xs = subSize(xs, widthBits)
        }
      }
    }

    // entropy-coded pixels
    val cacheBits = if (br.readBits(1) == 1) br.readBits(4) else 0
    require(cacheBits <= 11, "vp8l: cache bits > 11")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

    var metaBits = 0
    var metaXs = 0
    var meta: Array[Int] = null
    var numGroups = 1
    if (isLevel0 && br.readBits(1) == 1) {
      metaBits = br.readBits(3) + 2
      metaXs = subSize(xs, metaBits)
      meta = decodeImageStream(br, metaXs, subSize(ys, metaBits), isLevel0 = false)
      var m = 0
      meta.foreach(p => { val i = (p >>> 8) & 0xffff; if (i > m) m = i })
      numGroups = m + 1
    }

    val greenAlpha = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups) {
      Array(readPrefixCode(br, greenAlpha), readPrefixCode(br, 256),
        readPrefixCode(br, 256), readPrefixCode(br, 256), readPrefixCode(br, 40))
    }

    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    @inline def insert(p: Int): Unit = if (cache != null) cache(cacheHash(p, cacheBits)) = p

    val n = xs * ys
    val out = new Array[Int](n)
    var pos = 0
    var x = 0
    var y = 0
    @inline def advance(): Unit = { pos += 1; x += 1; if (x == xs) { x = 0; y += 1 } }

    while (pos < n) {
      val g = if (meta != null) {
        val gi = (meta((y >> metaBits) * metaXs + (x >> metaBits)) >>> 8) & 0xffff
        groups(gi)
      } else groups(0)
      val s = g(0).read(br)
      if (s < 256) {
        val r = g(1).read(br); val b = g(2).read(br); val a = g(3).read(br)
        val p = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = p; insert(p); advance()
      } else if (s < 280) {
        val len = prefixValue(s - 256, br)
        val dv = prefixValue(g(4).read(br), br)
        val dist = planeToDist(dv, xs)
        require(dist <= pos && pos + len <= n, "vp8l: bad back-reference")
        var k = 0
        while (k < len) { val p = out(pos - dist); out(pos) = p; insert(p); advance(); k += 1 }
      } else {
        val idx = s - 280
        require(cache != null && idx < cacheSize, "vp8l: cache index without cache")
        out(pos) = cache(idx); advance()
      }
    }

    var px = out
    transforms.reverseIterator.foreach { t =>
      val (p2, xs2) = t.inverse(px, xs, ys)
      px = p2; xs = xs2
    }
    px
  }

  /** Decode a RIFF/WEBP container holding a VP8L chunk → (w, h, ARGB). */
  def decodeArgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 20, "vp8l: truncated container")
    def fourcc(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WEBP", "vp8l: not a WEBP RIFF")
    var off = 12
    var payloadOff = -1
    var payloadLen = -1
    while (payloadOff < 0 && off + 8 <= bytes.length) {
      val sz = (bytes(off + 4) & 0xff) | ((bytes(off + 5) & 0xff) << 8) |
        ((bytes(off + 6) & 0xff) << 16) | ((bytes(off + 7) & 0xff) << 24)
      if (fourcc(off) == "VP8L") { payloadOff = off + 8; payloadLen = sz }
      else off += 8 + sz + (sz & 1)
    }
    require(payloadOff > 0, "vp8l: no VP8L chunk")
    require((bytes(payloadOff) & 0xff) == 0x2f, "vp8l: bad signature byte")
    val br = new BitReader(bytes, payloadOff + 1)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBits(1) // alpha hint
    require(br.readBits(3) == 0, "vp8l: unsupported version")
    (w, h, decodeImageStream(br, w, h, isLevel0 = true))
  }

  /** Decode to 8-bit gray (green channel — encoder stores luma there). */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, argb) = decodeArgb(bytes)
    val out = new Array[Byte](argb.length)
    var i = 0
    while (i < argb.length) { out(i) = ((argb(i) >>> 8) & 0xff).toByte; i += 1 }
    (w, h, out)
  }

  // ------------------------------------------------------------------
  // encoder
  // ------------------------------------------------------------------

  /** Encoder feature switches. `palette` is mutually exclusive with the
    * pixel-space transforms (the spec allows chaining; this encoder keeps
    * the combinations it emits simple — the decoder handles general chains).
    */
  final case class EncOptions(
      subtractGreen: Boolean = true,
      predictorMode: Option[Int] = None,
      predictorBits: Int = 4,
      colorDeltas: Option[(Int, Int, Int)] = None, // (g2r, g2b, r2b) signed bytes
      colorBits: Int = 4,
      palette: Boolean = false,
      cacheBits: Int = 8,
      lz77: Boolean = true,
      metaBits: Option[Int] = None) {
    require(!(palette && (subtractGreen || predictorMode.isDefined || colorDeltas.isDefined)),
      "palette is emitted standalone by this encoder")
  }

  private sealed trait Token
  private final case class Lit(argb: Int, pos: Int) extends Token
  private final case class Copy(len: Int, dist: Int, pos: Int) extends Token
  private final case class CacheRef(idx: Int, pos: Int) extends Token

  /** Greedy LZ77 + color-cache tokenizer, mirroring decoder cache state. */
  private def tokenize(px: Array[Int], xs: Int, cacheBits: Int, lz77: Boolean): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val cacheSeen = if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    @inline def insert(p: Int): Unit =
      if (cache != null) { val h = cacheHash(p, cacheBits); cache(h) = p; cacheSeen(h) = true }
    val head = if (lz77) new mutable.HashMap[Int, Int] else null // pixel value → last pos
    val maxDist = 1048456 // largest distance encodable as a plain (>120) code
    var pos = 0
    val n = px.length
    while (pos < n) {
      var bestLen = 0
      var bestDist = 0
      if (lz77) {
        // candidate 1: run (distance 1); candidate 2: last position with the
        // same pixel value (single-entry chain — greedy, compression not
        // optimality, is the goal)
        @inline def extend(dist: Int): Int = {
          var l = 0
          val cap = math.min(4096, n - pos)
          while (l < cap && px(pos + l) == px(pos + l - dist)) l += 1
          l
        }
        if (pos > 0) {
          val runLen = extend(1)
          if (runLen > bestLen) { bestLen = runLen; bestDist = 1 }
        }
        head.get(px(pos)).foreach { prev =>
          val d = pos - prev
          if (d >= 1 && d <= maxDist) {
            val l = extend(d)
            if (l > bestLen) { bestLen = l; bestDist = d }
          }
        }
      }
      if (bestLen >= 4) {
        out += Copy(bestLen, bestDist, pos)
        var k = 0
        while (k < bestLen) {
          insert(px(pos + k))
          if (head != null) head(px(pos + k)) = pos + k
          k += 1
        }
        pos += bestLen
      } else {
        val p = px(pos)
        val h = if (cache != null) cacheHash(p, cacheBits) else 0
        if (cache != null && cacheSeen(h) && cache(h) == p) out += CacheRef(h, pos)
        else { out += Lit(p, pos); insert(p) }
        if (head != null) head(p) = pos
        pos += 1
      }
    }
    out.result()
  }

  /** Huffman code lengths from frequencies, max length `limit`, complete
    * Kraft by construction (true Huffman; frequencies are halved and rebuilt
    * if the tree exceeds the limit — converges to flat).
    */
  private[core] def huffLengths(freq0: Array[Long], limit: Int): Array[Int] = {
    val n = freq0.length
    val lens = new Array[Int](n)
    var freq = freq0.clone()
    val used = freq.count(_ > 0)
    if (used == 0) return lens
    if (used == 1) { lens(freq.indexWhere(_ > 0)) = 1; return lens }
    var done = false
    while (!done) {
      java.util.Arrays.fill(lens, 0)
      // standard Huffman via sorted merge of leaf + internal queues
      final case class Node(w: Long, tie: Int, syms: List[Int], depth: Int)
      val leaves = (0 until n).filter(freq(_) > 0)
        .map(s => Node(freq(s), s, List(s), 0)).sortBy(nd => (nd.w, nd.tie))
      var q1 = leaves.toList
      var q2 = List.empty[Node]
      var tieC = n
      def popMin(): Node = (q1, q2) match {
        case (h1 :: t1, h2 :: _) if h1.w <= h2.w => q1 = t1; h1
        case (h1 :: t1, Nil)                     => q1 = t1; h1
        case (_, h2 :: t2)                       => q2 = t2; h2
        case _                                   => throw new IllegalStateException
      }
      var count = q1.size
      while (count > 1) {
        val a = popMin(); val b = popMin()
        tieC += 1
        q2 = q2 :+ Node(a.w + b.w, tieC, a.syms ++ b.syms, math.max(a.depth, b.depth) + 1)
        // children one level deeper
        (a.syms ++ b.syms).foreach(s => lens(s) += 1)
        count -= 1
      }
      val maxLen = lens.max
      if (maxLen <= limit) done = true
      else freq = freq.map(f => if (f > 0) (f + 1) / 2 else 0L)
    }
    lens
  }

  /** Canonical codes from lengths ((length, symbol) order). */
  private def canonCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = if (lens.isEmpty) 0 else lens.max
    val codes = new Array[Int](lens.length)
    if (maxLen == 0) return codes
    val blCount = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code; l += 1 }
    var s = 0
    while (s < lens.length) {
      if (lens(s) > 0) { codes(s) = nextCode(lens(s)); nextCode(lens(s)) += 1 }
      s += 1
    }
    codes
  }

  private final class WCode(val lens: Array[Int], val codes: Array[Int]) {
    private val nUsed = lens.count(_ > 0)
    def write(bw: BitWriter, s: Int): Unit =
      if (nUsed > 1) bw.writeBits(revBits(codes(s), lens(s)), lens(s)) // trivial: 0 bits
  }

  /** Emit a prefix code description (simple form when it fits, else the
    * normal code-length-coded form with 16/17/18 run-length tokens).
    */
  private def writePrefixCode(bw: BitWriter, lens: Array[Int]): Unit = {
    val syms = lens.indices.filter(lens(_) > 0)
    if (syms.isEmpty) { // unused alphabet: 1-symbol simple code for symbol 0
      bw.writeBits(1, 1); bw.writeBits(0, 1); bw.writeBits(0, 1); bw.writeBits(0, 1)
      return
    }
    if (syms.length == 1 && syms(0) <= 255) {
      bw.writeBits(1, 1); bw.writeBits(0, 1)
      if (syms(0) <= 1) { bw.writeBits(0, 1); bw.writeBits(syms(0), 1) }
      else { bw.writeBits(1, 1); bw.writeBits(syms(0), 8) }
      return
    }
    if (syms.length == 2 && syms(1) <= 255 && lens(syms(0)) == 1 && lens(syms(1)) == 1) {
      bw.writeBits(1, 1); bw.writeBits(1, 1)
      if (syms(0) <= 1) { bw.writeBits(0, 1); bw.writeBits(syms(0), 1) }
      else { bw.writeBits(1, 1); bw.writeBits(syms(0), 8) }
      bw.writeBits(syms(1), 8)
      return
    }
    // normal form: RLE the length sequence into code-length tokens
    val tokens = mutable.ListBuffer.empty[(Int, Int, Int)] // (clSym, extraBits, extraVal)
    var i = 0
    while (i < lens.length) {
      val l = lens(i)
      var run = 1
      while (i + run < lens.length && lens(i + run) == l) run += 1
      var rem = run
      if (l == 0) {
        while (rem > 0) {
          if (rem >= 11) { val c = math.min(rem, 138); tokens += ((18, 7, c - 11)); rem -= c }
          else if (rem >= 3) { tokens += ((17, 3, rem - 3)); rem = 0 }
          else { tokens += ((0, 0, 0)); rem -= 1 }
        }
      } else {
        tokens += ((l, 0, 0)); rem -= 1
        while (rem > 0) {
          if (rem >= 3) { val c = math.min(rem, 6); tokens += ((16, 2, c - 3)); rem -= c }
          else { tokens += ((l, 0, 0)); rem -= 1 }
        }
      }
      i += run
    }
    val clFreq = new Array[Long](19)
    tokens.foreach(t => clFreq(t._1) += 1)
    val clLens = huffLengths(clFreq, 7)
    val clCodes = canonCodes(clLens)
    val clW = new WCode(clLens, clCodes)
    var numCl = 19
    while (numCl > 4 && clLens(ClOrder(numCl - 1)) == 0) numCl -= 1
    bw.writeBits(0, 1) // not simple
    bw.writeBits(numCl - 4, 4)
    var k = 0
    while (k < numCl) { bw.writeBits(clLens(ClOrder(k)), 3); k += 1 }
    bw.writeBits(0, 1) // no max_symbol shortcut
    tokens.foreach { case (s, eb, ev) => clW.write(bw, s); if (eb > 0) bw.writeBits(ev, eb) }
  }

  /** Encode one entropy-coded image (recursively used for transform
    * subimages and the meta prefix-code image).
    */
  private def encodeEntropyImage(bw: BitWriter, px: Array[Int], xs: Int, ys: Int,
      isLevel0: Boolean, cacheBits: Int, lz77: Boolean, metaBits: Option[Int]): Unit = {
    // color cache header (all levels)
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)

    var numGroups = 1
    var metaXs = 0
    var mb = 0
    var groupOf: Array[Int] = null // per-tile group index
    if (isLevel0) {
      metaBits match {
        case Some(bits) =>
          mb = bits
          bw.writeBits(1, 1)
          bw.writeBits(bits - 2, 3)
          metaXs = subSize(xs, bits)
          val metaYs = subSize(ys, bits)
          numGroups = 2
          groupOf = Array.tabulate(metaXs * metaYs)(i => ((i % metaXs) + (i / metaXs)) & 1)
          val metaPx = groupOf.map(g => 0xff000000 | (g << 8))
          encodeEntropyImage(bw, metaPx, metaXs, metaYs, isLevel0 = false,
            cacheBits = 0, lz77 = false, metaBits = None)
        case None => bw.writeBits(0, 1)
      }
    }

    val tokens = tokenize(px, xs, cacheBits, lz77)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greenAlpha = 256 + 24 + cacheSize
    @inline def grp(pos: Int): Int =
      if (groupOf == null) 0
      else groupOf(((pos / xs) >> mb) * metaXs + ((pos % xs) >> mb))

    // per-group histograms for the 5 symbol streams
    val hG = Array.fill(numGroups)(new Array[Long](greenAlpha))
    val hR = Array.fill(numGroups)(new Array[Long](256))
    val hB = Array.fill(numGroups)(new Array[Long](256))
    val hA = Array.fill(numGroups)(new Array[Long](256))
    val hD = Array.fill(numGroups)(new Array[Long](40))
    val d2p = if (lz77) distToPlane(xs) else null
    tokens.foreach {
      case Lit(p, pos) =>
        val g = grp(pos)
        hG(g)((p >>> 8) & 0xff) += 1; hR(g)((p >>> 16) & 0xff) += 1
        hB(g)(p & 0xff) += 1; hA(g)((p >>> 24) & 0xff) += 1
      case Copy(len, dist, pos) =>
        val g = grp(pos)
        hG(g)(256 + prefixCode(len)._1) += 1
        hD(g)(prefixCode(d2p.getOrElse(dist, dist + 120))._1) += 1
      case CacheRef(idx, pos) => hG(grp(pos))(280 + idx) += 1
    }

    val codes = (0 until numGroups).map { g =>
      Array(hG(g), hR(g), hB(g), hA(g), hD(g)).map { h =>
        val lens = huffLengths(h, 15)
        writePrefixCode(bw, lens)
        new WCode(lens, canonCodes(lens))
      }
    }

    tokens.foreach {
      case Lit(p, pos) =>
        val c = codes(grp(pos))
        c(0).write(bw, (p >>> 8) & 0xff)
        c(1).write(bw, (p >>> 16) & 0xff)
        c(2).write(bw, p & 0xff)
        c(3).write(bw, (p >>> 24) & 0xff)
      case Copy(len, dist, pos) =>
        val c = codes(grp(pos))
        val (lc, leb, lev) = prefixCode(len)
        c(0).write(bw, 256 + lc)
        if (leb > 0) bw.writeBits(lev, leb)
        val (dc, deb, dev) = prefixCode(d2p.getOrElse(dist, dist + 120))
        c(4).write(bw, dc)
        if (deb > 0) bw.writeBits(dev, deb)
      case CacheRef(idx, pos) => codes(grp(pos))(0).write(bw, 280 + idx)
    }
  }

  /** Encode ARGB pixels as a RIFF/WEBP container with one VP8L chunk. */
  def encodeArgb(argb: Array[Int], w: Int, h: Int, opts: EncOptions = EncOptions()): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384 && argb.length == w * h,
      "vp8l: bad dimensions")
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(if (argb.exists(p => (p >>> 24) != 0xff)) 1 else 0, 1)
    bw.writeBits(0, 3) // version

    var cur = argb.clone()
    var xs = w

    if (opts.palette) {
      val pal = cur.distinct.sorted
      require(pal.length <= 256, "vp8l: palette > 256 colors")
      val palIdx = pal.zipWithIndex.toMap
      val widthBits =
        if (pal.length <= 2) 3 else if (pal.length <= 4) 2 else if (pal.length <= 16) 1 else 0
      bw.writeBits(1, 1); bw.writeBits(3, 2) // COLOR_INDEXING
      bw.writeBits(pal.length - 1, 8)
      val palDeltas = Array.tabulate(pal.length)(i => if (i == 0) pal(0) else subPx(pal(i), pal(i - 1)))
      encodeEntropyImage(bw, palDeltas, pal.length, 1, isLevel0 = false,
        cacheBits = 0, lz77 = false, metaBits = None)
      val redXs = subSize(xs, widthBits)
      val bpp = 8 >> widthBits
      val packed = new Array[Int](redXs * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < xs) {
          val idx = palIdx(cur(y * xs + x))
          val slot = y * redXs + (x >> widthBits)
          val bitOff = (x & ((1 << widthBits) - 1)) * bpp
          packed(slot) |= idx << (8 + bitOff) // green channel
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < packed.length) { packed(i) |= 0xff000000; i += 1 }
      cur = packed
      xs = redXs
    }

    if (opts.subtractGreen) {
      bw.writeBits(1, 1); bw.writeBits(2, 2) // SUBTRACT_GREEN
      var i = 0
      while (i < cur.length) {
        val p = cur(i)
        val g = (p >>> 8) & 0xff
        val r = (((p >>> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        cur(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
    }

    opts.colorDeltas.foreach { case (g2r, g2b, r2b) =>
      bw.writeBits(1, 1); bw.writeBits(1, 2) // COLOR_TRANSFORM
      val bits = opts.colorBits
      bw.writeBits(bits - 2, 3)
      val tilesX = subSize(xs, bits)
      val tilesY = subSize(h, bits)
      val cte = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) | (g2r & 0xff)
      encodeEntropyImage(bw, Array.fill(tilesX * tilesY)(cte), tilesX, tilesY,
        isLevel0 = false, cacheBits = 0, lz77 = true, metaBits = None)
      var i = 0
      while (i < cur.length) {
        val p = cur(i)
        val g = (p >>> 8) & 0xff
        val r0 = (p >>> 16) & 0xff
        val b0 = p & 0xff
        val r1 = (r0 - ctDelta(g2r, g)) & 0xff
        val b1 = (b0 - ctDelta(g2b, g) - ctDelta(r2b, r0)) & 0xff
        cur(i) = (p & 0xff00ff00) | (r1 << 16) | b1
        i += 1
      }
    }

    opts.predictorMode.foreach { mode =>
      require(mode >= 0 && mode <= 13, "vp8l: predictor mode 0..13")
      bw.writeBits(1, 1); bw.writeBits(0, 2) // PREDICTOR
      val bits = opts.predictorBits
      bw.writeBits(bits - 2, 3)
      val tilesX = subSize(xs, bits)
      val tilesY = subSize(h, bits)
      encodeEntropyImage(bw, Array.fill(tilesX * tilesY)(0xff000000 | (mode << 8)),
        tilesX, tilesY, isLevel0 = false, cacheBits = 0, lz77 = true, metaBits = None)
      val res = new Array[Int](cur.length)
      var pos = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < xs) {
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) cur(pos - 1)
            else if (x == 0) cur(pos - xs)
            else predict(mode, cur(pos - 1), cur(pos - xs), cur(pos - xs - 1), cur(pos - xs + 1))
          res(pos) = subPx(cur(pos), pred)
          pos += 1; x += 1
        }
        y += 1
      }
      cur = res
    }

    bw.writeBits(0, 1) // end of transforms
    encodeEntropyImage(bw, cur, xs, h, isLevel0 = true,
      cacheBits = opts.cacheBits, lz77 = opts.lz77, metaBits = opts.metaBits)

    val payload = bw.finish()
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    bos.write("RIFF".getBytes("US-ASCII"))
    w32(4 + 8 + payload.length + (payload.length & 1))
    bos.write("WEBP".getBytes("US-ASCII"))
    bos.write("VP8L".getBytes("US-ASCII"))
    w32(payload.length)
    bos.write(payload)
    if ((payload.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** Encode 8-bit gray as VP8L (luma in all three channels; subtract-green
    * zeroes red/blue, so gray costs ~one channel).
    */
  def encodeGray(px: Array[Byte], w: Int, h: Int,
      opts: EncOptions = EncOptions()): Array[Byte] = {
    val argb = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      argb(i) = 0xff000000 | (v << 16) | (v << 8) | v
      i += 1
    }
    encodeArgb(argb, w, h, opts)
  }
}
