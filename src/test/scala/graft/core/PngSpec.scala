package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.ImageCodec

/** In-repo gray-PNG fast path: byte parity with the ImageIO reference on
  * encoder output, all five scanline filters via hand-built streams, and
  * fallback behaviour outside the supported subset.
  */
class PngSpec extends AnyFunSuite {

  private def imageIoDecode(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val out = new Array[Byte](w * h)
    img.getRaster.getDataElements(0, 0, w, h, out)
    out
  }

  test("fixture-style and noise pixels: byte parity with ImageIO across sizes") {
    val rnd = new scala.util.Random(42)
    for ((w, h) <- Seq((32, 32), (64, 32), (96, 64), (33, 17), (1, 1), (7, 3))) {
      val smooth = ImageCodec.pixelsFromHash(rnd.nextLong(), math.max(8, w / 8 * 8), math.max(8, h / 8 * 8))
      val cases = Seq(
        Array.fill(w * h)(rnd.nextInt(256).toByte),
        Array.tabulate(w * h)(i => (i % 251).toByte)) ++
        (if (smooth.length == w * h) Seq(smooth) else Nil)
      for (px <- cases) {
        val enc = ImageCodec.encodePng(px, w, h)
        val got = Png.decodeGray(enc)
        assert(got.isDefined, s"fast path must handle ImageIO gray output ($w x $h)")
        val (dw, dh, dpx) = got.get
        assert((dw, dh) === ((w, h)))
        assert(dpx.sameElements(px), s"pixel mismatch at $w x $h")
        assert(imageIoDecode(enc, w, h).sameElements(dpx), "ImageIO parity")
      }
    }
  }

  test("all five filter types unfilter correctly (hand-built stream)") {
    val w = 5; val h = 5
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    // forward-filter each row with filter type = row index (0..4)
    val stride = w + 1
    val raw = new Array[Byte](stride * h)
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * stride) = ft.toByte
      for (x <- 0 until w) {
        val cur = px(y * w + x) & 0xff
        val a = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val b = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * stride + 1 + x) = (cur - pred).toByte
      }
    }
    // zlib-wrap + chunk-wrap (CRCs present but unchecked by the parser)
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(bos)
    dos.write(raw); dos.close()
    val idat = bos.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
    val got = Png.decodeGray(png)
    assert(got.isDefined)
    assert(got.get._3.sameElements(px))
    assert(imageIoDecode(png, w, h).sameElements(px), "hand-built stream must also be ImageIO-valid")
  }

  private def imageIoRgb(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      out(o) = ((argb >> 16) & 0xff).toByte
      out(o + 1) = ((argb >> 8) & 0xff).toByte
      out(o + 2) = (argb & 0xff).toByte
    }
    out
  }

  test("RGB (colour type 2): byte parity with ImageIO across sizes") {
    val rnd = new scala.util.Random(43)
    for ((w, h) <- Seq((32, 32), (33, 17), (1, 1), (7, 3), (64, 48))) {
      for (gen <- 0 until 2) {
        val rgb =
          if (gen == 0) Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
          else Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
        val enc = ImageCodec.encodePngRgb(rgb, w, h)
        val got = Png.decode(enc)
        assert(got.isDefined, s"fast path must handle ImageIO RGB output ($w x $h)")
        assert(got.get.channels === 3)
        assert((got.get.w, got.get.h) === ((w, h)))
        assert(got.get.pixels.sameElements(rgb), s"pixel mismatch at $w x $h")
        assert(imageIoRgb(enc, w, h).sameElements(got.get.pixels), "ImageIO parity")
        assert(ImageCodec.decodeRgb(enc, "png", w, h).sameElements(rgb))
      }
    }
  }

  test("palette (colour type 3): expanded RGB matches ImageIO") {
    // TYPE_BYTE_INDEXED → ImageIO writes a palette PNG (colour type 3)
    val w = 24; val h = 16
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val rnd = new scala.util.Random(44)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt(1 << 24))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val enc = bos.toByteArray
    // guard: only meaningful if ImageIO actually produced colour type 3 at depth 8
    val isPalette8 = enc.length > 26 && enc(24) == 8 && enc(25) == 3
    if (isPalette8) {
      val got = Png.decode(enc)
      assert(got.isDefined, "palette-8 PNG must take the fast path")
      assert(got.get.channels === 3)
      assert(got.get.pixels.sameElements(imageIoRgb(enc, w, h)), "ImageIO parity")
    } else {
      assert(Png.decode(enc).isEmpty || Png.decode(enc).get.pixels.sameElements(imageIoRgb(enc, w, h)))
    }
  }

  test("all five filter types × RGB unfilter correctly (hand-built stream)") {
    val w = 5; val h = 5; val bpp = 3
    val px = Array.tabulate(w * h * bpp)(i => ((i * 41 + 13) % 256).toByte)
    val rowBytes = w * bpp
    val stride = rowBytes + 1
    val raw = new Array[Byte](stride * h)
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * stride) = ft.toByte
      for (x <- 0 until rowBytes) {
        val cur = px(y * rowBytes + x) & 0xff
        val a = if (x >= bpp) px(y * rowBytes + x - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * rowBytes + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) px((y - 1) * rowBytes + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * stride + 1 + x) = (cur - pred).toByte
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(bos)
    dos.write(raw); dos.close()
    val idat = bos.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
    val got = Png.decode(png)
    assert(got.isDefined && got.get.channels === 3)
    assert(got.get.pixels.sameElements(px))
    assert(imageIoRgb(png, w, h).sameElements(px), "hand-built RGB stream must also be ImageIO-valid")
  }

  test("malformed streams return None, never throw (overflow guards)") {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      out.putInt(0) // wrong CRC — parser doesn't verify
      out.array()
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    // IHDR with dims whose stride*h overflows int: 0x20000 x 0x20000 gray
    val hugeIhdr = java.nio.ByteBuffer.allocate(13)
      .putInt(0x20000).putInt(0x20000).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val huge = sig ++ chunk("IHDR", hugeIhdr) ++ chunk("IDAT", Array[Byte](1, 2, 3)) ++ chunk("IEND", Array.empty)
    assert(Png.decode(huge).isEmpty, "overflowing dims must be rejected, not thrown")
    // chunk length that overflows off + 12 + len in int arithmetic
    val evil = sig ++ java.nio.ByteBuffer.allocate(8).putInt(0x7ffffff0).put("IDAT".getBytes("US-ASCII")).array()
    assert(Png.decode(evil).isEmpty, "int-overflowing chunk length must be rejected")
    // palette image missing its PLTE chunk
    val palIhdr = java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(4).put(8.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(bos)
    dos.write(new Array[Byte](5 * 4)); dos.close()
    val noPlte = sig ++ chunk("IHDR", palIhdr) ++ chunk("IDAT", bos.toByteArray) ++ chunk("IEND", Array.empty)
    assert(Png.decode(noPlte).isEmpty, "palette stream without PLTE must be rejected")
  }

  test("outside the subset: returns None, ImageCodec falls back to ImageIO") {
    // RGB png — colour type 2, not in the fast subset
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, (x * 32 << 16) | (y * 32 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rgb = bos.toByteArray
    assert(Png.decodeGray(rgb).isEmpty, "RGB must not take the gray fast path")
    // full decode path still works (ImageIO fallback, gray conversion)
    val px = ImageCodec.decode(rgb, "png", 8, 8)
    assert(px.length === 64)
    // garbage and truncated input
    assert(Png.decodeGray(Array.fill(64)(0x7f.toByte)).isEmpty)
    val ok = ImageCodec.encodePng(Array.fill(64)(9.toByte), 8, 8)
    assert(Png.decodeGray(ok.take(ok.length - 10)).isEmpty, "truncated stream must be rejected")
  }
}
