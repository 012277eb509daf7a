package graft.fixtures

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Grayscale image codec + perceptual-hash kernels (SURVEY.md H12).
  *
  * `raw` fmt = single-channel 8-bit row-major pixels (w*h bytes) —
  * byte-exact checks. `png` fmt = lossless PNG via javax.imageio (in-JDK,
  * zero extra deps) — exercises the decode + PSNR≥40dB verification path
  * that a lossy format would use (BASELINE.json input_hint).
  */
object ImageCodec {
  def encodeRaw(pixels: Array[Byte]): Array[Byte] = pixels

  def encodePng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Lossy JPEG at the given quality (in-JDK writer — real DCT lossy path,
    * exercising the PSNR≥40dB verification gate non-trivially).
    */
  def encodeJpeg(pixels: Array[Byte], w: Int, h: Int, quality: Float = 0.95f): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  def encodeBmp(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Lossless WebP (VP8L) via the in-repo graft.core.Vp8l codec — real
    * container + bitstream, subtract-green + color cache + LZ77.
    */
  def encodeWebp(pixels: Array[Byte], w: Int, h: Int): Array[Byte] =
    graft.core.Vp8l.encodeGray(pixels, w, h)

  /** Formats decoded for real: raw/png/jpg/bmp/gif via the in-JDK ImageIO
    * stack, webp (VP8L) via graft.core.Vp8l. No external libs.
    */
  val RealFormats: Set[String] = Set("raw", "png", "jpg", "jpeg", "bmp", "gif", "webp")

  /** Decode to row-major 8-bit gray pixels. png/jpeg/bmp/gif go through
    * javax.imageio (in-JDK), webp through the VP8L decoder; non-gray
    * sources are converted via the standard luma draw.
    */
  def decode(bytes: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] = fmt match {
    case "raw" => bytes
    case "webp" =>
      val (dw, dh, px) = graft.core.Vp8l.decodeGray(bytes)
      require(dw == w && dh == h, s"webp dims ($dw,$dh) != metadata ($w,$h)")
      px
    case "png" =>
      // fast path: the in-repo 8-bit-gray decoder (ImageIO's reader costs
      // ~3.3 ms/tiny image in setup alone — 90× measured; PngSpec gates
      // byte parity). Non-gray/interlaced PNGs fall through to ImageIO.
      graft.core.Png.decodeGray(bytes) match {
        case Some((dw, dh, px)) =>
          require(dw == w && dh == h, s"png dims ($dw,$dh) != metadata ($w,$h)")
          px
        case None => decodeImageIo(bytes, fmt, w, h)
      }
    case f if RealFormats.contains(f.toLowerCase) => decodeImageIo(bytes, fmt, w, h)
    case other => throw new IllegalArgumentException(s"unknown fmt: $other")
  }

  /** Encode interleaved-RGB pixels (3 bytes/px, row-major) as a truecolor
    * PNG (colour type 2) via ImageIO — the RGB fixture twin of encodePng.
    */
  def encodePngRgb(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(rgb.length == w * h * 3, "need 3 bytes per pixel")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val samples = new Array[Int](w * h * 3)
    var i = 0
    while (i < samples.length) { samples(i) = rgb(i) & 0xff; i += 1 }
    img.getRaster.setPixels(0, 0, w, h, samples)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode to interleaved 8-bit RGB (3 bytes/px). PNG colour types 0/2/3
    * take the in-repo fast path (graft.core.Png — gray replicates to three
    * equal channels); anything else falls back to ImageIO.
    */
  def decodeRgb(bytes: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] = fmt match {
    case "png" =>
      graft.core.Png.decode(bytes) match {
        case Some(img) if img.channels == 3 =>
          require(img.w == w && img.h == h, s"png dims (${img.w},${img.h}) != metadata ($w,$h)")
          img.pixels
        case Some(img) =>
          require(img.w == w && img.h == h, s"png dims (${img.w},${img.h}) != metadata ($w,$h)")
          val out = new Array[Byte](w * h * 3)
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i)
            val o = i * 3
            out(o) = v; out(o + 1) = v; out(o + 2) = v
            i += 1
          }
          out
        case None => decodeRgbImageIo(bytes, fmt, w, h)
      }
    case _ => decodeRgbImageIo(bytes, fmt, w, h)
  }

  private def decodeRgbImageIo(bytes: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"ImageIO failed to decode fmt=$fmt")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        out(o) = ((argb >> 16) & 0xff).toByte
        out(o + 1) = ((argb >> 8) & 0xff).toByte
        out(o + 2) = (argb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def decodeImageIo(bytes: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] = {
    val img0 = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img0 != null, s"ImageIO failed to decode fmt=$fmt")
    val img =
      if (img0.getType == BufferedImage.TYPE_BYTE_GRAY) img0
      else {
        val g = new BufferedImage(img0.getWidth, img0.getHeight, BufferedImage.TYPE_BYTE_GRAY)
        val gg = g.createGraphics(); gg.drawImage(img0, 0, 0, null); gg.dispose()
        g
      }
    val out = new Array[Byte](w * h)
    img.getRaster.getDataElements(0, 0, w, h, out)
    out
  }

  /** 8×8 average-hash: bit k (row-major) set iff block-k mean > global mean.
    * Requires w, h divisible by 8.
    */
  def avgHash64(pixels: Array[Byte], w: Int, h: Int): Long = {
    val bw = w / 8; val bh = h / 8
    var global = 0L
    var i = 0
    while (i < pixels.length) { global += (pixels(i) & 0xff); i += 1 }
    val gMean = global.toDouble / pixels.length
    var hash = 0L
    var k = 0
    while (k < 64) {
      val br = k / 8; val bc = k % 8
      var sum = 0L
      var y = br * bh
      while (y < (br + 1) * bh) {
        var x = bc * bw
        val rowBase = y * w
        while (x < (bc + 1) * bw) { sum += (pixels(rowBase + x) & 0xff); x += 1 }
        y += 1
      }
      if (sum.toDouble / (bw * bh) > gMean) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** Construct pixels whose avgHash64 equals the given 64-bit value:
    * block k = 200 if bit k set else 50. Exact for any value with < 64 bits
    * set (phash is a ≤58-bit Morton code, so always exact here).
    */
  def pixelsFromHash(hash: Long, w: Int, h: Int): Array[Byte] = {
    val bw = w / 8; val bh = h / 8
    val px = new Array[Byte](w * h)
    var k = 0
    while (k < 64) {
      val v: Byte = if (((hash >>> k) & 1L) == 1L) 200.toByte else 50.toByte
      val br = k / 8; val bc = k % 8
      var y = br * bh
      while (y < (br + 1) * bh) {
        java.util.Arrays.fill(px, y * w + bc * bw, y * w + (bc + 1) * bw, v)
        y += 1
      }
      k += 1
    }
    px
  }

  /** Peak signal-to-noise ratio in dB; Double.PositiveInfinity if identical. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, "size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * a.length / se)
  }
}
