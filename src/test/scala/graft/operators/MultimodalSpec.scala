package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.{Fixtures, ImageCodec}

/** Multimodal plumbing over the image fixture table: real decode (raw/png),
  * resize, feature-extract, frame-sample — verified against the shared
  * in-JVM codec kernels per-row.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  lazy val imgs = Fixtures.images(spark, 500)

  test("decodeMeta: every phash recomputes exactly; lossless roundtrip PSNR = inf") {
    val m = Multimodal.decodeMeta(imgs)
    val rows = m.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.getBoolean(7)), "phash mismatch")
    assert(rows.forall(r => r.getDouble(8).isPosInfinity), "lossless roundtrip must be exact")
    val lumas = rows.map(_.getDouble(5))
    assert(lumas.forall(l => l > 40 && l < 210))
  }

  test("resize preserves the 8x8 block structure of fixture images") {
    val r = Multimodal.resize(imgs.limit(64), 32, 32)
    val joined = r.withColumnRenamed("bytes", "rbytes")
      .join(imgs.select("image_id", "phash"), "image_id")
    val rows = joined.select("rbytes", "phash").collect()
    assert(rows.length === 64)
    for (row <- rows) {
      val px = row.getAs[Array[Byte]](0)
      assert(ImageCodec.avgHash64(px, 32, 32) === row.getLong(1))
    }
  }

  test("features: block-mean embedding encodes the phash bits") {
    val f = Multimodal.features(imgs.limit(32))
      .join(imgs.select("image_id", "phash"), "image_id")
    for (row <- f.select("embedding", "hist8", "phash").collect()) {
      val emb = row.getSeq[Double](0)
      val phash = row.getLong(2)
      assert(emb.length === 64)
      for (k <- 0 until 64) {
        val expect = if (((phash >>> k) & 1L) == 1L) 200.0 / 255 else 50.0 / 255
        assert(math.abs(emb(k) - expect) < 1e-9, s"bit $k")
      }
      assert(row.getSeq[Long](1).sum === row.getSeq[Long](1).sum) // hist present
    }
  }

  test("sampleFrames: fan-out count and byte-exact slices") {
    val one = imgs.where(col("fmt") === "raw").limit(1)
    val src = one.select("bytes", "w", "h").collect().head
    val (bytes, w, h) = (src.getAs[Array[Byte]](0), src.getInt(1), src.getInt(2))
    val frames = Multimodal.sampleFrames(one, frameH = 8, stride = 2).collect()
    assert(frames.length === (h / 8 + 1) / 2)
    for (f <- frames) {
      val idx = f.getInt(1)
      val expect = java.util.Arrays.copyOfRange(bytes, idx * 8 * w, (idx + 1) * 8 * w)
      assert(java.util.Arrays.equals(f.getAs[Array[Byte]](2), expect), s"frame $idx")
    }
  }

  test("audioFeatures: windowed RMS/peak match a hand computation") {
    import spark.implicits._
    val pcm = Array.tabulate(256)(i => ((i % 32) + 112).toByte) // sawtooth around 128
    val df = Seq(("a1", pcm)).toDF("image_id", "bytes")
    val rows = Multimodal.audioFeatures(df, window = 64).collect()
    assert(rows.length === 4)
    val w0 = (0 until 64).map(i => ((pcm(i) & 0xff) - 128))
    val expRms = math.sqrt(w0.map(v => v.toDouble * v).sum / 64)
    assert(math.abs(rows.head.getDouble(2) - expRms) < 1e-12)
    assert(rows.head.getInt(3) === w0.map(math.abs).max)
  }

  test("stub decode path: unknown fmt flows through the same plumbing") {
    import spark.implicits._
    val fake = Seq(("x1", Array[Byte](1, 2, 3), 16, 16, "jpeg", "cap", 0L))
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val m = Multimodal.decodeMeta(fake).collect().head
    assert(m.getInt(4) === 256) // decoded to w*h pixels deterministically
  }
}
