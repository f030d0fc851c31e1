package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The from-scratch baseline JPEG decoder: exact DC-only goldens (fixture
  * generator formula), INDEPENDENT conformance both ways against the
  * JDK's ImageIO JPEG implementation (ImageIO reads our synthetic files;
  * we read ImageIO-written files), restart markers, the MJPEG
  * default-table install, the progressive descope + decodeImage fallback,
  * truncation and hostile bytes, and the MJPEG-in-AVI route.
  */
class JpegCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dims(id: Long): (Int, Int) = (
    8 * (2 + id % 3).toInt - (if (id % 5 == 0) 3 else 0),
    8 * (1 + id % 2).toInt - (if (id % 7 == 0) 2 else 0))

  private def level(id: Long, f: Int, w: Int, x: Int, y: Int): Int = {
    val nbx = (w + 7) / 8
    val b = (y / 8) * nbx + (x / 8)
    ((id * 31 + f * 97 + b * 29) % 256).toInt
  }

  test("decode golden: DC-only synthJpeg decodes to the exact block levels") {
    // ids cover: all q values 1/2/4/8 (id%4), restart rows (odd ids),
    // ragged right edge (id%5==0), ragged bottom edge (id%7==0)
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 7L, 10L, 35L)) {
      val (w, h) = dims(id)
      val img = JpegCodec.decode(graft.SparkEntry.synthJpeg(id)).get
      assert(img.width == w && img.height == h && img.channels == 1, s"id=$id")
      for (y <- 0 until h; x <- 0 until w)
        assert((img.pixels(y * w + x) & 0xFF) == level(id, 0, w, x, y),
          s"id=$id ($x,$y)")
    }
  }

  test("conformance: ImageIO reads our synthetic JPEGs and agrees exactly") {
    // DC-only blocks are exact in ANY conformant decoder (no IDCT
    // rounding ambiguity on flat blocks) — so the JDK's independent
    // implementation must reproduce the same pixels bit-for-bit, proving
    // the generator emits spec-conformant streams (stuffing, padding,
    // restart markers, canonical DHT) rather than a dialect only our
    // decoder accepts
    for (id <- Seq(1L, 4L, 7L, 15L)) {
      val (w, h) = dims(id)
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(graft.SparkEntry.synthJpeg(id)))
      assert(decoded != null, s"ImageIO rejected synthJpeg($id)")
      assert(decoded.getWidth == w && decoded.getHeight == h)
      val raster = decoded.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) == level(id, 0, w, x, y),
          s"id=$id ($x,$y)")
    }
  }

  test("conformance: ImageIO-WRITTEN grayscale (full AC, real quant) decodes within ±1") {
    // the reverse direction: a real continuous-tone image through the
    // JDK's encoder exercises AC run/size decode, ZRL, the full Annex K
    // tables and non-trivial IDCT; ±1 absorbs IDCT rounding differences
    // between implementations (T.81 does not mandate a bit-exact IDCT)
    val w = 40; val h = 24
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 5 + y * 3 + ((x * y) % 7)) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpeg", bos))
    val bytes = bos.toByteArray
    val mine = JpegCodec.decode(bytes).get
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(mine.width == w && mine.height == h && mine.channels == 1)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((mine.pixels(y * w + x) & 0xFF) - theirs.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 1, s"max per-pixel diff $maxDiff")
  }

  test("conformance: ImageIO-written COLOR 4:2:0 decodes close (replicated vs interpolated chroma)") {
    // the JDK writer subsamples chroma 4:2:0 by default; its reader
    // interpolates chroma up while we replicate — on a smooth gradient
    // the luma-dominated signal still pins Huffman/IDCT/color-matrix
    // correctness: a table or MCU-walk error produces diffs of 50+
    val w = 32; val h = 32
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((x * 6 + 30) << 16) | ((y * 6 + 20) << 8) | (((x + y) * 3 + 40) & 0xFF))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpeg", bos))
    val bytes = bos.toByteArray
    val mine = JpegCodec.decode(bytes).get
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(mine.width == w && mine.height == h && mine.channels == 3)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = theirs.getRGB(x, y)
      val o = (y * w + x) * 3
      for ((mineV, theirV) <- Seq(
        (mine.pixels(o) & 0xFF, (rgb >> 16) & 0xFF),
        (mine.pixels(o + 1) & 0xFF, (rgb >> 8) & 0xFF),
        (mine.pixels(o + 2) & 0xFF, rgb & 0xFF))) {
        val d = math.abs(mineV - theirV)
        sumDiff += d; maxDiff = math.max(maxDiff, d)
      }
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 2.0, s"mean per-sample diff $meanDiff")
    assert(maxDiff <= 24, s"max per-sample diff $maxDiff (chroma-edge tolerance)")
  }

  test("restart markers: predictor resets per block row on odd ids") {
    // id=9: ri = nbx → a RSTn between every block row; corrupting the
    // restart marker id makes the decode fail (None), proving the marker
    // is actually consumed, not skipped as noise
    val id = 9L
    val bytes = graft.SparkEntry.synthJpeg(id)
    assert(JpegCodec.decode(bytes).isDefined)
    // find the first RST marker (FF D0..D7 after SOS) and break it
    val sos = { var i = 2; while (!((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xDA)) i += 1; i }
    var r = sos + 2
    while (!((bytes(r) & 0xFF) == 0xFF && (bytes(r + 1) & 0xFF) >= 0xD0 && (bytes(r + 1) & 0xFF) <= 0xD7)) r += 1
    val broken = bytes.clone()
    broken(r + 1) = 0xC3.toByte // not a restart marker
    assert(JpegCodec.decode(broken).isEmpty)
  }

  test("MJPEG convention: omitted DHT installs Annex K tables; pixels identical to the explicit-DHT stream") {
    for (id <- Seq(2L, 6L)) {
      val withTables = JpegCodec.decode(graft.SparkEntry.synthJpeg(id, withDht = true)).get
      val without = JpegCodec.decode(graft.SparkEntry.synthJpeg(id, withDht = false)).get
      assert(without.width == withTables.width && without.height == withTables.height)
      assert(without.pixels.sameElements(withTables.pixels), s"id=$id")
    }
  }

  test("progressive JPEG is the documented descope: JpegCodec None, decodeImage ImageIO fallback decodes") {
    val w = 24; val h = 16
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) src.getRaster.setSample(x, y, 0, (x * 7 + y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    assert(JpegCodec.decode(bytes).isEmpty, "progressive must be None, not misdecoded")
    val img = Multimodal.decodeImage(bytes).get
    assert(img.width == w && img.height == h)
  }

  test("garbage-in contract: truncation, bit flips, random bytes never throw; dims are capped") {
    val good = graft.SparkEntry.synthJpeg(3L)
    for (cut <- Seq(1, 2, 4, 20, good.length / 3, good.length / 2))
      assert(JpegCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // near-end cuts may only clip EOI/padding — decode may succeed, but
    // must never throw
    for (cut <- (good.length - 4) until good.length)
      JpegCodec.decode(good.take(cut))
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 300) {
      val mutated = good.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      JpegCodec.decode(mutated) // any result is fine; throwing is not
    }
    for (trial <- 0 until 100) {
      val junk = new Array[Byte](64 + rnd.nextInt(256))
      rnd.nextBytes(junk)
      junk(0) = 0xFF.toByte; junk(1) = 0xD8.toByte // valid SOI, garbage after
      JpegCodec.decode(junk)
    }
    // dimension bomb: a tiny stream declaring a ~1-gigasample image
    val bomb = graft.SparkEntry.synthJpeg(1L).clone()
    val sof = { var i = 2; while (!((bomb(i) & 0xFF) == 0xFF && (bomb(i + 1) & 0xFF) == 0xC0)) i += 1; i }
    bomb(sof + 5) = 0x7F.toByte; bomb(sof + 6) = 0xFF.toByte // height 32767
    bomb(sof + 7) = 0x7F.toByte; bomb(sof + 8) = 0xFF.toByte // width 32767
    assert(JpegCodec.decode(bomb).isEmpty)
  }

  test("MJPEG-in-AVI: frames decode through JpegCodec with exact levels; frame order preserved") {
    val id = 4L
    val (w, h) = dims(id)
    val nf = (2 + id % 3).toInt
    val d = AviCodec.decode(graft.SparkEntry.synthMjpegAvi(id)).get
    assert(d.frames.length == nf)
    for (f <- 0 until nf) {
      val img = d.frames(f)
      assert(img.width == w && img.height == h && img.channels == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.pixels(y * w + x) & 0xFF) == level(id, f, w, x, y),
          s"f=$f ($x,$y)")
    }
  }

  test("videoFrameStats over MJPEG AVI matches the per-frame generator formula") {
    val ids = Seq(0L, 1L, 4L, 9L)
    val media = ids.toDF("doc_id").as[Long]
      .map(id => (id, graft.SparkEntry.synthMjpegAvi(id)))
      .toDF("doc_id", "media")
    val rows = Multimodal.videoFrameStats(media, "doc_id")
      .orderBy("doc_id", "frame_index").collect()
    val expected = ids.flatMap { id =>
      val (w, h) = dims(id)
      (0 until (2 + id % 3).toInt).map { f =>
        val vs = for (y <- 0 until h; x <- 0 until w) yield level(id, f, w, x, y)
        (id, f.toLong, w.toLong, h.toLong, (w * h).toLong,
          vs.map(_.toLong).sum,
          vs.zipWithIndex.map { case (v, i) => v.toLong * i }.sum,
          vs.min.toLong, vs.max.toLong)
      }
    }
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, e) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) == e)
    }
  }
}
