package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch GIF (LZW) and BMP (DIB) decoders: exact goldens
  * against the fixture generator formulas, independent conformance
  * against the JDK's ImageIO (which WROTE the GIF fixtures — real LZW
  * output, not a dialect), interlace handling, all three BMP layouts,
  * and the hostile-input contract.
  */
class GifBmpCodecSpec extends AnyFunSuite {

  private def gifDims(id: Long) = ((8 + 2 * (id % 8)).toInt, (8 + 2 * (id % 4)).toInt)
  private def gifVal(id: Long, i: Int) = ((id * 31 + i) % 256).toInt
  private def bmpDims(id: Long) = ((4 + id % 9).toInt, (3 + id % 5).toInt)
  private def bmpVal(id: Long, i: Int) = ((id * 31 + i * 7) % 256).toInt

  test("GifCodec decodes ImageIO-written LZW exactly (gray palette → RGB triples)") {
    for (id <- 0L until 16L) { // all widths × all heights the fixture makes
      val (w, h) = gifDims(id)
      val img = GifCodec.decode(graft.SparkEntry.synthGif(id)).get
      assert(img.width == w && img.height == h && img.channels == 3, s"id=$id")
      for (i <- 0 until w * h; c <- 0 until 3)
        assert((img.pixels(i * 3 + c) & 0xFF) == gifVal(id, i), s"id=$id px=$i ch=$c")
    }
  }

  test("GifCodec handles INTERLACED images (8/8/4/2 pass reorder)") {
    val w = 16; val h = 13 // odd height exercises ragged pass boundaries
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) src.getRaster.setSample(x, y, 0, (y * w + x) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // interlace on
    writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
    writer.dispose(); ios.close()
    val img = GifCodec.decode(bos.toByteArray).get
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels((y * w + x) * 3) & 0xFF) == (y * w + x) % 256, s"($x,$y)")
  }

  test("BmpCodec decodes all three layouts to the same gray formula") {
    // id%3 cycles 24bpp bottom-up / 32bpp top-down / 8bpp palette
    for (id <- 0L until 9L) {
      val (w, h) = bmpDims(id)
      val img = BmpCodec.decode(graft.SparkEntry.synthBmp(id)).get
      assert(img.width == w && img.height == h && img.channels == 3, s"id=$id")
      for (i <- 0 until w * h; c <- 0 until 3)
        assert((img.pixels(i * 3 + c) & 0xFF) == bmpVal(id, i), s"id=$id px=$i ch=$c")
    }
  }

  test("BmpCodec conformance: ImageIO reads the same fixtures identically") {
    for (id <- Seq(0L, 1L, 2L, 4L, 5L)) {
      val bytes = graft.SparkEntry.synthBmp(id)
      val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(theirs != null, s"ImageIO rejected synthBmp($id)")
      val (w, h) = bmpDims(id)
      assert(theirs.getWidth == w && theirs.getHeight == h)
      // raster samples, not getRGB: ImageIO promotes the gray palette to a
      // linear-gray ColorSpace whose getRGB applies an sRGB transform —
      // the raw samples are the decoded values
      for (y <- 0 until h; x <- 0 until w)
        assert(theirs.getRaster.getSample(x, y, 0) == bmpVal(id, y * w + x),
          s"id=$id ($x,$y)")
    }
  }

  test("decodeImage routes GIF/BMP through our codecs; stats values unchanged vs ImageIO") {
    // the q_gif_decode oracle was written against the ImageIO path — the
    // codec swap must be value-invisible
    val gif = graft.SparkEntry.synthGif(5L)
    val ours = GifCodec.decode(gif).get
    val io = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    for (y <- 0 until ours.height; x <- 0 until ours.width)
      assert((ours.pixels((y * ours.width + x) * 3) & 0xFF) == (io.getRGB(x, y) & 0xFF))
    assert(Multimodal.decodeImage(gif).get.pixels.sameElements(ours.pixels))
    val bmp = graft.SparkEntry.synthBmp(7L)
    assert(Multimodal.decodeImage(bmp).get.pixels
      .sameElements(BmpCodec.decode(bmp).get.pixels))
  }

  test("garbage-in contract: truncation, bit flips and junk never throw") {
    val goodGif = graft.SparkEntry.synthGif(3L)
    val goodBmp = graft.SparkEntry.synthBmp(3L)
    for (cut <- Seq(1, 5, 12, goodGif.length / 2)) {
      assert(GifCodec.decode(goodGif.take(cut)).isEmpty, s"gif cut=$cut")
      assert(BmpCodec.decode(goodBmp.take(math.min(cut, goodBmp.length - 1))).isEmpty,
        s"bmp cut=$cut")
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val g = goodGif.clone(); g(rnd.nextInt(g.length)) = rnd.nextInt(256).toByte
      GifCodec.decode(g)
      val b = goodBmp.clone(); b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      BmpCodec.decode(b)
    }
    // dimension bomb: tiny BMP claiming huge dims
    val bomb = goodBmp.clone()
    bomb(18) = 0xFF.toByte; bomb(19) = 0xFF.toByte; bomb(20) = 0x7F.toByte
    assert(BmpCodec.decode(bomb).isEmpty)
  }
}
