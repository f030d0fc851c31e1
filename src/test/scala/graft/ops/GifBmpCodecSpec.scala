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

  test("decodeFrames golden: every synthAnimGif frame exact, delays parsed from the GCE") {
    for (id <- Seq(0L, 4L, 7L)) {
      val w = (8 + 2 * (id % 5)).toInt
      val h = (6 + 2 * (id % 3)).toInt
      val nf = (2 + id % 3).toInt
      val anim = GifCodec.decodeFrames(graft.SparkEntry.synthAnimGif(id)).get
      assert(anim.width == w && anim.height == h && anim.frames.length == nf, s"id=$id")
      assert(anim.delaysCs.forall(_ == (4 + id % 7).toInt), anim.delaysCs.toSeq)
      for (f <- 0 until nf; i <- 0 until w * h; c <- 0 until 3)
        assert((anim.frames(f).pixels(i * 3 + c) & 0xFF) == ((id * 31 + f * 97 + i) % 256).toInt,
          s"id=$id f=$f px=$i")
    }
  }

  /** ImageIO-written animation with explicit per-frame metadata. */
  private def animGif(canvasW: Int, canvasH: Int,
                      frames: Seq[(Int, Int, Array[Array[Int]], String, Int)]): Array[Byte] = {
    // frames: (left, top, rows of palette indices, disposal, transparentIdx or -1)
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (left, top, rows, disposal, transparent) =>
      val h = rows.length; val w = rows(0).length
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, rows(y)(x))
      val param = writer.getDefaultWriteParam
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), param)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", if (transparent >= 0) "TRUE" else "FALSE")
      gce.setAttribute("delayTime", "5")
      gce.setAttribute("transparentColorIndex", math.max(transparent, 0).toString)
      root.appendChild(gce)
      val desc = new javax.imageio.metadata.IIOMetadataNode("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      desc.setAttribute("imageWidth", w.toString)
      desc.setAttribute("imageHeight", h.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      // replace the default descriptor if present
      val existing = root.getElementsByTagName("ImageDescriptor")
      if (existing.getLength > 0) root.removeChild(existing.item(0))
      root.appendChild(desc)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("decodeFrames compositing: sub-rect update, transparency keeps canvas, disposal-2 restores background") {
    val w = 8; val h = 4
    def flat(wid: Int, hei: Int, v: Int) = Array.fill(hei)(Array.fill(wid)(v))
    // frame 0: full canvas 100, disposal none
    // frame 1: 3×2 rect of 200 at (2,1), disposal restoreToBackgroundColor
    // frame 2: full canvas where the LEFT half is transparent (index 7),
    //          right half 50 — transparent pixels must show the
    //          post-disposal canvas (background 0 inside frame 1's rect,
    //          100 elsewhere)
    val f2 = Array.tabulate(h, w)((_, x) => if (x < w / 2) 7 else 50)
    val bytes = animGif(w, h, Seq(
      (0, 0, flat(w, h, 100), "none", -1),
      (2, 1, flat(3, 2, 200), "restoreToBackgroundColor", -1),
      (0, 0, f2, "none", 7)))
    val anim = GifCodec.decodeFrames(bytes).get
    assert(anim.frames.length == 3 && anim.width == w && anim.height == h)
    def px(f: Int, x: Int, y: Int) = anim.frames(f).pixels((y * w + x) * 3) & 0xFF
    // frame 0: flat 100
    assert((0 until w * h).forall(i => (anim.frames(0).pixels(i * 3) & 0xFF) == 100))
    // frame 1: rect 200 over 100
    assert(px(1, 2, 1) == 200 && px(1, 4, 2) == 200 && px(1, 0, 0) == 100 && px(1, 5, 3) == 100)
    // frame 2: right half 50; left half = post-disposal canvas
    assert(px(2, 6, 0) == 50 && px(2, 4, 3) == 50)
    assert(px(2, 0, 0) == 100, "outside the disposed rect the old canvas survives")
    assert(px(2, 2, 1) == 0 && px(2, 3, 2) == 0,
      "inside frame 1's rect disposal-2 restored the background")
  }

  test("BI_RLE8: runs, absolute mode, delta and EOL/EOB decode; ImageIO agrees") {
    val w = 7; val h = 3
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val palette = (0 until 256).flatMap(g => Seq(g.toByte, g.toByte, g.toByte, 0.toByte)).toArray
    val rle = Array[Int](
      3, 10, 0, 3, 20, 30, 40, 0 /*pad*/, 1, 50, 0, 0, // row0: 10,10,10,20,30,40,50
      0, 2, 2, 0, 5, 60, 0, 0,                         // row1: skip 2 (→0), 5×60
      7, 70, 0, 1                                      // row2: 7×70, EOB
    ).map(_.toByte)
    val pxOffset = 14 + 40 + palette.length
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(pxOffset + rle.length)); out.write(le32(0)); out.write(le32(pxOffset))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
    out.write(le16(1)); out.write(le16(8))
    out.write(le32(1)) // BI_RLE8
    out.write(le32(rle.length)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(256)); out.write(le32(0))
    out.write(palette); out.write(rle)
    val bytes = out.toByteArray
    val img = BmpCodec.decode(bytes).get
    assert(img.width == w && img.height == h && img.channels == 3)
    // file rows are bottom-up: output y0 = row2, y1 = row1, y2 = row0
    val expected = Array(
      Array(70, 70, 70, 70, 70, 70, 70),
      Array(0, 0, 60, 60, 60, 60, 60),
      Array(10, 10, 10, 20, 30, 40, 50))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels((y * w + x) * 3) & 0xFF) == expected(y)(x), s"($x,$y)")
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO rejected the RLE8 fixture")
    for (y <- 0 until h; x <- 0 until w)
      assert(theirs.getRaster.getSample(x, y, 0) == expected(y)(x), s"imageio ($x,$y)")
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
