package graft.ops

/** From-scratch BMP (DIB) pixel decoder — with [[PngCodec]], [[JpegCodec]]
  * and [[GifCodec]] this makes the whole still-image stack zero-dependency.
  * BMP is pure FORMAT: a 14-byte file header ('BM', pixel-data offset), a
  * BITMAPINFOHEADER (or longer V4/V5 header — length-prefixed, so longer
  * variants parse by skipping), an optional BGRA palette, and raster rows
  * padded to 4-byte stride.
  *
  * Supported pixel formats (the profiles that cover real-world BMP):
  * 24bpp BI_RGB (BGR), 32bpp BI_RGB (BGRX, alpha byte ignored), 8bpp
  * palettized, and BI_RLE8 (the run-length-coded 8bpp variant: encoded
  * runs, absolute mode with word padding, end-of-line / end-of-bitmap /
  * delta escapes — deltas leave skipped pixels at palette index 0, the
  * de-facto convention). Bottom-up (positive height) and top-down
  * (negative height) row orders both decode. RLE4/bitfields and
  * sub-8-bit depths return None — `Multimodal.decodeImage` falls back to
  * ImageIO for those.
  *
  * Robustness contract (shared across the codec family): malformed,
  * hostile or truncated input yields `None`, never a throw; declared
  * dimensions are validated against the actual pixel payload before any
  * allocation.
  */
object BmpCodec {

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  def decode(bytes: Array[Byte]): Option[PngCodec.Image] = {
    try {
      if (bytes == null || bytes.length < 54) return None
      if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
      val pxOffset = le32(bytes, 10)
      val dibSize = le32(bytes, 14)
      if (dibSize < 40) return None // BITMAPCOREHEADER not supported
      val width = le32(bytes, 18).toInt
      val rawHeight = le32(bytes, 22).toInt
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      val bitCount = le16(bytes, 28)
      val compression = le32(bytes, 30)
      if (width <= 0 || height <= 0) return None
      if (compression != 0L && !(compression == 1L && bitCount == 8)) return None
      if (width.toLong * height * 3 > (1L << 26)) return None
      val bypp = bitCount match {
        case 24 => 3
        case 32 => 4
        case 8  => 1
        case _  => return None
      }
      // 8bpp palette: BGRA quads right after the DIB header; biClrUsed
      // (offset 46) 0 means the full 256
      val palette: Array[Byte] = if (bitCount != 8) null else {
        val used = le32(bytes, 46) match { case 0 => 256L; case u => u }
        if (used > 256) return None
        val palStart = 14 + dibSize.toInt
        if (palStart + used.toInt * 4 > bytes.length) return None
        val p = new Array[Byte](used.toInt * 4)
        System.arraycopy(bytes, palStart, p, 0, p.length)
        p
      }
      val rle = compression == 1L
      if (rle && topDown) return None // RLE bitmaps are bottom-up by spec
      val stride = ((width * bypp + 3) / 4) * 4
      val off = pxOffset.toInt
      if (off < 0) return None
      if (!rle && off + stride.toLong * height > bytes.length) return None
      // RLE8 pre-pass: expand the run stream into a flat index raster in
      // FILE row order (row 0 = bottom row), stride = width
      val rleRaster: Array[Byte] =
        if (!rle) null
        else decodeRle8(bytes, off, width, height).getOrElse(return None)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = off + (if (topDown) y else height - 1 - y) * stride
        var x = 0
        while (x < width) {
          val d = (y * width + x) * 3
          bitCount match {
            case 8 =>
              val pi =
                if (rle) rleRaster((height - 1 - y) * width + x) & 0xFF
                else bytes(srcRow + x) & 0xFF
              val idx = pi * 4
              if (idx + 2 >= palette.length) return None
              // palette entries are BGRA
              out(d) = palette(idx + 2); out(d + 1) = palette(idx + 1); out(d + 2) = palette(idx)
            case _ =>
              val s = srcRow + x * bypp // BGR(X)
              out(d) = bytes(s + 2); out(d + 1) = bytes(s + 1); out(d + 2) = bytes(s)
          }
          x += 1
        }
        y += 1
      }
      Some(PngCodec.Image(width, height, 3, out))
    } catch { case _: Throwable => None }
  }

  /** BI_RLE8 expansion into a width-stride index raster in FILE row order
    * (row 0 = bottom). Encoded mode (count ≥ 1, value), escapes 0x00 0x00
    * (end of line), 0x00 0x01 (end of bitmap), 0x00 0x02 dx dy (delta —
    * skipped pixels stay index 0), absolute mode (0x00, n ≥ 3, n raw
    * indices, padded to a word boundary). Overruns and truncation → None.
    */
  private def decodeRle8(b: Array[Byte], start: Int, width: Int,
                         height: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](width * height)
    var x = 0
    var row = 0
    var p = start
    while (p + 1 < b.length) {
      val n = b(p) & 0xFF
      val v = b(p + 1) & 0xFF
      p += 2
      if (n > 0) { // encoded run
        if (row >= height || x + n > width) return None
        java.util.Arrays.fill(out, row * width + x, row * width + x + n, v.toByte)
        x += n
      } else v match {
        case 0 => // end of line
          x = 0; row += 1
          if (row > height) return None
        case 1 => return Some(out) // end of bitmap
        case 2 => // delta
          if (p + 1 >= b.length) return None
          x += b(p) & 0xFF; row += b(p + 1) & 0xFF
          p += 2
          if (x > width || row > height) return None
        case cnt => // absolute mode: cnt raw indices, word-aligned
          if (row >= height || x + cnt > width || p + cnt > b.length) return None
          System.arraycopy(b, p, out, row * width + x, cnt)
          x += cnt
          p += cnt + (cnt & 1)
      }
    }
    None // ran out of bytes before the end-of-bitmap escape
  }
}
