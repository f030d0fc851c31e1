package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG pixel codec with zero external dependencies — `java.util.zip`
  * inflate/deflate plus the PNG scanline filters implemented directly from
  * the spec (RFC 2083 / W3C PNG §9: None, Sub, Up, Average, Paeth). This
  * closes the one image-decode stub that never needed a native library:
  * PNG's compression IS zlib, which the JDK ships.
  *
  * Decode supports the 8-bit-depth, non-interlaced forms of all five color
  * types — greyscale (0), truecolor (2), palette (3, expanded to RGB via
  * PLTE), grey+alpha (4), RGBA (6). Anything else (16-bit, Adam7, ancillary
  * transparency) returns None — same garbage-in contract as the other
  * codecs here: a malformed or unsupported file yields no pixels, never a
  * thrown executor error.
  *
  * Encode writes 8-bit greyscale/RGB/RGBA with a caller-chosen filter per
  * row — exercising every filter type on the encode side is what lets a
  * round-trip test prove the decoder's unfiltering, and the golden spec
  * cross-checks both directions against the JDK's independent ImageIO
  * implementation.
  */
object PngCodec {

  /** Decoded image: 8-bit channel-interleaved row-major samples.
    * `channels`: 1 = grey, 2 = grey+alpha, 3 = RGB, 4 = RGBA.
    */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Signature = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  def decode(bytes: Array[Byte]): Option[Image] = scala.util.Try {
    if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(Signature)) return None
    var width = 0; var height = 0; var bitDepth = 0; var colorType = -1; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    var off = 8
    var sawEnd = false
    while (!sawEnd && off + 8 <= bytes.length) {
      val len = be32(bytes, off)
      if (len < 0 || off + 12 + len > bytes.length) return None
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          width = be32(bytes, off + 8); height = be32(bytes, off + 12)
          bitDepth = bytes(off + 16) & 0xFF; colorType = bytes(off + 17) & 0xFF
          interlace = bytes(off + 20) & 0xFF
        case "PLTE" => palette = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _      => // ancillary chunk — skip
      }
      off += 12 + len
    }
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (bitDepth != 8 || interlace != 0 || width <= 0 || height <= 0) return None
    if (colorType == 3 && palette == null) return None

    // zlib-inflate the concatenated IDAT stream into (1 + w·ch) · h bytes.
    // Dimensions are ATTACKER-CONTROLLED: bound the allocation by zlib's
    // maximum expansion (1032:1) of the actual IDAT payload before touching
    // it — a 60-byte file declaring a 100M-wide image must yield None, not
    // a 2 GB allocation (OutOfMemoryError escapes the Try and kills the
    // executor, breaking the garbage-in contract).
    val idatBytes = idat.toByteArray
    // stride/rawLen in LONG first: crafted IHDR dims (width ≈ 2^30, RGBA)
    // overflow an Int stride to a small positive number, which would decode
    // "successfully" into a buffer inconsistent with width·height·channels
    val strideL = width.toLong * channels
    val rawLen = (strideL + 1L) * height
    if (rawLen > idatBytes.length.toLong * 1032L + 4096L || rawLen > Int.MaxValue)
      return None
    val stride = strideL.toInt
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    inf.setInput(idatBytes)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // any zero-progress state ends the decode: truncated stream
      // (needsInput), FDICT preset-dictionary header (needsDictionary —
      // inflate() returns 0 with needsInput()=false FOREVER, a confirmed
      // infinite-loop vector for crafted files), or any other stall
      if (n == 0 && !inf.finished()) { inf.end(); return None }
      got += n
    }
    inf.end()
    if (got < raw.length) return None

    // undo the per-row filter (PNG §9): bpp = bytes per complete pixel
    val out = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val left = if (x >= bpp) out(rowOut + x - bpp) & 0xFF else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xFF else 0
        val upLeft = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xFF else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            cur + pred
          case _ => return None
        }
        out(rowOut + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }

    if (colorType == 3) {
      // palette indices → RGB triples
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < width * height) {
        val idx = (out(i) & 0xFF) * 3
        if (idx + 2 >= palette.length) return None
        rgb(i * 3) = palette(idx); rgb(i * 3 + 1) = palette(idx + 1); rgb(i * 3 + 2) = palette(idx + 2)
        i += 1
      }
      Some(Image(width, height, 3, rgb))
    } else Some(Image(width, height, channels, out))
  }.toOption.flatten

  /** Encode 8-bit samples (channels 1 = grey, 2 = grey+alpha, 3 = RGB,
    * 4 = RGBA) as a spec-conformant PNG. `filterForRow` picks the filter type (0-4) per
    * scanline — the forward filter is applied here, so a decoder must
    * implement the matching reconstruction to recover the pixels.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(Set(1, 2, 3, 4).contains(channels), s"unsupported channel count $channels")
    require(pixels.length == width * height * channels,
      s"${pixels.length} samples for ${width}x$height x$channels")
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val stride = width * channels
    val bpp = channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = filterForRow(y)
      require(ft >= 0 && ft <= 4, s"filter $ft")
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xFF
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xFF else 0
        val upLeft = if (y > 0 && x >= bpp) pixels((y - 1) * stride + x - bpp) & 0xFF else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            cur - pred
        }
        raw(y * (stride + 1) + 1 + x) = (filtered & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = (v >>> 24).toByte; a(i + 1) = (v >>> 16).toByte
      a(i + 2) = (v >>> 8).toByte; a(i + 3) = v.toByte
    }
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8; compression/filter/interlace 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", comp.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, payload: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    len(0) = (payload.length >>> 24).toByte; len(1) = (payload.length >>> 16).toByte
    len(2) = (payload.length >>> 8).toByte; len(3) = payload.length.toByte
    out.write(len)
    val typBytes = typ.getBytes("US-ASCII")
    out.write(typBytes)
    out.write(payload)
    val crc = new CRC32()
    crc.update(typBytes); crc.update(payload)
    val c = crc.getValue.toInt
    out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
  }
}
