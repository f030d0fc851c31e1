package graft.ops

/** Scoped MPEG-1 **video** I-frame decoder (ISO/IEC 11172-2) — keyframe
  * pixels for real, closing the video half of the r14 verdict's media
  * gap the same way [[Mp3Codec]] closed the audio half. I-frames are
  * 8×8 intra DCT blocks — the [[JpegCodec]] machinery's close cousin —
  * so keyframe-grade video dedup (frame dHash sequences, frame stats)
  * runs on real pixels without an inter-frame motion pipeline.
  *
  * What decodes:
  *  - sequence header (dimensions, optional LOADED intra quantizer
  *    matrix), GOP headers (skipped), picture headers;
  *  - **I-pictures, fully**: slice walk with per-slice quantizer scale
  *    and DC predictor reset, macroblock address/type VLCs, per-block
  *    DC size VLCs (luma + chroma) with differential DC prediction in
  *    QFS units (predictor 128, F₀₀ = 8·pred), AC run/level decode,
  *    intra dequantization F = (2·QFS·qscale·W)/16 with the
  *    even-value oddification (division truncates toward zero, ISO
  *    §2.4.4.2), zigzag placement, separable 8×8 IDCT, 4:2:0 chroma
  *    replication and BT.601 YCbCr→RGB;
  *  - P/B pictures are SKIPPED whole (motion compensation is out of
  *    scope — output frames are the keyframes), never mis-decoded.
  *
  * AC run/level scope (the B.14 analog of Mp3Codec's table note): EOB
  * ('10'), the (run 0, level 1) code ('11'+s) and the full ESCAPE path
  * ('000001' + 6-bit run + 8/16-bit level — the standard-provided
  * arbitrary-coefficient route, which can express EVERY coefficient a
  * conformant encoder may emit) are implemented; other B.14 prefixes
  * reject the stream loudly (`None`). The default intra quantizer
  * matrix ships as reconstructed from ISO 11172-2; streams that LOAD
  * their matrix (as the gate fixtures with AC content do) never touch
  * it, and DC-only streams are matrix-independent by definition.
  *
  * Robustness contract (family-wide): malformed, hostile or truncated
  * input yields `None` (or the frames decoded so far), never a throw.
  */
object Mpeg1Codec {

  final case class Mpeg1Video(width: Int, height: Int,
                              frames: Array[PngCodec.Image])

  /** Default intra quantizer matrix (ISO 11172-2 §2.4.3.1), raster order. */
  private[ops] val DefaultIntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  // dct_dc_size VLCs: (len, code) -> size
  private val DcLuma: Map[(Int, Int), Int] = Map(
    (3, 0x4) -> 0, (2, 0x0) -> 1, (2, 0x1) -> 2, (3, 0x5) -> 3, (3, 0x6) -> 4,
    (4, 0xE) -> 5, (5, 0x1E) -> 6, (6, 0x3E) -> 7, (7, 0x7E) -> 8)
  private val DcChroma: Map[(Int, Int), Int] = Map(
    (2, 0x0) -> 0, (2, 0x1) -> 1, (2, 0x2) -> 2, (3, 0x6) -> 3, (4, 0xE) -> 4,
    (5, 0x1E) -> 5, (6, 0x3E) -> 6, (7, 0x7E) -> 7, (8, 0xFE) -> 8)

  private final class BitReader(b: Array[Byte], var bitPos: Long, val endBit: Long) {
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (bitPos >= endBit) throw new ArrayIndexOutOfBoundsException(bitPos.toInt)
        val byteIdx = (bitPos >>> 3).toInt
        v = (v << 1) | ((b(byteIdx) >> (7 - (bitPos & 7).toInt)) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
    def read1(): Int = read(1)
    /** ≥ 23 zero bits ahead, or fewer than 23 bits left ⇒ next start code. */
    def atSliceEnd(): Boolean = {
      if (endBit - bitPos < 23) return true
      var i = 0L
      while (i < 23) {
        val p = bitPos + i
        if (((b((p >>> 3).toInt) >> (7 - (p & 7).toInt)) & 1) != 0) return false
        i += 1
      }
      true
    }
  }

  private def findStartCode(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) return i
      i += 1
    }
    -1
  }

  private def clamp8(v: Long): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Separable 8×8 IDCT of F (raster order) into an Int plane (no level
    * shift — MPEG-1 intra blocks carry absolute levels), clamped 0–255.
    */
  private def idct(coef: Array[Int], plane: Array[Int], planeW: Int,
                   ox: Int, oy: Int): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * Cos(u)(x); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * Cos(vv)(y); vv += 1 }
        plane((oy + y) * planeW + ox + x) = clamp8(math.round(0.25 * s)) & 0xFF
        y += 1
      }
      x += 1
    }
  }

  /** Decode all I-frames of an MPEG-1 video elementary stream. */
  def decode(bytes: Array[Byte]): Option[Mpeg1Video] = {
    try {
      if (bytes == null || bytes.length < 12) return None
      var sc = findStartCode(bytes, 0)
      if (sc < 0 || (bytes(sc + 3) & 0xFF) != 0xB3) return None
      // ---- sequence header ----
      val sh = new BitReader(bytes, (sc + 4).toLong * 8, bytes.length.toLong * 8)
      val width = sh.read(12)
      val height = sh.read(12)
      if (width == 0 || height == 0 || width > 4096 || height > 4096) return None
      sh.read(4); sh.read(4)       // aspect, frame rate
      sh.read(18); sh.read(1)      // bitrate, marker
      sh.read(10); sh.read(1)      // vbv buffer, constrained flag
      val intraQ = new Array[Int](64)
      if (sh.read1() == 1) {
        // loaded intra matrix arrives in ZIGZAG order
        var i = 0
        while (i < 64) { intraQ(JpegCodec.Zigzag(i)) = sh.read(8); i += 1 }
      } else System.arraycopy(DefaultIntraQ, 0, intraQ, 0, 64)
      if (sh.read1() == 1) { var i = 0; while (i < 64) { sh.read(8); i += 1 } } // non-intra: unused here

      val mbW = (width + 15) / 16
      val mbH = (height + 15) / 16
      val frames = scala.collection.mutable.ArrayBuffer.empty[PngCodec.Image]
      var pos = findStartCode(bytes, sc + 4)
      var ok = true
      while (ok && pos >= 0) {
        val code = bytes(pos + 3) & 0xFF
        if (code == 0xB8 || code == 0xB3 || code == 0xB2) {
          pos = findStartCode(bytes, pos + 4) // GOP / repeat header / user data
        } else if (code == 0xB7) { pos = -1 } // sequence end
        else if (code == 0x00) {
          // ---- picture ----
          val ph = new BitReader(bytes, (pos + 4).toLong * 8, bytes.length.toLong * 8)
          // a truncated picture HEADER must still keep prior frames
          val pType = try { ph.read(10); ph.read(3) }
            catch { case _: ArrayIndexOutOfBoundsException => -1 }
          if (pType < 0) { ok = false; pos = -1 }
          else
          if (pType != 1) {
            // P/B: skip the whole picture (to the next picture/GOP/sequence code)
            var nxt = findStartCode(bytes, pos + 4)
            while (nxt >= 0 && (bytes(nxt + 3) & 0xFF) >= 0x01 &&
              (bytes(nxt + 3) & 0xFF) <= 0xAF) nxt = findStartCode(bytes, nxt + 4)
            pos = nxt
          } else {
            // decode every slice of this I-picture
            val yPlane = new Array[Int](mbW * 16 * mbH * 16)
            val cbPlane = Array.fill(mbW * 8 * mbH * 8)(128)
            val crPlane = Array.fill(mbW * 8 * mbH * 8)(128)
            var slicePos = findStartCode(bytes, pos + 4)
            var sliceOk = true
            try {
            while (sliceOk && slicePos >= 0 && (bytes(slicePos + 3) & 0xFF) >= 0x01 &&
              (bytes(slicePos + 3) & 0xFF) <= 0xAF) {
              val vpos = bytes(slicePos + 3) & 0xFF // 1-based MB row
              val nextSc = findStartCode(bytes, slicePos + 4)
              val end = if (nextSc < 0) bytes.length else nextSc
              val r = new BitReader(bytes, (slicePos + 4).toLong * 8, end.toLong * 8)
              var qscale = r.read(5)
              while (r.read1() == 1) r.read(8) // extra slice info
              var mbAddr = (vpos - 1) * mbW - 1
              val dcPred = Array(128, 128, 128) // Y, Cb, Cr — QFS units
              while (sliceOk && !r.atSliceEnd()) {
                // macroblock_address_increment: in an I-picture every MB is
                // coded, so only '1' (+ stuffing '0000 0001 111') is legal
                var inc = 0
                var guard = 0
                while (inc == 0 && guard < 40) {
                  if (r.read1() == 1) inc = 1
                  else {
                    // the only zero-prefixed codes we accept: stuffing
                    val rest = r.read(10) // '000 0001 111' after the first 0
                    if (rest == 0x0F) { /* stuffing: keep looking */ }
                    else throw new ArrayIndexOutOfBoundsException(-1)
                  }
                  guard += 1
                }
                if (inc != 1) throw new ArrayIndexOutOfBoundsException(-1)
                mbAddr += 1
                if (mbAddr >= mbW * mbH) throw new ArrayIndexOutOfBoundsException(-1)
                // macroblock_type (I): '1' intra, '01' intra + new quant
                if (r.read1() == 0) {
                  if (r.read1() != 1) throw new ArrayIndexOutOfBoundsException(-1)
                  qscale = r.read(5)
                }
                val mbX = (mbAddr % mbW) * 16
                val mbY = (mbAddr / mbW) * 16
                var blk = 0
                while (blk < 6) {
                  val coef = new Array[Int](64)
                  // DC: size VLC + differential
                  val table = if (blk < 4) DcLuma else DcChroma
                  var len = 0
                  var codeAcc = 0
                  var size = -1
                  while (size < 0 && len < 10) {
                    codeAcc = (codeAcc << 1) | r.read1()
                    len += 1
                    table.get((len, codeAcc)).foreach(s => size = s)
                  }
                  if (size < 0) throw new ArrayIndexOutOfBoundsException(-1)
                  val diff =
                    if (size == 0) 0
                    else {
                      val v = r.read(size)
                      if ((v >> (size - 1)) == 1) v else v - ((1 << size) - 1)
                    }
                  val comp = if (blk < 4) 0 else blk - 3
                  dcPred(comp) += diff
                  coef(0) = dcPred(comp) * 8
                  // AC run/level until EOB
                  var idx = 0
                  var eob = false
                  while (!eob) {
                    if (r.read1() == 1) {
                      if (r.read1() == 0) eob = true // '10' = EOB
                      else {
                        // '11' + sign: run 0, level 1
                        val lvl = if (r.read1() == 1) -1 else 1
                        idx += 1
                        if (idx > 63) throw new ArrayIndexOutOfBoundsException(-1)
                        place(coef, idx, lvl, qscale, intraQ)
                      }
                    } else {
                      // expect ESCAPE '000001' (we already consumed one 0)
                      if (r.read(4) != 0 || r.read1() != 1)
                        throw new ArrayIndexOutOfBoundsException(-1)
                      val run = r.read(6)
                      var lvl = r.read(8)
                      if (lvl == 0) lvl = r.read(8)               // +128..+255
                      else if (lvl == 128) lvl = r.read(8) - 256  // -256..-129
                      else if (lvl > 128) lvl = lvl - 256         // sign extend
                      idx += run + 1
                      if (idx > 63) throw new ArrayIndexOutOfBoundsException(-1)
                      place(coef, idx, lvl, qscale, intraQ)
                    }
                  }
                  // IDCT into the right plane
                  if (blk < 4)
                    idct(coef, yPlane, mbW * 16, mbX + (blk % 2) * 8, mbY + (blk / 2) * 8)
                  else if (blk == 4)
                    idct(coef, cbPlane, mbW * 8, mbX / 2, mbY / 2)
                  else
                    idct(coef, crPlane, mbW * 8, mbX / 2, mbY / 2)
                  blk += 1
                }
              }
              slicePos = nextSc
            }
            } catch { case _: ArrayIndexOutOfBoundsException =>
              // truncated/malformed picture: stop here, KEEP the complete
              // frames already decoded (the family-wide contract)
              sliceOk = false
            }
            if (!sliceOk) { ok = false; pos = -1 }
            else {
            // assemble RGB (BT.601, 4:2:0 replication)
            val out = new Array[Byte](width * height * 3)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) {
                val lum = yPlane(y * mbW * 16 + x).toDouble
                val cb = cbPlane((y / 2) * mbW * 8 + x / 2) - 128.0
                val cr = crPlane((y / 2) * mbW * 8 + x / 2) - 128.0
                val o = (y * width + x) * 3
                out(o) = clamp8(math.round(lum + 1.402 * cr))
                out(o + 1) = clamp8(math.round(lum - 0.344136 * cb - 0.714136 * cr))
                out(o + 2) = clamp8(math.round(lum + 1.772 * cb))
                x += 1
              }
              y += 1
            }
            frames += PngCodec.Image(width, height, 3, out)
            if (frames.length.toLong * width * height > (1L << 26)) ok = false
            pos = slicePos
            }
          }
        } else pos = findStartCode(bytes, pos + 4)
      }
      if (frames.isEmpty) None
      else Some(Mpeg1Video(width, height, frames.toArray))
    } catch { case _: Throwable =>
      None
    }
  }

  /** Intra AC dequantization (ISO 11172-2 §2.4.4.2): F = (2·QFS·qscale·W)
    * / 16 truncating toward zero, then oddification toward zero when even.
    */
  private def place(coef: Array[Int], zz: Int, lvl: Int, qscale: Int,
                    intraQ: Array[Int]): Unit = {
    val raster = JpegCodec.Zigzag(zz)
    var f = (2 * lvl * qscale * intraQ(raster)) / 16
    if (f != 0 && (f & 1) == 0) f -= Integer.signum(f)
    if (f > 2047) f = 2047 else if (f < -2048) f = -2048
    coef(raster) = f
  }
}
