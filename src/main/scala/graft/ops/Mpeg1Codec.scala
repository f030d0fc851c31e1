package graft.ops

/** MPEG-1 **video** decoder (ISO/IEC 11172-2) — intra (I) pictures fully,
  * and since round 15 predictive (P) pictures with REAL forward motion
  * compensation, retiring the last stubbed media path: keyframe AND
  * inter-frame pixels decode for real, so video dedup (frame dHash
  * sequences, frame stats) runs on actual reconstructed frames.
  *
  * What decodes:
  *  - sequence header (dimensions, optional LOADED intra and non-intra
  *    quantizer matrices), GOP headers (skipped), picture headers;
  *  - **I-pictures, fully**: slice walk with per-slice quantizer scale
  *    and DC predictor reset, macroblock address/type VLCs, per-block
  *    DC size VLCs (luma + chroma) with differential DC prediction in
  *    QFS units (predictor 128, F₀₀ = 8·pred), AC run/level decode,
  *    intra dequantization F = (2·QFS·qscale·W)/16 with the
  *    even-value oddification (division truncates toward zero, ISO
  *    §2.4.4.2), zigzag placement, separable 8×8 IDCT, 4:2:0 chroma
  *    replication and BT.601 YCbCr→RGB;
  *  - **P-pictures**: full_pel_forward_vector + forward_f_code picture
  *    header fields, the full Table B.1 macroblock_address_increment
  *    VLC (values 1–33 plus escape +33 and stuffing), SKIPPED
  *    macroblocks (zero-vector copy from the previous picture, motion
  *    and DC predictors reset — ISO §2.4.4.4), the Table B.2b P
  *    macroblock_type VLC (all seven rows incl. the quant variants),
  *    motion vector decode via Table B.4 (whose codes are Table B.1's
  *    rows 2–33 — odd row = positive, even row = negative, the last
  *    bit being the sign) with f_code residuals and the little/big
  *    wraparound reconstruction of §2.4.4.2, half-pel interpolation
  *    with away-from-zero rounding ((a+b+1)>>1 / (a+b+c+d+2)>>2, the
  *    spec's "//" operator), chroma displacement recon/2 truncated
  *    toward zero, the Table B.3 coded_block_pattern VLC (all 63
  *    rows), non-intra dequantization F = ((2·QFS + sign)·qscale·W)/16
  *    with oddification and the default all-16 non-intra matrix, the
  *    non-intra first-coefficient rule ('1 s' = run 0 level ±1, EOB
  *    cannot lead), and prediction-error ADDITION onto the
  *    motion-compensated block;
  *  - **B-pictures** (round 15): the Table B.2c macroblock_type VLC
  *    (all eleven rows), dual forward/backward f_code picture headers,
  *    backward MC from the future anchor, INTERPOLATED prediction
  *    averaging forward and backward pels with away-from-zero rounding,
  *    skipped-B macroblocks repeating the previous macroblock's
  *    prediction type and vectors (§2.4.4.4), and PRESENTATION
  *    REORDERING — anchors are emitted when the next anchor arrives, B
  *    frames in between, so decode order I₀P₃B₁B₂ comes out I₀B₁B₂P₃;
  *  - D-pictures are SKIPPED whole (the DC-only preview type), never
  *    mis-decoded.
  *
  * AC run/level scope (the B.14 analog of Mp3Codec's table note): EOB
  * ('10'), the (run 0, level 1) code ('11'+s — and its non-intra
  * first-coefficient form '1'+s) and the full ESCAPE path
  * ('000001' + 6-bit run + 8/16-bit level — the standard-provided
  * arbitrary-coefficient route, which can express EVERY coefficient a
  * conformant encoder may emit) are implemented; other B.14 prefixes
  * reject the stream loudly (`None`). The default intra quantizer
  * matrix ships as reconstructed from ISO 11172-2; streams that LOAD
  * their matrix (as the gate fixtures with AC content do) never touch
  * it, and DC-only streams are matrix-independent by definition. The
  * B.1 and B.3 tables are reconstructions of the published ISO tables,
  * prefix-free-checked in the spec suite; B.3's Kraft sum closes to
  * exactly 1 − 2/512 (the two reserved 9-bit rows), a structural
  * property transcription errors break.
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

  /** Table B.1 — macroblock_address_increment, values 1–33 as
    * (value, len, code); stuffing ('0000 0001 111') and escape
    * ('0000 0001 000', +33) are matched inline. Also the source of the
    * Table B.4 motion codes: row v ≥ 2 is motion_code ±(v/2) — odd v
    * positive, even v negative (the code's last bit is the sign bit) —
    * and row 1 ('1') is motion_code 0.
    */
  private[ops] val MbaEntries: Seq[(Int, Int, Int)] = Seq(
    (1, 1, 0x1),
    (2, 3, 0x3), (3, 3, 0x2),
    (4, 4, 0x3), (5, 4, 0x2),
    (6, 5, 0x3), (7, 5, 0x2),
    (8, 7, 0x7), (9, 7, 0x6),
    (10, 8, 0xB), (11, 8, 0xA), (12, 8, 0x9), (13, 8, 0x8),
    (14, 8, 0x7), (15, 8, 0x6),
    (16, 10, 0x17), (17, 10, 0x16), (18, 10, 0x15), (19, 10, 0x14),
    (20, 10, 0x13), (21, 10, 0x12),
    (22, 11, 0x23), (23, 11, 0x22), (24, 11, 0x21), (25, 11, 0x20),
    (26, 11, 0x1F), (27, 11, 0x1E), (28, 11, 0x1D), (29, 11, 0x1C),
    (30, 11, 0x1B), (31, 11, 0x1A), (32, 11, 0x19), (33, 11, 0x18))
  private val Mba: Map[(Int, Int), Int] =
    MbaEntries.map { case (v, len, code) => (len, code) -> v }.toMap
  private val MbaStuffing = (11, 0x0F)
  private val MbaEscape = (11, 0x08)

  /** Table B.2b — P-picture macroblock_type:
    * (len, code) -> (quant, motion_forward, pattern, intra).
    */
  private[ops] val PMbType: Map[(Int, Int), (Int, Int, Int, Int)] = Map(
    (1, 0x1) -> (0, 1, 1, 0),
    (2, 0x1) -> (0, 0, 1, 0),
    (3, 0x1) -> (0, 1, 0, 0),
    (5, 0x3) -> (0, 0, 0, 1),
    (5, 0x2) -> (1, 1, 1, 0),
    (5, 0x1) -> (1, 0, 1, 0),
    (6, 0x1) -> (1, 0, 0, 1))

  /** Table B.2c — B-picture macroblock_type:
    * (len, code) -> (quant, motion_forward, motion_backward, pattern, intra).
    */
  private[ops] val BMbType: Map[(Int, Int), (Int, Int, Int, Int, Int)] = Map(
    (2, 0x2) -> (0, 1, 1, 0, 0),
    (2, 0x3) -> (0, 1, 1, 1, 0),
    (3, 0x2) -> (0, 0, 1, 0, 0),
    (3, 0x3) -> (0, 0, 1, 1, 0),
    (4, 0x2) -> (0, 1, 0, 0, 0),
    (4, 0x3) -> (0, 1, 0, 1, 0),
    (5, 0x3) -> (0, 0, 0, 0, 1),
    (5, 0x2) -> (1, 1, 1, 1, 0),
    (6, 0x3) -> (1, 1, 0, 1, 0),
    (6, 0x2) -> (1, 0, 1, 1, 0),
    (6, 0x1) -> (1, 0, 0, 0, 1))

  /** Table B.3 — coded_block_pattern, all 63 rows as (cbp, len, code);
    * bit 32 = Y₀ … bit 1 = Cr. Kraft sum = 1 − 2/512 (the two reserved
    * 9-bit codes), checked in the spec suite.
    */
  private[ops] val CbpEntries: Seq[(Int, Int, Int)] = Seq(
    (60, 3, 0x7),
    (4, 4, 0xD), (8, 4, 0xC), (16, 4, 0xB), (32, 4, 0xA),
    (12, 5, 0x13), (48, 5, 0x12), (20, 5, 0x11), (40, 5, 0x10),
    (28, 5, 0xF), (44, 5, 0xE), (52, 5, 0xD), (56, 5, 0xC),
    (1, 5, 0xB), (61, 5, 0xA), (2, 5, 0x9), (62, 5, 0x8),
    (24, 6, 0xF), (36, 6, 0xE), (3, 6, 0xD), (63, 6, 0xC),
    (5, 7, 0x17), (9, 7, 0x16), (17, 7, 0x15), (33, 7, 0x14),
    (6, 7, 0x13), (10, 7, 0x12), (18, 7, 0x11), (34, 7, 0x10),
    (7, 8, 0x1F), (11, 8, 0x1E), (19, 8, 0x1D), (35, 8, 0x1C),
    (13, 8, 0x1B), (49, 8, 0x1A), (21, 8, 0x19), (41, 8, 0x18),
    (14, 8, 0x17), (50, 8, 0x16), (22, 8, 0x15), (42, 8, 0x14),
    (15, 8, 0x13), (51, 8, 0x12), (23, 8, 0x11), (43, 8, 0x10),
    (25, 8, 0xF), (37, 8, 0xE), (26, 8, 0xD), (38, 8, 0xC),
    (29, 8, 0xB), (45, 8, 0xA), (53, 8, 0x9), (57, 8, 0x8),
    (30, 8, 0x7), (46, 8, 0x6), (54, 8, 0x5), (58, 8, 0x4),
    (31, 9, 0x7), (47, 9, 0x6), (55, 9, 0x5), (59, 9, 0x4),
    (27, 9, 0x3), (39, 9, 0x2))
  private val Cbp: Map[(Int, Int), Int] =
    CbpEntries.map { case (v, len, code) => (len, code) -> v }.toMap

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
    /** Slice data ends when the next 23 bits are zero (the start-code
      * prefix). The reader stops at the next start code, so when fewer
      * than 23 bits remain the zero-run check covers just the remaining
      * alignment padding — the start code itself supplies the rest of
      * the zeros (a sub-23-bit final macroblock is perfectly legal).
      */
    def atSliceEnd(): Boolean = {
      val lim = math.min(23L, endBit - bitPos)
      if (lim <= 0) return true
      var i = 0L
      while (i < lim) {
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

  /** Separable 8×8 IDCT of F (raster order) — `add = false` writes the
    * absolute intra block; `add = true` adds the prediction error onto
    * the motion-compensated prediction already in the plane. Clamped
    * 0–255 either way (no level shift — MPEG-1 intra blocks carry
    * absolute levels).
    */
  private def idct(coef: Array[Int], plane: Array[Int], planeW: Int,
                   ox: Int, oy: Int, add: Boolean = false): Unit = {
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
        val o = (oy + y) * planeW + ox + x
        val e = math.round(0.25 * s)
        plane(o) = (clamp8(if (add) plane(o) + e else e) & 0xFF)
        y += 1
      }
      x += 1
    }
  }

  /** Forward motion-compensated copy of a `size`×`size` block from `src`
    * into `dst` at (ox, oy), displaced (dx, dy) HALF-pel units —
    * interpolation rounds away from zero (the spec's "//"): 2-tap
    * (a+b+1)>>1, 4-tap (a+b+c+d+2)>>2. Out-of-picture references are
    * illegal in MPEG-1 and throw (caught by the picture walk).
    */
  private def mcCopy(src: Array[Int], dst: Array[Int], planeW: Int, planeH: Int,
                     ox: Int, oy: Int, dx: Int, dy: Int, size: Int,
                     avg: Boolean = false): Unit = {
    val fx = dx >> 1; val hx = dx & 1
    val fy = dy >> 1; val hy = dy & 1
    if (ox + fx < 0 || oy + fy < 0 ||
        ox + fx + size - 1 + hx >= planeW || oy + fy + size - 1 + hy >= planeH)
      throw new ArrayIndexOutOfBoundsException(-1)
    var y = 0
    while (y < size) {
      val sy = oy + y + fy
      var x = 0
      while (x < size) {
        val sx = ox + x + fx
        val p =
          if (hx == 0 && hy == 0) src(sy * planeW + sx)
          else if (hy == 0) (src(sy * planeW + sx) + src(sy * planeW + sx + 1) + 1) >> 1
          else if (hx == 0) (src(sy * planeW + sx) + src((sy + 1) * planeW + sx) + 1) >> 1
          else (src(sy * planeW + sx) + src(sy * planeW + sx + 1) +
            src((sy + 1) * planeW + sx) + src((sy + 1) * planeW + sx + 1) + 2) >> 2
        val di = (oy + y) * planeW + ox + x
        // `avg`: the backward half of an interpolated B prediction —
        // averaged with the forward pel already written, rounding away
        // from zero (the spec's "//")
        dst(di) = if (avg) (dst(di) + p + 1) >> 1 else p
        x += 1
      }
      y += 1
    }
  }

  /** §2.4.4.2 motion vector reconstruction: predictor + little, or + big
    * on range overflow; `f` = 1 << (f_code − 1), `resid` = motion_r.
    */
  private def reconMv(pred: Int, code: Int, resid: Int, f: Int): Int = {
    if (code == 0) return pred
    val comp = if (f == 1) 0 else f - 1 - resid
    var little = code * f
    var big = 0
    if (code > 0) { little -= comp; big = little - 32 * f }
    else { little += comp; big = little + 32 * f }
    val mx = 16 * f - 1
    val mn = -16 * f
    val n = pred + little
    if (n >= mn && n <= mx) n else pred + big
  }

  private def decodeVlc[T](r: BitReader, table: Map[(Int, Int), T], maxLen: Int): T = {
    var code = 0
    var len = 0
    while (len < maxLen) {
      code = (code << 1) | r.read1()
      len += 1
      table.get((len, code)) match {
        case Some(v) => return v
        case None =>
      }
    }
    throw new ArrayIndexOutOfBoundsException(-1)
  }

  /** macroblock_address_increment with stuffing + escape handling. */
  private def readMbaIncrement(r: BitReader): Int = {
    var inc = 0
    var code = 0
    var len = 0
    var guardBits = 0
    while (guardBits < 64 * 11) { // bounds repeated stuffing/escape runs
      code = (code << 1) | r.read1()
      len += 1
      guardBits += 1
      if ((len, code) == MbaStuffing) { code = 0; len = 0 } // keep looking
      else if ((len, code) == MbaEscape) { inc += 33; code = 0; len = 0 }
      else {
        Mba.get((len, code)) match {
          case Some(v) => return inc + v
          case None =>
            if (len >= 11) throw new ArrayIndexOutOfBoundsException(-1)
        }
      }
    }
    throw new ArrayIndexOutOfBoundsException(-1)
  }

  /** One motion vector component: Table B.4 code (B.1 rows — see
    * [[MbaEntries]]) then the f_code−1 residual bits.
    */
  private def readMvDelta(r: BitReader, fCode: Int, pred: Int): Int = {
    val row = {
      var code = 0
      var len = 0
      var v = -1
      while (v < 0 && len < 11) {
        code = (code << 1) | r.read1()
        len += 1
        Mba.get((len, code)).foreach(x => v = x)
      }
      if (v < 0) throw new ArrayIndexOutOfBoundsException(-1)
      v
    }
    val motionCode =
      if (row == 1) 0
      else if ((row & 1) == 1) row / 2
      else -(row / 2)
    val f = 1 << (fCode - 1)
    val resid = if (f != 1 && motionCode != 0) r.read(fCode - 1) else 0
    reconMv(pred, motionCode, resid, f)
  }

  /** Decode one coefficient block. `intra`: DC via size VLC + diff chain
    * then AC; non-intra: run/levels from coefficient 0 with the
    * first-coefficient '1 s' rule. Returns the updated DC predictor
    * (intra) — non-intra blocks return `dcPredIn` untouched.
    */
  private def decodeBlock(r: BitReader, intra: Boolean, luma: Boolean,
                          dcPredIn: Int, qscale: Int, intraQ: Array[Int],
                          nonIntraQ: Array[Int], coef: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    var dcPred = dcPredIn
    var idx = if (intra) 0 else -1
    if (intra) {
      val table = if (luma) DcLuma else DcChroma
      val size = decodeVlc(r, table, 10)
      val diff =
        if (size == 0) 0
        else {
          val v = r.read(size)
          if ((v >> (size - 1)) == 1) v else v - ((1 << size) - 1)
        }
      dcPred += diff
      coef(0) = dcPred * 8
    }
    var eob = false
    var first = !intra
    while (!eob) {
      if (r.read1() == 1) {
        if (first) {
          // non-intra first coefficient: '1 s' = run 0, level ±1 (EOB
          // cannot lead a coded block, so the short form is unambiguous)
          val lvl = if (r.read1() == 1) -1 else 1
          idx += 1
          place(coef, idx, lvl, qscale, if (intra) intraQ else nonIntraQ, intra)
        } else if (r.read1() == 0) eob = true // '10' = EOB
        else {
          // '11' + sign: run 0, level 1
          val lvl = if (r.read1() == 1) -1 else 1
          idx += 1
          if (idx > 63) throw new ArrayIndexOutOfBoundsException(-1)
          place(coef, idx, lvl, qscale, if (intra) intraQ else nonIntraQ, intra)
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
        place(coef, idx, lvl, qscale, if (intra) intraQ else nonIntraQ, intra)
      }
      first = false
    }
    dcPred
  }

  /** Decode all I- and P-frames of an MPEG-1 video elementary stream
    * (B/D pictures are skipped — see the scope note above).
    */
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
      val nonIntraQ = Array.fill(64)(16) // default non-intra matrix: flat 16
      if (sh.read1() == 1) {
        var i = 0
        while (i < 64) { nonIntraQ(JpegCodec.Zigzag(i)) = sh.read(8); i += 1 }
      }

      val mbW = (width + 15) / 16
      val mbH = (height + 15) / 16
      val frames = scala.collection.mutable.ArrayBuffer.empty[PngCodec.Image]
      // anchor (I/P) planes: `ref*` is the most recent anchor (a P
      // picture's forward reference, a B picture's BACKWARD reference),
      // `past*` the one before it (a B picture's FORWARD reference)
      var refY: Array[Int] = null
      var refCb: Array[Int] = null
      var refCr: Array[Int] = null
      var pastY: Array[Int] = null
      var pastCb: Array[Int] = null
      var pastCr: Array[Int] = null
      // presentation reordering: anchors are emitted when the NEXT anchor
      // arrives (B frames between them come out in between), so decode
      // order I₀ P₃ B₁ B₂ … emits I₀ B₁ B₂ P₃ … — display order
      var pendingAnchor: PngCodec.Image = null
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
          // a truncated picture HEADER must still keep prior frames; a
          // picture that will be SKIPPED (no anchors yet, or a D picture)
          // is not parsed past its type at all
          var pType = -1
          var fullPel = 0
          var fCode = 1
          var fullPelB = 0
          var fCodeB = 1
          var decodable = false
          var hdrOk = true
          try {
            ph.read(10)
            pType = ph.read(3)
            decodable = pType == 1 || (pType == 2 && refY != null) ||
              (pType == 3 && pastY != null && refY != null)
            if (decodable && (pType == 2 || pType == 3)) {
              ph.read(16) // vbv_delay
              fullPel = ph.read1()
              fCode = ph.read(3)
              if (fCode < 1 || fCode > 7) hdrOk = false
              if (pType == 3) {
                fullPelB = ph.read1()
                fCodeB = ph.read(3)
                if (fCodeB < 1 || fCodeB > 7) hdrOk = false
              }
            }
          } catch { case _: ArrayIndexOutOfBoundsException => hdrOk = false }
          if (!hdrOk) { ok = false; pos = -1 }
          else if (!decodable) {
            // D pictures (and a P/B without its anchors): skip whole
            var nxt = findStartCode(bytes, pos + 4)
            while (nxt >= 0 && (bytes(nxt + 3) & 0xFF) >= 0x01 &&
              (bytes(nxt + 3) & 0xFF) <= 0xAF) nxt = findStartCode(bytes, nxt + 4)
            pos = nxt
          } else {
            val isP = pType == 2
            val isB = pType == 3
            // I: fresh planes; P: start from the reference (skipped and
            // uncovered macroblocks keep the zero-vector copy for free)
            val yPlane = if (isP) refY.clone() else new Array[Int](mbW * 16 * mbH * 16)
            val cbPlane = if (isP) refCb.clone() else Array.fill(mbW * 8 * mbH * 8)(128)
            val crPlane = if (isP) refCr.clone() else Array.fill(mbW * 8 * mbH * 8)(128)
            var slicePos = findStartCode(bytes, pos + 4)
            var sliceOk = true
            val coef = new Array[Int](64)
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
              var mvX = 0 // forward MV predictors (coded domain)
              var mvY = 0
              var mvBX = 0 // backward MV predictors (B pictures)
              var mvBY = 0
              // skipped-B state: the previous macroblock's prediction
              // directions (its vectors ARE the current predictors, since
              // uncoded directions leave predictors untouched)
              var lastFwd = false
              var lastBwd = false
              // apply the (fwd?, bwd?) prediction at macroblock (mx, my):
              // forward from the PAST anchor (P: the only anchor), backward
              // from the most recent one; interpolation averages with
              // away-from-zero rounding
              def predict(mx: Int, my: Int, fwd: Boolean, bwd: Boolean): Unit = {
                if (fwd) {
                  val dxh = mvX * (if (fullPel == 1) 2 else 1)
                  val dyh = mvY * (if (fullPel == 1) 2 else 1)
                  val (sy, scb, scr) =
                    if (isB) (pastY, pastCb, pastCr) else (refY, refCb, refCr)
                  // P zero-vector predictions are already in the cloned
                  // planes; B planes start empty, so always copy there
                  if (isB || dxh != 0 || dyh != 0) {
                    mcCopy(sy, yPlane, mbW * 16, mbH * 16, mx, my, dxh, dyh, 16)
                    mcCopy(scb, cbPlane, mbW * 8, mbH * 8, mx / 2, my / 2,
                      dxh / 2, dyh / 2, 8)
                    mcCopy(scr, crPlane, mbW * 8, mbH * 8, mx / 2, my / 2,
                      dxh / 2, dyh / 2, 8)
                  }
                }
                if (bwd) {
                  val dxh = mvBX * (if (fullPelB == 1) 2 else 1)
                  val dyh = mvBY * (if (fullPelB == 1) 2 else 1)
                  mcCopy(refY, yPlane, mbW * 16, mbH * 16, mx, my, dxh, dyh, 16, avg = fwd)
                  mcCopy(refCb, cbPlane, mbW * 8, mbH * 8, mx / 2, my / 2,
                    dxh / 2, dyh / 2, 8, avg = fwd)
                  mcCopy(refCr, crPlane, mbW * 8, mbH * 8, mx / 2, my / 2,
                    dxh / 2, dyh / 2, 8, avg = fwd)
                }
              }
              while (sliceOk && !r.atSliceEnd()) {
                val inc = readMbaIncrement(r)
                if (!isP && !isB && inc != 1) throw new ArrayIndexOutOfBoundsException(-1)
                if (inc > 1) {
                  if (isB) {
                    // B: skipped macroblocks REPEAT the previous
                    // macroblock's prediction type and vectors (§2.4.4.4)
                    // — predictors untouched; a leading skip is illegal
                    if (!lastFwd && !lastBwd) throw new ArrayIndexOutOfBoundsException(-1)
                    var k = 1
                    while (k < inc) {
                      val a = mbAddr + k
                      if (a < 0 || a >= mbW * mbH) throw new ArrayIndexOutOfBoundsException(-1)
                      predict((a % mbW) * 16, (a / mbW) * 16, lastFwd, lastBwd)
                      k += 1
                    }
                  } else {
                    // P: skipped = zero-vector reference copy (already in
                    // the cloned planes); both predictor kinds reset
                    mvX = 0; mvY = 0
                  }
                  dcPred(0) = 128; dcPred(1) = 128; dcPred(2) = 128
                }
                mbAddr += inc
                if (mbAddr >= mbW * mbH) throw new ArrayIndexOutOfBoundsException(-1)
                val (quant, forward, backward, pattern, intra) =
                  if (isB) decodeVlc(r, BMbType, 6)
                  else if (isP) {
                    val (q, fw, pat, in) = decodeVlc(r, PMbType, 6)
                    (q, fw, 0, pat, in)
                  } else {
                    // macroblock_type (I): '1' intra, '01' intra + quant
                    if (r.read1() == 1) (0, 0, 0, 0, 1)
                    else if (r.read1() == 1) (1, 0, 0, 0, 1)
                    else throw new ArrayIndexOutOfBoundsException(-1)
                  }
                if (quant == 1) qscale = r.read(5)
                val mbX = (mbAddr % mbW) * 16
                val mbY = (mbAddr / mbW) * 16
                if (intra == 1) {
                  mvX = 0; mvY = 0; mvBX = 0; mvBY = 0 // intra resets MVs
                  lastFwd = false; lastBwd = false     // and forbids a next skip
                } else {
                  if (forward == 1) {
                    mvX = readMvDelta(r, fCode, mvX)
                    mvY = readMvDelta(r, fCode, mvY)
                  } else if (isP) { mvX = 0; mvY = 0 } // P: no-vector ⇒ zero + reset
                  if (backward == 1) {
                    mvBX = readMvDelta(r, fCodeB, mvBX)
                    mvBY = readMvDelta(r, fCodeB, mvBY)
                  }
                  if (isB && forward == 0 && backward == 0)
                    throw new ArrayIndexOutOfBoundsException(-1)
                  predict(mbX, mbY, forward == 1 || isP, backward == 1)
                  lastFwd = forward == 1
                  lastBwd = backward == 1
                  // non-intra macroblock: DC predictors reset
                  dcPred(0) = 128; dcPred(1) = 128; dcPred(2) = 128
                }
                val cbp =
                  if (intra == 1) 63
                  else if (pattern == 1) decodeVlc(r, Cbp, 9)
                  else 0
                var blk = 0
                while (blk < 6) {
                  if ((cbp & (32 >> blk)) != 0) {
                    val comp = if (blk < 4) 0 else blk - 3
                    val np = decodeBlock(r, intra == 1, blk < 4, dcPred(comp),
                      qscale, intraQ, nonIntraQ, coef)
                    if (intra == 1) dcPred(comp) = np
                    if (blk < 4)
                      idct(coef, yPlane, mbW * 16, mbX + (blk % 2) * 8,
                        mbY + (blk / 2) * 8, add = intra == 0)
                    else if (blk == 4)
                      idct(coef, cbPlane, mbW * 8, mbX / 2, mbY / 2, add = intra == 0)
                    else
                      idct(coef, crPlane, mbW * 8, mbX / 2, mbY / 2, add = intra == 0)
                  }
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
            val img = PngCodec.Image(width, height, 3, out)
            if (isB) frames += img // B frames display immediately
            else {
              // anchors display when the next anchor arrives (any B
              // frames decoded in between slot in before them)
              if (pendingAnchor != null) frames += pendingAnchor
              pendingAnchor = img
              pastY = refY; pastCb = refCb; pastCr = refCr
              refY = yPlane; refCb = cbPlane; refCr = crPlane
            }
            if ((frames.length + 1).toLong * width * height > (1L << 26)) ok = false
            pos = slicePos
            }
          }
        } else pos = findStartCode(bytes, pos + 4)
      }
      if (pendingAnchor != null) frames += pendingAnchor // flush the last anchor
      if (frames.isEmpty) None
      else Some(Mpeg1Video(width, height, frames.toArray))
    } catch { case _: Throwable =>
      None
    }
  }

  /** Dequantization (ISO 11172-2 §2.4.4.2/.3): intra F = (2·QFS·qscale·W)
    * / 16; non-intra F = ((2·QFS + sign)·qscale·W) / 16 — division
    * truncating toward zero, then oddification toward zero when even.
    */
  private def place(coef: Array[Int], zz: Int, lvl: Int, qscale: Int,
                    q: Array[Int], intra: Boolean): Unit = {
    val raster = JpegCodec.Zigzag(zz)
    val num = if (intra) 2 * lvl else 2 * lvl + Integer.signum(lvl)
    var f = (num * qscale * q(raster)) / 16
    if (f != 0 && (f & 1) == 0) f -= Integer.signum(f)
    if (f > 2047) f = 2047 else if (f < -2048) f = -2048
    coef(raster) = f
  }
}
