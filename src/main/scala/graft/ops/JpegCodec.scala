package graft.ops

/** From-scratch BASELINE JPEG decoder (ITU T.81 sequential DCT, the format
  * of essentially all web JPEG and of every MJPEG video frame) — no
  * ImageIO, no native library. Like the other codecs here (PngCodec,
  * Mp1Codec/Mp2Codec, AviCodec) everything decoded is either container
  * FORMAT or closed-form math:
  *
  *  - marker walk: SOI, APPn/COM skips, DQT (8- and 16-bit precision),
  *    DHT (canonical code reconstruction per T.81 C.2), SOF0/SOF1 (8-bit
  *    baseline/extended-sequential; progressive SOF2 is a documented
  *    descope → None — `Multimodal.decodeImage` falls back to ImageIO for
  *    those), DRI, SOS, RSTn;
  *  - entropy decode: the T.81 F.2.2.3 DECODE procedure over the
  *    mincode/maxcode/valptr tables, 0xFF00 byte unstuffing, DC
  *    prediction + EXTEND, AC run/size with ZRL and EOB, restart-marker
  *    realignment with predictor reset;
  *  - block reconstruction: dequantize (zigzag order), separable
  *    double-precision IDCT, level shift + clamp;
  *  - color: sampling factors 1–2 per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0),
  *    chroma upsampling by sample replication, BT.601 YCbCr→RGB
  *    (`r = y + 1.402·(cr−128)` …) with round + clamp. Grayscale stays
  *    single-channel.
  *
  * MJPEG convention: AVI 'MJPG' frames routinely OMIT the DHT segment and
  * rely on the T.81 Annex K.3 "typical" tables — when a scan references an
  * undefined slot 0/1, those tables are installed (the table CONTENTS are
  * part of the published standard, exactly like Mp2Codec's B.2 allocation
  * tables). Undefined slots ≥2 stay an error: no convention covers them.
  *
  * Robustness contract (shared by every codec in this package): malformed,
  * hostile or truncated input yields `None`, never a throw, and declared
  * dimensions are capped (64M samples) so a 200-byte file claiming a
  * billion-pixel image cannot allocate its way to an executor OOM.
  *
  * DC-only streams decode EXACTLY: a block whose only coefficient is
  * F(0,0)=c reconstructs to the flat value c/8 (double error ~1e-12,
  * erased by the final round), which is what lets the q_jpeg_decode /
  * q_mjpeg_frames oracles replay pixel values in integer arithmetic.
  */
object JpegCodec {

  /** Decoded Huffman table in T.81 F.2.2.3 form. Index 1..16 by code
    * length; `vals` is the HUFFVAL list.
    */
  private final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l); k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == vals.length, "DHT count mismatch")
      // canonical-code overflow check: codes of length l must fit in l bits
      require((maxcode(16) match { case -1 => true; case m => m < (1 << 16) }), "DHT overflow")
    }
  }

  private final class Component(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTab = 0; var acTab = 0
    var pred = 0
    var plane: Array[Byte] = null
    var planeW = 0
  }

  /** Scan bit reader with 0xFF00 unstuffing. Any marker encountered
    * mid-read, and any read past the buffer, throws (caught by the outer
    * decode → None); restart markers are consumed only via [[restart]].
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new IllegalArgumentException("truncated scan")
        var byte0 = b(pos) & 0xFF; pos += 1
        if (byte0 == 0xFF) {
          val nxt = if (pos < b.length) b(pos) & 0xFF else -1
          if (nxt == 0x00) pos += 1
          else throw new IllegalArgumentException("marker inside entropy data")
        }
        cur = byte0; nbits = 8
      }
      nbits -= 1
      (cur >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. A preceding
      * stuffed 0xFF00 (an all-ones pad byte that itself needed stuffing)
      * and fill 0xFFs are skipped — both are legal inter-interval filler.
      */
    def restart(): Unit = {
      nbits = 0
      var skipping = true
      while (skipping && pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF) {
        (b(pos + 1) & 0xFF) match {
          case 0x00 => pos += 2 // stuffed pad byte
          case 0xFF => pos += 1 // fill byte
          case _    => skipping = false
        }
      }
      if (pos + 1 >= b.length || (b(pos) & 0xFF) != 0xFF ||
        (b(pos + 1) & 0xFF) < 0xD0 || (b(pos + 1) & 0xFF) > 0xD7)
        throw new IllegalArgumentException("expected restart marker")
      pos += 2
    }
  }

  private def huffDecode(br: BitReader, t: HuffTable): Int = {
    var code = br.nextBit()
    var l = 1
    while (code > t.maxcode(l)) {
      if (l >= 16) throw new IllegalArgumentException("bad Huffman code")
      code = (code << 1) | br.nextBit()
      l += 1
    }
    t.vals(t.valptr(l) + code - t.mincode(l))
  }

  /** T.81 F.2.2.1 EXTEND: map the `t` received bits to the signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Zigzag index → natural (row-major) index. */
  private[ops] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K.3 "typical" tables (MJPEG default-install) ----
  // BITS arrays are 1-indexed by code length (index 0 unused).
  private val KDcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val KDcLumaVals = (0 to 11).toArray
  private val KDcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val KDcChromaVals = (0 to 11).toArray
  private val KAcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val KAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)
  private val KAcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val KAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)

  /** IDCT basis: COS(u)(x) = C(u)·cos((2x+1)uπ/16), C(0)=1/√2. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** Max decoded samples (w·h·channels): 64M ≈ a 4600² RGB image. */
  private val MaxSamples = 1L << 26

  def decode(bytes: Array[Byte]): Option[PngCodec.Image] =
    try decodeImpl(bytes) catch { case _: Throwable => None }

  private def decodeImpl(b: Array[Byte]): Option[PngCodec.Image] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var p = 2
    while (p + 2 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF) return None
      p += 1
      while (p < b.length && (b(p) & 0xFF) == 0xFF) p += 1 // fill bytes
      if (p >= b.length) return None
      val m = b(p) & 0xFF
      p += 1
      m match {
        case 0xD8 => // stray SOI — ignore
        case 0xD9 => return None // EOI before any scan
        case 0x01 => // TEM — parameterless
        case mk if mk >= 0xD0 && mk <= 0xD7 => // stray RST outside scan
        case 0xC0 | 0xC1 => // baseline / extended sequential, Huffman
          if (p + 2 > b.length) return None
          val len = be16(b, p)
          if (p + len > b.length || len < 8) return None
          val prec = b(p + 2) & 0xFF
          height = be16(b, p + 3); width = be16(b, p + 5)
          val nf = b(p + 7) & 0xFF
          if (prec != 8 || width <= 0 || height <= 0 || (nf != 1 && nf != 3)) return None
          if (width.toLong * height * nf > MaxSamples) return None
          if (len < 8 + 3 * nf) return None
          comps = Array.tabulate(nf) { i =>
            val o = p + 8 + 3 * i
            val hv = b(o + 1) & 0xFF
            new Component(b(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF, b(o + 2) & 0xFF)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3)) return None
          p += len
        case 0xC4 => // DHT
          if (p + 2 > b.length) return None
          val len = be16(b, p)
          val end = p + len
          if (end > b.length) return None
          var q = p + 2
          while (q < end) {
            val tcth = b(q) & 0xFF
            val tc = (tcth >> 4) & 0xF; val th = tcth & 0xF
            if (tc > 1 || th > 3 || q + 17 > end) return None
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = b(q + l) & 0xFF; total += bits(l); l += 1 }
            if (total > 256 || q + 17 + total > end) return None
            val vals = new Array[Int](total)
            var i = 0
            while (i < total) { vals(i) = b(q + 17 + i) & 0xFF; i += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            q += 17 + total
          }
          p = end
        case 0xDB => // DQT
          if (p + 2 > b.length) return None
          val len = be16(b, p)
          val end = p + len
          if (end > b.length) return None
          var q = p + 2
          while (q < end) {
            val pqtq = b(q) & 0xFF
            val pq = (pqtq >> 4) & 0xF; val tq = pqtq & 0xF
            if (pq > 1 || tq > 3) return None
            val tab = new Array[Int](64)
            if (pq == 0) {
              if (q + 65 > end) return None
              var i = 0
              while (i < 64) { tab(i) = b(q + 1 + i) & 0xFF; i += 1 }
              q += 65
            } else {
              if (q + 129 > end) return None
              var i = 0
              while (i < 64) { tab(i) = be16(b, q + 1 + 2 * i); i += 1 }
              q += 129
            }
            qtabs(tq) = tab
          }
          p = end
        case 0xDD => // DRI
          if (p + 4 > b.length || be16(b, p) != 4) return None
          restartInterval = be16(b, p + 2)
          p += 4
        case 0xDA => // SOS — decode the scan and finish
          if (comps == null) return None
          if (p + 2 > b.length) return None
          val len = be16(b, p)
          if (p + len > b.length) return None
          val ns = b(p + 2) & 0xFF
          if (ns != comps.length || len != 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cs = b(p + 3 + 2 * i) & 0xFF
            val tt = b(p + 4 + 2 * i) & 0xFF
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.dcTab = (tt >> 4) & 0xF; c.acTab = tt & 0xF
            if (c.dcTab > 3 || c.acTab > 3) return None
            i += 1
          }
          // MJPEG convention: undefined slot 0/1 → Annex K typical tables
          comps.foreach { c =>
            if (dcTabs(c.dcTab) == null && c.dcTab <= 1)
              dcTabs(c.dcTab) =
                if (c.dcTab == 0) new HuffTable(KDcLumaBits, KDcLumaVals)
                else new HuffTable(KDcChromaBits, KDcChromaVals)
            if (acTabs(c.acTab) == null && c.acTab <= 1)
              acTabs(c.acTab) =
                if (c.acTab == 0) new HuffTable(KAcLumaBits, KAcLumaVals)
                else new HuffTable(KAcChromaBits, KAcChromaVals)
            if (dcTabs(c.dcTab) == null || acTabs(c.acTab) == null ||
              qtabs(c.tq) == null) throw new IllegalArgumentException("missing table")
          }
          return Some(decodeScan(b, p + len, comps, width, height, restartInterval,
            qtabs, dcTabs, acTabs))
        case _ => // APPn, COM, anything else with a length field
          if (p + 2 > b.length) return None
          val len = be16(b, p)
          if (len < 2 || p + len > b.length) return None
          p += len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], scanStart: Int, comps: Array[Component],
                         width: Int, height: Int, restartInterval: Int,
                         qtabs: Array[Array[Int]], dcTabs: Array[HuffTable],
                         acTabs: Array[HuffTable]): PngCodec.Image = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    // interleaved scan (Ns = Nf): MCU = hmax×vmax luma-aligned blocks;
    // single-component scan: MCU = one block (T.81 A.2.2/A.2.3)
    val single = comps.length == 1
    val mcusX = if (single) (width + 7) / 8 else (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = if (single) (height + 7) / 8 else (height + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      val bw = if (single) mcusX else mcusX * c.h
      val bh = if (single) mcusY else mcusY * c.v
      c.planeW = bw * 8
      c.plane = new Array[Byte](bw * 8 * bh * 8)
      c.pred = 0
    }
    val br = new BitReader(b, scanStart)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = qtabs(c.tq)
        val dct = dcTabs(c.dcTab)
        val act = acTabs(c.acTab)
        val bh = if (single) 1 else c.v
        val bw = if (single) 1 else c.h
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = huffDecode(br, dct)
            if (t > 15) throw new IllegalArgumentException("bad DC size")
            c.pred += extend(br.receive(t), t)
            coef(0) = c.pred * qt(0)
            // AC
            var k = 1
            var done = false
            while (!done && k <= 63) {
              val rs = huffDecode(br, act)
              val r = (rs >> 4) & 0xF
              val s = rs & 0xF
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else done = true // EOB
              } else {
                k += r
                if (k > 63) throw new IllegalArgumentException("AC overrun")
                coef(Zigzag(k)) = extend(br.receive(s), s) * qt(k)
                k += 1
              }
            }
            idctToPlane(coef, c.plane, c.planeW,
              (if (single) mx else mx * c.h + bx) * 8,
              (if (single) my else my * c.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    if (comps.length == 1) {
      val c = comps(0)
      if (c.planeW == width) PngCodec.Image(width, height, 1,
        java.util.Arrays.copyOf(c.plane, width * height))
      else {
        val out = new Array[Byte](width * height)
        var y = 0
        while (y < height) {
          System.arraycopy(c.plane, y * c.planeW, out, y * width, width)
          y += 1
        }
        PngCodec.Image(width, height, 1, out)
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val yy = y * cy.v / vmax * cy.planeW
        val yb = y * cb.v / vmax * cb.planeW
        val yr = y * cr.v / vmax * cr.planeW
        var x = 0
        while (x < width) {
          val lum = cy.plane(yy + x * cy.h / hmax) & 0xFF
          val cbv = (cb.plane(yb + x * cb.h / hmax) & 0xFF) - 128
          val crv = (cr.plane(yr + x * cr.h / hmax) & 0xFF) - 128
          val o = (y * width + x) * 3
          out(o) = clamp8(math.round(lum + 1.402 * crv))
          out(o + 1) = clamp8(math.round(lum - 0.344136 * cbv - 0.714136 * crv))
          out(o + 2) = clamp8(math.round(lum + 1.772 * cbv))
          x += 1
        }
        y += 1
      }
      PngCodec.Image(width, height, 3, out)
    }
  }

  private def clamp8(v: Long): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Separable double IDCT of one dequantized block into the component
    * plane at (ox, oy), with the +128 level shift and clamp.
    */
  private def idctToPlane(coef: Array[Int], plane: Array[Byte], planeW: Int,
                          ox: Int, oy: Int): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each coefficient row v, transform u → x
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
    // cols: v → y, with the 1/4 normalization
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * Cos(vv)(y); vv += 1 }
        plane((oy + y) * planeW + ox + x) = clamp8(math.round(0.25 * s) + 128)
        y += 1
      }
      x += 1
    }
  }
}
