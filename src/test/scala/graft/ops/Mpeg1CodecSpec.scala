package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Scoped MPEG-1 video I-frame decoder: DC-only fixture round-trip
  * against the exact flat-block formula, the AC escape/run-level path
  * against a test-local IDCT reference (with a LOADED quantizer matrix
  * and the even-value oddification pinned), per-slice DC predictor
  * reset, P/B-picture skipping, and the malformed-input contract.
  */
class Mpeg1CodecSpec extends AnyFunSuite {

  private def vOf(id: Long, f: Int, m: Int, b: Int): Int =
    20 + ((id * 31 + f * 97 + (m * 4 + b) * 7) % 200).toInt

  test("DC-only fixture: every pixel matches the flat-block formula, RGB = gray") {
    for (id <- Seq(0L, 1L, 5L, 10L)) {
      val w = 16 * (1 + id % 2).toInt
      val d = Mpeg1Codec.decode(graft.SparkEntry.synthMpeg1(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == w && d.height == 16)
      assert(d.frames.length == (2 + id % 3).toInt)
      for (f <- d.frames.indices) {
        val img = d.frames(f)
        assert(img.channels == 3)
        for (y <- 0 until 16; x <- 0 until w) {
          val m = x / 16
          val b = (y / 8) * 2 + (x % 16) / 8
          val want = vOf(id, f, m, b)
          val o = (y * w + x) * 3
          for (c <- 0 until 3)
            assert((img.pixels(o + c) & 0xFF) == want,
              s"id=$id f=$f ($x,$y) ch$c: ${img.pixels(o + c) & 0xFF} != $want")
        }
      }
    }
  }

  // ---- a tiny test-local encoder for the structured cases ----
  private class Enc {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (n > 0) put(0, 8 - n)
    def start(c: Int): Unit = { align(); put(0, 8); put(0, 8); put(1, 8); put(c, 8) }
    def seqHeader(w: Int, h: Int, intraQ: Option[Array[Int]]): Unit = {
      start(0xB3)
      put(w, 12); put(h, 12); put(1, 4); put(3, 4)
      put(0x3FFFF, 18); put(1, 1); put(0, 10); put(0, 1)
      intraQ match {
        case Some(q) => put(1, 1); for (i <- 0 until 64) put(q(JpegCodec.Zigzag(i)), 8)
        case None => put(0, 1)
      }
      put(0, 1)
    }
    def picture(tref: Int, ptype: Int): Unit = {
      start(0x00); put(tref, 10); put(ptype, 3); put(0xFFFF, 16)
      if (ptype == 2) { put(1, 1); put(1, 3) } // P: full_pel + f_code 1
      put(0, 1)
    }
    def sliceStart(row: Int, qscale: Int): Unit = { start(row); put(qscale, 5); put(0, 1) }
    def mbIntra(): Unit = { put(1, 1); put(1, 1) }
    def dcLuma(diff: Int): Unit = dc(diff, chroma = false)
    def dcChroma(diff: Int): Unit = dc(diff, chroma = true)
    private def dc(diff: Int, chroma: Boolean): Unit = {
      val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      if (chroma) size match {
        case 0 => put(0x0, 2); case 1 => put(0x1, 2); case 2 => put(0x2, 2)
        case 3 => put(0x6, 3); case 4 => put(0xE, 4); case 5 => put(0x1E, 5)
        case 6 => put(0x3E, 6); case 7 => put(0x7E, 7); case _ => put(0xFE, 8)
      } else size match {
        case 0 => put(0x4, 3); case 1 => put(0x0, 2); case 2 => put(0x1, 2)
        case 3 => put(0x5, 3); case 4 => put(0x6, 3); case 5 => put(0xE, 4)
        case 6 => put(0x1E, 5); case 7 => put(0x3E, 6); case _ => put(0x7E, 7)
      }
      if (size > 0) put(if (diff > 0) diff else diff + (1 << size) - 1, size)
    }
    def acRun0Level1(neg: Boolean): Unit = { put(0x3, 2); put(if (neg) 1 else 0, 1) }
    def acEscape(run: Int, level: Int): Unit = {
      put(0x1, 6); put(run, 6)
      if (level > 127) { put(0, 8); put(level, 8) }
      else if (level < -127) { put(128, 8); put(level + 256, 8) }
      else put(level & 0xFF, 8)
    }
    def eob(): Unit = put(0x2, 2)
    def end(): Array[Byte] = { start(0xB7); align(); out.toByteArray }
  }

  test("AC path: escape + run0/level1 coefficients with a LOADED matrix match a reference IDCT") {
    val q = Array.fill(64)(16) // loaded intra matrix: uniform 16
    val e = new Enc
    e.seqHeader(16, 16, Some(q))
    e.picture(0, 1)
    e.sliceStart(1, qscale = 4)
    e.mbIntra()
    // Y block 0: DC 100, AC zigzag idx 1 = +1 ('11s'), idx 5 (run 3 after
    // idx 1) = -20 via escape, idx 10 = +200 via double-byte escape
    e.dcLuma(100 - 128)
    e.acRun0Level1(neg = false)
    e.acEscape(3, -20)
    e.acEscape(4, 200)
    e.eob()
    for (_ <- 0 until 3) { e.dcLuma(0); e.eob() } // Y1-3 flat at the predictor
    e.dcChroma(0); e.eob(); e.dcChroma(0); e.eob()
    val d = Mpeg1Codec.decode(e.end()).getOrElse(fail("AC stream did not decode"))
    assert(d.frames.length == 1)
    // reference reconstruction of block 0
    val coef = new Array[Int](64)
    coef(0) = 100 * 8
    def dq(lvl: Int): Int = {
      var f = (2 * lvl * 4 * 16) / 16
      if (f != 0 && (f & 1) == 0) f -= Integer.signum(f)
      f
    }
    coef(JpegCodec.Zigzag(1)) = dq(1)
    coef(JpegCodec.Zigzag(5)) = dq(-20)
    coef(JpegCodec.Zigzag(10)) = dq(200)
    // oddification sanity: 2·1·4·16/16 = 8 (even) → 7
    assert(dq(1) == 7 && dq(-20) == -159 && dq(200) == 1599)
    def cos(u: Int, x: Int) = {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }
    val img = d.frames(0)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += coef(v * 8 + u) * cos(u, x) * cos(v, y)
      val want = math.max(0L, math.min(255L, math.round(0.25 * s)))
      val got = img.pixels((y * 16 + x) * 3) & 0xFF
      assert(got == want.toInt, s"block0 ($x,$y): $got != $want")
    }
  }

  test("two slices per picture: the DC predictor resets per slice") {
    val e = new Enc
    e.seqHeader(16, 32, None) // 1 MB wide, 2 MB rows → one slice each
    e.picture(0, 1)
    e.sliceStart(1, 8)
    e.mbIntra()
    e.dcLuma(50 - 128) // row 0 flat 50
    e.eob(); for (_ <- 0 until 3) { e.dcLuma(0); e.eob() }
    e.dcChroma(0); e.eob(); e.dcChroma(0); e.eob()
    e.sliceStart(2, 8)
    e.mbIntra()
    e.dcLuma(70 - 128) // row 1: diff from a FRESH 128 predictor, not 50
    e.eob(); for (_ <- 0 until 3) { e.dcLuma(0); e.eob() }
    e.dcChroma(0); e.eob(); e.dcChroma(0); e.eob()
    val d = Mpeg1Codec.decode(e.end()).getOrElse(fail("did not decode"))
    val img = d.frames(0)
    assert((img.pixels(0) & 0xFF) == 50)
    assert((img.pixels(16 * 16 * 3) & 0xFF) == 70,
      "slice 2 must restart DC prediction at 128")
  }

  test("B fixture: presentation reordering and every bidirectional path match the closed form") {
    for (id <- Seq(0L, 1L, 2L, 3L)) {
      val nf = (3 + 2 * (id % 2)).toInt
      val d = Mpeg1Codec.decode(graft.SparkEntry.synthMpeg1B(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == 48 && d.height == 16)
      assert(d.frames.length == nf, s"id=$id: display-order frame count")
      def v0(x: Int, y: Int): Int =
        20 + ((id * 31 + ((x / 16) * 4 + (y / 8) * 2 + (x % 16) / 8) * 7) % 200).toInt
      def intraF(ff: Int, xx: Int, y: Int): Int =
        20 + ((id * 31 + ff * 97 + ((y / 8) * 2 + (xx % 16) / 8) * 7) % 200).toInt
      def want(f: Int, x: Int, y: Int): Int = f match {
        case 0 => v0(x, y)
        case 1 => // B between I and P: fwd / bwd / interpolated
          if (x < 16) v0(x + 8, y)
          else if (x < 32) v0(x, y)
          else (v0(x - 8, y) + v0(x - 16, y) + 1) >> 1
        case 2 => if (x < 16) intraF(2, x, y) else v0(x - 8, y)
        case 3 => // second B: skipped m1 repeats m0's forward prediction
          if (x < 8) intraF(2, x + 8, y)
          else if (x < 32) v0(x, y)
          else (v0(x - 16, y) + v0(x - 24, y) + 1) >> 1
        case _ =>
          if (x < 16) intraF(4, x, y)
          else if (x < 24) intraF(2, x - 8, y)
          else v0(x - 16, y)
      }
      for (f <- 0 until nf; y <- 0 until 16; x <- 0 until 48) {
        val o = (y * 48 + x) * 3
        val wv = want(f, x, y)
        for (c <- 0 until 3)
          assert((d.frames(f).pixels(o + c) & 0xFF) == wv,
            s"id=$id f=$f ($x,$y) ch$c: ${d.frames(f).pixels(o + c) & 0xFF} != $wv")
      }
    }
  }

  test("a B picture without both anchors is skipped whole; garbage P data keeps prior frames") {
    val id = 1L
    val iOnly = Mpeg1Codec.decode(graft.SparkEntry.synthMpeg1(id)).get
    def iPicture(e: Enc): Unit = {
      e.picture(0, 1)
      e.sliceStart(1, 8)
      var pred = 128
      for (m <- 0 until 2) {
        e.mbIntra()
        for (b <- 0 until 4) {
          val v = vOf(id, 0, m, b)
          e.dcLuma(v - pred)
          pred = v
          e.eob()
        }
        e.dcChroma(0); e.eob(); e.dcChroma(0); e.eob()
      }
    }
    // a B-picture between two I-pictures is skipped, both I's decode
    val full = {
      val head = new Enc
      head.seqHeader(32, 16, None)
      iPicture(head)
      head.picture(1, 3) // B-picture: out of scope, skipped whole
      head.sliceStart(1, 8)
      head.put(0xDEAD, 16) // bidirectional data the decoder must never interpret
      iPicture(head)
      head.end()
    }
    val d = Mpeg1Codec.decode(full).getOrElse(fail("did not decode"))
    assert(d.frames.length == 2, "both I-pictures decode around the skipped B")
    assert(d.frames(0).pixels.sameElements(iOnly.frames(0).pixels))
    // a P-picture with garbage motion data fails LOUDLY mid-picture and
    // keeps the frames decoded before it (the family-wide contract)
    val g = new Enc
    g.seqHeader(32, 16, None)
    iPicture(g)
    g.picture(1, 2)
    g.sliceStart(1, 8)
    g.put(0xDEAD, 16)
    val dp = Mpeg1Codec.decode(g.end()).getOrElse(fail("did not decode"))
    assert(dp.frames.length == 1, "only the I-picture survives the garbage P")
    assert(dp.frames(0).pixels.sameElements(iOnly.frames(0).pixels))
  }

  // ---- P-picture (forward motion compensation) coverage ----

  test("P fixture: every pixel of every frame matches the closed-form evolution") {
    for (id <- Seq(0L, 1L, 2L, 7L)) {
      val nf = (2 + id % 3).toInt
      val d = Mpeg1Codec.decode(graft.SparkEntry.synthMpeg1P(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == 48 && d.height == 16 && d.frames.length == nf)
      def v0(x: Int, y: Int): Int =
        20 + ((id * 31 + ((x / 16) * 4 + (y / 8) * 2 + (x % 16) / 8) * 7) % 200).toInt
      def delta(k: Int): Int = 2 * ((k + id) % 5 + 1).toInt + 1
      def want(f: Int, x: Int, y: Int): Int =
        if (x < 16) 20 + ((id * 31 + f * 97 + ((y / 8) * 2 + (x % 16) / 8) * 7) % 200).toInt
        else if (x < 32)
          v0(x, y) + (if (x < 24 && y < 8)
            (if (f >= 1) delta(1) else 0) + (if (f >= 3) delta(3) else 0) else 0)
        else f match {
          case 0 => v0(x, y)
          case 1 => v0(x - 8, y)
          case 2 => (if (x < 40) v0(x - 8, y) else v0(x - 16, y)) +
            (if (x < 40 && y < 8) delta(2) else 0)
          case _ => if (x < 40) v0(x - 8, y)
            else v0(x - 16, y) + (if (y < 8) delta(2) else 0)
        }
      for (f <- 0 until nf; y <- 0 until 16; x <- 0 until 48) {
        val o = (y * 48 + x) * 3
        val w = want(f, x, y)
        for (c <- 0 until 3)
          assert((d.frames(f).pixels(o + c) & 0xFF) == w,
            s"id=$id f=$f ($x,$y) ch$c: ${d.frames(f).pixels(o + c) & 0xFF} != $w")
      }
    }
  }

  // motion-code encoder: Table B.4 codes are MbaEntries rows 2–33
  private def putMv(e: Enc, mc: Int, fCode: Int, resid: Int): Unit = {
    val row = if (mc == 0) 1 else 2 * math.abs(mc) + (if (mc > 0) 1 else 0)
    val (_, len, code) = Mpeg1Codec.MbaEntries.find(_._1 == row).get
    e.put(code, len)
    if (fCode > 1 && mc != 0) e.put(resid, fCode - 1)
  }

  test("half-pel interpolation rounds away from zero; chroma vector truncates toward zero") {
    // I-picture 32×32: four MBs, every 8×8 quadrant flat at a distinct
    // value; chroma per-MB distinct (tests the chroma displacement /2)
    val yQ = Array.tabulate(4, 4)((m, b) => 40 + m * 50 + b * 11)
    val cbQ = Array(120, 136, 112, 144)
    val e = new Enc
    e.seqHeader(32, 32, None)
    e.picture(0, 1)
    for (row <- 0 until 2) {
      e.sliceStart(row + 1, 8)
      var pred = 128
      var cbPred = 128
      var crPred = 128
      for (mcol <- 0 until 2) {
        val m = row * 2 + mcol
        e.mbIntra()
        for (b <- 0 until 4) {
          e.dcLuma(yQ(m)(b) - pred); pred = yQ(m)(b); e.eob()
        }
        e.dcChroma(cbQ(m) - cbPred); cbPred = cbQ(m); e.eob()
        e.dcChroma(128 - crPred); crPred = 128; e.eob()
      }
    }
    // P-picture: MB0/MB1/MB2 zero-vector MC (no-op), MB3 vector (−1, −1)
    // half-pel: 4-tap (a+b+c+d+2)>>2 luma; chroma −1/2 = 0 → UNMOVED
    // (picture() hardcodes full_pel 1, so write the header manually)
    e.start(0x00); e.put(1, 10); e.put(2, 3); e.put(0xFFFF, 16)
    e.put(0, 1); e.put(1, 3) // full_pel 0, f_code 1
    e.put(0, 1)
    e.sliceStart(1, 8)
    for (_ <- 0 until 2) { // MB0, MB1: '001' MC non-coded, vector (0,0)
      e.put(1, 1); e.put(0x1, 3); putMv(e, 0, 1, 0); putMv(e, 0, 1, 0)
    }
    e.sliceStart(2, 8)
    e.put(1, 1); e.put(0x1, 3); putMv(e, 0, 1, 0); putMv(e, 0, 1, 0) // MB2
    e.put(1, 1); e.put(0x1, 3); putMv(e, -1, 1, 0); putMv(e, -1, 1, 0) // MB3
    val d = Mpeg1Codec.decode(e.end()).getOrElse(fail("did not decode"))
    assert(d.frames.length == 2)
    // reference planes for frame 0
    val yP = Array.tabulate(32, 32) { (y, x) =>
      yQ((y / 16) * 2 + x / 16)((y % 16) / 8 * 2 + (x % 16) / 8)
    }
    val cbP = Array.tabulate(16, 16)((y, x) => cbQ((y / 8) * 2 + x / 8))
    // frame 1 luma: MB3 region (16..31)² = 4-tap average at (x−1, y−1)
    def lum1(x: Int, y: Int): Int =
      if (x < 16 || y < 16) yP(y)(x)
      else (yP(y - 1)(x - 1) + yP(y - 1)(x) + yP(y)(x - 1) + yP(y)(x) + 2) >> 2
    val img = d.frames(1)
    for (y <- 0 until 32; x <- 0 until 32) {
      val cb = cbP(y / 2)(x / 2) - 128.0 // chroma unmoved: −1 halfpel /2 = 0
      val lum = lum1(x, y).toDouble
      val o = (y * 32 + x) * 3
      def c8(v: Long) = math.max(0L, math.min(255L, v)).toInt
      assert((img.pixels(o) & 0xFF) == c8(math.round(lum)), s"R ($x,$y)")
      assert((img.pixels(o + 1) & 0xFF) == c8(math.round(lum - 0.344136 * cb)), s"G ($x,$y)")
      assert((img.pixels(o + 2) & 0xFF) == c8(math.round(lum + 1.772 * cb)), s"B ($x,$y)")
    }
  }

  test("motion vector reconstruction: f_code residuals and little/big wraparound") {
    // 48×16, full_pel 0, f_code 2 (f = 2): MB0 vector via motion_code 4
    // + residual 1 → little = 8−(f−1−r)=8−0=8 halfpel; MB1 delta
    // motion_code 4 residual 1 again → pred 8 + 8 = 16 ≤ max 31 stays
    // little; MB2 motion_code 8 residual 1 → little 16, new = 32 > max 31
    // → big = 16 − 64 = −48 → recon = 16 − 48 = −32 = min ✓
    val e = new Enc
    e.seqHeader(48, 16, None)
    e.picture(0, 1)
    e.sliceStart(1, 8)
    var pred = 128
    for (m <- 0 until 3) {
      e.mbIntra()
      for (b <- 0 until 4) {
        val v = 30 + m * 60 + b * 13
        e.dcLuma(v - pred); pred = v; e.eob()
      }
      e.dcChroma(0); e.eob(); e.dcChroma(0); e.eob()
    }
    e.start(0x00); e.put(1, 10); e.put(2, 3); e.put(0xFFFF, 16)
    e.put(0, 1); e.put(2, 3) // full_pel 0, f_code 2
    e.put(0, 1)
    e.sliceStart(1, 8)
    // MB0: vector (+8, 0) halfpel = +4 px
    e.put(1, 1); e.put(0x1, 3); putMv(e, 4, 2, 1); putMv(e, 0, 2, 0)
    // MB1: delta +8 again → recon (+16, 0) = +8 px
    e.put(1, 1); e.put(0x1, 3); putMv(e, 4, 2, 1); putMv(e, 0, 2, 0)
    // MB2: delta little would be +16 → new 32 > 31 → big −48 → recon −32 px −16
    e.put(1, 1); e.put(0x1, 3); putMv(e, 8, 2, 1); putMv(e, 0, 2, 0)
    val d = Mpeg1Codec.decode(e.end()).getOrElse(fail("did not decode"))
    assert(d.frames.length == 2)
    val f0 = d.frames(0).pixels
    val f1 = d.frames(1).pixels
    def lum(px: Array[Byte], x: Int, y: Int): Int = px((y * 48 + x) * 3) & 0xFF
    for (y <- 0 until 16; x <- 0 until 16) {
      assert(lum(f1, x, y) == lum(f0, x + 4, y), s"MB0 ($x,$y): +4 px")
      assert(lum(f1, 16 + x, y) == lum(f0, 16 + x + 8, y), s"MB1 ($x,$y): +8 px")
      assert(lum(f1, 32 + x, y) == lum(f0, 32 + x - 16, y), s"MB2 ($x,$y): −16 px (wraparound)")
    }
  }

  test("skipped macroblocks copy the reference and reset predictors") {
    // 48×16: P-picture skips MB1 (increment 2); MB0 and MB2 are MC coded
    // with vector 0 + an escape error so the DC-predictor reset after
    // non-intra macroblocks is exercised via the pixel values
    val e = new Enc
    e.seqHeader(48, 16, None)
    e.picture(0, 1)
    e.sliceStart(1, 8)
    var pred = 128
    for (m <- 0 until 3) {
      e.mbIntra()
      for (b <- 0 until 4) {
        val v = 60 + m * 40 + b * 9
        e.dcLuma(v - pred); pred = v; e.eob()
      }
      e.dcChroma(0); e.eob(); e.dcChroma(0); e.eob()
    }
    e.start(0x00); e.put(1, 10); e.put(2, 3); e.put(0xFFFF, 16)
    e.put(1, 1); e.put(1, 3); e.put(0, 1) // full_pel 1, f_code 1
    e.sliceStart(1, 8)
    // MB0: type '01' (no MC, coded) cbp 32, escape level 3 → Δ = 7 on Y₀
    e.put(1, 1); e.put(0x1, 2); e.put(0xA, 4)
    e.acEscape(0, 3); e.eob()
    // MB1 skipped (increment 2), then MB2: '1' MC coded, vector 0, cbp 32,
    // escape level 5 → Δ = 11 on its Y₀
    e.put(0x3, 3)
    e.put(1, 1); putMv(e, 0, 1, 0); putMv(e, 0, 1, 0)
    e.put(0xA, 4); e.acEscape(0, 5); e.eob()
    val d = Mpeg1Codec.decode(e.end()).getOrElse(fail("did not decode"))
    assert(d.frames.length == 2)
    val f0 = d.frames(0).pixels
    val f1 = d.frames(1).pixels
    def lum(px: Array[Byte], x: Int, y: Int): Int = px((y * 48 + x) * 3) & 0xFF
    for (y <- 0 until 16; x <- 0 until 48) {
      val base = lum(f0, x, y)
      val wantD =
        if (x < 8 && y < 8) 7        // MB0 Y₀: (2·3+1)·8−1 = 55 → ⌈55/8⌋ = 7
        else if (x >= 32 && x < 40 && y < 8) 11 // MB2 Y₀: (2·5+1)·8−1 = 87 → 11
        else 0                        // skipped MB1 + uncoded quadrants
      assert(lum(f1, x, y) == base + wantD, s"($x,$y)")
    }
  }

  test("B.1 / B.3 tables are prefix-free; B.3's Kraft sum closes to 1 − 2/512") {
    def prefixFree(codes: Seq[(Int, Int)]): Unit =
      for (Seq((l1, c1), (l2, c2)) <- codes.combinations(2).map(_.sortBy(_._1)))
        assert(l1 == l2 && c1 != c2 || l1 < l2 && (c2 >> (l2 - l1)) != c1,
          s"($l1,$c1) prefixes ($l2,$c2)")
    val mba = Mpeg1Codec.MbaEntries.map { case (_, l, c) => (l, c) } ++
      Seq((11, 0x0F), (11, 0x08)) // stuffing + escape participate
    prefixFree(mba)
    val cbp = Mpeg1Codec.CbpEntries.map { case (_, l, c) => (l, c) }
    prefixFree(cbp)
    val kraft = Mpeg1Codec.CbpEntries.map { case (_, l, _) => 1.0 / (1 << l) }.sum
    assert(math.abs(kraft - (1.0 - 2.0 / 512)) < 1e-12,
      s"B.3 Kraft sum $kraft != ${1.0 - 2.0 / 512}")
    assert(Mpeg1Codec.CbpEntries.map(_._1).sorted == (1 to 63).toList)
    assert(Mpeg1Codec.MbaEntries.map(_._1).sorted == (1 to 33).toList)
    assert(Mpeg1Codec.PMbType.size == 7)
  }

  test("HeaderCodec sniffs MPEG-1 video and reports dimensions + picture count") {
    for (id <- Seq(0L, 1L, 2L)) {
      val bytes = graft.SparkEntry.synthMpeg1(id)
      assert(Multimodal.HeaderCodec.sniffFormat(bytes) == "mpeg1v")
      val m = Multimodal.HeaderCodec.decodeMeta(bytes)
      assert(m.getString(0) == "mpeg1v")
      assert(m.getInt(1) == 16 * (1 + id % 2).toInt && m.getInt(2) == 16)
      assert(m.getInt(3) == (2 + id % 3).toInt, "picture count")
    }
    // truncated to just the start code: format sniffs, fields stay null
    val stub = Array[Byte](0, 0, 1, 0xB3.toByte)
    assert(Multimodal.HeaderCodec.sniffFormat(stub) == "mpeg1v")
    assert(Multimodal.HeaderCodec.decodeMeta(stub).isNullAt(1))
  }

  test("malformed input contract: garbage, truncation, absent sequence header") {
    assert(Mpeg1Codec.decode(null).isEmpty)
    assert(Mpeg1Codec.decode(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(3)
    assert(Mpeg1Codec.decode(Array.fill(2048)(rnd.nextInt().toByte)).forall(_.frames.nonEmpty))
    // truncating mid-picture keeps the complete frames before it
    val full = graft.SparkEntry.synthMpeg1(2L) // 4 pictures
    val cut = Mpeg1Codec.decode(full.take(full.length * 3 / 5))
    assert(cut.exists(_.frames.length >= 1))
    assert(cut.get.frames.length < 4)
  }
}
