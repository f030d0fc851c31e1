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

  test("P/B pictures are skipped whole; output frames are the keyframes") {
    val id = 1L
    val iOnly = Mpeg1Codec.decode(graft.SparkEntry.synthMpeg1(id)).get
    // splice a P-picture header + garbage slice between the I-pictures
    val e = new Enc
    e.seqHeader(32, 16, None)
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
    e.picture(1, 2) // P-picture
    e.sliceStart(1, 8)
    e.put(0xDEAD, 16) // motion garbage the decoder must never interpret
    val d = Mpeg1Codec.decode(e.end()).getOrElse(fail("did not decode"))
    assert(d.frames.length == 1, "only the I-picture decodes")
    // the I frame's pixels equal the fixture's frame 0
    assert(d.frames(0).pixels.sameElements(iOnly.frames(0).pixels))
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
