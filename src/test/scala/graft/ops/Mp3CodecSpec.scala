package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Scoped MPEG-1 Layer-III decoder: fixture round-trip against the exact
  * spectral formula, Huffman table structural integrity (prefix-free +
  * Kraft-complete — the properties transcription errors break), TDAC
  * perfect reconstruction through the IMDCT/window/overlap path, alias
  * butterflies as exact rotations, the bit reservoir, and the
  * malformed-input contract.
  */
class Mp3CodecSpec extends AnyFunSuite {

  // ---- fixture formulas (the synthMp3 contract) ----
  private def mag(id: Long, f: Int, g: Int, l: Int): Int =
    ((id * 7 + f * 11 + g * 13 + l * 3) % 2).toInt
  private def sgn(id: Long, f: Int, g: Int, l: Int): Int =
    ((id + f + g + l) % 2).toInt
  private def sfOf(id: Long, f: Int, g: Int, b: Int): Int =
    ((id + 3 * f + 5 * g + b) % 4).toInt
  private def bandOf(l: Int): Int = if (l < 24) l / 4 else 6 + (l - 24) / 6

  test("fixture round-trip: every dequantized spectral line matches the formula exactly") {
    for (id <- Seq(0L, 1L, 7L, 42L)) {
      val d = Mp3Codec.decode(graft.SparkEntry.synthMp3L3(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.sampleRate == 48000 && d.channels == 1)
      assert(d.nFrames == (6 + id % 3).toInt)
      assert(d.spectra.length == d.nFrames * 2)
      assert(d.granules.length == d.nFrames * 2 * 18)
      for (f <- 0 until d.nFrames; g <- 0 until 2) {
        val xr = d.spectra(f * 2 + g)
        val a = ((id + f + g) % 4).toInt
        for (l <- 0 until 576) {
          val expected =
            if (l >= 40 || mag(id, f, g, l) == 0) 0.0
            else {
              val v = math.pow(2.0, a - sfOf(id, f, g, bandOf(l)))
              if (sgn(id, f, g, l) == 1) -v else v
            }
          assert(xr(l) == expected,
            s"id=$id f=$f g=$g line=$l: got ${xr(l)}, want $expected")
        }
      }
    }
  }

  test("Huffman tables are prefix-free and Kraft-complete") {
    def check(name: String, codes: Seq[(Int, Int)]): Unit = { // (len, code)
      val kraft = codes.map { case (len, _) => math.pow(2.0, -len) }.sum
      assert(math.abs(kraft - 1.0) < 1e-12, s"$name Kraft sum $kraft != 1")
      for (Seq((la, ca), (lb, cb)) <- codes.combinations(2)) {
        val (sl, sc, ll, lc) = if (la <= lb) (la, ca, lb, cb) else (lb, cb, la, ca)
        assert(!(sl == ll && sc == lc), s"$name duplicate code")
        assert((lc >> (ll - sl)) != sc,
          s"$name: ($sl, $sc) is a prefix of ($ll, $lc)")
      }
    }
    check("table1", Mp3Codec.Table1Entries.map(e => (e._3, e._4)))
    check("table2", Mp3Codec.Table2Entries.map(e => (e._3, e._4)))
    check("table3", Mp3Codec.Table3Entries.map(e => (e._3, e._4)))
    check("table5", Mp3Codec.Table5Entries.map(e => (e._3, e._4)))
    check("table6", Mp3Codec.Table6Entries.map(e => (e._3, e._4)))
    check("table7", Mp3Codec.Table7Entries.map(e => (e._3, e._4)))
    check("table8", Mp3Codec.Table8Entries.map(e => (e._3, e._4)))
    check("table9", Mp3Codec.Table9Entries.map(e => (e._3, e._4)))
    check("table10", Mp3Codec.Table10Entries.map(e => (e._3, e._4)))
    check("table12", Mp3Codec.Table12Entries.map(e => (e._3, e._4)))
    check("table13", Mp3Codec.Table13Entries.map(e => (e._3, e._4)))
    check("count1A", Mp3Codec.Count1AEntries.map(e => (e._2, e._3)))
    // count1 B is the 4-bit complement block code: trivially complete
    assert((0 until 16).map(v => v ^ 0xF).toSet == (0 until 16).toSet)
    // every (x, y) cell of each table is present exactly once
    for ((name, entries, dim) <- Seq(
      ("table2", Mp3Codec.Table2Entries, 3), ("table3", Mp3Codec.Table3Entries, 3),
      ("table5", Mp3Codec.Table5Entries, 4), ("table6", Mp3Codec.Table6Entries, 4),
      ("table7", Mp3Codec.Table7Entries, 6), ("table8", Mp3Codec.Table8Entries, 6),
      ("table9", Mp3Codec.Table9Entries, 6), ("table10", Mp3Codec.Table10Entries, 8),
      ("table12", Mp3Codec.Table12Entries, 8),
      ("table13", Mp3Codec.Table13Entries, 16)))
      assert(entries.map(e => (e._1, e._2)).toSet ==
        (for (x <- 0 until dim; y <- 0 until dim) yield (x, y)).toSet, name)
  }

  test("tables 7/8/9/10/12/13 round-trip EVERY cell at full magnitude range") {
    // one frame per table; granule 0 carries exactly dim² big-values
    // pairs enumerating every (x, y) cell once (up to 256 pairs = 512
    // lines for table 13), global_gain 210 and slen 0/0 scalefactors ⇒
    // xr(l) = ±|is(l)|^(4/3) exactly — the decoder's requant expression
    // replayed verbatim, so any decode slip in ANY cell's code fails
    for ((tid, entries, dim) <- Seq(
      (7, Mp3Codec.Table7Entries, 6), (8, Mp3Codec.Table8Entries, 6),
      (9, Mp3Codec.Table9Entries, 6), (10, Mp3Codec.Table10Entries, 8),
      (12, Mp3Codec.Table12Entries, 8), (13, Mp3Codec.Table13Entries, 16))) {
      val codeOf = entries.map(e => (e._1, e._2) -> (e._3, e._4)).toMap
      val nPairs = dim * dim
      def pair(l: Int): (Int, Int) = { val k = l / 2; (k / dim, k % dim) }
      def sgn(l: Int): Int = l % 2
      val frame = l3Frame { put =>
        var huffBits = 0
        for (l <- 0 until 2 * nPairs by 2) {
          val (x, y) = pair(l)
          huffBits += codeOf((x, y))._1 + (if (x != 0) 1 else 0) + (if (y != 0) 1 else 0)
        }
        put(0, 9); put(0, 5); put(0, 4)
        put(huffBits, 12); put(nPairs, 9); put(210, 8); put(0, 4)
        put(0, 1)
        put(tid, 5); put(tid, 5); put(tid, 5) // same table, regions moot
        put(5, 4); put(3, 3)
        put(0, 1); put(1, 1); put(1, 1)
        // granule 1: silent
        put(0, 12); put(0, 9); put(210, 8); put(0, 4)
        put(0, 1); put(0, 5); put(0, 5); put(0, 5); put(0, 4); put(0, 3)
        put(0, 1); put(0, 1); put(1, 1)
        for (l <- 0 until 2 * nPairs by 2) {
          val (x, y) = pair(l)
          val (len, code) = codeOf((x, y))
          put(code, len)
          if (x != 0) put(sgn(l), 1)
          if (y != 0) put(sgn(l + 1), 1)
        }
      }
      val d = Mp3Codec.decode(frame)
        .getOrElse(fail(s"table $tid frame did not decode"))
      val xr = d.spectra(0)
      for (l <- 0 until 2 * nPairs) {
        val m = if (l % 2 == 0) pair(l)._1 else pair(l - 1)._2
        val expect =
          if (m == 0) 0.0
          else {
            val v = math.pow(m.toDouble, 4.0 / 3.0)
            if (sgn(l) == 1) -v else v
          }
        assert(xr(l) == expect, s"table $tid line $l: ${xr(l)} != $expect")
      }
      for (l <- 2 * nPairs until 576) assert(xr(l) == 0.0, s"table $tid tail $l")
    }
  }

  test("linbits escape extends magnitude 15 before the sign bit (mechanism)") {
    // synthetic linbits table (the shipped 7–13 are linbits-0 by spec;
    // 16–31 are descoped data, not machinery): table 5's codes with
    // maxVal = 3 treated as the escape and linbits = 4. Bitstream for
    // the cell (3, 3) (len 8, code 0): 8 code bits, then x's 4 linbits
    // (0b1010 = 10 → x = 13), x sign (1 = negative), y's 4 linbits
    // (0b0011 = 3 → y = 6), y sign (0 = positive).
    val t = Mp3Codec.BigTable(Mp3Codec.pairTable(Mp3Codec.Table5Entries),
      maxVal = 3, linbits = 4)
    val bits = "00000000" + "1010" + "1" + "0011" + "0"
    val bytes = bits.padTo(24, '0').grouped(8)
      .map(s => Integer.parseInt(s, 2).toByte).toArray
    val r = new Mp3Codec.BitReader(bytes, 0L)
    val (x, y) = Mp3Codec.decodeBigPair(r, t)
    assert(x == -13, s"x = $x")
    assert(y == 6, s"y = $y")
    assert(r.bitPos == 18, s"bitPos = ${r.bitPos}")
    // non-escape magnitudes read no linbits: cell (1, 0) (len 3, code
    // 0b011) then one sign bit
    val bits2 = "011" + "1"
    val bytes2 = bits2.padTo(8, '0').grouped(8)
      .map(s => Integer.parseInt(s, 2).toByte).toArray
    val r2 = new Mp3Codec.BitReader(bytes2, 0L)
    val (x2, y2) = Mp3Codec.decodeBigPair(r2, t)
    assert(x2 == -1 && y2 == 0, s"($x2, $y2)")
    assert(r2.bitPos == 4, s"bitPos = ${r2.bitPos}")
  }

  test("tables 2/3/5/6 round-trip at full magnitude range") {
    // one frame per table: 12 big-values pairs cycling through EVERY
    // (x, y) cell (mags up to 2 or 3 — beyond the oracle gate's dyadic
    // subset), global_gain 210, scalefac_scale 1, all scalefactors 0 ⇒
    // xr(l) = ±|is(l)|^(4/3) exactly
    for ((tid, entries, dim) <- Seq(
      (2, Mp3Codec.Table2Entries, 3), (3, Mp3Codec.Table3Entries, 3),
      (5, Mp3Codec.Table5Entries, 4), (6, Mp3Codec.Table6Entries, 4))) {
      val codeOf = entries.map(e => (e._1, e._2) -> (e._3, e._4)).toMap
      def pair(l: Int): (Int, Int) = { // deterministic walk over all cells
        val k = (l / 2) * 7 % (dim * dim)
        (k / dim, k % dim)
      }
      def sgn(l: Int): Int = l % 2
      val frame = l3Frame { put =>
        var huffBits = 0
        for (l <- 0 until 24 by 2) {
          val (x, y) = pair(l)
          huffBits += codeOf((x, y))._1 + (if (x != 0) 1 else 0) + (if (y != 0) 1 else 0)
        }
        put(0, 9); put(0, 5); put(0, 4)
        // granule 0: 12 pairs, table `tid`, sfc 0 (slen 0/0 → 0 sf bits)
        put(huffBits, 12); put(12, 9); put(210, 8); put(0, 4)
        put(0, 1)
        put(tid, 5); put(0, 5); put(0, 5)
        put(5, 4); put(3, 3)
        put(0, 1); put(1, 1); put(1, 1)
        // granule 1: silent
        put(0, 12); put(0, 9); put(210, 8); put(0, 4)
        put(0, 1); put(0, 5); put(0, 5); put(0, 5); put(0, 4); put(0, 3)
        put(0, 1); put(0, 1); put(1, 1)
        for (l <- 0 until 24 by 2) {
          val (x, y) = pair(l)
          val (len, code) = codeOf((x, y))
          put(code, len)
          if (x != 0) put(sgn(l), 1)
          if (y != 0) put(sgn(l + 1), 1)
        }
      }
      val d = Mp3Codec.decode(frame)
        .getOrElse(fail(s"table $tid frame did not decode"))
      val xr = d.spectra(0)
      for (l <- 0 until 24) {
        val m = if (l % 2 == 0) pair(l)._1 else pair(l - 1)._2
        val expect =
          if (m == 0) 0.0
          else {
            val v = math.pow(m.toDouble, 4.0 / 3.0)
            if (sgn(l) == 1 && m != 0) -v else v
          }
        assert(xr(l) == expect, s"table $tid line $l: ${xr(l)} != $expect")
      }
      for (l <- 24 until 576) assert(xr(l) == 0.0, s"table $tid tail $l")
    }
  }

  test("alias butterflies are exact rotations and reduce inter-band leakage") {
    for (i <- 0 until 8)
      assert(math.abs(Mp3Codec.Cs(i) * Mp3Codec.Cs(i) +
        Mp3Codec.Ca(i) * Mp3Codec.Ca(i) - 1.0) < 1e-12)
    val rnd = new scala.util.Random(7)
    val xr = Array.fill(576)(rnd.nextDouble() - 0.5)
    val before = xr.map(v => v * v).sum
    Mp3Codec.aliasReduce(xr)
    val after = xr.map(v => v * v).sum
    assert(math.abs(before - after) < 1e-9, "rotations must preserve energy")
  }

  test("IMDCT + sine window + overlap-add achieves TDAC perfect reconstruction (x N/2)") {
    // forward MDCT (test-local, independent direction): 36 windowed
    // samples -> 18 coeffs; feeding them back through the decoder's
    // imdct36 + 50% overlap-add must reproduce the signal scaled by
    // N/2 = 9 in the steady state — any phase error in the cosine
    // kernel breaks this everywhere, so it pins the transform exactly.
    val n = 18
    def window(i: Int) = math.sin(math.Pi / 36.0 * (i + 0.5))
    val sig = Array.tabulate(36 * 6)(t =>
      math.sin(0.37 * t) + 0.5 * math.cos(1.19 * t + 0.3))
    val blocks = (0 until 5).map { b =>
      val x = Array.tabulate(36)(i => sig(b * 18 + i) * window(i))
      Array.tabulate(n)(k => (0 until 36).map(i =>
        x(i) * math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))).sum)
    }
    val overlap = new Array[Double](18)
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    blocks.foreach { coeffs =>
      val xr = new Array[Double](576)
      System.arraycopy(coeffs, 0, xr, 0, 18)
      val z = Mp3Codec.imdct36(xr, 0)
      for (s <- 0 until 18) { out += z(s) + overlap(s); overlap(s) = z(s + 18) }
    }
    // steady state: skip the first half-block (no left neighbor)
    for (t <- 18 until out.length) {
      val want = 9.0 * sig(t)
      assert(math.abs(out(t) - want) < 1e-9 * math.max(1.0, math.abs(want)),
        s"t=$t: ${out(t)} vs $want")
    }
  }

  test("bit reservoir: granule data stored in the previous frame decodes identically") {
    val id = 5L
    // plain 2-frame stream (mdb = 0 everywhere): the first 2 frames of
    // the standard fixture
    val plain = graft.SparkEntry.synthMp3L3(id).take(2 * 576)
    val base = Mp3Codec.decode(plain).getOrElse(fail("plain did not decode"))
    assert(base.nFrames == 2)

    // reservoir variant: frame 2's granule bits moved to the TAIL of
    // frame 1's main-data region; frame 2 carries main_data_begin
    // pointing back at them and an empty own region
    val out = new Array[Byte](2 * 576)
    val t1 = Map((0, 0) -> (1, 1), (0, 1) -> (3, 1), (1, 0) -> (2, 1), (1, 1) -> (3, 0))
    def huffBits(f: Int, g: Int): Int = {
      var bits = 0
      var l = 0
      while (l < 24) {
        val (x, y) = (mag(id, f, g, l), mag(id, f, g, l + 1))
        bits += t1((x, y))._1 + x + y
        l += 2
      }
      l = 24
      while (l < 40) { bits += 4 + (0 until 4).map(k => mag(id, f, g, l + k)).sum; l += 4 }
      bits
    }
    def part23(f: Int, g: Int) = 42 + huffBits(f, g)
    // frame 2's two granules, bit-packed from a byte boundary
    val f2bits = part23(1, 0) + part23(1, 1)
    val f2len = (f2bits + 7) / 8
    def writeFrame(f: Int, mdb: Int): Unit = {
      val o = f * 576
      out(o) = 0xFF.toByte; out(o + 1) = 0xFB.toByte
      out(o + 2) = 0xB4.toByte; out(o + 3) = 0xC0.toByte
      var bitPos = 0
      def put(v: Int, nb: Int): Unit = {
        var i = nb - 1
        while (i >= 0) {
          if (((v >> i) & 1) == 1) {
            val bi = o + 4 + bitPos / 8
            out(bi) = (out(bi) | (1 << (7 - bitPos % 8))).toByte
          }
          bitPos += 1; i -= 1
        }
      }
      put(mdb, 9); put(0, 5); put(0, 4)
      for (g <- 0 until 2) {
        put(part23(f, g), 12); put(12, 9)
        put(210 + 4 * ((id + f + g) % 4).toInt, 8)
        put(9, 4); put(0, 1); put(1, 5); put(0, 5); put(0, 5)
        put(5, 4); put(3, 3); put(0, 1); put(1, 1); put(1, 1)
      }
      if (f == 0) {
        // own granule data at the region start...
        for (g <- 0 until 2) writeGranule(0, g, put)
        // ...then frame 2's data at the region TAIL (byte-aligned start;
        // put() addresses bits from the side-info start, so skip its 17
        // bytes plus the main region up to the tail)
        bitPos = (17 + 555 - f2len) * 8
        for (g <- 0 until 2) writeGranule(1, g, put)
      } // frame 1 (f == 1): own region stays zero
    }
    def writeGranule(f: Int, g: Int, put: (Int, Int) => Unit): Unit = {
      for (b <- 0 until 21) put(sfOf(id, f, g, b), 2)
      var l = 0
      while (l < 24) {
        val (x, y) = (mag(id, f, g, l), mag(id, f, g, l + 1))
        val (len, code) = t1((x, y))
        put(code, len)
        if (x != 0) put(sgn(id, f, g, l), 1)
        if (y != 0) put(sgn(id, f, g, l + 1), 1)
        l += 2
      }
      l = 24
      while (l < 40) {
        val v = (mag(id, f, g, l) << 3) | (mag(id, f, g, l + 1) << 2) |
          (mag(id, f, g, l + 2) << 1) | mag(id, f, g, l + 3)
        put(v ^ 0xF, 4)
        for (k <- 0 until 4) if (mag(id, f, g, l + k) != 0) put(sgn(id, f, g, l + k), 1)
        l += 4
      }
    }
    writeFrame(0, 0)
    writeFrame(1, f2len)
    val res = Mp3Codec.decode(out).getOrElse(fail("reservoir stream did not decode"))
    assert(res.nFrames == 2)
    for (gi <- 0 until 4; l <- 0 until 576)
      assert(res.spectra(gi)(l) == base.spectra(gi)(l),
        s"granule $gi line $l diverged under the reservoir")
  }

  test("MS joint stereo: decoded channels are the exact (M±S)/√2 rotation of the spectra") {
    def magMs(id: Long, f: Int, g: Int, c: Int, l: Int): Int =
      ((id * 7 + f * 11 + g * 13 + c * 17 + l * 3) % 2).toInt
    def sgnMs(id: Long, f: Int, g: Int, c: Int, l: Int): Int =
      ((id + f + g + c + l) % 2).toInt
    def sfMs(id: Long, f: Int, g: Int, c: Int, b: Int): Int =
      ((id + 3 * f + 5 * g + 7 * c + b) % 4).toInt
    val invSqrt2 = 1.0 / math.sqrt(2.0)
    for (id <- Seq(0L, 4L, 9L)) {
      val d = Mp3Codec.decode(graft.SparkEntry.synthMp3Ms(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.channels == 2 && d.sampleRate == 48000)
      assert(d.nFrames == (6 + id % 3).toInt)
      assert(d.spectra.length == d.nFrames * 2 * 2)
      for (f <- 0 until d.nFrames; g <- 0 until 2; l <- 0 until 60) {
        def raw(c: Int): Double = {
          if (l >= 40 || magMs(id, f, g, c, l) == 0) 0.0
          else {
            val a = ((id + f + g + 2 * c) % 4).toInt
            val v = math.pow(2.0, a - sfMs(id, f, g, c, bandOf(l)))
            if (sgnMs(id, f, g, c, l) == 1) -v else v
          }
        }
        val gi = (f * 2 + g) * 2
        val wantL = (raw(0) + raw(1)) * invSqrt2
        val wantR = (raw(0) - raw(1)) * invSqrt2
        assert(d.spectra(gi)(l) == wantL, s"id=$id f=$f g=$g l=$l L")
        assert(d.spectra(gi + 1)(l) == wantR, s"id=$id f=$f g=$g l=$l R")
      }
    }
  }

  test("every joint-stereo mode_extension decodes; intensity is a no-op without a zero part") {
    val ms = graft.SparkEntry.synthMp3Ms(1L)
    val msDec = Mp3Codec.decode(ms).getOrElse(fail("MS fixture did not decode"))
    // mode_ext 00: plain stereo — spectra stay the raw (unrotated) values
    val plain = ms.clone()
    plain(3) = 0x40.toByte
    val plainDec = Mp3Codec.decode(plain).getOrElse(fail("ext=0 did not decode"))
    assert(plainDec.spectra.length == msDec.spectra.length)
    assert(!plainDec.spectra(0).sameElements(msDec.spectra(0)),
      "plain stereo must differ from the MS rotation")
    // mode_ext 01: the MS fixture's right channel has data through line 39,
    // so the intensity bound lands past every nonzero line → no-op ⇒ the
    // decode equals plain stereo exactly
    val intOnly = ms.clone()
    intOnly(3) = 0x50.toByte
    val intDec = Mp3Codec.decode(intOnly).getOrElse(fail("ext=1 did not decode"))
    for (i <- plainDec.spectra.indices)
      assert(intDec.spectra(i).sameElements(plainDec.spectra(i)),
        s"granule-channel $i: boundless intensity must be a no-op")
    // mode_ext 11: MS below the (empty) intensity region ⇒ equals pure MS
    val both = ms.clone()
    both(3) = 0x70.toByte
    val bothDec = Mp3Codec.decode(both).getOrElse(fail("ext=3 did not decode"))
    for (i <- msDec.spectra.indices)
      assert(bothDec.spectra(i).sameElements(msDec.spectra(i)),
        s"granule-channel $i: MS+intensity with no zero part must equal MS")
  }

  test("intensity stereo: zero-part bound, is_pos readout and the ratio split") {
    def magIs(id: Long, f: Int, g: Int, c: Int, l: Int): Int =
      ((id * 7 + f * 11 + g * 13 + c * 17 + l * 3) % 2).toInt
    def sgnIs(id: Long, f: Int, g: Int, c: Int, l: Int): Int =
      ((id + f + g + c + l) % 2).toInt
    def sfIs(id: Long, f: Int, g: Int, c: Int, b: Int): Int =
      ((id + 3 * f + 5 * g + 7 * c + b) % 4).toInt
    for (id <- Seq(0L, 1L, 4L)) {
      val d = Mp3Codec.decode(graft.SparkEntry.synthMp3Is(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.channels == 2 && d.sampleRate == 48000)
      for (f <- 0 until d.nFrames; g <- 0 until 2) {
        val xl = d.spectra((f * 2 + g) * 2)
        val xr = d.spectra((f * 2 + g) * 2 + 1)
        val am = ((id + f + g) % 4).toInt
        val as = ((id + f + g + 2) % 4).toInt
        def raw(c: Int, l: Int): Double = {
          val a = if (c == 0) am else as
          if (magIs(id, f, g, c, l) == 0) 0.0
          else {
            val v = math.pow(2.0, a - sfIs(id, f, g, c, bandOf(l)))
            if (sgnIs(id, f, g, c, l) == 1) -v else v
          }
        }
        for (l <- 0 until 576) {
          if (l < 24) {
            // below the bound: plain stereo (mode_ext bit 1 is OFF)
            assert(xl(l) == raw(0, l), s"id=$id f=$f g=$g L line $l")
            assert(xr(l) == raw(1, l), s"id=$id f=$f g=$g R line $l")
          } else if (l < 40) {
            val p = 3 * ((id + f + g + bandOf(l)) % 2).toInt
            val v = raw(0, l)
            if (p == 0) {
              assert(xl(l) == 0.0, s"id=$id f=$f g=$g is_pos 0 L line $l")
              assert(xr(l) == v, s"id=$id f=$f g=$g is_pos 0 R line $l")
            } else { // is_pos 3: both halves (tan(π/4) within an ulp of 1)
              assert(math.abs(xl(l) - v / 2) <= math.abs(v) * 1e-14,
                s"id=$id f=$f g=$g is_pos 3 L line $l")
              assert(math.abs(xr(l) - v / 2) <= math.abs(v) * 1e-14,
                s"id=$id f=$f g=$g is_pos 3 R line $l")
            }
          } else {
            assert(xl(l) == 0.0 && xr(l) == 0.0, s"id=$id f=$f g=$g tail line $l")
          }
        }
      }
    }
    // pure-short intensity decodes since r16 (q_mp3_intensity_short);
    // a mono fixture remarked stereo is still malformed and rejects
    val shortIs = graft.SparkEntry.synthMp3Short(0L).clone()
    shortIs(3) = 0x50.toByte // mono fixture remarked joint+intensity: stereo
    assert(Mp3Codec.decode(shortIs).isEmpty,
      "a mono→stereo remark is malformed and must reject")
    // the r16 fixture round-trips: per-window bounds, {0,3} positions
    val isShort = Mp3Codec.decode(graft.SparkEntry.synthMp3IsShort(1L))
      .getOrElse(fail("short-intensity fixture did not decode"))
    assert(isShort.channels == 2 && isShort.nFrames == 7)
    // every right-channel granule must carry band-0 data AND intensity
    // contributions above it (band 1+ positions are strided w mod 3)
    for (gc <- 0 until 4) {
      val xrR = isShort.spectra(gc * 2 + 1)
      assert(xrR.take(12).exists(_ != 0.0), s"gc=$gc right band 0")
    }
    // MS + intensity + short stays a loud reject (per-window MS bound
    // is out of scope), as does mixed + intensity
    val msIs = graft.SparkEntry.synthMp3IsShort(1L).clone()
    msIs(3) = 0x70.toByte // mode_ext 11: MS + intensity
    assert(Mp3Codec.decode(msIs).isEmpty,
      "MS + intensity + short must reject loudly")
  }

  test("malformed input contract: garbage, empties and truncation never throw") {
    assert(Mp3Codec.decode(null).isEmpty)
    assert(Mp3Codec.decode(Array.emptyByteArray).isEmpty)
    assert(Mp3Codec.decode(Array.fill(300)(0x55.toByte)).isEmpty)
    val rnd = new scala.util.Random(11)
    assert(Mp3Codec.decode(Array.fill(4096)(rnd.nextInt().toByte)).forall(_.nFrames >= 0))
    // truncating the fixture mid-frame keeps the whole frames before it
    val full = graft.SparkEntry.synthMp3L3(3L)
    val cut = Mp3Codec.decode(full.take(576 + 100))
    assert(cut.exists(_.nFrames == 1))
  }

  // ---- window switching (short / mixed / start / stop) ----

  test("short-block fixture: reordered dequantized lines match the formula exactly") {
    for (id <- Seq(0L, 1L, 5L, 11L)) {
      val d = Mp3Codec.decode(graft.SparkEntry.synthMp3Short(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.sampleRate == 48000 && d.channels == 1)
      assert(d.nFrames == (6 + id % 3).toInt)
      for (f <- 0 until d.nFrames) {
        // granule 0: SHORT — Huffman line l lands at reordered position
        // r = 12·(l/12) + 3·(l%4) + (l%12)/4 with per-window gains
        val xr0 = d.spectra(f * 2)
        val a0 = ((id + f) % 4).toInt
        val want0 = new Array[Double](576)
        for (l <- 0 until 40 if mag(id, f, 0, l) == 1) {
          val b = l / 12
          val w = (l % 12) / 4
          val rr = 12 * b + 3 * (l % 4) + w
          val sfs = ((id + 3 * f + b + w) % 2).toInt
          val sbg = ((id + f + w) % 2).toInt
          val v = math.pow(2.0, a0 - 2 * sbg - sfs)
          want0(rr) = if (sgn(id, f, 0, l) == 1) -v else v
        }
        for (l <- 0 until 576)
          assert(xr0(l) == want0(l), s"id=$id f=$f SHORT line=$l")
        // granule 1: LONG — the q_mp3_decode shape at g = 1
        val xr1 = d.spectra(f * 2 + 1)
        val a1 = ((id + f + 1) % 4).toInt
        for (l <- 0 until 576) {
          val expected =
            if (l >= 40 || mag(id, f, 1, l) == 0) 0.0
            else {
              val v = math.pow(2.0, a1 - sfOf(id, f, 1, bandOf(l)))
              if (sgn(id, f, 1, l) == 1) -v else v
            }
          assert(xr1(l) == expected, s"id=$id f=$f LONG line=$l")
        }
      }
    }
  }

  // single-frame bit writer for handcrafted window-switching cases
  private def l3Frame(body: ((Int, Int) => Unit) => Unit): Array[Byte] = {
    val out = new Array[Byte](576)
    out(0) = 0xFF.toByte; out(1) = 0xFB.toByte
    out(2) = 0xB4.toByte; out(3) = 0xC0.toByte // 192k / 48k / mono
    var bitPos = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >> i) & 1) == 1) {
          val bi = 4 + bitPos / 8
          out(bi) = (out(bi) | (1 << (7 - bitPos % 8))).toByte
        }
        bitPos += 1
        i -= 1
      }
    }
    body(put)
    out
  }

  test("mixed block: long bands below line 36, reordered shorts above") {
    // granule 0: wsf=1, bt=2, MIXED; granule 1: silent long
    val a = 2 // global_gain 218
    val sbg = Array(1, 0, 2)
    def magM(l: Int): Int = (l + 1) % 2 // even lines carry ±1
    def sgnM(l: Int): Int = if (l % 3 == 0) 1 else 0
    def sfL(b: Int): Int = b % 2 // long bands 0..7, slen1=1
    def sfSS(b: Int, w: Int): Int = (b + w) % 2 // short bands 3..11
    val pairBits = (0 until 36 by 2).map { l =>
      val (x, y) = (magM(l), magM(l + 1))
      Map((0, 0) -> 1, (0, 1) -> 3, (1, 0) -> 2, (1, 1) -> 3)((x, y)) + x + y
    }.sum
    val quadBits = 4 + (36 until 40).map(magM).sum // one count1-B quad
    val part23 = 8 + 27 + pairBits + quadBits // sf: 8 long + 9 short bands ×3
    val frame = l3Frame { put =>
      put(0, 9); put(0, 5); put(0, 4)
      // granule 0 side info
      put(part23, 12); put(18, 9); put(210 + 4 * a, 8); put(5, 4) // slen 1/1
      put(1, 1); put(2, 2); put(1, 1)        // wsf, bt 2, MIXED
      put(1, 5); put(0, 5)                    // tables 1, 0
      put(sbg(0), 3); put(sbg(1), 3); put(sbg(2), 3)
      put(0, 1); put(1, 1); put(1, 1)         // pre, sfscale 1, count1 B
      // granule 1 side info: silent (part23 0, slen 0/0)
      put(0, 12); put(0, 9); put(210, 8); put(0, 4)
      put(0, 1); put(0, 5); put(0, 5); put(0, 5); put(0, 4); put(0, 3)
      put(0, 1); put(0, 1); put(0, 1)
      // granule 0 main data: long sf 0..7 then short sf 3..11 ×3 windows
      for (b <- 0 until 8) put(sfL(b), 1)
      for (b <- 3 until 12; w <- 0 until 3) put(sfSS(b, w), 1)
      val t1 = Map((0, 0) -> (1, 1), (0, 1) -> (3, 1), (1, 0) -> (2, 1), (1, 1) -> (3, 0))
      for (l <- 0 until 36 by 2) {
        val (x, y) = (magM(l), magM(l + 1))
        val (len, code) = t1((x, y))
        put(code, len)
        if (x != 0) put(sgnM(l), 1)
        if (y != 0) put(sgnM(l + 1), 1)
      }
      val v = (magM(36) << 3) | (magM(37) << 2) | (magM(38) << 1) | magM(39)
      put(v ^ 0xF, 4)
      for (k <- 36 until 40 if magM(k) == 1) put(sgnM(k), 1)
    }
    val d = Mp3Codec.decode(frame).getOrElse(fail("mixed frame did not decode"))
    val xr = d.spectra(0)
    val bounds = Mp3Codec.sfbBounds(48000)
    val want = new Array[Double](576)
    for (l <- 0 until 36 if magM(l) == 1) { // long part: no reorder
      var band = 0
      while (l >= bounds(band + 1)) band += 1
      val v = math.pow(2.0, a - sfL(band))
      want(l) = if (sgnM(l) == 1) -v else v
    }
    for (l <- 36 until 40 if magM(l) == 1) { // short band 3, window 0
      val i = l - 36
      val v = math.pow(2.0, a - 2 * sbg(0) - sfSS(3, 0))
      want(36 + 3 * i) = if (sgnM(l) == 1) -v else v
    }
    for (l <- 0 until 576)
      assert(xr(l) == want(l), s"mixed line $l: got ${xr(l)}, want ${want(l)}")
    assert(d.spectra(1).forall(_ == 0.0), "silent long granule stays zero")
  }

  test("start/stop windows: granule time slices match the windowed IMDCT") {
    // granule 0: bt=1 (START), granule 1: bt=3 (STOP), one line at 9 each
    // (safely inside subband 0, away from the alias butterflies)
    def sideInfo(put: (Int, Int) => Unit, bt: Int, p23: Int): Unit = {
      put(p23, 12); put(5, 9); put(210 + 12, 8); put(0, 4) // a = 3, slen 0/0
      put(1, 1); put(bt, 2); put(0, 1)  // wsf, block_type, not mixed
      put(1, 5); put(0, 5)
      put(0, 3); put(0, 3); put(0, 3)   // subblock gains (unused: long layout)
      put(0, 1); put(0, 1); put(1, 1)
    }
    def granuleData(put: (Int, Int) => Unit): Unit = {
      // 5 pairs: lines 0..7 zero (code '1' ×4), pair (0, +1) at lines 8/9
      for (_ <- 0 until 4) put(1, 1)
      put(1, 3); put(0, 1) // (0,1) code + positive sign
    }
    val p23 = 4 + 4 // four 1-bit pairs + 3-bit pair + sign
    val frame = l3Frame { put =>
      put(0, 9); put(0, 5); put(0, 4)
      sideInfo(put, 1, p23)
      sideInfo(put, 3, p23)
      granuleData(put)
      granuleData(put)
    }
    val d = Mp3Codec.decode(frame).getOrElse(fail("start/stop frame did not decode"))
    val v = math.pow(2.0, 3) // gain 2^3, sf 0
    assert(d.spectra(0)(9) == v && d.spectra(1)(9) == v)
    val xr = new Array[Double](576)
    xr(9) = v
    Mp3Codec.aliasReduce(xr) // bt 1/3 are long granules: butterflies apply
    val b0 = Mp3Codec.imdct36(xr, 0, Mp3Codec.StartWindow)
    val b1 = Mp3Codec.imdct36(xr, 0, Mp3Codec.StopWindow)
    for (s <- 0 until 18) {
      assert(math.abs(d.granules(s)(0) - b0(s)) < 1e-12, s"START slice $s")
      assert(math.abs(d.granules(18 + s)(0) - (b1(s) + b0(18 + s))) < 1e-12,
        s"STOP slice $s (with the start granule's overlap tail)")
    }
    // window structure: start/stop are mirrors; flat and zero regions pinned
    for (i <- 0 until 36)
      assert(math.abs(Mp3Codec.StartWindow(i) - Mp3Codec.StopWindow(35 - i)) < 1e-12,
        s"start/stop mirror at $i")
    assert(Mp3Codec.StartWindow(20) == 1.0 && Mp3Codec.StartWindow(33) == 0.0)
    assert(Mp3Codec.StopWindow(2) == 0.0 && Mp3Codec.StopWindow(14) == 1.0)
  }

  test("wsf with reserved block_type 0 rejects loudly") {
    val frame = l3Frame { put =>
      put(0, 9); put(0, 5); put(0, 4)
      put(0, 12); put(0, 9); put(210, 8); put(0, 4)
      put(1, 1); put(0, 2); put(0, 1) // wsf=1, block_type 0: reserved
      put(0, 5); put(0, 5); put(0, 3); put(0, 3); put(0, 3)
      put(0, 1); put(0, 1); put(0, 1)
      put(0, 12); put(0, 9); put(210, 8); put(0, 4)
      put(0, 1); put(0, 5); put(0, 5); put(0, 5); put(0, 4); put(0, 3)
      put(0, 1); put(0, 1); put(0, 1)
    }
    assert(Mp3Codec.decode(frame).isEmpty)
  }

  test("malformed channel remarks and unshipped Huffman tables are rejected, not mis-decoded") {
    val js = graft.SparkEntry.synthMp3L3(0L).clone()
    js(3) = 0x40.toByte // mono stream remarked stereo: 17-byte side info
    assert(Mp3Codec.decode(js).isEmpty, // can't parse as the 32-byte layout
      "a mono frame remarked joint-stereo is malformed and must reject")
    val badTable = graft.SparkEntry.synthMp3L3(0L).clone()
    // table_select(0) field: side info bits — flip to table 16 (unshipped:
    // the linbits transcriptions failed the completeness discipline;
    // 2/3/5/6 decode since round 15, 7/8/9/10/12/13 since round 16).
    // Offset: 4 (header) + 9+5+4 (mdb/priv/scfsi) + 12+9+8+4+1 = 52 bits in
    // → table_select starts at bit 52 of side info
    val bitOff = (9 + 5 + 4 + 12 + 9 + 8 + 4 + 1)
    val byteIdx = 4 + bitOff / 8
    // write 10000 over the 5 bits at bitOff (big-endian in-byte)
    var v = 16
    for (i <- 0 until 5) {
      val bp = bitOff + i
      val bit = (v >> (4 - i)) & 1
      val mask = 1 << (7 - bp % 8)
      val bi = 4 + bp / 8
      badTable(bi) = (if (bit == 1) badTable(bi) | mask else badTable(bi) & ~mask).toByte
    }
    assert(Mp3Codec.decode(badTable).isEmpty, "unshipped table must reject loudly")
  }
}
