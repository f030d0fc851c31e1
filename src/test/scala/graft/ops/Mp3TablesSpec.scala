package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The r18 B.7 table-data seam: the loader accepts only tables passing
  * the shipped-table discipline (Kraft/prefix/round-trip), rejects
  * everything else loudly with the defect named, dispatches loaded
  * tables in the real decode, and the per-frame reject telemetry names
  * the table id a stream needed.
  */
class Mp3TablesSpec extends AnyFunSuite {

  // a trivially-verifiable synthetic table 16: 2×2 grid, fixed 2-bit
  // codes (Kraft 4·2⁻² = 1, prefix-free by construction), linbits 1
  private val valid16 =
    """# synthetic verification table
      |table 16 size 2 linbits 1
      |2 0
      |2 1
      |2 2
      |2 3
      |end
      |""".stripMargin

  test("loader accepts a valid table file; structure lands in BigTable") {
    val m = Mp3Tables.parseTableFile(valid16)
    assert(m.keySet == Set(16))
    val t = m(16)
    assert(t.maxVal == 1 && t.linbits == 1 && t.pairs.size == 4)
    assert(t.pairs((2, 3)) == ((1, 1)))
    // multiple blocks + comments + blank lines
    val two = Mp3Tables.parseTableFile(valid16 + "\n# second block\n" +
      valid16.replace("table 16", "table 17"))
    assert(two.keySet == Set(16, 17))
  }

  test("loader loud-rejects structural damage, naming the defect") {
    def msg(t: String): String =
      intercept[IllegalArgumentException](Mp3Tables.parseTableFile(t)).getMessage
    // Kraft-INCOMPLETE: lengthening one code leaves a hole
    assert(msg(valid16.replace("2 3", "3 6")).contains("INCOMPLETE"))
    // prefix violation: 1-bit code 0 prefixes 2-bit codes
    assert(msg(valid16.replace("2 0\n", "1 0\n")).contains("prefix"))
    // duplicate codeword
    assert(msg(valid16.replace("2 1", "2 0")).contains("duplicate"))
    // shipped id must not be overridden
    assert(msg(valid16.replace("table 16", "table 7")).contains("shipped"))
    // reserved slot
    assert(msg(valid16.replace("table 16", "table 14")).contains("reserved"))
    // cell count mismatch
    assert(msg(valid16.replace("2 3\n", "")).contains("expected 4 cells"))
    // code wider than its length
    assert(msg(valid16.replace("2 3", "2 5")).contains("does not fit"))
    // garbage header
    assert(msg("tables 16").contains("expected 'table"))
  }

  /** synthMp3Tables-shaped mono 48 kHz stream: `nGood` frames on the
    * shipped tables (2, 3, 5 / 6), then `nLoaded` frames selecting
    * TABLE 16 everywhere (every nonzero magnitude escapes through the
    * 1-linbit extension, written as 0 so values stay exact).
    */
  private def synthWith16(nGood: Int, nLoaded: Int): Array[Byte] = {
    val nFrames = nGood + nLoaded
    val frameLen = 576
    val out = new Array[Byte](nFrames * frameLen)
    val t2 = Map((0, 0) -> (1, 1), (0, 1) -> (3, 2), (1, 0) -> (3, 3), (1, 1) -> (3, 1))
    val t3 = Map((0, 0) -> (2, 3), (0, 1) -> (2, 2), (1, 0) -> (3, 1), (1, 1) -> (2, 1))
    val t5 = Map((0, 0) -> (1, 1), (0, 1) -> (3, 2), (1, 0) -> (3, 3), (1, 1) -> (3, 1))
    val t6 = Map((0, 0) -> (3, 7), (0, 1) -> (3, 3), (1, 0) -> (3, 6), (1, 1) -> (2, 2))
    val t16 = Map((0, 0) -> (2, 0), (0, 1) -> (2, 1), (1, 0) -> (2, 2), (1, 1) -> (2, 3))
    val c1a = Map(0 -> (1, 0x1), 1 -> (4, 0x5), 2 -> (4, 0x4), 3 -> (5, 0x5),
      4 -> (4, 0x6), 5 -> (6, 0x5), 6 -> (5, 0x4), 7 -> (6, 0x4),
      8 -> (4, 0x7), 9 -> (5, 0x3), 10 -> (5, 0x6), 11 -> (6, 0x0),
      12 -> (5, 0x7), 13 -> (6, 0x2), 14 -> (6, 0x3), 15 -> (6, 0x1))
    def loaded(f: Int) = f >= nGood
    def tableFor(f: Int, g: Int, l: Int): Map[(Int, Int), (Int, Int)] =
      if (loaded(f)) t16
      else if (g == 1) t6 else if (l < 24) t2 else if (l < 42) t3 else t5
    var f = 0
    while (f < nFrames) {
      val o = f * frameLen
      out(o) = 0xFF.toByte; out(o + 1) = 0xFB.toByte
      out(o + 2) = 0xB4.toByte; out(o + 3) = 0xC0.toByte
      var bitPos = 0
      def put(v: Int, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          if (((v >> i) & 1) == 1) {
            val bi = o + 4 + bitPos / 8
            out(bi) = (out(bi) | (1 << (7 - bitPos % 8))).toByte
          }
          bitPos += 1; i -= 1
        }
      }
      def mag(g: Int, l: Int): Int = ((7 + f * 11 + g * 13 + l * 3) % 2)
      def sgn(g: Int, l: Int): Int = ((f + g + l) % 2)
      def huffBits(g: Int): Int = {
        var bits = 0
        val bvEnd = if (g == 0) 50 else 24
        var l = 0
        while (l < bvEnd) {
          val (x, y) = (mag(g, l), mag(g, l + 1))
          // loaded table: nonzero magnitude = maxVal -> +1 linbit each
          bits += tableFor(f, g, l)((x, y))._1 +
            (if (loaded(f)) 2 * (x + y) else x + y)
          l += 2
        }
        val c1End = if (g == 0) 58 else 40
        while (l < c1End) {
          val v = (mag(g, l) << 3) | (mag(g, l + 1) << 2) |
            (mag(g, l + 2) << 1) | mag(g, l + 3)
          bits += (if (g == 0) 4 else c1a(v)._1) +
            (0 until 4).map(k => mag(g, l + k)).sum
          l += 4
        }
        bits
      }
      put(0, 9); put(0, 5); put(0, 4)
      var g = 0
      while (g < 2) {
        put(42 + huffBits(g), 12)
        put(if (g == 0) 25 else 12, 9)
        put(210 + 4 * ((f + g) % 4), 8)
        put(9, 4); put(0, 1)
        if (loaded(f)) { put(16, 5); put(16, 5); if (g == 0) put(16, 5) else put(0, 5) }
        else if (g == 0) { put(2, 5); put(3, 5); put(5, 5) }
        else { put(6, 5); put(0, 5); put(0, 5) }
        put(5, 4)
        put(if (g == 0) 2 else 3, 3)
        put(0, 1); put(1, 1)
        put(if (g == 0) 1 else 0, 1)
        g += 1
      }
      g = 0
      while (g < 2) {
        var b = 0
        while (b < 21) { put(((3 * f + 5 * g + b) % 4), 2); b += 1 }
        val bvEnd = if (g == 0) 50 else 24
        var l = 0
        while (l < bvEnd) {
          val (x, y) = (mag(g, l), mag(g, l + 1))
          val (len, code) = tableFor(f, g, l)((x, y))
          put(code, len)
          if (loaded(f) && x != 0) put(0, 1) // linbits extension (0 -> exact)
          if (x != 0) put(sgn(g, l), 1)
          if (loaded(f) && y != 0) put(0, 1)
          if (y != 0) put(sgn(g, l + 1), 1)
          l += 2
        }
        val c1End = if (g == 0) 58 else 40
        while (l < c1End) {
          val v = (mag(g, l) << 3) | (mag(g, l + 1) << 2) |
            (mag(g, l + 2) << 1) | mag(g, l + 3)
          if (g == 0) put(v ^ 0xF, 4)
          else { val (len, code) = c1a(v); put(code, len) }
          var k = 0
          while (k < 4) { if (mag(g, l + k) != 0) put(sgn(g, l + k), 1); k += 1 }
          l += 4
        }
        g += 1
      }
      f += 1
    }
    out
  }

  test("dispatch: without the table the stream rejects AND names id 16; with it, decodes") {
    val bytes = synthWith16(nGood = 3, nLoaded = 2)
    // unloaded: the walk keeps the 3 good frames, stops at the first
    // table-16 frame, and the telemetry NAMES the table it needed
    val bare = Mp3Codec.decode(bytes).get
    assert(bare.nFrames == 3)
    assert(bare.rejectedTables == Map(16 -> 1), bare.rejectedTables.toString)
    // loaded: all 5 frames decode, no rejects, table-16 spectra nonzero
    val loaded = Mp3Tables.parseTableFile(valid16)
    val full = Mp3Codec.decode(bytes, loaded).get
    assert(full.nFrames == 5)
    assert(full.rejectedTables.isEmpty)
    assert(full.spectra.length == 10) // 5 frames x 2 granules, mono
    val tail = full.spectra.drop(6) // the table-16 frames' granules
    assert(tail.forall(_.exists(_ != 0.0)), "loaded-table frames must carry spectra")
    // the good frames decode IDENTICALLY with and without the extra table
    for (i <- 0 until 6)
      assert(bare.spectra(i).toSeq == full.spectra(i).toSeq, s"granule $i drifted")
    // shipped/reserved override refused at the decode door too
    intercept[IllegalArgumentException](
      Mp3Codec.decode(bytes, Map(7 -> loaded(16))))
  }
}
