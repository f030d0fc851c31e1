package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The scoped MPEG-1 Layer-II subband decoder: analytic requantization
  * goldens through the B.2b table, scfsi semantics, the GROUPED 3-level
  * class through table B.2c, stereo, descoped joint stereo, truncation,
  * hostile bytes, and the envelope-fingerprint DF over it.
  */
class Mp2CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // v = (2·code − n + 1)/n · sf — the Layer-II requantization closed form
  private def vq(code: Long, n: Int, sf: Double): Double =
    (2 * code - n + 1).toDouble / n * sf

  test("decode golden: synthMp2 header fields, scfsi thirds, analytic values") {
    val id = 5L
    val d = Mp2Codec.decode(graft.SparkEntry.synthMp2(id)).get
    assert(d.sampleRate == 32000 && d.channels == 1)
    assert(d.nFrames == 8 && d.granules.length == 8 * 36) // 6 + 5%3 frames
    for (f <- 0 until d.nFrames; g <- 0 until 12; s <- 0 until 3) {
      val base = id * 5 + f * 7 + g * 3 + s
      val slice = d.granules(f * 36 + g * 3 + s)
      val sf0 = (g / 4) match { case 0 => 2.0; case 1 => 1.0; case _ => 0.5 }
      assert(math.abs(slice(0) - vq(base % 7, 7, sf0)) < 1e-12, s"f=$f g=$g s=$s sb0")
      assert(math.abs(slice(1) - vq((base + 1) % 7, 7, 1.0)) < 1e-12, s"f=$f g=$g s=$s sb1")
      assert((2 until 32).forall(sb => slice(sb) == 0.0), "unallocated subbands are silent")
    }
  }

  test("allocation-table selection follows the ISO rule") {
    // ≤48 kbps/ch: 32 kHz → B.2d (12 sb), else B.2c (8 sb)
    assert(Mp2Codec.allocTable(48, 1, 32000)._1 == 12)
    assert(Mp2Codec.allocTable(48, 1, 44100)._1 == 8)
    assert(Mp2Codec.allocTable(96, 2, 44100)._1 == 8) // 48/ch
    // 49–80 kbps/ch → B.2a (27 sb)
    assert(Mp2Codec.allocTable(80, 1, 44100)._1 == 27)
    assert(Mp2Codec.allocTable(160, 2, 48000)._1 == 27)
    // >80 kbps/ch: 48 kHz stays B.2a, 44.1/32 kHz go B.2b (30 sb)
    assert(Mp2Codec.allocTable(384, 1, 48000)._1 == 27)
    assert(Mp2Codec.allocTable(384, 1, 44100)._1 == 30)
    assert(Mp2Codec.allocTable(384, 1, 32000)._1 == 30)
  }

  /** Hand-built single low-rate frame (32 kbps mono @ 44.1 kHz → table
    * B.2c, 8 subbands, frame 104 bytes): sb0 allocated with `alloc`
    * (code 1 = the GROUPED 3-level class), scfsi=2, one scalefactor.
    */
  private def frameC(mode: Int, alloc: Int, scfIdx: Int,
                     groupCodes: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](104)
    out(0) = 0xFF.toByte; out(1) = 0xFD.toByte; out(2) = 0x10.toByte
    out(3) = ((mode << 6) & 0xFF).toByte
    var bitPos = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >> i) & 1) == 1) {
          val bi = 4 + bitPos / 8
          out(bi) = (out(bi) | (1 << (7 - bitPos % 8))).toByte
        }
        bitPos += 1; i -= 1
      }
    }
    val ch = if (mode == 3) 1 else 2
    for (c <- 0 until ch) put(alloc, 4)          // sb0 (nbal 4)
    for (c <- 0 until ch) put(0, 4)              // sb1 (nbal 4 — B.2c sb 0-1)
    for (_ <- 2 until 8; _ <- 0 until ch) put(0, 3) // sb2-7 (nbal 3)
    for (c <- 0 until ch) put(2, 2)              // scfsi = 2 (one sf)
    for (c <- 0 until ch) put(scfIdx, 6)
    for (g <- 0 until 12; c <- 0 until ch) put(groupCodes(g), 5)
    out
  }

  test("grouped 3-level class: one 5-bit code carries three base-3 samples") {
    // code = c0 + 3·c1 + 9·c2; digits map to (2·ci − 2)/3 · sf
    val codes = (0 until 12).map(g => (g % 3) + 3 * ((g + 1) % 3) + 9 * ((g + 2) % 3))
    val d = Mp2Codec.decode(frameC(3, 1, 3, codes)).get
    assert(d.sampleRate == 44100 && d.channels == 1 && d.nFrames == 1)
    assert(d.granules.length == 36)
    for (g <- 0 until 12; s <- 0 until 3) {
      val ci = (g + s) % 3
      assert(math.abs(d.granules(g * 3 + s)(0) - vq(ci, 3, 1.0)) < 1e-12,
        s"g=$g s=$s: ${d.granules(g * 3 + s)(0)}")
    }
  }

  test("stereo frame decodes both channels") {
    val codes = (0 until 12).map(_ => 13) // digits (1,1,1) → all zeros
    val d = Mp2Codec.decode(frameC(0, 1, 3, codes)).get
    assert(d.channels == 2 && d.granules.length == 36)
    assert(d.granules.forall(_.forall(_ == 0.0)))
  }

  test("joint stereo: one shared sample stream above the bound, per-channel scfsi scalefactors") {
    val id = 4L
    val d = Mp2Codec.decode(graft.SparkEntry.synthMp2Js(id))
      .getOrElse(fail("joint fixture did not decode"))
    assert(d.channels == 2 && d.nFrames == (6 + id % 3).toInt)
    for (f <- 0 until d.nFrames; g <- 0 until 12; s <- 0 until 3) {
      val sl = d.granules(f * 36 + g * 3 + s)
      val part = g / 4
      val m0 = ((id * 5 + f * 7 + g * 3 + s) % 7).toInt
      val m1 = ((id * 5 + f * 7 + g * 3 + s + 1) % 7).toInt
      val m2 = ((id * 5 + f * 7 + g * 3 + s + 2) % 7).toInt
      val thirds = Array(2.0, 1.0, 0.5)
      assert(math.abs(sl(0) - vq(m0, 7, thirds(part))) < 1e-12, s"f=$f g=$g s=$s sb0 ch0")
      assert(math.abs(sl(1) - vq(m1, 7, 1.0)) < 1e-12, s"f=$f g=$g s=$s sb0 ch1")
      // the SHARED sb4 stream: flat 0.5 on ch0, scfsi-0 thirds on ch1
      assert(math.abs(sl(4 * 2) - vq(m2, 7, 0.5)) < 1e-12, s"f=$f g=$g s=$s sb4 ch0")
      assert(math.abs(sl(4 * 2 + 1) - vq(m2, 7, thirds(part))) < 1e-12,
        s"f=$f g=$g s=$s sb4 ch1")
      for (sb <- 0 until 32 if sb != 0 && sb != 4; c <- 0 until 2)
        assert(sl(sb * 2 + c) == 0.0, s"f=$f g=$g s=$s sb=$sb ch$c must be silent")
    }
  }

  test("truncation mid-frame keeps the frames already decoded") {
    val full = graft.SparkEntry.synthMp2(1L)
    val cut = full.take(1728 + 200) // one whole frame + a partial second
    val d = Mp2Codec.decode(cut).get
    assert(d.nFrames == 1 && d.granules.length == 36)
    assert(Mp2Codec.decode(full.take(60)).isEmpty)
  }

  test("ID3v2 tag is skipped; hostile bytes never throw") {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++
      new Array[Byte](20) ++ graft.SparkEntry.synthMp2(2L)
    assert(Mp2Codec.decode(id3).get.nFrames == 6 + 2)
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(3000))(rnd.nextInt().toByte)
      Mp2Codec.decode(junk) // must not throw
      val mangled = graft.SparkEntry.synthMp2(3L).clone()
      for (_ <- 0 until 10) mangled(rnd.nextInt(mangled.length)) = rnd.nextInt().toByte
      Mp2Codec.decode(mangled) // must not throw either
    }
    assert(Mp2Codec.decode(null) == None)
    assert(Mp2Codec.decode(Array[Byte](1, 2, 3)) == None)
    // a Layer-I stream is not Layer II
    assert(Mp2Codec.decode(graft.SparkEntry.synthMp1(1L)) == None)
  }

  test("mp2EnergyFingerprintDF: exact integer-scaled energies, junk skipped") {
    val df = Seq((1L, graft.SparkEntry.synthMp2(1L)),
      (2L, "garbage".getBytes), (3L, null: Array[Byte]))
      .toDF("doc_id", "media")
    val rows = Multimodal.mp2EnergyFingerprintDF(df, "doc_id").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 32000L)
    assert(r.getLong(2) == 7L && r.getLong(3) == 7L * 36) // 6 + 1%3 frames
    // replay the oracle's integer pipeline for the fingerprint
    val n = 7 * 36
    val energies = Array.tabulate(n) { gi =>
      val f = gi / 36; val g = (gi % 36) / 3; val s = gi % 3
      val c0 = (1L * 5 + f * 7 + g * 3 + s) % 7
      val c1 = (1L * 5 + f * 7 + g * 3 + s + 1) % 7
      val m0 = (g / 4) match { case 0 => 4096L; case 1 => 1024L; case _ => 256L }
      (2 * c0 - 6) * (2 * c0 - 6) * m0 + (2 * c1 - 6) * (2 * c1 - 6) * 1024L
    }
    assert(r.getLong(4) == Multimodal.envelopeHash64(energies))
  }
}
