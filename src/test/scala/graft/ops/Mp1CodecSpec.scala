package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The scoped MPEG-1 Layer-I subband decoder: analytic requantization
  * goldens, stereo, descoped joint stereo, truncation, hostile bytes, and
  * the envelope-fingerprint DF over it.
  */
class Mp1CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // v = (code − 3) · 2 · sf / 7 for the nb = 3 fixture (see synthMp1 doc)
  private def v3(code: Long, sf: Double): Double = (code - 3) * 2.0 * sf / 7.0

  test("decode golden: synthMp1 header fields and analytic sample values") {
    val id = 5L
    val d = Mp1Codec.decode(graft.SparkEntry.synthMp1(id)).get
    assert(d.sampleRate == 32000 && d.channels == 1)
    assert(d.nFrames == 8 && d.granules.length == 96) // 6 + 5%3 frames
    for (f <- 0 until d.nFrames; g <- 0 until 12) {
      val base = id * 5 + f * 7 + g * 3
      val gr = d.granules(f * 12 + g)
      assert(math.abs(gr(0) - v3(base % 8, 2.0)) < 1e-12, s"f=$f g=$g sb0")
      assert(math.abs(gr(1) - v3((base + 1) % 8, 1.0)) < 1e-12, s"f=$f g=$g sb1")
      assert((2 until 32).forall(sb => gr(sb) == 0.0), "unallocated subbands are silent")
    }
  }

  /** Hand-built single frame with explicit mode bits. */
  private def frame(mode: Int, allocSb0: Seq[Int], scf: Seq[Int],
                    codes: Seq[Seq[Int]]): Array[Byte] = {
    val out = new Array[Byte](672)
    out(0) = 0xFF.toByte; out(1) = 0xFF.toByte; out(2) = 0xE8.toByte
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
    for (sb <- 0 until 32; c <- 0 until ch)
      put(if (sb == 0) allocSb0(c) else 0, 4)
    for (c <- 0 until ch) put(scf(c), 6)
    for (g <- 0 until 12; c <- 0 until ch) put(codes(g)(c), 3)
    out
  }

  test("stereo frame decodes both channels with their own scalefactors") {
    val codes = (0 until 12).map(g => Seq(g % 8, (g + 5) % 8))
    val d = Mp1Codec.decode(frame(0, Seq(2, 2), Seq(0, 3), codes)).get
    assert(d.channels == 2 && d.nFrames == 1 && d.granules.length == 12)
    for (g <- 0 until 12) {
      assert(math.abs(d.granules(g)(0) - v3(g % 8, 2.0)) < 1e-12)       // sb0 ch0
      assert(math.abs(d.granules(g)(1) - v3((g + 5) % 8, 1.0)) < 1e-12) // sb0 ch1
    }
  }

  test("joint stereo: shared codes above the bound, per-channel scalefactors") {
    val id = 3L
    val d = Mp1Codec.decode(graft.SparkEntry.synthMp1Js(id))
      .getOrElse(fail("joint fixture did not decode"))
    assert(d.channels == 2 && d.nFrames == (6 + id % 3).toInt)
    for (f <- 0 until d.nFrames; g <- 0 until 12) {
      val gr = d.granules(f * 12 + g)
      val m0 = ((id * 5 + f * 7 + g * 3) % 8).toInt
      val m1 = ((id * 5 + f * 7 + g * 3 + 1) % 8).toInt
      val m2 = ((id * 5 + f * 7 + g * 3 + 2) % 8).toInt
      assert(math.abs(gr(0) - v3(m0, 2.0)) < 1e-12, s"f=$f g=$g sb0 ch0")
      assert(math.abs(gr(1) - v3(m1, 1.0)) < 1e-12, s"f=$f g=$g sb0 ch1")
      // the SHARED sb4 code lands on both channels with their OWN sf
      assert(math.abs(gr(4 * 2) - v3(m2, 1.0)) < 1e-12, s"f=$f g=$g sb4 ch0")
      assert(math.abs(gr(4 * 2 + 1) - v3(m2, 0.5)) < 1e-12, s"f=$f g=$g sb4 ch1")
      for (sb <- 0 until 32 if sb != 0 && sb != 4; c <- 0 until 2)
        assert(gr(sb * 2 + c) == 0.0, s"f=$f g=$g sb=$sb ch$c must be silent")
    }
  }

  test("truncation mid-frame keeps the frames already decoded") {
    val full = graft.SparkEntry.synthMp1(1L)
    val cut = full.take(672 + 100) // one whole frame + a partial second
    val d = Mp1Codec.decode(cut).get
    assert(d.nFrames == 1 && d.granules.length == 12)
    assert(Mp1Codec.decode(full.take(50)).isEmpty) // not even one frame
  }

  test("ID3v2 tag is skipped; hostile bytes never throw") {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++
      new Array[Byte](20) ++ graft.SparkEntry.synthMp1(2L)
    assert(Mp1Codec.decode(id3).get.nFrames == 6 + 2)
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(2000))(rnd.nextInt().toByte)
      Mp1Codec.decode(junk) // must not throw
      val mangled = graft.SparkEntry.synthMp1(3L).clone()
      for (_ <- 0 until 10) mangled(rnd.nextInt(mangled.length)) = rnd.nextInt().toByte
      Mp1Codec.decode(mangled) // must not throw either
    }
    assert(Mp1Codec.decode(null) == None)
    assert(Mp1Codec.decode(Array[Byte](1, 2, 3)) == None)
  }

  test("envelopeHash64 goldens") {
    assert(Multimodal.envelopeHash64(Array.empty[Long]) == 0L)
    assert(Multimodal.envelopeHash64(Array.fill(65)(7L)) == 0L) // flat → all ties
    // strictly rising 65 values → every adjacent comparison true
    assert(Multimodal.envelopeHash64(Array.tabulate(65)(_.toLong)) == -1L)
  }

  test("mp1EnergyFingerprintDF: exact integer-scaled energies, junk skipped") {
    val df = Seq((1L, graft.SparkEntry.synthMp1(1L)),
      (2L, "garbage".getBytes), (3L, null: Array[Byte]))
      .toDF("doc_id", "media")
    val rows = Multimodal.mp1EnergyFingerprintDF(df, "doc_id").collect()
    assert(rows.length == 1) // junk and null yield nothing
    val r = rows(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 32000L)
    assert(r.getLong(2) == 7L && r.getLong(3) == 84L) // 6 + 1%3 frames
    // replay the oracle's integer pipeline for the fingerprint
    val n = 84
    val energies = Array.tabulate(n) { gi =>
      val f = gi / 12; val g = gi % 12
      val c0 = (1L * 5 + f * 7 + g * 3) % 8
      val c1 = (1L * 5 + f * 7 + g * 3 + 1) % 8
      ((c0 - 3) * (c0 - 3) * 4 + (c1 - 3) * (c1 - 3)) * 4096
    }
    assert(r.getLong(4) == Multimodal.envelopeHash64(energies))
  }
}
