package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Goldens for the integer PCM decode ([[Multimodal.PcmCodec.decodeInt16]])
  * and the 64-bit audio energy fingerprint + dedup/near-dup operators —
  * unit-level twins of the q_audio_dedup oracle gate.
  */
class AudioDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Multimodal.PcmCodec

  private def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def riff(fmt: Int, channels: Int, rate: Int, bits: Int,
                   data: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(fmt) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * bits / 8) ++ le16(channels * bits / 8) ++
      le16(bits) ++ "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  private def wav16(samples: Seq[Int], channels: Int = 1): Array[Byte] =
    riff(1, channels, 8000, 16, samples.flatMap(le16(_).toSeq).toArray)
  private def wav8(samples: Seq[Int]): Array[Byte] = // unsigned 0..255
    riff(1, 1, 8000, 8, samples.map(_.toByte).toArray)
  private def wavF32(samples: Seq[Float]): Array[Byte] =
    riff(3, 1, 8000, 32, samples.flatMap(v =>
      le32(java.lang.Float.floatToIntBits(v)).toSeq).toArray)

  test("decodeInt16 goldens: 16-bit passthrough, 8-bit recentred <<8, float rounded") {
    val p16 = PcmCodec.decodeInt16(wav16(Seq(0, 100, -200, 32767, -32768))).get
    assert(p16.samples.toSeq == Seq(0L, 100L, -200L, 32767L, -32768L))
    assert(p16.channels == 1 && p16.sampleRate == 8000 && p16.bitsPerSample == 16)
    val p8 = PcmCodec.decodeInt16(wav8(Seq(128, 129, 127, 255, 0))).get
    assert(p8.samples.toSeq == Seq(0L, 256L, -256L, 32512L, -32768L))
    val pf = PcmCodec.decodeInt16(wavF32(Seq(0f, 0.5f, -0.25f, 1.5f))).get
    assert(pf.samples.toSeq == Seq(0L, 16384L, -8192L, 32767L)) // clamped
    assert(PcmCodec.decodeInt16("not a wav at all".getBytes).isEmpty)
  }

  test("fingerprint is invariant to container bit depth of the same signal") {
    // the same waveform stored as int16 and as float32 (16-bit values are
    // exact binary32 fractions, so rint round-trips them) must collide
    val sig = (0 until 650).map(i => ((i * 997) % 65536) - 32768)
    val a = PcmCodec.decodeInt16(wav16(sig)).get
    val b = PcmCodec.decodeInt16(wavF32(sig.map(_ / 32768f))).get
    val fa = Multimodal.audioFingerprint64(a.samples, a.channels)
    val fb = Multimodal.audioFingerprint64(b.samples, b.channels)
    assert(fa == fb && fa != 0L)
  }

  test("fingerprint: empty stream is 0; different material differs") {
    assert(Multimodal.audioFingerprint64(Array.emptyLongArray, 1) == 0L)
    val s1 = (0 until 650).map(i => ((i * 997) % 65536) - 32768)
    val s2 = (0 until 650).map(i => ((i * 1013) % 65536) - 32768)
    val f1 = Multimodal.audioFingerprint64(s1.map(_.toLong).toArray, 1)
    val f2 = Multimodal.audioFingerprint64(s2.map(_.toLong).toArray, 1)
    assert(f1 != f2)
  }

  test("audioDedup groups identical clips; canonical = min id; near-dup pairs verify") {
    val sigA = (0 until 650).map(i => ((i * 997) % 65536) - 32768)
    val sigB = (0 until 650).map(i => ((i * 1031) % 65536) - 32768)
    // silence ALL of window 30 (frames 300..309 at n=650): energy[30]
    // drops to 0, flipping its comparison against a live neighbour, while
    // every other window is untouched → only the 2 adjacent comparisons
    // can flip → 1 <= hamming <= 2
    val sigA2 = sigA.zipWithIndex.map { case (v, i) => if (i >= 300 && i < 310) 0 else v }
    val df = Seq(
      (1L, wav16(sigA)), (2L, wav16(sigA)), (3L, wav16(sigB)),
      (4L, wav16(sigA2)), (5L, "junk".getBytes))
      .toDF("doc_id", "media")
    val d = Multimodal.audioDedup(df, "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(d.size == 4) // junk row yields nothing
    assert(d(1L).getAs[Long]("n_dups") == 2 && d(2L).getAs[Long]("canonical_id") == 1L)
    assert(d(3L).getAs[Long]("n_dups") == 1)
    assert(d(4L).getAs[Long]("n_dups") == 1) // perturbed copy: NOT an exact dup

    val pairs = Multimodal.audioNearDupPairs(df, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0L)
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) <= 2L, pairs.toString)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L }) // unrelated
  }

  // The banding cover must hold for ANY requested radius, not just the
  // default 3: maxHamming + 1 bands guarantee (pigeonhole) that a pair
  // within the radius agrees on at least one intact band. Spread 5
  // differing bits so every 16-bit quarter contains one — the old fixed
  // 4×16 banding would lose this pair at maxHamming = 5.
  test("hammingCoverBands: exact cover at any radius, radius bound enforced") {
    val a = 0L
    val b = (1L << 2) | (1L << 18) | (1L << 34) | (1L << 50) | (1L << 63)
    assert(java.lang.Long.bitCount(a ^ b) == 5)
    val hashed = Seq((1L, a), (2L, b)).toDF("doc_id", "h")
    def sharedBuckets(maxHamming: Int): Long = {
      val bands = Multimodal.hammingCoverBands(hashed, "h", maxHamming)
      bands.as[(Long, Long, Long)].collect().groupBy(r => (r._2, r._3))
        .count(_._2.map(_._1).toSet == Set(1L, 2L)).toLong
    }
    assert(sharedBuckets(3) == 0L, "4 bands cannot cover 5 spread bits")
    assert(sharedBuckets(5) >= 1L, "6 bands must leave an intact shared band")
    assertThrows[IllegalArgumentException](
      Multimodal.hammingCoverBands(hashed, "h", 16))
    assertThrows[IllegalArgumentException](
      Multimodal.hammingCoverBands(hashed, "h", -1))
    // masks tile all 64 bits exactly once: XOR-reassembling the banded
    // buckets of any hash reproduces the hash
    val h = 0x5DEADBEEFCAFE123L
    val one = Seq((1L, h)).toDF("doc_id", "h")
    for (mh <- Seq(0, 3, 7, 15)) {
      val nBands = mh + 1
      val parts = Multimodal.hammingCoverBands(one, "h", mh)
        .as[(Long, Long, Long)].collect()
      assert(parts.length == nBands)
      val rebuilt = parts.map { case (_, band, bucket) =>
        bucket << (band.toInt * 64 / nBands)
      }.reduce(_ | _)
      assert(rebuilt == h, s"maxHamming=$mh bands do not tile the hash")
    }
  }
}
