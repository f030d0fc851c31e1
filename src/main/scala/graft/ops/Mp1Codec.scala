package graft.ops

/** Scoped MPEG-1 Audio **Layer I** subband decoder (ISO/IEC 11172-3) — the
  * compressed-audio fingerprint path. Everything here is analytic (no
  * empirical tables beyond the bitrate/sample-rate header enums):
  *
  *  - frame walk: 32-bit header → slot count (12·bitrate/rate + padding)·4;
  *  - bit-exact payload parse: 4-bit allocation per (channel, subband),
  *    6-bit scalefactor index per allocated subband, then 12 granules ×
  *    32 subbands × channels of `nb`-bit sample codes (nb = alloc + 1);
  *  - requantization (ISO §2.4.3.2 layer I shape):
  *    v = ((code − 2^(nb−1)) · 2^(1−nb) + 2^(1−nb)) · 2^nb/(2^nb − 1) · sf,
  *    sf = 2 · 2^(−idx/3) — both factors analytic;
  *  - NO synthesis filterbank: the polyphase window (ISO Table B.3) is an
  *    empirical prototype filter, and reproducing it approximately would be
  *    a silently-wrong "PCM decode". Dequantized SUBBAND samples are the
  *    standard-defined signal one stage earlier, and the filterbank is
  *    near-orthonormal, so per-granule subband energy ≈ the energy of the
  *    32 PCM samples that granule synthesizes — exactly the quantity the
  *    gain-invariant envelope fingerprint ([[Multimodal.audioFingerprint64]]
  *    discipline) consumes. The decode stops, loudly and by design, at the
  *    subband domain; Layer II (empirical B.2 allocation tables) and
  *    Layer III (Huffman/IMDCT) sample decode remain out of scope — their
  *    headers/VBR metadata parse via [[Multimodal.HeaderCodec]], and the
  *    boundary is documented in README.
  *
  * Robustness contract (same as PcmCodec/PngCodec): any malformed, hostile
  * or truncated input yields `None`, never a throw — a 100 TB crawl always
  * contains garbage. Mono, stereo, dual-channel AND joint stereo decode:
  * joint (intensity) mode shares ONE allocation + ONE sample code per
  * subband at and above bound = 4·(mode_extension+1), reconstructing each
  * channel with its OWN scalefactor (ISO 11172-3 §2.4.2.3) — gated by
  * q_mp1_js_decode's per-channel envelope.
  */
object Mp1Codec {

  /** All frames' dequantized subband samples, granule-major:
    * `samples(frame * 12 + granule)(sb * channels + ch)`.
    */
  final case class Mp1Data(sampleRate: Int, channels: Int, nFrames: Int,
                           granules: Array[Array[Double]])

  private val BitrateKbps = Array(0, 32, 64, 96, 128, 160, 192, 224, 256,
    288, 320, 352, 384, 416, 448, 0)
  private val SampleRates = Array(44100, 48000, 32000, 0)

  private final class BitReader(b: Array[Byte], var pos: Int, val end: Int) {
    var bit: Int = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) throw new ArrayIndexOutOfBoundsException(pos)
        v = (v << 1) | ((b(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  /** Layer-I header check at offset `o`: sync, MPEG-1, layer '11', legal
    * bitrate/rate fields.
    */
  private def isLayer1Header(b: Array[Byte], o: Int): Boolean =
    o + 4 <= b.length &&
      (b(o) & 0xFF) == 0xFF && (b(o + 1) & 0xF8) == 0xF8 &&       // sync + ID=1 (MPEG-1)
      ((b(o + 1) >> 1) & 0x3) == 3 &&                             // layer I
      ((b(o + 2) >> 4) & 0xF) != 0 && ((b(o + 2) >> 4) & 0xF) != 15 &&
      ((b(o + 2) >> 2) & 0x3) != 3

  /** Decode every Layer-I frame in `bytes` (ID3v2 skipped, first sync
    * found by scan). None when no decodable frame exists.
    */
  def decode(bytes: Array[Byte]): Option[Mp1Data] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      var off = 0
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val sz = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
          ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
        off = 10 + sz
      }
      while (off + 4 <= bytes.length && !isLayer1Header(bytes, off)) off += 1
      if (off + 4 > bytes.length) return None

      val granules = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var sampleRate = 0
      var channels = 0
      var nFrames = 0
      var ok = true
      while (ok && off + 4 <= bytes.length && isLayer1Header(bytes, off)) {
        val protection = bytes(off + 1) & 1
        val bitrate = BitrateKbps((bytes(off + 2) >> 4) & 0xF) * 1000
        val rate = SampleRates((bytes(off + 2) >> 2) & 0x3)
        val padding = (bytes(off + 2) >> 1) & 1
        val mode = (bytes(off + 3) >> 6) & 0x3
        val modeExt = (bytes(off + 3) >> 4) & 0x3
        // joint (intensity) stereo: subbands ≥ this bound carry ONE
        // allocation + ONE sample code, two scalefactors
        val jsBound = if (mode == 1) (modeExt + 1) * 4 else 32
        val frameLen = (12 * bitrate / rate + padding) * 4
        if (frameLen <= 4 || off + frameLen > bytes.length) { ok = false }
        else {
          val ch = if (mode == 3) 1 else 2
          if (nFrames == 0) { sampleRate = rate; channels = ch }
          if (rate != sampleRate || ch != channels) { ok = false } // no mid-stream switches
          else try {
            val dataStart = off + 4 + (if (protection == 0) 2 else 0)
            val r = new BitReader(bytes, dataStart, off + frameLen)
            val alloc = Array.ofDim[Int](32, ch)
            var valid = true
            var sb = 0
            while (valid && sb < 32) {
              if (sb < jsBound) {
                var c = 0
                while (valid && c < ch) {
                  val a = r.read(4)
                  if (a == 15) valid = false else alloc(sb)(c) = a
                  c += 1
                }
              } else {
                val a = r.read(4) // shared: one allocation, both channels
                if (a == 15) valid = false
                else { alloc(sb)(0) = a; alloc(sb)(1) = a }
              }
              sb += 1
            }
            val sf = Array.ofDim[Double](32, ch)
            sb = 0
            while (valid && sb < 32) {
              var c = 0
              while (valid && c < ch) {
                if (alloc(sb)(c) != 0) {
                  val idx = r.read(6)
                  if (idx == 63) valid = false
                  else sf(sb)(c) = 2.0 * math.pow(2.0, -idx / 3.0)
                }
                c += 1
              }
              sb += 1
            }
            if (valid) {
              val frameGranules = Array.fill(12)(new Array[Double](32 * ch))
              var g = 0
              while (g < 12) {
                sb = 0
                while (sb < 32) {
                  if (sb < jsBound) {
                    var c = 0
                    while (c < ch) {
                      val a = alloc(sb)(c)
                      if (a != 0) {
                        val nb = a + 1
                        val code = r.read(nb)
                        val half = 1 << (nb - 1)
                        val v = ((code - half).toDouble / half + 1.0 / half) *
                          ((1 << nb).toDouble / ((1 << nb) - 1)) * sf(sb)(c)
                        frameGranules(g)(sb * ch + c) = v
                      }
                      c += 1
                    }
                  } else {
                    // intensity region: one code, per-channel scalefactors
                    val a = alloc(sb)(0)
                    if (a != 0) {
                      val nb = a + 1
                      val code = r.read(nb)
                      val half = 1 << (nb - 1)
                      val base = ((code - half).toDouble / half + 1.0 / half) *
                        ((1 << nb).toDouble / ((1 << nb) - 1))
                      var c = 0
                      while (c < ch) {
                        frameGranules(g)(sb * ch + c) = base * sf(sb)(c)
                        c += 1
                      }
                    }
                  }
                  sb += 1
                }
                g += 1
              }
              granules ++= frameGranules
              nFrames += 1
              off += frameLen
            } else ok = false
          } catch { case _: ArrayIndexOutOfBoundsException =>
            ok = false // truncated mid-frame: keep the frames already decoded
          }
        }
      }
      if (nFrames == 0) None
      else Some(Mp1Data(sampleRate, channels, nFrames, granules.toArray))
    } catch { case _: Throwable => None }
  }
}
