package graft.ops

/** Scoped MPEG-1 Audio **Layer II** subband decoder (ISO/IEC 11172-3) —
  * closes the widest media-dedup gap left after [[Mp1Codec]]: Layer II is
  * the broadcast/DAB/VCD audio layer, and its frame format is the template
  * Layer III extends. Same design discipline as the Layer-I decoder:
  *
  *  - frame walk: 32-bit header (layer bits '10') → frame length
  *    144·bitrate/rate + padding bytes;
  *  - bit-exact payload parse: per-(subband, channel) allocation codes
  *    (2–4 bits, width set by the subband's row), 2-bit scfsi per
  *    allocated subband, 6-bit scalefactor indices per scfsi pattern,
  *    then 12 triplet-granules × subbands × channels of sample codes —
  *    GROUPED classes (3/5/9 levels) read one base-n code carrying three
  *    samples, the rest read three codes;
  *  - requantization is ANALYTIC: ISO's per-class (C, D) pairs reduce
  *    exactly to v = (2·c − n + 1)/n · sf for every Layer-II class
  *    (n = nlevels; the same closed form the Layer-I path uses with
  *    n = 2^nb − 1), sf = 2·2^(−idx/3) — no empirical requantization
  *    constants anywhere;
  *  - the ONLY tabular content is the B.2 allocation-table STRUCTURE
  *    (which quantization class each (table row, allocation code) selects,
  *    and which of the four tables a (bitrate/channel, rate) combination
  *    uses). That is bitstream FORMAT — without it a frame cannot even be
  *    parsed — the same standing as the bitrate/sample-rate header enums,
  *    not an empirical approximation;
  *  - NO synthesis filterbank, deliberately (see Mp1Codec's rationale):
  *    dequantized subband samples are the standard-defined signal one
  *    stage earlier, and per-slice subband energy ≈ the energy of the 32
  *    PCM samples that slice synthesizes — the quantity the envelope
  *    fingerprint consumes. Layer III (Huffman + IMDCT) remains out of
  *    scope; its headers/VBR metadata parse via Multimodal.HeaderCodec.
  *
  * Robustness contract (PcmCodec/PngCodec/Mp1Codec): malformed, hostile or
  * truncated input yields `None`, never a throw. Mono, stereo,
  * dual-channel AND joint stereo decode: joint (intensity) mode shares
  * one allocation + one sample stream per subband at and above bound =
  * 4·(mode_extension+1) (capped at sblimit), reconstructing each channel
  * with its OWN scalefactors incl. scfsi thirds (ISO §2.4.1.6/2.4.2.6) —
  * gated by q_mp2_js_decode's per-channel envelope.
  */
object Mp2Codec {

  /** All frames' dequantized subband samples, time-slice-major: 36 slices
    * per frame (12 triplet-granules × 3),
    * `samples(frame * 36 + slice)(sb * channels + ch)`.
    */
  final case class Mp2Data(sampleRate: Int, channels: Int, nFrames: Int,
                           granules: Array[Array[Double]])

  private val BitrateKbps = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160,
    192, 224, 256, 320, 384, 0)
  private val SampleRates = Array(44100, 48000, 32000, 0)

  // Layer-II quantization classes: levels / grouped / code bits (total
  // bits of the one grouped code, or bits PER SAMPLE when ungrouped).
  private val ClassLevels = Array(3, 5, 7, 9, 15, 31, 63, 127, 255, 511,
    1023, 2047, 4095, 8191, 16383, 32767, 65535)
  private val ClassGrouped = Array(true, true, false, true, false, false,
    false, false, false, false, false, false, false, false, false, false, false)
  private val ClassBits = Array(5, 7, 3, 10, 4, 5, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16)

  // Allocation rows (ISO Table B.2): allocation code → class index
  // (slot 0 = "no allocation"). Row identity is per subband range.
  private val RowA = Array(-1, 0, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16) // B.2a/b sb 0–2, nbal 4
  private val RowB = Array(-1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 16)   // B.2a/b sb 3–10, nbal 4
  private val RowC = Array(-1, 0, 1, 2, 3, 4, 5, 16)                               // B.2a/b sb 11–22, nbal 3
  private val RowD = Array(-1, 0, 1, 16)                                           // B.2a/b sb 23+, nbal 2
  private val RowE = Array(-1, 0, 1, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)  // B.2c/d sb 0–1, nbal 4
  private val RowF = Array(-1, 0, 1, 3, 4, 5, 6, 7)                                // B.2c/d sb 2+, nbal 3

  /** (sblimit, per-subband (nbal, row)) for a (bitrate, channels, rate)
    * combination — ISO's table-selection rule: ≤48 kbps/ch uses the
    * low-rate tables (B.2d at 32 kHz, else B.2c), ≤80 uses B.2a, above
    * that B.2a at 48 kHz and B.2b otherwise.
    */
  private[ops] def allocTable(bitrateKbps: Int, channels: Int,
                              rate: Int): (Int, Array[(Int, Array[Int])]) = {
    def ab(sblimit: Int) = (sblimit, Array.tabulate(sblimit) { sb =>
      if (sb < 3) (4, RowA) else if (sb < 11) (4, RowB)
      else if (sb < 23) (3, RowC) else (2, RowD)
    })
    def cd(sblimit: Int) = (sblimit, Array.tabulate(sblimit) { sb =>
      if (sb < 2) (4, RowE) else (3, RowF)
    })
    val per = bitrateKbps / channels
    if (per <= 48) { if (rate == 32000) cd(12) else cd(8) }
    else if (per <= 80) ab(27)
    else if (rate == 48000) ab(27)
    else ab(30)
  }

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

  /** Layer-II header check at offset `o`: sync, MPEG-1, layer '10', legal
    * bitrate/rate fields.
    */
  private def isLayer2Header(b: Array[Byte], o: Int): Boolean =
    o + 4 <= b.length &&
      (b(o) & 0xFF) == 0xFF && (b(o + 1) & 0xF8) == 0xF8 &&       // sync + ID=1 (MPEG-1)
      ((b(o + 1) >> 1) & 0x3) == 2 &&                             // layer II
      ((b(o + 2) >> 4) & 0xF) != 0 && ((b(o + 2) >> 4) & 0xF) != 15 &&
      ((b(o + 2) >> 2) & 0x3) != 3

  /** Decode every Layer-II frame in `bytes` (ID3v2 skipped, first sync
    * found by scan). None when no decodable frame exists.
    */
  def decode(bytes: Array[Byte]): Option[Mp2Data] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      var off = 0
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val sz = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
          ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
        off = 10 + sz
      }
      while (off + 4 <= bytes.length && !isLayer2Header(bytes, off)) off += 1
      if (off + 4 > bytes.length) return None

      val granules = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var sampleRate = 0
      var channels = 0
      var nFrames = 0
      var ok = true
      while (ok && off + 4 <= bytes.length && isLayer2Header(bytes, off)) {
        val protection = bytes(off + 1) & 1
        val brKbps = BitrateKbps((bytes(off + 2) >> 4) & 0xF)
        val rate = SampleRates((bytes(off + 2) >> 2) & 0x3)
        val padding = (bytes(off + 2) >> 1) & 1
        val mode = (bytes(off + 3) >> 6) & 0x3
        val modeExt = (bytes(off + 3) >> 4) & 0x3
        val frameLen = 144 * (brKbps * 1000) / rate + padding
        if (frameLen <= 4 || off + frameLen > bytes.length) { ok = false }
        else {
          val ch = if (mode == 3) 1 else 2
          if (nFrames == 0) { sampleRate = rate; channels = ch }
          if (rate != sampleRate || ch != channels) { ok = false } // no mid-stream switches
          else try {
            val dataStart = off + 4 + (if (protection == 0) 2 else 0)
            val r = new BitReader(bytes, dataStart, off + frameLen)
            val (sblimit, table) = allocTable(brKbps, ch, rate)
            // joint (intensity) stereo: subbands >= this bound carry ONE
            // allocation + ONE sample stream, per-channel scalefactors
            // (ISO 11172-3 sections 2.4.1.6, 2.4.2.6)
            val jsBound =
              if (mode == 1) math.min(4 * (modeExt + 1), sblimit) else sblimit
            val cls = Array.fill(32, ch)(-1)
            var sb = 0
            while (sb < sblimit) {
              val (nbal, row) = table(sb)
              if (sb < jsBound) {
                var c = 0
                while (c < ch) {
                  cls(sb)(c) = row(r.read(nbal))
                  c += 1
                }
              } else {
                val k = row(r.read(nbal)) // shared: both channels
                cls(sb)(0) = k
                cls(sb)(1) = k
              }
              sb += 1
            }
            val scfsi = Array.ofDim[Int](32, ch)
            sb = 0
            while (sb < sblimit) {
              var c = 0
              while (c < ch) {
                if (cls(sb)(c) >= 0) scfsi(sb)(c) = r.read(2)
                c += 1
              }
              sb += 1
            }
            // scalefactors per third of the frame (12 slices each); scfsi
            // encodes which thirds share an index (ISO §2.4.2.6)
            val sf = Array.ofDim[Double](32, ch, 3)
            var valid = true
            def sfOf(idx: Int): Double = {
              if (idx == 63) valid = false
              2.0 * math.pow(2.0, -idx / 3.0)
            }
            sb = 0
            while (valid && sb < sblimit) {
              var c = 0
              while (valid && c < ch) {
                if (cls(sb)(c) >= 0) scfsi(sb)(c) match {
                  case 0 =>
                    sf(sb)(c)(0) = sfOf(r.read(6)); sf(sb)(c)(1) = sfOf(r.read(6))
                    sf(sb)(c)(2) = sfOf(r.read(6))
                  case 1 =>
                    val a = sfOf(r.read(6)); sf(sb)(c)(0) = a; sf(sb)(c)(1) = a
                    sf(sb)(c)(2) = sfOf(r.read(6))
                  case 2 =>
                    val a = sfOf(r.read(6))
                    sf(sb)(c)(0) = a; sf(sb)(c)(1) = a; sf(sb)(c)(2) = a
                  case _ =>
                    sf(sb)(c)(0) = sfOf(r.read(6))
                    val b2 = sfOf(r.read(6)); sf(sb)(c)(1) = b2; sf(sb)(c)(2) = b2
                }
                c += 1
              }
              sb += 1
            }
            if (valid) {
              val frameSlices = Array.fill(36)(new Array[Double](32 * ch))
              var g = 0
              while (g < 12) {
                val part = g >> 2
                sb = 0
                while (sb < sblimit) {
                  val chEnd = if (sb < jsBound) ch else 1
                  var c = 0
                  while (c < chEnd) {
                    val k = cls(sb)(c)
                    if (k >= 0) {
                      val n = ClassLevels(k)
                      // intensity region: one sample stream reconstructs
                      // BOTH channels, each with its own scalefactor
                      val joint = sb >= jsBound && ch == 2
                      if (ClassGrouped(k)) {
                        var code = r.read(ClassBits(k))
                        var s = 0
                        while (s < 3) {
                          val ci = code % n
                          code /= n
                          val base = (2 * ci - n + 1).toDouble / n
                          frameSlices(g * 3 + s)(sb * ch + c) = base * sf(sb)(c)(part)
                          if (joint)
                            frameSlices(g * 3 + s)(sb * ch + 1) = base * sf(sb)(1)(part)
                          s += 1
                        }
                      } else {
                        var s = 0
                        while (s < 3) {
                          val ci = r.read(ClassBits(k))
                          val base = (2 * ci - n + 1).toDouble / n
                          frameSlices(g * 3 + s)(sb * ch + c) = base * sf(sb)(c)(part)
                          if (joint)
                            frameSlices(g * 3 + s)(sb * ch + 1) = base * sf(sb)(1)(part)
                          s += 1
                        }
                      }
                    }
                    c += 1
                  }
                  sb += 1
                }
                g += 1
              }
              granules ++= frameSlices
              nFrames += 1
              off += frameLen
            } else ok = false
          } catch { case _: ArrayIndexOutOfBoundsException =>
            ok = false // truncated mid-frame: keep the frames already decoded
          }
        }
      }
      if (nFrames == 0) None
      else Some(Mp2Data(sampleRate, channels, nFrames, granules.toArray))
    } catch { case _: Throwable => None }
  }
}
