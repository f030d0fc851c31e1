package graft.ops

/** Scoped AVI (RIFF) video decoder for UNCOMPRESSED DIB and MJPEG
  * frames — the real video-pixel path behind frame sampling and video
  * dedup. Like the other from-scratch codecs here (PngCodec,
  * Mp1Codec/Mp2Codec, the WARC reader), everything is container FORMAT
  * parsing plus deterministic pixel math:
  *
  *  - RIFF walk: 'RIFF' size 'AVI ', LIST hdrl (avih; LIST strl → strh /
  *    strf), LIST movi with '##db'/'##dc' frame chunks (all sizes
  *    little-endian, chunks padded to even offsets);
  *  - stream checks: first 'vids' stream must be BI_RGB (biCompression 0)
  *    at 24 bits/pixel — the uncompressed-DIB profile — or 'MJPG', whose
  *    frame chunks are standalone baseline JPEGs decoded by [[JpegCodec]]
  *    (Annex K default Huffman tables cover the customary omitted DHT).
  *    Other codecs (cinepak, h26x…) are a documented descope: those need
  *    empirical inter-frame decoders, and this decoder returns None for
  *    them rather than guessing;
  *  - frame data: bottom-up BGR rows padded to 4-byte stride, converted
  *    to the engine-wide top-down RGB [[PngCodec.Image]] shape so every
  *    downstream image op (dhash64, pixel stats) applies to video frames
  *    unchanged.
  *
  * Robustness contract (PcmCodec/PngCodec/Mp1Codec/Mp2Codec): malformed,
  * hostile or truncated input yields `None`, never a throw; a truncated
  * movi list keeps the frames already decoded.
  */
object AviCodec {

  /** Decoded video: header dimensions + frame timing, frames as top-down
    * RGB images (all frames share width/height by the DIB profile).
    */
  final case class AviData(width: Int, height: Int, microSecPerFrame: Long,
                           frames: Array[PngCodec.Image])

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL)) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def fourcc(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""

  /** biCompression value of the 'MJPG' fourcc (little-endian). */
  private val MJPG: Long = 'M'.toLong | ('J'.toLong << 8) | ('P'.toLong << 16) | ('G'.toLong << 24)

  def decode(bytes: Array[Byte]): Option[AviData] = {
    try {
      if (bytes == null || bytes.length < 24) return None
      if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
      var microSec = 0L
      var width = 0
      var height = 0
      var bitCount = 0
      var compression = -1L
      var videoStreamSeen = false
      val frames = scala.collection.mutable.ArrayBuffer.empty[PngCodec.Image]

      def parseFrame(off: Int, size: Int): Unit = {
        if (compression == MJPG) {
          // MJPEG frame: the chunk IS a baseline JPEG ([[JpegCodec]] —
          // Annex K default tables cover the customary omitted DHT).
          // Frame dims come from the JPEG itself; a corrupt frame is
          // skipped, keeping the frames already decoded.
          JpegCodec.decode(java.util.Arrays.copyOfRange(bytes, off, off + size))
            .foreach(frames += _)
          return
        }
        if (width <= 0 || height <= 0 || bitCount != 24) return
        val stride = ((width * 3 + 3) / 4) * 4
        if (size < stride * height || off + stride * height > bytes.length) return
        val px = new Array[Byte](width * height * 3)
        var y = 0
        while (y < height) {
          val srcRow = off + (height - 1 - y) * stride // bottom-up rows
          var x = 0
          while (x < width) {
            val s = srcRow + x * 3 // BGR
            val d = (y * width + x) * 3
            px(d) = bytes(s + 2)     // R
            px(d + 1) = bytes(s + 1) // G
            px(d + 2) = bytes(s)     // B
            x += 1
          }
          y += 1
        }
        frames += PngCodec.Image(width, height, 3, px)
      }

      /** Walk the chunks in [start, end): LISTs recurse, known leaf chunks
        * update state. Truncated tails end the walk quietly.
        */
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end && p + 8 <= bytes.length) {
          val id = fourcc(bytes, p)
          val size = le32(bytes, p + 4)
          if (size < 0 || size > Int.MaxValue) return
          val sz = size.toInt
          val dataStart = p + 8
          val dataEnd = math.min(math.min(dataStart + sz, end), bytes.length)
          id match {
            case "LIST" =>
              // list type occupies the first 4 data bytes; children follow
              if (dataStart + 4 <= dataEnd) walk(dataStart + 4, dataEnd)
            case "avih" =>
              if (dataStart + 40 <= dataEnd) {
                microSec = le32(bytes, dataStart)
                width = le32(bytes, dataStart + 32).toInt
                height = le32(bytes, dataStart + 36).toInt
              }
            case "strh" =>
              if (dataStart + 8 <= dataEnd && fourcc(bytes, dataStart) == "vids")
                videoStreamSeen = true
            case "strf" =>
              // first video stream's BITMAPINFOHEADER wins
              if (videoStreamSeen && compression == -1L && dataStart + 20 <= dataEnd) {
                val biW = le32(bytes, dataStart + 4).toInt
                val biH = le32(bytes, dataStart + 8).toInt
                if (biW > 0) width = biW
                if (biH > 0) height = biH
                bitCount = le16(bytes, dataStart + 14)
                compression = le32(bytes, dataStart + 16)
              }
            case other =>
              // frame chunks: '##db' (uncompressed DIB) / '##dc' with
              // BI_RGB or MJPG — other codecs (cinepak, h26x…) are the
              // documented descope
              val kind = other.drop(2)
              if ((kind == "db" || kind == "dc") &&
                (compression == 0L || compression == MJPG))
                parseFrame(dataStart, dataEnd - dataStart)
          }
          p = dataStart + sz + (sz & 1) // chunks pad to even
        }
      }

      walk(12, bytes.length)
      if (frames.isEmpty || (compression != 0L && compression != MJPG)) None
      else Some(AviData(width, height, microSec, frames.toArray))
    } catch { case _: Throwable => None }
  }
}
