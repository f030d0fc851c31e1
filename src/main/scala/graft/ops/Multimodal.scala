package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.HashEmbeddingBackend

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side mechanics — schema, batch iteration,
  * partition-local processing, feature vectors — are real and tested.
  * Container/codec HEADER parsing (PNG IHDR, JPEG SOFn, WAV fmt/data) is
  * REAL pure-JVM code ([[HeaderCodec]]); uncompressed PCM WAV gets REAL
  * sample decode + frame-level DSP features ([[PcmCodec]],
  * [[audioFrameFeatures]]); and PNG gets REAL pixel decode — inflate +
  * all five scanline filters, every 8-bit color type — via [[PngCodec]]
  * ([[imagePixelStats]]); JPEG/BMP/GIF pixels decode through the JDK's
  * own `javax.imageio` readers ([[decodeImage]] — part of the JDK, not an
  * external library). Only MP3/video decode remains behind
  * [[StubCodec]]'s deterministic fakes (no JDK codec exists); swap it for
  * a real decoder (e.g. javacv) to productionize — nothing else changes.
  *
  * Scale notes: media bytes never leave their partition (mapPartitions, no
  * shuffle); metadata extraction is projection-shaped; feature vectors are
  * small so downstream similarity ops shuffle features, not media.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),      // images; null for audio
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),   // audio sample frames; 1 for stills
    StructField("sample_rate", IntegerType), // audio; null for images
    StructField("channels", IntegerType)))

  /** ======= REAL header parsing (no external libs) =======
    * Best-effort: the format is sniffed from magic bytes; fields that can't
    * be parsed out of a truncated/malformed header stay null rather than
    * failing the row (a 100 TB media crawl always contains garbage).
    */
  object HeaderCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') "wav"
      else "bin"

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

    /** PNG: 8-byte signature, then the IHDR chunk (must be first): 4-byte
      * length, "IHDR", width/height as big-endian u32 (PNG spec §11.2.2).
      */
    private def png(b: Array[Byte]): Row =
      if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Row("png", be32(b, 16), be32(b, 20), 1, null, null)
      else Row("png", null, null, null, null, null)

    /** JPEG: walk the marker segments from offset 2; any SOFn
      * (C0-CF except C4/C8/CC) carries precision(1), height(2), width(2)
      * big-endian after the 2-byte segment length (ITU T.81 §B.2.2).
      */
    private def jpeg(b: Array[Byte]): Row = {
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xFF) == 0xFF) {
        val m = b(i + 1) & 0xFF
        if (m == 0xFF) i += 1                      // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2 // stand-alone
        else {
          val len = be16(b, i + 2)
          if (len < 2) return Row("jpeg", null, null, null, null, null)
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof && i + 9 < b.length)
            return Row("jpeg", be16(b, i + 7), be16(b, i + 5), 1, null, null)
          i += 2 + len
        }
      }
      Row("jpeg", null, null, null, null, null)
    }

    /** WAV: RIFF/WAVE container; "fmt " chunk carries channels (u16 LE) and
      * sample rate (u32 LE), block align at +12; "data" chunk size /
      * blockAlign = sample-frame count (RIFF WAVE spec).
      */
    private def wav(b: Array[Byte]): Row = {
      if (b.length < 12 || !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
        return Row("wav", null, null, null, null, null)
      var channels: Any = null; var rate: Any = null; var frames: Any = null
      var blockAlign = 0
      // Chunk sizes are UNSIGNED u32 and attacker-controlled: walk with Long
      // offsets so a size near 2^32 ends the walk (offset past length)
      // instead of wrapping Int-negative and re-entering the loop at a
      // garbage offset (out-of-bounds throw on hostile input).
      var i = 12L
      while (i + 8 <= b.length) {
        val o = i.toInt
        val id = new String(b, o, 4, "US-ASCII")
        val size = le32(b, o + 4).toLong & 0xFFFFFFFFL
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          channels = le16(b, o + 10)
          rate = le32(b, o + 12)
          blockAlign = le16(b, o + 20)
        } else if (id == "data" && blockAlign > 0) {
          frames = math.min(size / blockAlign, Int.MaxValue.toLong).toInt // header-declared count
        }
        i += 8 + size + (size & 1L) // chunks are word-aligned
      }
      Row("wav", null, null, frames, rate, channels)
    }

    def decodeMeta(bytes: Array[Byte]): Row = sniffFormat(bytes) match {
      case "png"  => png(bytes)
      case "jpeg" => jpeg(bytes)
      case "wav"  => wav(bytes)
      case f      => Row(f, null, null, null, null, null)
    }
  }

  /** ======= REAL PCM audio decode (no external libs) =======
    * Uncompressed WAV (format code 1, 8/16-bit PCM) is fully specified by
    * the RIFF header — decode and frame-level feature extraction here are
    * REAL signal processing, not a stub: only compressed codecs (MP3/AAC/
    * video) remain behind [[StubCodec]].
    */
  object PcmCodec {
    final case class Pcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
                         samples: Array[Float]) // interleaved, normalized [-1, 1]

    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

    /** None for anything that is not an uncompressed PCM WAV. */
    def decode(b: Array[Byte]): Option[Pcm] = {
      if (b.length < 12 || HeaderCodec.sniffFormat(b) != "wav" ||
          !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      var fmt = 0; var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      // Long offsets + unsigned u32 sizes: a hostile declared size walks the
      // offset past the buffer and exits cleanly instead of wrapping Int-
      // negative and indexing out of bounds (decode contract: garbage → None,
      // never a thrown executor error).
      var i = 12L
      while (i + 8 <= b.length) {
        val o = i.toInt
        val id = new String(b, o, 4, "US-ASCII")
        val size = le32(b, o + 4).toLong & 0xFFFFFFFFL
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          fmt = le16(b, o + 8); channels = le16(b, o + 10)
          rate = le32(b, o + 12); bits = le16(b, o + 22)
        } else if (id == "data") {
          dataOff = o + 8; dataLen = math.min(size, (b.length - dataOff).toLong).toInt
        }
        i += 8 + size + (size & 1L)
      }
      if (fmt != 1 || channels <= 0 || dataOff < 0 || (bits != 8 && bits != 16)) None
      else {
        val n = if (bits == 16) dataLen / 2 else dataLen
        val out = new Array[Float](n)
        var j = 0
        while (j < n) {
          out(j) =
            if (bits == 16) (le16(b, dataOff + j * 2).toShort).toFloat / 32768f
            else ((b(dataOff + j) & 0xFF) - 128).toFloat / 128f
          j += 1
        }
        Some(Pcm(channels, rate, bits, out))
      }
    }

    /** Per-frame features over `frameSize` sample-frame windows (channel-
      * interleaved input; mono-mixed first): RMS energy, zero-crossing
      * rate, peak amplitude — the classic cheap audio descriptors.
      */
    def frameFeatures(p: Pcm, frameSize: Int): Seq[(Int, Float, Float, Float)] = {
      val mono: Array[Float] =
        if (p.channels == 1) p.samples
        else {
          val n = p.samples.length / p.channels
          Array.tabulate(n) { i =>
            var s = 0f; var c = 0
            while (c < p.channels) { s += p.samples(i * p.channels + c); c += 1 }
            s / p.channels
          }
        }
      mono.grouped(frameSize).zipWithIndex.map { case (w, fi) =>
        var sumSq = 0.0; var zc = 0; var peak = 0f
        var i = 0
        while (i < w.length) {
          val x = w(i)
          sumSq += x.toDouble * x.toDouble
          if (math.abs(x) > peak) peak = math.abs(x)
          if (i > 0 && ((w(i - 1) >= 0) != (x >= 0))) zc += 1
          i += 1
        }
        (fi, math.sqrt(sumSq / math.max(1, w.length)).toFloat,
          if (w.length > 1) zc.toFloat / (w.length - 1) else 0f, peak)
      }.toSeq
    }
  }

  /** ======= STUB: deterministic fake decode =======
    * A real implementation would decode pixels/samples. The fake derives
    * frame bytes deterministically from the input so tests are stable.
    */
  object StubCodec {
    def sniffFormat(bytes: Array[Byte]): String = HeaderCodec.sniffFormat(bytes)
    /** "Decode" a frame: deterministic byte slice standing in for pixels. */
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
      val nFrames = 1 + bytes.length % 32
      (0 until nFrames by everyN).map { f =>
        val start = (f * 7) % math.max(1, bytes.length)
        bytes.slice(start, math.min(bytes.length, start + 64))
      }
    }
  }

  /** Extract typed metadata from a binary media column by REAL header
    * parsing ([[HeaderCodec]]). Partition-local; batch-shaped like a
    * Pandas-UDF `mapInPandas` (iterator of batches in, iterator out) but in
    * JVM-native form.
    */
  def extractMeta(df: DataFrame, binaryCol: String = "media"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", mediaMetaSchema))
    val idx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // per-row Try: one hostile header must not fail the whole scan —
        // fall back to format sniff (bounds-safe) with null fields
        val meta =
          if (bytes == null) null
          else scala.util.Try(HeaderCodec.decodeMeta(bytes)).getOrElse(
            Row(HeaderCodec.sniffFormat(bytes), null, null, null, null, null))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Frame sampling for "video" bytes: one output row per sampled frame.
    * Media expansion happens within the partition; only (id, frame_index,
    * frame feature) rows flow on.
    */
  def sampleFrames(df: DataFrame, idCol: String, binaryCol: String = "media",
                   everyN: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_index", IntegerType),
      StructField("frame", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else StubCodec.sampleFrames(bytes, everyN).zipWithIndex.iterator.map {
          case (frame, i) => Row(r.get(idIdx), i, frame)
        }
      }
    }
  }

  /** Feature extraction stub: embed the media bytes' hex digest with the
    * deterministic hash embedder — a stand-in for a CLIP-style encoder with
    * the same shape (binary → fixed-dim float vector, batched per partition).
    */
  def extractFeatures(df: DataFrame, binaryCol: String = "media", dims: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(binaryCol)
    val backend = HashEmbeddingBackend(dims)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch =>
        val texts = batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          if (bytes == null) "" else java.util.Base64.getEncoder.encodeToString(bytes)
        }
        val vecs = backend.embedBatch(texts)
        batch.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }
  }

  /** REAL audio feature extraction over PCM WAV bytes: one row per analysis
    * frame with (rms, zero-crossing rate, peak). Decode and DSP happen
    * inside the partition; only small (id, frame, 3-float) rows flow on —
    * the audio bytes never cross a shuffle. Non-PCM rows yield no frames
    * (a 100 TB crawl mixes codecs; unsupported ones are someone else's
    * decoder, surfaced by [[extractMeta]]'s format column).
    */
  def audioFrameFeatures(df: DataFrame, idCol: String, binaryCol: String = "media",
                         frameSize: Int = 1024): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_index", IntegerType),
      StructField("rms", FloatType),
      StructField("zcr", FloatType),
      StructField("peak", FloatType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        // per-row Try: a corrupt container yields no frames, not a job failure
        else scala.util.Try(PcmCodec.decode(bytes)).toOption.flatten.iterator.flatMap { pcm =>
          PcmCodec.frameFeatures(pcm, frameSize).iterator.map {
            case (fi, rms, zcr, peak) => Row(r.get(idIdx), fi, rms, zcr, peak)
          }
        }
      }
    }
  }

  /** Full image decode for the formats closable WITHOUT external
    * dependencies: PNG through [[PngCodec]] (our own inflate + unfilter —
    * deterministic, oracle-gated), everything else through the JDK's own
    * `javax.imageio` readers (REAL baseline JPEG/BMP/GIF decode — ImageIO
    * is part of the JDK, not an external library). Only video/MP3 remain
    * stubbed. Returns 8-bit channel-interleaved samples.
    */
  def decodeImage(bytes: Array[Byte]): Option[PngCodec.Image] =
    PngCodec.decode(bytes).orElse(scala.util.Try {
      val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (decoded == null) None
      else {
        // indexed rasters (GIF, indexed BMP) carry palette INDICES in their
        // bands, and >8-bit samples would truncate — convert through the
        // color model to true 8-bit RGB first so stats are pixel VALUES
        val needsConvert =
          decoded.getColorModel.isInstanceOf[java.awt.image.IndexColorModel] ||
            decoded.getColorModel.getComponentSize.exists(_ > 8)
        val img = if (!needsConvert) decoded else {
          val conv = new java.awt.image.BufferedImage(
            decoded.getWidth, decoded.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = conv.createGraphics()
          try g.drawImage(decoded, 0, 0, null) finally g.dispose()
          conv
        }
        val raster = img.getRaster
        val ch = raster.getNumBands
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](w * h * ch)
        val buf = new Array[Int](ch)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.getPixel(x, y, buf)
            var c = 0
            while (c < ch) { out((y * w + x) * ch + c) = (buf(c) & 0xFF).toByte; c += 1 }
            x += 1
          }
          y += 1
        }
        Some(PngCodec.Image(w, h, ch, out))
      }
    }.toOption.flatten)

  /** REAL image pixel statistics ([[decodeImage]]: own PNG codec, JDK
    * ImageIO for JPEG/BMP/GIF): per image the decoded dimensions, channel
    * count, and pixel-value aggregates over every 8-bit sample. Decode
    * happens inside the partition; only the small stats row flows on (the
    * 100 TB discipline: media bytes never cross a shuffle). Unsupported /
    * corrupt rows yield nothing, like [[audioFrameFeatures]].
    */
  def imagePixelStats(df: DataFrame, idCol: String, binaryCol: String = "media"): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("channels", LongType),
      StructField("n_px", LongType),
      StructField("px_sum", LongType),
      StructField("px_min", LongType),
      StructField("px_max", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else decodeImage(bytes).iterator.map { img =>
          var sum = 0L; var mn = 255L; var mx = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = (img.pixels(i) & 0xFF).toLong
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Row(r.get(idIdx), img.width.toLong, img.height.toLong, img.channels.toLong,
            (img.pixels.length / img.channels).toLong, sum, mn, mx)
        }
      }
    }
  }

  /** Column-only metadata over binary media (no decode): byte size + digest.
    * Fully codegen'd, SQL-expressible — this is what a catalog scan over
    * 100 TB of media would run (no bytes ever decoded).
    */
  def mediaStats(df: DataFrame, idCol: String, binaryCol: String = "media"): DataFrame =
    df.select(col(idCol),
      length(col(binaryCol)).cast("long").as("n_bytes"),
      md5(col(binaryCol)).as("digest"),
      (lit(16) + length(col(binaryCol)) % 640).cast("int").as("fake_width"),
      (lit(16) + (length(col(binaryCol)) / lit(640)).cast("long") % 480).cast("int").as("fake_height"))
}
