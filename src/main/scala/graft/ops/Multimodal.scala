package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.HashEmbeddingBackend

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side mechanics — schema, batch iteration,
  * partition-local processing, feature vectors — are real and tested; the
  * actual codec calls are STUBBED with deterministic fakes (the image/audio
  * libraries are not available in this environment). Swap
  * [[StubCodec]] for a real decoder (e.g. javacv / TwelveMonkeys) to
  * productionize; nothing else changes.
  *
  * Scale notes: media bytes never leave their partition (mapPartitions, no
  * shuffle); metadata extraction is projection-shaped; feature vectors are
  * small so downstream similarity ops shuffle features, not media.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** ======= STUB: deterministic fake codec =======
    * A real implementation would parse the container/codec headers and
    * decode frames. The fake derives all values deterministically from the
    * bytes so tests are stable.
    */
  object StubCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') "wav"
      else "bin"
    def decodeMeta(bytes: Array[Byte]): Row = {
      val n = bytes.length
      Row(sniffFormat(bytes), 16 + n % 640, 16 + (n / 640) % 480, 1 + n % 32)
    }
    /** "Decode" a frame: deterministic byte slice standing in for pixels. */
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
      val nFrames = 1 + bytes.length % 32
      (0 until nFrames by everyN).map { f =>
        val start = (f * 7) % math.max(1, bytes.length)
        bytes.slice(start, math.min(bytes.length, start + 64))
      }
    }
  }

  /** Extract typed metadata from a binary media column. Partition-local;
    * batch-shaped like a Pandas-UDF `mapInPandas` (iterator of batches in,
    * iterator out) but in JVM-native form.
    */
  def extractMeta(df: DataFrame, binaryCol: String = "media"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", mediaMetaSchema))
    val idx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else StubCodec.decodeMeta(bytes)))
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
