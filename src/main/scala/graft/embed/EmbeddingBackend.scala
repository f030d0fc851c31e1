package graft.embed

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** Pluggable embedding backend — Spark re-expression of the reference's
  * BaseEmbeddingBackend (ai_utils/backends/base.py:216-229). The contract is
  * BATCHED: one call embeds a whole batch of texts (the reference batches 100
  * objects per API call, storage/django.py:390-402; litellm backend
  * ai_utils/backends/litellm.py:175-186). On Spark the batching happens
  * per-partition inside [[EmbedStage.embed]] — external calls are
  * partition-local, never per-row.
  */
trait EmbeddingBackend extends Serializable {
  def dims: Int
  def tokenLimit: Int
  /** Embed a batch of texts; must return one vector per input, in order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  final def embedOne(text: String): Array[Float] = {
    if (text == null || text.isEmpty)
      throw new IllegalArgumentException("No embeddings were generated for the given query.")
    embedBatch(Seq(text)).head
  }
}

/** Deterministic feature-hash embedder (the dev/test backend).
  *
  * The reference's echo backend returns RANDOM vectors
  * (ai_utils/backends/echo.py:106-110) which is not reproducible; its own
  * tests dodge this with content-keyed fakes (tests/test_index.py:18-26).
  * We instead hash ASCII word tokens into `dims` buckets with a signed
  * MD5-derived weight and L2-normalize — deterministic across JVMs/engines,
  * so correctness harnesses can re-derive it.
  */
final case class HashEmbeddingBackend(dims: Int = 64, tokenLimit: Int = 8191)
    extends EmbeddingBackend {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)

  private def embed(text: String): Array[Float] = {
    val v = new Array[Float](dims)
    if (text == null) return v
    val md = MessageDigest.getInstance("MD5")
    val tokens = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    for (t <- tokens) {
      val h = md.digest(t.getBytes(StandardCharsets.UTF_8))
      md.reset()
      // bucket from first 4 bytes, sign from byte 4
      val bucket = math.floorMod(
        ((h(0) & 0xff) << 24) | ((h(1) & 0xff) << 16) | ((h(2) & 0xff) << 8) | (h(3) & 0xff),
        dims)
      val sign = if ((h(4) & 1) == 0) 1.0f else -1.0f
      v(bucket) += sign
    }
    var n = 0.0
    var i = 0
    while (i < dims) { n += v(i).toDouble * v(i).toDouble; i += 1 }
    if (n > 0) {
      val inv = (1.0 / math.sqrt(n)).toFloat
      i = 0
      while (i < dims) { v(i) *= inv; i += 1 }
    }
    v
  }
}

/** Constant-vector mock (reference tests/conftest.py:33-42: every text maps to
  * the same small vector — makes end-to-end counts assertable).
  */
final case class ConstantEmbeddingBackend(vectorValues: Seq[Float], tokenLimit: Int = 1024)
    extends EmbeddingBackend {
  override def dims: Int = vectorValues.length
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(_ => vectorValues.toArray)
}

/** Chat backend surface for the RAG query path (reference
  * BaseChatBackend, ai_utils/backends/base.py:169-213). Driver-side only.
  */
final case class ChatMessage(role: String, content: String)

trait ChatBackend extends Serializable {
  def chat(messages: Seq[ChatMessage]): String
  /** Streaming variant (R4): yield the response incrementally — the analog
    * of the reference's `achat(stream=True)` chunk iterator
    * (ai_utils/backends/base.py:169-213; consumed by aquery,
    * storage/base.py:267-276). Default: the whole response as one chunk.
    */
  def chatStream(messages: Seq[ChatMessage]): Iterator[String] =
    Iterator.single(chat(messages))
}

/** Echo chat backend (reference ai_utils/backends/echo.py:88-94 prepends
  * "This is an echo backend:"; test mock returns a fixed string,
  * tests/conftest.py:56-67). Streams one chunk per message part, like the
  * reference echo backend's chunk-wise streaming.
  */
final case class EchoChatBackend() extends ChatBackend {
  private def parts(messages: Seq[ChatMessage]): Seq[String] =
    Seq("This is an echo backend:") ++ messages.map(_.content)
  override def chat(messages: Seq[ChatMessage]): String = parts(messages).mkString(" ")
  override def chatStream(messages: Seq[ChatMessage]): Iterator[String] = {
    val p = parts(messages)
    p.zipWithIndex.map { case (s, i) => if (i == 0) s else " " + s }.iterator
  }
}

final case class FixedChatBackend(response: String = "AI! Don't talk to me about AI!")
    extends ChatBackend {
  override def chat(messages: Seq[ChatMessage]): String = response
}

/** The distributed embedding stage: batched, partition-local backend calls. */
object EmbedStage {
  /** Append a `vector array<float>` column by embedding `textCol`, calling the
    * backend once per `batchSize` texts within each partition (preserves the
    * reference's batching economics — 100 objects/call,
    * storage/django.py:390-402 — while parallelizing across executors).
    *
    * Implemented with mapPartitions on Rows (not a per-row UDF) so one backend
    * round-trip covers a whole batch.
    */
  def embed(df: DataFrame, textCol: String, backend: EmbeddingBackend,
            batchSize: Int = 100, outputCol: String = "vector"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, ArrayType(FloatType, containsNull = false), nullable = true))
    val textIdx = df.schema.fieldIndex(textCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => Option(r.getString(textIdx)).getOrElse(""))
        val vectors = backend.embedBatch(texts)
        batch.lazyZip(vectors).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }
  }
}
