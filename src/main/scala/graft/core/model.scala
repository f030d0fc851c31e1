package graft.core

import org.apache.spark.sql.types._

/** Core data model — Spark-native re-expression of the reference's Document
  * abstraction (wagtail-vector-index storage/models.py:34-53) plus the
  * configuration surface (storage/django.py:103-124).
  *
  * The Document is the central record: one row per text chunk, carrying the
  * source-object keys, the embedding vector, the chunk content and free-form
  * metadata. In Spark it is a row of [[DocumentSchema.schema]]; a typed
  * `Dataset[Document]` boundary is available where type safety helps.
  */
final case class Document(
    doc_id: Long,
    object_keys: Seq[String],
    vector: Array[Float],
    content: String,
    metadata: Map[String, String]
)

object DocumentSchema {
  /** Canonical index schema; vectors are float32 arrays (matches the driver
    * fixture `embeddings.parquet: embedding list<float>`).
    */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("object_keys", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true)
  ))
}

/** Schema annotation for index building: which column to embed and whether it
  * is "important" (important content is prepended to every chunk — reference
  * storage/django.py:103-108, 429-432).
  */
final case class EmbeddingField(column: String, important: Boolean = false)

object EmbeddingField {
  /** Reference dedupes embedding_fields by field name, last wins
    * (storage/django.py:119-124).
    */
  def dedup(fields: Seq[EmbeddingField]): Seq[EmbeddingField] =
    fields.reverse.distinctBy(_.column).reverse
}

/** Source-row identity: `"<table>:<id>"` string (reference ModelKey,
  * storage/django.py:78-95). `object_keys(0)` is the most-specific key.
  */
object ModelKey {
  def make(table: String, id: Any): String = s"$table:$id"
  def table(key: String): String = key.split(":", 2)(0)
  def id(key: String): String = { val p = key.split(":", 2); if (p.length > 1) p(1) else "" }
}

/** Name-generation util (P8): snake_case → CamelCase, used by the reference
  * to synthesize per-provider index class names
  * (storage/django.py:513-516, build_vector_index_base_for_storage_provider).
  * The reference's own implementation `"".join(*map(str.title, parts))`
  * unpacks the mapped parts into join() and therefore raises TypeError for
  * any alias containing '_' — we implement the evident intent (documented
  * divergence; single-word aliases behave identically).
  */
object Naming {
  def camelCase(snake: String): String =
    snake.split("_").filter(_.nonEmpty).map(_.capitalize).mkString
  def indexClassName(providerAlias: String): String = s"${camelCase(providerAlias)}VectorIndex"
}

/** Distance metric enum — reference pgvector supports cosine / L2 / max inner
  * product (storage/pgvector/types.py:4-7). We standardize scores on
  * "similarity: higher is better" (SURVEY.md §7 risk 4).
  */
sealed trait Metric
object Metric {
  case object Cosine extends Metric
  case object L2 extends Metric              // score = -distance (higher is better)
  case object MaxInnerProduct extends Metric // score = dot product
  def fromString(s: String): Metric = s.toLowerCase match {
    case "cosine"                       => Cosine
    case "l2" | "euclidean"             => L2
    case "mip" | "max_inner_product"    => MaxInnerProduct
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/** Index configuration: fields to embed, chunking budget, metric.
  * `tokenLimit` drives chunk_size exactly as in the reference
  * (storage/django.py:292-295 — chunk_size = embedding backend token_limit).
  *
  * `parentTables`: the source type's ancestors in MRO order, most specific
  * first — every Document carries `"<parent>:<id>"` keys for each, so a
  * multi-model index resolves lookups by base-class key (reference
  * `_keys_for_instance`, storage/django.py:279-285 — the normal Wagtail
  * `Page`-inheritance case).
  */
final case class IndexConfig(
    name: String,
    keyColumn: String,
    fields: Seq[EmbeddingField],
    tokenLimit: Int = 8191,
    chunkOverlap: Int = 100,
    dims: Int = 64,
    metric: Metric = Metric.Cosine,
    parentTables: Seq[String] = Nil
) {
  def importantCols: Seq[String] = EmbeddingField.dedup(fields).filter(_.important).map(_.column)
  def splittableCols: Seq[String] = EmbeddingField.dedup(fields).filterNot(_.important).map(_.column)
}

/** Backend model registry — token limits and embedding output dims resolved
  * per model id (reference ai_utils/tokens.py:12-28, embeddings.py:6-10).
  */
object BackendRegistry {
  /** modelId -> (tokenLimit, outputDims). Public model specs. */
  val known: Map[String, (Int, Int)] = Map(
    "text-embedding-ada-002" -> (8191, 1536),
    "text-embedding-3-small" -> (8191, 1536),
    "text-embedding-3-large" -> (8191, 3072),
    "gpt-3.5-turbo"          -> (4096, 0),
    "gpt-4"                  -> (8192, 0),
    "hash-embed"             -> (8191, 64)
  )
  def tokenLimit(modelId: String, overrideLimit: Option[Int] = None): Int =
    overrideLimit.orElse(known.get(modelId).map(_._1)).getOrElse(
      throw new IllegalArgumentException(s"unknown model '$modelId' and no token_limit override"))
  def dims(modelId: String, overrideDims: Option[Int] = None): Int =
    overrideDims.orElse(known.get(modelId).map(_._2)).getOrElse(
      throw new IllegalArgumentException(s"unknown model '$modelId' and no dimensions override"))
}
