package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{IndexConfig, Metric}
import graft.embed.{ChatBackend, EchoChatBackend, EmbeddingBackend, HashEmbeddingBackend}
import graft.pipeline.IndexBuild
import graft.query.Retrieval

/** User-facing index handle — the Spark re-expression of the reference's
  * VectorIndex public API (storage/base.py:174-354): `search`, `find_similar`,
  * `query` (RAG) plus the provider operations `rebuild_index` / `upsert` /
  * `delete` / `clear`. A user of the reference maps 1:1:
  *
  *   index.search(q, limit, threshold)      -> index.search(q, k, threshold)
  *   index.find_similar(obj, ...)           -> index.findSimilar("table:id", ...)
  *   index.query(q, sources_limit)          -> index.query(q, sourcesLimit)
  *   index.rebuild_index()                  -> index.rebuild(sourceDf)
  *   provider.upsert/delete/clear           -> index.upsert / delete / clear
  *
  * The index is a parquet Document table at `indexPath`; all query methods
  * are lazy DataFrames (Catalyst plans them; see PLANS.md §1-§3).
  */
final class VectorIndex(
    val spark: SparkSession,
    val config: IndexConfig,
    val backend: EmbeddingBackend,
    val chatBackend: ChatBackend,
    val indexPath: String,
    val sourceTable: String,
    val idColumn: String,
    storeOverride: Option[IndexStore] = None
) {

  /** Provider seam (reference StorageProvider, storage/base.py:48-71):
    * all physical index ops go through here — swap in another [[IndexStore]]
    * for a different backend.
    */
  val store: IndexStore = storeOverride.getOrElse(new ParquetIndexStore(spark, indexPath))

  def documents: DataFrame = store.read()

  /** Full rebuild: clear + build from scratch (reference rebuild_index,
    * pgvector provider.py:61-63).
    */
  def rebuild(source: DataFrame): Unit =
    store.replace(IndexBuild.buildDocuments(source, config, backend, sourceTable, idColumn))

  /** Incremental update: diff against the stored index, re-embed only
    * changed objects, keep the rest (reference A4 incremental path,
    * storage/django.py:320-383). The store's versioned replace means the
    * stored read and the new write never race — no cache, no swap window.
    */
  def update(source: DataFrame): Unit = {
    val stored = store.readOption()
    store.replace(IndexBuild.buildDocuments(source, config, backend, sourceTable, idColumn, stored))
  }

  /** Upsert pre-built Document rows (reference provider upsert, S7) —
    * conflict-ignore, old-wins, deterministic (see [[IndexStore.upsert]]).
    */
  def upsert(docs: DataFrame): Unit = store.upsert(docs)

  /** Delete documents by doc_id (S10). */
  def delete(docIds: Seq[Long]): Unit = store.delete(docIds)

  /** Remove every document (S11). */
  def clear(): Unit = store.clear()

  def search(query: String, k: Int = 5, threshold: Double = 0.0,
             metric: Metric = Metric.Cosine): DataFrame =
    Retrieval.search(documents, query, backend, k, threshold, metric)

  def findSimilar(objectKey: String, k: Int = 5, threshold: Double = 0.0,
                  includeSelf: Boolean = false): DataFrame =
    Retrieval.findSimilar(documents, objectKey, k, threshold, config.metric, includeSelf)

  def query(question: String, sourcesLimit: Int = 5, threshold: Double = 0.0): Retrieval.QueryResponse =
    Retrieval.ragQuery(documents, question, backend, chatBackend, sourcesLimit, threshold)

  /** R4: streaming RAG query (reference aquery, storage/base.py:230-276). */
  def queryStream(question: String, sourcesLimit: Int = 5,
                  threshold: Double = 0.0): Retrieval.StreamingQueryResponse =
    Retrieval.ragQueryStream(documents, question, backend, chatBackend, sourcesLimit, threshold)
}

/** Index registry + rebuild-all — the reference's registry of indexes
  * (storage/django.py:603-611) and the `update_vector_indexes` management
  * command (management/commands/update_vector_indexes.py:18-44), minus the
  * interactive confirmation (pass force=true semantics).
  */
object IndexRegistry {
  private val indexes = TrieMap.empty[String, (VectorIndex, () => DataFrame)]

  /** Register an index with the closure that produces its source rows
    * (the analog of the reference's queryset providers).
    */
  def register(index: VectorIndex, source: () => DataFrame): VectorIndex = {
    indexes.put(index.config.name, (index, source))
    index
  }

  def get(name: String): Option[VectorIndex] = indexes.get(name).map(_._1)
  def registered: Seq[String] = indexes.keys.toSeq.sorted

  /** Rebuild every registered index from its source. */
  def rebuildAll(): Unit =
    indexes.values.foreach { case (idx, src) => idx.rebuild(src()) }

  def clearRegistry(): Unit = indexes.clear()
}

object VectorIndex {
  /** Convenience constructor with the dev/test backends. */
  def local(spark: SparkSession, config: IndexConfig, indexPath: String,
            sourceTable: String, idColumn: String,
            backend: EmbeddingBackend = null,
            chatBackend: ChatBackend = EchoChatBackend()): VectorIndex =
    new VectorIndex(spark, config,
      Option(backend).getOrElse(HashEmbeddingBackend(config.dims)),
      chatBackend, indexPath, sourceTable, idColumn)
}
