package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.embed.{ChatBackend, ChatMessage, EmbeddingBackend}
import graft.functions.vector._

/** Online query surface: KNN search, per-object dedup, source hydration and
  * RAG assembly — Spark re-expression of the reference's query lifecycle
  * (storage/base.py:174-354; SURVEY.md §3).
  *
  * All scoring is "similarity: higher is better" in a single convention
  * (cosine in [-1,1]); L2 is negated, MIP is raw dot. The per-backend
  * similarity↔distance conversions of the reference
  * (pgvector provider.py:119-122, qdrant 88-93, weaviate 93-97) collapse into
  * this one rule.
  */
object Retrieval {

  /** Similarity score column for a (vectorCol, query literal vector) pair. */
  def scoreCol(vectorCol: Column, queryVec: Seq[Float], metric: Metric = Metric.Cosine): Column =
    scoreColOf(vectorCol, typedLit(queryVec), metric)

  /** Column-vs-column variant (probe vectors coming from another table). */
  def scoreColOf(vectorCol: Column, queryCol: Column, metric: Metric): Column =
    metric match {
      case Metric.Cosine          => vec_cosine(vectorCol, queryCol)
      case Metric.L2              => -vec_l2(vectorCol, queryCol)
      case Metric.MaxInnerProduct => vec_dot(vectorCol, queryCol)
    }

  /** Brute-force exact KNN: score every row, threshold, take top-k.
    *
    * Plan shape: scan → (dim filter) → score expr → filter ≥ threshold →
    * TakeOrderedAndProject(k). No global sort: Catalyst turns orderBy+limit
    * into per-partition top-k + driver merge, which is the scalable shape
    * (each of 1000 executors returns k rows, driver merges 1000·k).
    *
    * The dimension pre-filter mirrors the reference's multi-model index
    * support (pgvector provider.py:112: filter embedding dims = len(query)).
    * Threshold filter: reference numpy provider.py:52-53 keeps
    * similarity ≥ threshold. Ties broken by `tieBreaker` for determinism.
    */
  def knn(index: DataFrame, queryVec: Seq[Float], k: Int = 5,
          threshold: Double = 0.0, metric: Metric = Metric.Cosine,
          vectorCol: String = "vector", tieBreaker: String = "doc_id",
          checkDims: Boolean = false): DataFrame = {
    val base = if (checkDims) index.filter(size(col(vectorCol)) === lit(queryVec.length)) else index
    base
      .withColumn("score", scoreCol(col(vectorCol), queryVec, metric))
      .filter(col("score") >= lit(threshold))
      .orderBy(desc("score"), col(tieBreaker).asc)
      .limit(k)
  }

  /** Order-preserving first-per-key dedup (reference storage/django.py:211-222:
    * streaming `seen_keys` set keeps the FIRST document per object key in
    * similarity-rank order). The window row_number is the reference's only
    * window-shaped operator (SURVEY.md §2.6 A5).
    */
  def dedupByKey(results: DataFrame, keyCol: String = "key",
                 scoreColName: String = "score", tieBreaker: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(desc(scoreColName), col(tieBreaker).asc)
    results.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Hydration join: resolve result keys back to source rows
    * (reference storage/django.py:224-240 — per-model `pk IN (...)` fetch;
    * in Spark one broadcast equi-join per source table). `sourceDf` rows are
    * keyed by `sourceKeyCol`; result keys of form `"<table>:<id>"` are parsed
    * with split. Result tables are tiny (k rows) so the JOIN build side is
    * the results — Catalyst broadcasts it automatically under AQE; we hint it.
    */
  def hydrate(results: DataFrame, sourceDf: DataFrame, table: String,
              sourceKeyCol: String, resultKeyCol: String = "key"): DataFrame = {
    val parsed = results
      .withColumn("__tbl", split(col(resultKeyCol), ":").getItem(0))
      .withColumn("__id", split(col(resultKeyCol), ":").getItem(1))
      .filter(col("__tbl") === lit(table))
    broadcast(parsed)
      .join(sourceDf, parsed("__id") === sourceDf(sourceKeyCol).cast("string"), "inner")
      .drop("__tbl", "__id")
  }

  /** search(q): embed the query (driver-side single call, reference
    * storage/base.py:303-316) → KNN → dedup by first object key.
    */
  def search(index: DataFrame, query: String, backend: EmbeddingBackend,
             k: Int = 5, threshold: Double = 0.0,
             metric: Metric = Metric.Cosine): DataFrame = {
    val qv = backend.embedOne(query).toSeq
    val hits = knn(index, qv, k, threshold, metric)
      .withColumn("key", col("object_keys").getItem(0))
    dedupByKey(hits)
  }

  /** find_similar(obj): per-chunk KNN of the probe object's own chunks,
    * union, dedup, exclude self (reference storage/base.py:278-301 — which
    * loops one similarity query per chunk). Here the probe chunks stay a
    * DataFrame and are BROADCAST into a single index scan: score every
    * (probe-chunk, doc) pair over a NARROW (doc_id, vector) projection,
    * bounded per-chunk top-k via [[graft.ops.SimilaritySearch.topKByProbe]]
    * (partial aggregation keeps ≤ k rows per chunk per partition — the one
    * shuffle carries O(chunks·k), where a window row_number would shuffle
    * every row passing the threshold, i.e. the scored corpus), then a
    * broadcast join of the ≤ chunks·k hit ids hydrates full documents for
    * the global first-per-key dedup. One narrow scan + one semi-join-shaped
    * hydration scan, however many chunks the object has.
    */
  def findSimilar(index: DataFrame, probeKey: String, k: Int = 5,
                  threshold: Double = 0.0, metric: Metric = Metric.Cosine,
                  includeSelf: Boolean = false): DataFrame = {
    val probes = index
      .filter(array_contains(col("object_keys"), probeKey))
      .select(col("doc_id").as("__qid"), col("vector").as("__qv"))
    val scored = index.select(col("doc_id"), col("vector")).crossJoin(broadcast(probes))
      .select(col("__qid"), col("doc_id"),
        scoreColOf(col("vector"), col("__qv"), metric).as("score"))
      .filter(col("score") >= lit(threshold))
    val topk = graft.ops.SimilaritySearch.topKByProbe(scored, k, "__qid", "doc_id")
    // a doc hit by several probe chunks keeps its best score for the dedup
    val hits = topk.groupBy(col("doc_id")).agg(max(col("score")).as("score"))
    val keyed = broadcast(hits)
      .join(index, Seq("doc_id"))
      .withColumn("key", col("object_keys").getItem(0))
    val deduped = dedupByKey(keyed)
    if (includeSelf) deduped else deduped.filter(col("key") =!= lit(probeKey))
  }

  final case class QueryResponse(response: String, sources: DataFrame)

  /** R4: streaming twin of [[QueryResponse]] — `response` yields the chat
    * reply incrementally (reference AsyncQueryResponse, storage/base.py:37-44).
    */
  final case class StreamingQueryResponse(response: Iterator[String], sources: DataFrame)

  val DefaultSystemPrompt: String =
    "You are a helpful assistant. Use the following context to answer the question. Don't mention the context in your reply."

  /** RAG query: search → merge contexts with "\n" → 3-message prompt → chat
    * (reference storage/base.py:194-228). The merged context is built from
    * the RAW top-k chunk hits BEFORE object dedup — the reference assembles
    * merged_context from similar_documents (base.py:214) and dedups only the
    * sources list — so two chunks of one object both contribute content.
    * `sourcesLimit` IS honored here — the reference accepts it but drops it
    * (base.py:197,208-212, quirk O4); divergence documented in SURVEY.md §7.
    */
  def ragQuery(index: DataFrame, query: String, embedBackend: EmbeddingBackend,
               chatBackend: ChatBackend, sourcesLimit: Int = 5,
               threshold: Double = 0.0, systemPrompt: String = DefaultSystemPrompt): QueryResponse = {
    val qv = embedBackend.embedOne(query).toSeq
    val hits = knn(index, qv, sourcesLimit, threshold)
      .withColumn("key", col("object_keys").getItem(0))
    val context = hits.orderBy(desc("score"), col("doc_id").asc)
      .select("content").collect().map(_.getString(0)).mkString("\n")
    val sources = dedupByKey(hits)
    val messages = Seq(
      ChatMessage("system", systemPrompt),
      ChatMessage("system", context),
      ChatMessage("user", query))
    QueryResponse(chatBackend.chat(messages), sources)
  }

  /** R4: streaming RAG query — identical retrieval/prompt assembly to
    * [[ragQuery]], but the chat response arrives as a chunk iterator
    * (reference aquery with stream=True, storage/base.py:230-276; the
    * stream wrapper yields chunk contents, base.py:269-276).
    */
  def ragQueryStream(index: DataFrame, query: String, embedBackend: EmbeddingBackend,
                     chatBackend: ChatBackend, sourcesLimit: Int = 5,
                     threshold: Double = 0.0,
                     systemPrompt: String = DefaultSystemPrompt): StreamingQueryResponse = {
    val qv = embedBackend.embedOne(query).toSeq
    val hits = knn(index, qv, sourcesLimit, threshold)
      .withColumn("key", col("object_keys").getItem(0))
    val context = hits.orderBy(desc("score"), col("doc_id").asc)
      .select("content").collect().map(_.getString(0)).mkString("\n")
    val sources = dedupByKey(hits)
    val messages = Seq(
      ChatMessage("system", systemPrompt),
      ChatMessage("system", context),
      ChatMessage("user", query))
    StreamingQueryResponse(chatBackend.chatStream(messages), sources)
  }
}
