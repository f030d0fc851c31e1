package graft.api

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.embed.HttpSupport

/** Serializable wire client for [[RestIndexStore]]'s graft REST dialect —
  * the executor-shippable half (same split as [[QdrantWire]] /
  * [[WeaviateWire]]): point uploads above the store's threshold POST
  * per-partition from executors, capturing only these plain fields.
  */
final case class RestWire(base: String, collection: String,
                          apiKey: Option[String],
                          maxRetries: Int, backoffMs: Long,
                          requestTimeoutMs: Long,
                          uploadBatchRows: Int) extends Serializable {

  def collectionUrl: String = s"$base/collections/$collection"
  def pointsUrl: String = s"$collectionUrl/points"

  @transient private lazy val http = HttpSupport.client(requestTimeoutMs)
  private def mapper = HttpSupport.mapper

  def send(method: String, url: String, body: Option[String]): (Int, String) =
    HttpSupport.sendWithRetry(http, method, url, body, apiKey, maxRetries,
      backoffMs, requestTimeoutMs)

  def expect200(method: String, url: String, body: Option[String]): String =
    send(method, url, body) match {
      case (200, b) => b
      case (status, b) => throw new IllegalStateException(
        s"$method $url returned $status: ${b.take(500)}")
    }

  /** Batched points POST. The wire append is an UPSERT KEYED BY doc_id
    * (the server replaces an existing id, like qdrant/weaviate points), so
    * a retry after an ambiguous failure (server committed, response lost)
    * rewrites the same rows instead of duplicating them — idempotent.
    */
  def uploadRowJsons(rows: Iterator[String]): Unit =
    rows.grouped(uploadBatchRows).foreach { batch =>
      val root = mapper.createObjectNode()
      val pts = root.putArray("points")
      batch.foreach(r => pts.add(mapper.readTree(r)))
      expect200("POST", pointsUrl, Some(mapper.writeValueAsString(root)))
    }
}

/** [[IndexStore]] connector against a remote REST collection service — the
  * generic graft REST dialect (the qdrant/weaviate LITERAL wire protocols
  * live in [[QdrantIndexStore]] / [[WeaviateIndexStore]]; this one is the
  * clean protocol a new service would implement). Shaped like the providers
  * the reference ships (storage/qdrant/provider.py:44-104,
  * storage/weaviate/provider.py:46-121): a named collection of JSON points
  * keyed by integer doc_id, mutated over HTTP.
  *
  * Wire protocol (what the contract suite pins):
  * {{{
  *   GET    {base}/collections/{name}               -> 200 {"schema": <json>} | 404
  *   PUT    {base}/collections/{name}               {"schema": <json>, "points": [...]}
  *                                                  — ONE request recreates the
  *                                                  collection: schema and points
  *                                                  replace together (the server
  *                                                  applies both atomically, like
  *                                                  qdrant recreate_collection), so
  *                                                  no reader can observe the new
  *                                                  schema over the old points
  *   GET    {base}/collections/{name}/points        -> 200 {"points": [<rowJson>...]}
  *   POST   {base}/collections/{name}/points        {"points": [...]}   UPSERT keyed
  *                                                  by doc_id — the server replaces
  *                                                  an existing id, so retried
  *                                                  appends are idempotent
  *   POST   {base}/collections/{name}/points/delete {"ids": [...]}
  *   DELETE {base}/collections/{name}
  * }}}
  *
  * The collection stores the Spark schema JSON alongside the points, so a
  * fresh session reads rows back with exact types (array<float> vectors
  * survive the JSON round-trip via schema-directed parsing, not inference).
  * Retry policy is [[HttpSupport]]'s: 429/5xx/IO back off, other 4xx are
  * surfaced; old-wins upsert semantics are enforced CLIENT-side (anti-join
  * against existing ids) exactly like [[ParquetIndexStore]].
  *
  * Scale posture: reads are driver-mediated (this is a serving-index
  * connector), but WRITES distribute — batches of at least
  * `executorUploadMinRows` rows POST per-partition from executors via the
  * serializable [[RestWire]]. A `replace` above the threshold first PUTs
  * the schema with an empty point set, then appends per-partition: it
  * trades the small-replace single-request atomicity for a distributed
  * upload (the qdrant/weaviate providers' replace was never atomic either).
  */
final class RestIndexStore(spark: SparkSession, base: String, collection: String,
                           apiKey: Option[String] = None,
                           maxRetries: Int = 3, backoffMs: Long = 200,
                           requestTimeoutMs: Long = 60000,
                           uploadBatchRows: Int = 500,
                           executorUploadMinRows: Long = 10000) extends IndexStore {

  private val wire = RestWire(base, collection, apiKey, maxRetries, backoffMs,
    requestTimeoutMs, uploadBatchRows)
  private def mapper = HttpSupport.mapper

  override def exists: Boolean = wire.send("GET", wire.collectionUrl, None) match {
    case (200, _) => true
    case (404, _) => false
    case (status, b) => throw new IllegalStateException(
      s"GET ${wire.collectionUrl} returned $status: ${b.take(500)}")
  }

  override def read(): DataFrame = {
    val meta = wire.send("GET", wire.collectionUrl, None) match {
      case (200, b) => b
      case (404, _) => throw new IllegalStateException(
        s"collection $collection does not exist")
      case (status, b) => throw new IllegalStateException(
        s"GET ${wire.collectionUrl} returned $status: ${b.take(500)}")
    }
    val schema = DataType.fromJson(mapper.readTree(meta).path("schema").asText())
      .asInstanceOf[StructType]
    val body = wire.expect200("GET", wire.pointsUrl, None)
    val rows = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      mapper.readTree(body).path("points").forEach(p => buf += p.toString)
      buf.toSeq
    }
    spark.read.schema(schema).json(spark.createDataset(rows)(Encoders.STRING))
  }

  override def replace(docs: DataFrame): Unit = {
    val json = docs.dropDuplicates("doc_id").toJSON.persist()
    try {
      val n = json.count() // persisted: count + ship compute the plan once
      if (n < executorUploadMinRows) {
        // ONE request: schema and points replace together (server-side atomic),
        // so a concurrent reader sees either the old collection or the new one
        // — never the new schema parsed over the old points, and a failed call
        // leaves the old collection fully intact
        val body = mapper.createObjectNode()
        body.put("schema", docs.schema.json)
        val pts = body.putArray("points")
        json.collect().foreach(r => pts.add(mapper.readTree(r)))
        wire.expect200("PUT", wire.collectionUrl, Some(mapper.writeValueAsString(body)))
      } else {
        // distributed replace: recreate empty driver-side, append per-partition
        val body = mapper.createObjectNode()
        body.put("schema", docs.schema.json)
        body.putArray("points")
        wire.expect200("PUT", wire.collectionUrl, Some(mapper.writeValueAsString(body)))
        val w = wire
        json.foreachPartition((it: Iterator[String]) => w.uploadRowJsons(it))
      }
    } finally json.unpersist(false)
  }

  override def upsert(docs: DataFrame): Unit = readOption() match {
    case None => replace(docs)
    case Some(existing) =>
      import org.apache.spark.sql.functions.broadcast
      insertPrechecked(docs
        .join(broadcast(existing.select("doc_id")), Seq("doc_id"), "left_anti")
        .dropDuplicates("doc_id"))
  }

  /** Conflict-free pre-deduped rows append — no second full-collection
    * download (the caller already holds the conflict set). Driver-side in
    * one POST below `executorUploadMinRows`; per-partition from executors
    * at or above it.
    */
  override private[graft] def insertPrechecked(inserted: DataFrame): Unit =
    if (!exists) replace(inserted)
    else {
      val json = inserted.toJSON.persist()
      try {
        val n = json.count() // persisted: the upsert anti-join computes once
        if (n > 0) {
          val w = wire
          if (n < executorUploadMinRows) w.uploadRowJsons(json.collect().iterator)
          else json.foreachPartition((it: Iterator[String]) => w.uploadRowJsons(it))
        }
      } finally json.unpersist(false)
    }

  override def delete(docIds: Seq[Long]): Unit = if (docIds.nonEmpty && exists) {
    val root = mapper.createObjectNode()
    val ids = root.putArray("ids")
    docIds.foreach(ids.add)
    wire.expect200("POST", s"${wire.pointsUrl}/delete",
      Some(mapper.writeValueAsString(root)))
  }

  override def clear(): Unit = wire.send("DELETE", wire.collectionUrl, None) match {
    case (200, _) | (404, _) => ()
    case (status, b) => throw new IllegalStateException(
      s"DELETE ${wire.collectionUrl} returned $status: ${b.take(500)}")
  }
}
