package graft.api

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.embed.HttpSupport

/** [[IndexStore]] connector against a remote REST collection service — the
  * THIRD impl of the provider seam (S8/S9), shaped like the qdrant /
  * weaviate providers the reference ships (storage/qdrant/provider.py:44-104,
  * storage/weaviate/provider.py:46-121): a named collection of JSON points
  * keyed by integer id, mutated over HTTP. Like those providers it is
  * DRIVER-MEDIATED — every mutation ships its batch through the service API
  * (the reference pushes 100-object batches the same way), so this store is
  * for serving-sized indexes, not the 100 TB parquet path.
  *
  * Wire protocol (what the contract suite pins and a real qdrant/weaviate
  * adapter must map onto):
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
  *   POST   {base}/collections/{name}/points        {"points": [...]}   append (pre-deduped)
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
  */
final class RestIndexStore(spark: SparkSession, base: String, collection: String,
                           apiKey: Option[String] = None,
                           maxRetries: Int = 3, backoffMs: Long = 200,
                           requestTimeoutMs: Long = 60000) extends IndexStore {

  private val collectionUrl = s"$base/collections/$collection"
  private val pointsUrl = s"$collectionUrl/points"
  @transient private lazy val http = HttpSupport.client(requestTimeoutMs)
  private def mapper = HttpSupport.mapper

  private def send(method: String, url: String, body: Option[String]): (Int, String) =
    HttpSupport.sendWithRetry(http, method, url, body, apiKey, maxRetries,
      backoffMs, requestTimeoutMs)

  private def expect200(method: String, url: String, body: Option[String]): String =
    send(method, url, body) match {
      case (200, b) => b
      case (status, b) => throw new IllegalStateException(
        s"$method $url returned $status: ${b.take(500)}")
    }

  override def exists: Boolean = send("GET", collectionUrl, None) match {
    case (200, _) => true
    case (404, _) => false
    case (status, b) => throw new IllegalStateException(
      s"GET $collectionUrl returned $status: ${b.take(500)}")
  }

  override def read(): DataFrame = {
    val meta = send("GET", collectionUrl, None) match {
      case (200, b) => b
      case (404, _) => throw new IllegalStateException(
        s"collection $collection does not exist")
      case (status, b) => throw new IllegalStateException(
        s"GET $collectionUrl returned $status: ${b.take(500)}")
    }
    val schema = DataType.fromJson(mapper.readTree(meta).path("schema").asText())
      .asInstanceOf[StructType]
    val body = expect200("GET", pointsUrl, None)
    val rows = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      mapper.readTree(body).path("points").forEach(p => buf += p.toString)
      buf.toSeq
    }
    spark.read.schema(schema).json(spark.createDataset(rows)(Encoders.STRING))
  }

  private def pointsNode(docs: DataFrame): com.fasterxml.jackson.databind.node.ArrayNode = {
    val pts = mapper.createArrayNode()
    // driver-mediated by design (see class doc) — rows ship through the API
    docs.toJSON.collect().foreach(r => pts.add(mapper.readTree(r)))
    pts
  }

  override def replace(docs: DataFrame): Unit = {
    val d = docs.dropDuplicates("doc_id")
    // ONE request: schema and points replace together (server-side atomic),
    // so a concurrent reader sees either the old collection or the new one
    // — never the new schema parsed over the old points, and a failed call
    // leaves the old collection fully intact
    val body = mapper.createObjectNode()
    body.put("schema", d.schema.json)
    body.set[com.fasterxml.jackson.databind.JsonNode]("points", pointsNode(d))
    expect200("PUT", collectionUrl, Some(mapper.writeValueAsString(body)))
  }

  override def upsert(docs: DataFrame): Unit = readOption() match {
    case None => replace(docs)
    case Some(existing) =>
      import org.apache.spark.sql.functions.broadcast
      insertPrechecked(docs
        .join(broadcast(existing.select("doc_id")), Seq("doc_id"), "left_anti")
        .dropDuplicates("doc_id"))
  }

  /** Conflict-free pre-deduped rows append with ONE POST — no second
    * full-collection download (the caller already holds the conflict set).
    */
  override private[graft] def insertPrechecked(inserted: DataFrame): Unit =
    if (!exists) replace(inserted)
    else {
      val pts = pointsNode(inserted)
      if (pts.size() > 0) {
        val body = mapper.createObjectNode()
        body.set[com.fasterxml.jackson.databind.JsonNode]("points", pts)
        expect200("POST", pointsUrl, Some(mapper.writeValueAsString(body)))
      }
    }

  override def delete(docIds: Seq[Long]): Unit = if (docIds.nonEmpty && exists) {
    val root = mapper.createObjectNode()
    val ids = root.putArray("ids")
    docIds.foreach(ids.add)
    expect200("POST", s"$pointsUrl/delete", Some(mapper.writeValueAsString(root)))
  }

  override def clear(): Unit = send("DELETE", collectionUrl, None) match {
    case (200, _) | (404, _) => ()
    case (status, b) => throw new IllegalStateException(
      s"DELETE $collectionUrl returned $status: ${b.take(500)}")
  }
}
