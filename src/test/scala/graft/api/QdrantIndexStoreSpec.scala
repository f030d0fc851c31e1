package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.TestSpark

/** [[QdrantIndexStore]] runs the same five-op provider contract as every
  * other [[IndexStore]] — against a wire-faithful qdrant stub that validates
  * vector sizes, 404s unknown collections, and 409s double-creates.
  */
class QdrantIndexStoreContractSpec extends IndexStoreContract with BeforeAndAfterAll {
  private var stub: QdrantStub = _
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  override def beforeAll(): Unit = { stub = new QdrantStub() }
  override def afterAll(): Unit = if (stub != null) stub.stop()

  override def implName = "QdrantIndexStore"
  override def makeStore(tag: String): IndexStore =
    new QdrantIndexStore(spark, stub.baseUrl, s"$tag-${n.incrementAndGet()}",
      dims = 2, backoffMs = 1)
}

/** The qdrant-specific wire behavior the generic contract can't see: exact
  * request shapes, retry idempotency from id-keyed upserts, executor-side
  * per-partition uploads, server-side search, and the full VectorIndex
  * lifecycle through the connector.
  */
class QdrantIndexStoreSpec extends org.scalatest.funsuite.AnyFunSuite with BeforeAndAfterAll {
  private var stub: QdrantStub = _
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def beforeAll(): Unit = { stub = new QdrantStub() }
  override def afterAll(): Unit = if (stub != null) stub.stop()

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "content")
      .withColumn("object_keys", array(concat(lit("t:"), col("doc_id"))))
      .withColumn("vector",
        array((col("doc_id") % 7 + 1).cast("float"), (col("doc_id") % 3 - 1).cast("float")))
      .withColumn("metadata", map(lit("table"), lit("t")))

  private def store(name: String, minRows: Long = 10000, batchRows: Int = 500) =
    new QdrantIndexStore(spark, stub.baseUrl, name, dims = 2, backoffMs = 1,
      uploadBatchRows = batchRows, executorUploadMinRows = minRows)

  test("replace emits qdrant's literal wire sequence: delete, create with vector params, id-keyed points PUT") {
    val s = store("wire")
    s.replace(docs(1L -> "a", 2L -> "b"))
    val reqs = stub.requestLog.filter(_.path.contains("/collections/wire"))
    // delete_collection + create_collection + upsert (provider.py:34-42)
    val kinds = reqs.map(r => (r.method, r.path.stripPrefix("/collections/wire")))
    assert(kinds.take(3) == Seq(("DELETE", ""), ("PUT", ""), ("PUT", "/points")))
    val create = reqs(1)
    val cfg = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(create.body).path("vectors")
    assert(cfg.path("size").asInt() == 2 && cfg.path("distance").asText() == "Cosine")
    // every point carries the PointStruct triple (provider.py:45-52)
    val dataPut = reqs.filter(r => r.method == "PUT" && r.path.endsWith("/points")).last
    assert(dataPut.query == "wait=true")
    val pts = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(dataPut.body).path("points")
    assert(pts.size() == 2)
    pts.forEach { p =>
      assert(p.has("id") && p.has("vector") && p.has("payload"))
      // the payload CARRIES the original vector: real qdrant returns the
      // Cosine-normalized copy in the point's vector field, so read()
      // fidelity depends on the payload copy (stub normalizes too)
      assert(p.path("payload").has("vector"))
    }
  }

  test("retrying the same batch is idempotent — points are keyed by doc_id") {
    val s = store("idem")
    s.replace(docs(1L -> "a", 2L -> "b"))
    assert(stub.pointCount("idem") == 3) // 2 docs + schema point
    // an ambiguous failure (server committed, response lost) re-sends the
    // batch: the id-keyed PUT rewrites, never duplicates
    s.insertPrechecked(docs(3L -> "c"))
    s.insertPrechecked(docs(3L -> "c"))
    assert(stub.pointCount("idem") == 4)
    assert(s.read().count() == 3)
  }

  test("large batches upload per-partition from executors, small ones driver-side") {
    val s = store("dist", minRows = 1, batchRows = 500)
    s.replace(docs(1L -> "a").repartition(1)) // create collection
    val before = stub.requestLog.count(r =>
      r.method == "PUT" && r.path == "/collections/dist/points")
    val six = docs(10L -> "j", 11L -> "k", 12L -> "l", 13L -> "m", 14L -> "n", 15L -> "o")
      .repartition(3)
    s.insertPrechecked(six)
    val puts = stub.requestLog.count(r =>
      r.method == "PUT" && r.path == "/collections/dist/points") - before
    assert(puts == 3, s"expected one points PUT per partition, got $puts")
    assert(s.read().count() == 7)

    // under the threshold: exactly ONE driver-side PUT regardless of partitioning
    val s2 = store("drv", minRows = 100)
    s2.replace(docs(1L -> "a"))
    val b2 = stub.requestLog.count(r =>
      r.method == "PUT" && r.path == "/collections/drv/points")
    s2.insertPrechecked(six)
    val p2 = stub.requestLog.count(r =>
      r.method == "PUT" && r.path == "/collections/drv/points") - b2
    assert(p2 == 1, s"expected one driver-side points PUT, got $p2")
  }

  test("searchSimilar runs server-side with score_threshold and excludes the schema point") {
    val s = store("search")
    val d = Seq(
      (1L, "east", Seq(1.0f, 0.0f)),
      (2L, "north", Seq(0.0f, 1.0f)),
      (3L, "northeast", Seq(1.0f, 1.0f))
    ).toDF("doc_id", "content", "vector")
    s.replace(d)
    val hits = s.searchSimilar(Seq(1.0f, 0.05f), limit = 2)
    val got = hits.select("doc_id", "content").as[(Long, String)].collect()
    assert(got.length == 2 && got.head == ((1L, "east")))
    assert(hits.columns.contains("score"))
    // the threshold is qdrant's own score_threshold: orthogonal vector drops out
    val strict = s.searchSimilar(Seq(1.0f, 0.0f), limit = 10, similarityThreshold = 0.9)
    assert(strict.select("doc_id").as[Long].collect().toSet == Set(1L))
    val searchReq = stub.requestLog.filter(_.path == "/collections/search/points/search").last
    val body = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(searchReq.body)
    assert(body.path("score_threshold").asDouble() == 0.9)
    assert(body.path("filter").path("must_not").path(0).path("has_id").path(0).asText()
      == QdrantIndexStore.SchemaPointId)
    intercept[IllegalArgumentException] { s.searchSimilar(Seq(1.0f, 0.0f), 5, 1.5) }
  }

  test("a VectorIndex runs its full lifecycle against the qdrant connector") {
    val cfg = graft.core.IndexConfig("qdrant", "id",
      Seq(graft.core.EmbeddingField("title", important = true), graft.core.EmbeddingField("body")),
      tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val idx = new VectorIndex(spark, cfg, graft.embed.HashEmbeddingBackend(16),
      graft.embed.EchoChatBackend(), "unused://path", "page", "id",
      storeOverride = Some(new QdrantIndexStore(spark, stub.baseUrl, "vi-life",
        dims = 16, backoffMs = 1)))
    idx.rebuild(Seq(
      (1L, "Spark Engines", "distributed query processing"),
      (2L, "Vector Search", "nearest neighbour retrieval over embeddings"))
      .toDF("id", "title", "body"))
    assert(idx.documents.count() == 2)
    val hits = idx.search("nearest neighbour retrieval embeddings", k = 1, threshold = -1.0)
    assert(hits.select("key").as[String].head() == "page:2")
    idx.delete(idx.documents.filter(array_contains(col("object_keys"), "page:1"))
      .select("doc_id").as[Long].collect().toSeq)
    assert(idx.documents.count() == 1)
    idx.clear()
    assert(!idx.store.exists)
  }

  test("VectorIndex exact cosine search routes SERVER-side through the connector") {
    val cfg = graft.core.IndexConfig("qroute", "id",
      Seq(graft.core.EmbeddingField("title", important = true), graft.core.EmbeddingField("body")),
      tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val qstore = new QdrantIndexStore(spark, stub.baseUrl, "vi-route",
      dims = 16, backoffMs = 1)
    val idx = new VectorIndex(spark, cfg, graft.embed.HashEmbeddingBackend(16),
      graft.embed.EchoChatBackend(), "unused://path", "page", "id",
      storeOverride = Some(qstore))
    idx.rebuild(Seq(
      (1L, "alpha", "first topic text"),
      (2L, "beta", "second subject text"),
      (3L, "gamma", "third theme text")).toDF("id", "title", "body"))
    assert(idx.documents.count() == 3, "rebuild must land 3 documents")
    val before = stub.requestLog.count(_.path == "/collections/vi-route/points/search")
    val hits = idx.search("second subject text", k = 2, threshold = -1.0)
    val keys = hits.select("key").as[String].collect()
    assert(stub.requestLog.count(_.path == "/collections/vi-route/points/search") > before,
      "exact search must go through POST /points/search, not a collection download")
    assert(keys.nonEmpty && keys.forall(_.startsWith("page:")))
    // server route and Spark-side scan agree exactly
    val local = graft.query.Retrieval.search(idx.documents, "second subject text",
      graft.embed.HashEmbeddingBackend(16), k = 2, threshold = -1.0)
    assert(hits.select("doc_id").as[Long].collect().toSet ==
      local.select("doc_id").as[Long].collect().toSet)
    // non-cosine metrics must NOT route (the wire is cosine-only)
    val b2 = stub.requestLog.count(_.path == "/collections/vi-route/points/search")
    idx.search("second subject text", k = 2, threshold = -9.0,
      metric = graft.core.Metric.L2).collect()
    assert(stub.requestLog.count(_.path == "/collections/vi-route/points/search") == b2)
  }

  test("streaming incrementalIndex maintains a qdrant collection across micro-batches") {
    // the full composition: Structured Streaming foreachBatch → diff-and-
    // embed pipeline → the wire-literal connector (via the provider seam's
    // generic merge+replace path for stores without delta sidecars)
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-qstream").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val cfg = graft.core.IndexConfig("qstream", "id",
      Seq(graft.core.EmbeddingField("title", important = true), graft.core.EmbeddingField("body")),
      tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val qstore = new QdrantIndexStore(spark, stub.baseUrl, "stream-idx",
      dims = 16, backoffMs = 1)
    val idx = new VectorIndex(spark, cfg, graft.embed.HashEmbeddingBackend(16),
      graft.embed.EchoChatBackend(), "unused://path", "page", "id",
      storeOverride = Some(qstore))
    val q = graft.streaming.StreamingOps.incrementalIndex(
      input.toDF().toDF("id", "title", "body"), idx, s"$tmp/chk")
    try {
      input.addData((1L, "T1", "first page body"), (2L, "T2", "second page body"))
      q.processAllAvailable()
      assert(qstore.read().count() == 2)
      input.addData((1L, "T1", "first page body CHANGED"), (3L, "T3", "third page"))
      q.processAllAvailable()
      val after = qstore.read()
      assert(after.select(col("object_keys").getItem(0)).as[String].collect().toSet ==
        Set("page:1", "page:2", "page:3"))
      assert(after.filter(array_contains(col("object_keys"), "page:1"))
        .select("content").as[String].head().contains("CHANGED"))
    } finally q.stop()
  }

  test("scroll pages through large collections (read crosses the scroll batch boundary)") {
    val s = new QdrantIndexStore(spark, stub.baseUrl, "paged", dims = 2,
      backoffMs = 1, scrollBatchRows = 7)
    val many = docs((1L to 40L).map(i => i -> s"doc $i"): _*)
    s.replace(many)
    assert(s.read().count() == 40)
    assert(s.read().select("doc_id").as[Long].collect().toSet == (1L to 40L).toSet)
    val scrolls = stub.requestLog.count(_.path == "/collections/paged/points/scroll")
    assert(scrolls >= 6, s"expected paged scrolls, got $scrolls") // ceil(41/7)
  }
}
