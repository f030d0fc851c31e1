package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.TestSpark

/** [[WeaviateIndexStore]] runs the same five-op provider contract as every
  * other [[IndexStore]] — against a wire-faithful weaviate stub (schema
  * lifecycle, batch objects, cursor listing, where-filter deletes, GraphQL
  * nearVector).
  */
class WeaviateIndexStoreContractSpec extends IndexStoreContract with BeforeAndAfterAll {
  private var stub: WeaviateStub = _
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  override def beforeAll(): Unit = { stub = new WeaviateStub() }
  override def afterAll(): Unit = if (stub != null) stub.stop()

  override def implName = "WeaviateIndexStore"
  override def makeStore(tag: String): IndexStore =
    new WeaviateIndexStore(spark, stub.baseUrl, s"$tag-${n.incrementAndGet()}",
      backoffMs = 1)
}

/** Weaviate-specific wire behavior: class-name sanitization, the reference's
  * rebuild sequence, JSON-string document properties, id-keyed batch-object
  * idempotency, executor-side uploads, where-filter deletes, GraphQL
  * nearVector search with distance threshold, cursor paging, and the full
  * VectorIndex lifecycle.
  */
class WeaviateIndexStoreSpec extends org.scalatest.funsuite.AnyFunSuite with BeforeAndAfterAll {
  private var stub: WeaviateStub = _
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def beforeAll(): Unit = { stub = new WeaviateStub() }
  override def afterAll(): Unit = if (stub != null) stub.stop()

  private def mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "content")
      .withColumn("object_keys", array(concat(lit("t:"), col("doc_id"))))
      .withColumn("vector",
        array((col("doc_id") % 7 + 1).cast("float"), (col("doc_id") % 3 - 1).cast("float")))
      .withColumn("metadata", map(lit("table"), lit("t")))

  private def store(name: String, minRows: Long = 10000) =
    new WeaviateIndexStore(spark, stub.baseUrl, name, backoffMs = 1,
      executorUploadMinRows = minRows)

  test("collection names sanitize to weaviate-legal class names without collisions") {
    // already-legal names pass through untouched
    assert(WeaviateIndexStore.classNameOf("Already_Fine") == "Already_Fine")
    // sanitized names gain a deterministic suffix of the ORIGINAL, so
    // distinct collections can never share a class
    val sanitized = Seq("my-index", "my_index", "My_index", "foo", "Foo", "9lives")
      .map(WeaviateIndexStore.classNameOf)
    sanitized.foreach(c => assert(c.matches("[A-Z][_0-9A-Za-z]*"), c))
    assert(sanitized.distinct.size == sanitized.size, s"collision in $sanitized")
    assert(WeaviateIndexStore.classNameOf("my-index") ==
      WeaviateIndexStore.classNameOf("my-index")) // deterministic
    assert(WeaviateIndexStore.classNameOf("My_index") == "My_index")
    intercept[IllegalArgumentException] { WeaviateIndexStore.classNameOf("") }
  }

  test("replace emits weaviate's wire sequence: delete class, create class, batched objects") {
    val s = store("wire")
    val clsName = s.className
    s.replace(docs(1L -> "a", 2L -> "b"))
    val reqs = stub.requestLog
    val kinds = reqs.map(r => (r.method, r.path)).filter {
      case (_, p) => p.contains("/v1/schema") || p.contains("/v1/batch")
    }
    assert(kinds.takeRight(3) == Seq(
      ("DELETE", s"/v1/schema/$clsName"), ("POST", "/v1/schema"), ("POST", "/v1/batch/objects")))
    val create = reqs.filter(r => r.method == "POST" && r.path == "/v1/schema").last
    val cls = mapper.readTree(create.body)
    assert(cls.path("class").asText() == clsName)
    assert(cls.path("vectorizer").asText() == "none")
    assert(cls.path("description").asText().contains("doc_id")) // Spark schema JSON
    val batch = reqs.filter(r => r.method == "POST" && r.path == "/v1/batch/objects").last
    val objs = mapper.readTree(batch.body).path("objects")
    assert(objs.size() == 2)
    objs.forEach { o =>
      assert(o.path("class").asText() == clsName)
      assert(o.path("id").asText().matches("[0-9a-f-]{36}"))
      assert(o.path("properties").has("doc_json") && o.path("properties").has("embedding_pk"))
      assert(o.path("vector").isArray)
    }
  }

  test("retrying the same batch is idempotent — object ids derive from doc_id") {
    val s = store("idem")
    s.replace(docs(1L -> "a"))
    s.insertPrechecked(docs(2L -> "b"))
    s.insertPrechecked(docs(2L -> "b"))
    assert(stub.objectCount(s.className) == 2)
    assert(s.read().count() == 2)
  }

  test("a per-object FAILED inside a 200 batch response raises instead of dropping rows") {
    val s = store("objfail")
    s.replace(docs(1L -> "a"))
    // weaviate fails INDIVIDUAL objects inside a 200 (result.status=FAILED);
    // an empty vector triggers the stub's per-object failure path
    val bad = Seq((2L, "b", Seq.empty[Float])).toDF("doc_id", "content", "vector")
    val e = intercept[IllegalStateException] { s.insertPrechecked(bad) }
    assert(e.getMessage.contains("failed"))
    assert(s.read().count() == 1, "the failed object must not silently count as stored")
  }

  test("large batches upload per-partition from executors") {
    val s = store("dist", minRows = 1)
    s.replace(docs(1L -> "a").repartition(1))
    val before = stub.requestLog.count(r =>
      r.method == "POST" && r.path == "/v1/batch/objects")
    s.insertPrechecked(
      docs(10L -> "j", 11L -> "k", 12L -> "l", 13L -> "m", 14L -> "n", 15L -> "o")
        .repartition(3))
    val posts = stub.requestLog.count(r =>
      r.method == "POST" && r.path == "/v1/batch/objects") - before
    assert(posts == 3, s"expected one batch POST per partition, got $posts")
    assert(s.read().count() == 7)
  }

  test("delete goes through weaviate's batch where-filter (ContainsAny on embedding_pk)") {
    val s = store("del")
    s.replace(docs(1L -> "a", 2L -> "b", 3L -> "c"))
    s.delete(Seq(2L, 99L))
    assert(s.read().select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    val delReq = stub.requestLog.filter(r =>
      r.method == "DELETE" && r.path == "/v1/batch/objects").last
    val where = mapper.readTree(delReq.body).path("match").path("where")
    assert(where.path("operator").asText() == "ContainsAny")
    assert(where.path("path").path(0).asText() == "embedding_pk")
    assert(where.path("valueIntArray").size() == 2) // array-typed operand, not scalar valueInt
  }

  test("searchSimilar runs server-side GraphQL nearVector with a distance threshold") {
    val s = store("search")
    s.replace(Seq(
      (1L, "east", Seq(1.0f, 0.0f)),
      (2L, "north", Seq(0.0f, 1.0f)),
      (3L, "northeast", Seq(1.0f, 1.0f))
    ).toDF("doc_id", "content", "vector"))
    val hits = s.searchSimilar(Seq(1.0f, 0.05f), limit = 2)
    val got = hits.select("doc_id", "content").as[(Long, String)].collect()
    assert(got.length == 2 && got.head == ((1L, "east")))
    // threshold 0.9 → weaviate distance bound 0.1: only the aligned vector survives
    val strict = s.searchSimilar(Seq(1.0f, 0.0f), limit = 10, similarityThreshold = 0.9)
    assert(strict.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(strict.select("score").as[Double].head() > 0.99)
    val gql = mapper.readTree(stub.requestLog.filter(_.path == "/v1/graphql").last.body)
      .path("query").asText()
    // the reference's list-wrapped {"distance": [d]} is NOT sent — scalar only
    assert(gql.contains("distance: 0.09") || gql.contains("distance: 0.1"),
      s"expected a scalar distance bound in: $gql")
    assert(gql.contains("_additional { distance vector }"))
    intercept[IllegalArgumentException] { s.searchSimilar(Seq(1.0f, 0.0f), 5, -0.1) }
  }

  test("reads cursor-page through large classes") {
    val s = new WeaviateIndexStore(spark, stub.baseUrl, "paged", backoffMs = 1,
      listBatchRows = 7)
    s.replace(docs((1L to 40L).map(i => i -> s"doc $i"): _*))
    assert(s.read().select("doc_id").as[Long].collect().toSet == (1L to 40L).toSet)
    val lists = stub.requestLog.count(r =>
      r.method == "GET" && r.path == "/v1/objects" && r.query.contains("class=Paged"))
    assert(lists >= 6, s"expected cursor-paged listings, got $lists")
  }

  test("VectorIndex exact cosine search routes SERVER-side through GraphQL nearVector") {
    val cfg = graft.core.IndexConfig("wroute", "id",
      Seq(graft.core.EmbeddingField("title", important = true), graft.core.EmbeddingField("body")),
      tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val idx = new VectorIndex(spark, cfg, graft.embed.HashEmbeddingBackend(16),
      graft.embed.EchoChatBackend(), "unused://path", "page", "id",
      storeOverride = Some(new WeaviateIndexStore(spark, stub.baseUrl, "vi-route",
        backoffMs = 1)))
    idx.rebuild(Seq(
      (1L, "alpha", "first topic text"),
      (2L, "beta", "second subject text"),
      (3L, "gamma", "third theme text")).toDF("id", "title", "body"))
    val before = stub.requestLog.count(_.path == "/v1/graphql")
    val hits = idx.search("second subject text", k = 2, threshold = -1.0)
    assert(stub.requestLog.count(_.path == "/v1/graphql") > before,
      "exact search must go through GraphQL nearVector, not an object download")
    // server route and Spark-side scan agree exactly
    val local = graft.query.Retrieval.search(idx.documents, "second subject text",
      graft.embed.HashEmbeddingBackend(16), k = 2, threshold = -1.0)
    assert(hits.select("doc_id").as[Long].collect().toSet ==
      local.select("doc_id").as[Long].collect().toSet)
    assert(hits.count() == 2)
  }

  test("a VectorIndex runs its full lifecycle against the weaviate connector") {
    val cfg = graft.core.IndexConfig("weaviate", "id",
      Seq(graft.core.EmbeddingField("title", important = true), graft.core.EmbeddingField("body")),
      tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val idx = new VectorIndex(spark, cfg, graft.embed.HashEmbeddingBackend(16),
      graft.embed.EchoChatBackend(), "unused://path", "page", "id",
      storeOverride = Some(new WeaviateIndexStore(spark, stub.baseUrl, "vi-life",
        backoffMs = 1)))
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
}
