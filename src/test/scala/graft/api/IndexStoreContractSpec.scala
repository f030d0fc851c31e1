package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The five-op [[IndexStore]] provider contract as ONE parametrized suite
  * (r6 verdict #7): every impl — parquet, in-memory, REST connector — must
  * pass the same behavioral checks, which documents exactly what a real
  * qdrant/weaviate adapter has to satisfy: existence lifecycle, replace
  * round-trip with in-batch dedup, OLD-WINS upsert (pgvector
  * bulk_create(ignore_conflicts=True), provider.py:65-72), delete +
  * revive-by-reinsert, clear, and exact vector fidelity through the store.
  */
abstract class IndexStoreContract extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Impl under test; `tag` disambiguates storage roots per test. */
  def makeStore(tag: String): IndexStore
  def implName: String

  protected def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "content")
      .withColumn("object_keys", array(concat(lit("t:"), col("doc_id"))))
      .withColumn("vector", typedLit(Seq(0.25f, -1.5f)))
      .withColumn("metadata", map(lit("table"), lit("t")))

  test(s"$implName: existence lifecycle (exists / readOption / read-throws)") {
    val s = makeStore("life")
    assert(!s.exists)
    assert(s.readOption().isEmpty)
    intercept[Throwable] { s.read().count() }
    s.replace(docs(1L -> "a"))
    assert(s.exists)
    assert(s.readOption().isDefined)
  }

  test(s"$implName: replace round-trips rows and dedups in-batch doc_ids") {
    val s = makeStore("replace")
    val dup = docs(1L -> "first", 2L -> "two").unionByName(docs(1L -> "second"))
    s.replace(dup)
    val got = s.read()
    assert(got.count() == 2)
    assert(got.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // full replace discards prior contents
    s.replace(docs(9L -> "nine"))
    assert(s.read().select("doc_id").as[Long].collect().toSet == Set(9L))
  }

  test(s"$implName: vector values survive the store exactly") {
    val s = makeStore("fidelity")
    s.replace(docs(1L -> "a"))
    val v = s.read().select("vector").head().getSeq[Float](0)
    assert(v == Seq(0.25f, -1.5f))
    val keys = s.read().select("object_keys").head().getSeq[String](0)
    assert(keys == Seq("t:1"))
  }

  test(s"$implName: upsert is old-wins on conflict, inserts the rest") {
    val s = makeStore("upsert")
    s.replace(docs(1L -> "original", 2L -> "two"))
    s.upsert(docs(1L -> "conflicting rewrite", 3L -> "three"))
    val m = s.read().select("doc_id", "content").as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "original", 2L -> "two", 3L -> "three"))
    // all-conflict upsert is a no-op
    s.upsert(docs(2L -> "another rewrite"))
    assert(s.read().select("doc_id", "content").as[(Long, String)].collect().toMap == m)
  }

  test(s"$implName: upsert into a non-existent index creates it") {
    val s = makeStore("upsert-new")
    s.upsert(docs(5L -> "five"))
    assert(s.read().select("doc_id").as[Long].collect().toSet == Set(5L))
  }

  test(s"$implName: delete removes ids; re-insert revives; missing ids are no-ops") {
    val s = makeStore("delete")
    s.replace(docs(1L -> "a", 2L -> "b", 3L -> "c"))
    s.delete(Seq(2L, 99L))
    assert(s.read().select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    s.upsert(docs(2L -> "b2"))
    assert(s.read().select("doc_id", "content").as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test(s"$implName: clear empties everything; the store is rebuildable after") {
    val s = makeStore("clear")
    s.replace(docs(1L -> "a"))
    s.clear()
    assert(!s.exists)
    intercept[Throwable] { s.read().count() }
    s.replace(docs(2L -> "again"))
    assert(s.read().select("doc_id").as[Long].collect().toSet == Set(2L))
  }
}

class ParquetIndexStoreContractSpec extends IndexStoreContract {
  override def implName = "ParquetIndexStore"
  override def makeStore(tag: String): IndexStore = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-contract").toString
    new ParquetIndexStore(spark, s"$tmp/$tag")
  }
}

class InMemoryIndexStoreContractSpec extends IndexStoreContract {
  override def implName = "InMemoryIndexStore"
  override def makeStore(tag: String): IndexStore = new InMemoryIndexStore(spark)
}

class RestIndexStoreContractSpec extends IndexStoreContract
    with org.scalatest.BeforeAndAfterAll {
  private var stub: RestStoreStub = _
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  override def beforeAll(): Unit = { stub = new RestStoreStub() }
  override def afterAll(): Unit = if (stub != null) stub.stop()

  override def implName = "RestIndexStore"
  override def makeStore(tag: String): IndexStore =
    new RestIndexStore(spark, stub.baseUrl, s"$tag-${n.incrementAndGet()}", backoffMs = 1)

  test("RestIndexStore: a VectorIndex runs its full lifecycle against the REST provider") {
    import spark.implicits._
    val cfg = graft.core.IndexConfig("rest", "id",
      Seq(graft.core.EmbeddingField("title", important = true), graft.core.EmbeddingField("body")),
      tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val idx = new VectorIndex(spark, cfg, graft.embed.HashEmbeddingBackend(16),
      graft.embed.EchoChatBackend(), "unused://path", "page", "id",
      storeOverride = Some(makeStore("vi")))
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
  }

  test("RestIndexStore: re-sending a points batch is idempotent (doc_id-keyed upsert wire)") {
    val s = makeStore("retry")
    s.replace(docs(1L -> "a"))
    // an ambiguous failure replays the POST: the id-keyed wire rewrites
    // instead of duplicating
    s.insertPrechecked(docs(2L -> "b"))
    s.insertPrechecked(docs(2L -> "b"))
    assert(s.read().count() == 2)
    assert(s.read().filter(col("doc_id") === 2L).count() == 1)
  }

  test("RestIndexStore: large batches POST per-partition from executors") {
    import spark.implicits._
    val s = new RestIndexStore(spark, stub.baseUrl, s"dist-${n.incrementAndGet()}",
      backoffMs = 1, executorUploadMinRows = 1)
    s.replace(docs(1L -> "a").repartition(1)) // replace also distributes: schema PUT + partition POSTs
    val six = docs(10L -> "j", 11L -> "k", 12L -> "l", 13L -> "m", 14L -> "n", 15L -> "o")
      .repartition(3)
    val before = stub.pointsPostCount
    s.insertPrechecked(six)
    assert(stub.pointsPostCount - before == 3,
      s"expected one points POST per partition, got ${stub.pointsPostCount - before}")
    assert(s.read().count() == 7)
  }
}
