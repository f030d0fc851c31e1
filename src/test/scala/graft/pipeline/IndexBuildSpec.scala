package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.{EmbeddingField, IndexConfig}
import graft.embed.{ConstantEmbeddingBackend, HashEmbeddingBackend}

/** Build-pipeline behavior ports: important-prefix on every chunk
  * (reference test_django_converter.py:35-46), one Document per short object
  * (test_model_index.py:45-49), incremental skip of unchanged content
  * (storage/django.py:267-277).
  */
class IndexBuildSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val config = IndexConfig(name = "t", keyColumn = "id",
    fields = Seq(EmbeddingField("title", important = true), EmbeddingField("body")),
    tokenLimit = 30, chunkOverlap = 5)

  def source = Seq(
    (1L, "Title One", (1 to 60).map(i => s"w$i").mkString(" ")),
    (2L, "Title Two", "short body"))
    .toDF("id", "title", "body")

  test("extractFields validates configured columns") {
    val bad = IndexConfig("t", "id", Seq(EmbeddingField("nope")))
    val e = intercept[IllegalArgumentException] {
      IndexBuild.extractFields(source, bad)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("every chunk is prefixed with the important field") {
    val keyed = source.withColumn("key", concat_ws(":", lit("page"), col("id")))
    val chunks = IndexBuild.chunk(IndexBuild.extractFields(keyed, config), config)
    val contents = chunks.select("content").as[String].collect()
    assert(contents.nonEmpty)
    assert(contents.forall(c => c.startsWith("Title One\n") || c.startsWith("Title Two\n")))
    // long body must produce multiple chunks
    val n1 = chunks.filter(col("key") === "page:1").count()
    assert(n1 > 1)
  }

  test("chunk format matches reference with NO important fields (leading newline)") {
    // reference formats f"{important_text}\n{chunk}" unconditionally
    // (storage/django.py:429-432)
    val cfg = IndexConfig("t", "id", Seq(EmbeddingField("body")), tokenLimit = 30, chunkOverlap = 5)
    val keyed = Seq((1L, "just a body")).toDF("id", "body")
      .withColumn("key", concat_ws(":", lit("page"), col("id")))
    val contents = IndexBuild.chunk(IndexBuild.extractFields(keyed, cfg), cfg)
      .select("content").as[String].collect()
    assert(contents.toSeq == Seq("\njust a body"))
  }

  test("object_keys carries parent-class keys in MRO order; lookup by parent key works") {
    val cfg = config.copy(parentTables = Seq("page", "basepage"))
    val docs = IndexBuild.buildDocuments(
      Seq((5L, "Title Five", "short body")).toDF("id", "title", "body"),
      cfg, ConstantEmbeddingBackend(Seq(1f)), "blogpage", "id")
    val keys = docs.select("object_keys").head().getSeq[String](0)
    assert(keys == Seq("blogpage:5", "page:5", "basepage:5"))
    // base-class lookup (the reference's for_key / hydrate-by-superclass path)
    assert(docs.filter(array_contains(col("object_keys"), "page:5")).count() == 1)
    val meta = docs.select("metadata").head().getMap[String, String](0)
    assert(meta("table") == "blogpage" && meta("object_id") == "5")
  }

  test("buildDocuments: one Document per short object, stable doc_ids") {
    val docs = IndexBuild.buildDocuments(
      Seq((2L, "Title Two", "short body")).toDF("id", "title", "body"),
      config, ConstantEmbeddingBackend(Seq(1f, 2f, 3f)), "page", "id")
    val rows = docs.collect()
    assert(rows.length == 1)
    val r = docs.select("object_keys", "vector", "content").head()
    assert(r.getSeq[String](0) == Seq("page:2"))
    assert(r.getSeq[Float](1) == Seq(1f, 2f, 3f))
    assert(r.getString(2).startsWith("Title Two\n"))
  }

  test("diffAgainstIndex: unchanged objects are skipped, changed re-embedded") {
    val stored = Seq(
      (10L, Seq("page:1"), Seq(1f), "Title One\nsame content", Map.empty[String, String]),
      (11L, Seq("page:2"), Seq(1f), "Title Two\nold content", Map.empty[String, String]))
      .toDF("doc_id", "object_keys", "vector", "content", "metadata")
    val newChunks = Seq(
      ("page:1", "Title One\nsame content"),   // unchanged
      ("page:2", "Title Two\nNEW content"),    // changed
      ("page:3", "Title Three\nbrand new"))    // new object
      .toDF("key", "content")
    val (changed, unchanged) = IndexBuild.diffAgainstIndex(newChunks, Some(stored))
    assert(changed.select("key").as[String].collect().toSet == Set("page:2", "page:3"))
    assert(unchanged.select("doc_id").as[Long].collect().toSeq == Seq(10L))
  }

  test("writeIndex + readIndex + deleteByDocIds round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-index").toString + "/idx"
    val docs = IndexBuild.buildDocuments(source, config, HashEmbeddingBackend(8), "page", "id")
    IndexBuild.writeIndex(docs, tmp)
    val back = IndexBuild.readIndex(spark, tmp)
    assert(back.count() == docs.count())
    val one = back.select("doc_id").as[Long].head()
    val after = IndexBuild.deleteByDocIds(back, Seq(one).toDF("doc_id"))
    assert(after.count() == back.count() - 1)
  }

  test("incremental rebuild: second build with unchanged source keeps vectors without re-embedding") {
    val backend = HashEmbeddingBackend(8)
    val first = IndexBuild.buildDocuments(source, config, backend, "page", "id")
    val firstRows = first.collect()
    val stored = spark.createDataFrame(spark.sparkContext.parallelize(firstRows.toSeq), first.schema)
    val second = IndexBuild.buildDocuments(source, config, backend, "page", "id", Some(stored))
    // same doc set, nothing changed → identical doc_ids and contents
    assert(second.select("doc_id").as[Long].collect().sorted.toSeq ==
      first.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
