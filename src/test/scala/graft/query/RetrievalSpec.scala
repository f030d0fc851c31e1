package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Metric
import graft.embed.{ConstantEmbeddingBackend, EchoChatBackend, FixedChatBackend, HashEmbeddingBackend}

/** Ports the reference's retrieval-behavior tests: the content-keyed vector
  * fixture and threshold table (tests/test_index.py:18-26, 256-284),
  * first-key dedup (test_django_converter.py:169-180), and the RAG response
  * shape (tests/conftest.py:56-67, test_model_index.py:24-49).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Content-keyed fixture (reference test_index.py:18-26): query [1,0,0]. */
  val fixture = Seq(
    (1L, Seq("p:1"), Seq(0.9f, 0.1f, 0.0f), "Very similar to the query"),
    (2L, Seq("p:2"), Seq(0.7f, 0.3f, 0.0f), "Somewhat similar"),
    (3L, Seq("p:3"), Seq(1.0f, 0.0f, 0.0f), "test exact"),
    (4L, Seq("p:4"), Seq(0.1f, 0.1f, 0.8f), "unrelated"))

  def index = fixture.toDF("doc_id", "object_keys", "vector", "content")
  val query = Seq(1.0f, 0.0f, 0.0f)

  test("threshold table: higher thresholds keep fewer results (0/1/2/3 shape)") {
    // cosines: d3=1.0, d1≈0.994, d2≈0.919, d4≈0.122
    def n(t: Double) = Retrieval.knn(index, query, k = 5, threshold = t).count()
    assert(n(0.999) == 1)   // only the exact match
    assert(n(0.95) == 2)
    assert(n(0.6) == 3)
    assert(n(0.0) == 4)
  }

  test("knn returns top-k in similarity order with deterministic ties") {
    val got = Retrieval.knn(index, query, k = 3).select("doc_id").as[Long].collect()
    assert(got.toSeq == Seq(3L, 1L, 2L))
  }

  test("L2 and MIP metrics order correctly") {
    val l2 = Retrieval.knn(index, query, k = 1, threshold = Double.NegativeInfinity,
      metric = Metric.L2).select("doc_id").as[Long].head()
    assert(l2 == 3L)
    val mip = Retrieval.knn(index, query, k = 1, threshold = Double.NegativeInfinity,
      metric = Metric.MaxInnerProduct).select("doc_id").as[Long].head()
    assert(mip == 3L) // dot: d3=1.0 > d1=0.9
  }

  test("dedupByKey keeps first per key in score order") {
    val results = Seq(
      ("p:1", 10L, 0.9), ("p:1", 11L, 0.8), ("p:2", 12L, 0.7), ("p:2", 13L, 0.75))
      .toDF("key", "doc_id", "score")
    val got = Retrieval.dedupByKey(results).select("doc_id").as[Long].collect().toSet
    assert(got == Set(10L, 13L))
  }

  test("search embeds query, dedups by first object key") {
    val backend = HashEmbeddingBackend(8)
    val docs = Seq(
      (1L, Seq("p:1"), "spark vector engine", "spark vector engine"),
      (2L, Seq("p:2"), "other content here", "other content here"))
      .map { case (id, keys, text, content) =>
        (id, keys, backend.embedOne(text).toSeq, content) }
      .toDF("doc_id", "object_keys", "vector", "content")
    val hits = Retrieval.search(docs, "spark vector engine", backend, k = 2, threshold = -1.0)
    val top = hits.orderBy(desc("score")).select("key").as[String].head()
    assert(top == "p:1")
  }

  test("findSimilar excludes the probe object unless includeSelf") {
    val withoutSelf = Retrieval.findSimilar(index, "p:3", k = 4, threshold = -1.0)
    assert(!withoutSelf.select("key").as[String].collect().contains("p:3"))
    val withSelf = Retrieval.findSimilar(index, "p:3", k = 4, threshold = -1.0, includeSelf = true)
    assert(withSelf.select("key").as[String].collect().contains("p:3"))
  }

  test("hydrate joins parsed keys back to the source table") {
    val results = Seq(("customer:1", 0.9), ("customer:3", 0.8)).toDF("key", "score")
    val source = Seq((1L, "Alice"), (2L, "Bob"), (3L, "Carol")).toDF("c_custkey", "c_name")
    val got = Retrieval.hydrate(results, source, "customer", "c_custkey")
      .select("c_name").as[String].collect().toSet
    assert(got == Set("Alice", "Carol"))
  }

  test("ragQuery assembles context and returns chat response with sources") {
    val embed = ConstantEmbeddingBackend(Seq(1f, 0f, 0f))
    val resp = Retrieval.ragQuery(index, "what is similar?", embed, FixedChatBackend(),
      sourcesLimit = 2, threshold = -1.0)
    assert(resp.response == "AI! Don't talk to me about AI!")
    assert(resp.sources.count() == 2)
    val echo = Retrieval.ragQuery(index, "q", embed, EchoChatBackend(), sourcesLimit = 1,
      threshold = -1.0)
    assert(echo.response.startsWith("This is an echo backend:"))
  }
}
