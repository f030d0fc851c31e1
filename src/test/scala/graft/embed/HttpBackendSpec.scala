package graft.embed

import java.util.concurrent.Semaphore

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.{EmbeddingField, IndexConfig}
import graft.pipeline.IndexBuild

/** The HTTP connector seam closed offline: [[HttpEmbeddingBackend]] /
  * [[HttpChatBackend]] against the in-process [[HttpStub]] speaking the
  * litellm/OpenAI wire shapes (litellm.py:146-156, 175-186) — batch
  * economics, retry/backoff, loud dim mismatch, SSE chunk-by-chunk arrival,
  * and the full buildDocuments pipeline through the wire.
  */
class HttpBackendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withStub[A](stub: HttpStub)(f: HttpStub => A): A =
    try f(stub) finally stub.stop()

  test("embedBatch round-trips vectors in request order through the wire") {
    withStub(new HttpStub()) { stub =>
      val b = HttpEmbeddingBackend(stub.embeddingsUrl, "stub-model", dims = 16, backoffMs = 1)
      val texts = Seq("alpha", "bee", "this is a longer one")
      val got = b.embedBatch(texts)
      assert(got.map(_.toSeq) == texts.map(t => stub.vectorFor(t).toSeq))
      assert(stub.embedCalls.get() == 1, "one batch = one HTTP call")
    }
  }

  test("EmbedStage batches 100 texts per HTTP call (the reference's economics)") {
    withStub(new HttpStub()) { stub =>
      val b = HttpEmbeddingBackend(stub.embeddingsUrl, "stub-model", dims = 16, backoffMs = 1)
      val df = (1 to 250).map(i => (i.toLong, s"doc number $i")).toDF("id", "text")
        .repartition(1) // one partition → call count is exactly ceil(250/100)
      val out = EmbedStage.embed(df, "text", b, batchSize = 100)
      assert(out.count() == 250)
      assert(stub.embedCalls.get() == 3, s"expected 3 batch calls, got ${stub.embedCalls.get()}")
      val v = out.filter(col("id") === 7).select("vector").head().getSeq[Float](0)
      assert(v == stub.vectorFor("doc number 7").toSeq)
    }
  }

  test("429s are retried with backoff until success; the result is unaffected") {
    withStub(new HttpStub(failFirst = 2, failStatus = 429)) { stub =>
      val b = HttpEmbeddingBackend(stub.embeddingsUrl, "stub-model", dims = 16,
        maxRetries = 3, backoffMs = 1)
      val got = b.embedBatch(Seq("x"))
      assert(got.head.toSeq == stub.vectorFor("x").toSeq)
      assert(stub.calls.get() == 3, "two failures + one success")
    }
  }

  test("exhausted retries surface the last status loudly") {
    withStub(new HttpStub(failFirst = 100, failStatus = 503)) { stub =>
      val b = HttpEmbeddingBackend(stub.embeddingsUrl, "stub-model", dims = 16,
        maxRetries = 2, backoffMs = 1)
      val e = intercept[IllegalStateException] { b.embedBatch(Seq("x")) }
      assert(e.getMessage.contains("503") && e.getMessage.contains("3 attempts"), e.getMessage)
      assert(stub.calls.get() == 3)
    }
  }

  test("non-retriable 4xx fails fast — a malformed request never heals") {
    withStub(new HttpStub(failFirst = 100, failStatus = 400)) { stub =>
      val b = HttpEmbeddingBackend(stub.embeddingsUrl, "stub-model", dims = 16,
        maxRetries = 5, backoffMs = 1)
      val e = intercept[IllegalStateException] { b.embedBatch(Seq("x")) }
      assert(e.getMessage.contains("400") && e.getMessage.contains("not retriable"), e.getMessage)
      assert(stub.calls.get() == 1, "no retry on 400")
    }
  }

  test("a response vector of the wrong width fails loudly, never stores") {
    withStub(new HttpStub()) { stub =>
      val b = HttpEmbeddingBackend(stub.truncatedUrl, "stub-model", dims = 16, backoffMs = 1)
      val e = intercept[IllegalStateException] { b.embedBatch(Seq("x")) }
      assert(e.getMessage.contains("15-dim") && e.getMessage.contains("expected 16"), e.getMessage)
    }
  }

  test("forModel resolves dims/token limit from the registry; unknown model is loud") {
    val b = HttpEmbeddingBackend.forModel("http://unused", "text-embedding-3-small")
    assert(b.dims == 1536 && b.tokenLimit == 8191)
    val e = intercept[IllegalArgumentException] {
      HttpEmbeddingBackend.forModel("http://unused", "no-such-model")
    }
    assert(e.getMessage.contains("no-such-model"))
  }

  test("full buildDocuments pipeline through the HTTP backend") {
    withStub(new HttpStub()) { stub =>
      val b = HttpEmbeddingBackend(stub.embeddingsUrl, "stub-model", dims = 16, backoffMs = 1)
      val config = IndexConfig(name = "t", keyColumn = "id",
        fields = Seq(EmbeddingField("title", important = true), EmbeddingField("body")),
        tokenLimit = 30, chunkOverlap = 5)
      val source = Seq(
        (1L, "Title One", (1 to 60).map(i => s"w$i").mkString(" ")),
        (2L, "Title Two", "short body")).toDF("id", "title", "body")
      val docs = IndexBuild.buildDocuments(source, config, b, "page", "id").collect()
      assert(docs.length > 2, "long body must chunk")
      // every stored vector is exactly what the wire returned for its content
      docs.foreach { r =>
        val content = r.getAs[String]("content")
        assert(r.getSeq[Float](r.fieldIndex("vector")) == stub.vectorFor(content).toSeq)
      }
      assert(stub.embedCalls.get() >= 1)
    }
  }

  test("chat round-trips the last user message") {
    withStub(new HttpStub()) { stub =>
      val b = HttpChatBackend(stub.chatUrl, "stub-chat", backoffMs = 1)
      val got = b.chat(Seq(ChatMessage("system", "be brief"), ChatMessage("user", "hi there")))
      assert(got == "echo:hi there")
      assert(stub.chatCalls.get() == 1)
    }
  }

  test("chat retries 5xx then succeeds") {
    withStub(new HttpStub(failFirst = 1, failStatus = 500)) { stub =>
      val b = HttpChatBackend(stub.chatUrl, "stub-chat", maxRetries = 2, backoffMs = 1)
      assert(b.chat(Seq(ChatMessage("user", "q"))) == "echo:q")
      assert(stub.calls.get() == 2)
    }
  }

  test("chatStream yields SSE chunks AS THEY ARRIVE, not after the stream closes") {
    withStub(new HttpStub()) { stub =>
      stub.chatChunks = Seq("one", "two", "three")
      val gate = new Semaphore(0)
      stub.streamGate = Some(gate)
      val b = HttpChatBackend(stub.chatUrl, "stub-chat", backoffMs = 1)
      val it = b.chatStream(Seq(ChatMessage("user", "q")))
      // the server holds every chunk until released: if the iterator
      // buffered the whole body, this first read would block forever
      gate.release(1)
      val first = Await.result(Future(it.next()), 5.seconds)
      assert(first == "one")
      gate.release(2)
      assert(Await.result(Future(it.toSeq), 5.seconds) == Seq("two", "three"))
      stub.streamGate = None
    }
  }

  test("chatStream retries a pre-stream 429, then streams") {
    withStub(new HttpStub(failFirst = 1, failStatus = 429)) { stub =>
      val b = HttpChatBackend(stub.chatUrl, "stub-chat", maxRetries = 2, backoffMs = 1)
      assert(b.chatStream(Seq(ChatMessage("user", "q"))).mkString == "Hello from the stub")
      assert(stub.calls.get() == 2)
    }
  }
}
