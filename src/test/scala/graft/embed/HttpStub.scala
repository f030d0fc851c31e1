package graft.embed

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process HTTP stub speaking the litellm/OpenAI embedding + chat wire
  * shapes — the offline test double for [[HttpEmbeddingBackend]] /
  * [[HttpChatBackend]] (no network leaves the JVM; the server binds a
  * loopback ephemeral port). Failure injection: `failFirst` requests get
  * `failStatus` before any succeeds, counting every arrival in `calls`.
  */
final class HttpStub(failFirst: Int = 0, failStatus: Int = 429,
                     embedDims: Int = 16) {
  private val mapper = new ObjectMapper()
  val calls = new AtomicInteger(0)
  val embedCalls = new AtomicInteger(0)
  val chatCalls = new AtomicInteger(0)
  /** Chat streaming handshake: the server blocks before emitting chunk i+1
    * until `release(i)` — lets a test prove chunks arrive incrementally.
    */
  @volatile var streamGate: Option[java.util.concurrent.Semaphore] = None

  /** Deterministic stub embedding, distinct from HashEmbeddingBackend so a
    * test can tell which backend produced a vector: v[i] = (len + i) / 100.
    */
  def vectorFor(text: String): Array[Float] =
    Array.tabulate(embedDims)(i => (text.length + i) / 100.0f)

  @volatile var chatChunks: Seq[String] = Seq("Hello", " from", " the", " stub")

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def send(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def maybeFail(ex: HttpExchange): Boolean =
    if (calls.incrementAndGet() <= failFirst) {
      send(ex, failStatus, s"""{"error": "injected $failStatus"}""")
      true
    } else false

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  server.createContext("/v1/embeddings", (ex: HttpExchange) => {
    if (!maybeFail(ex)) {
      embedCalls.incrementAndGet()
      val req = mapper.readTree(readBody(ex))
      val root = mapper.createObjectNode()
      val data = root.putArray("data")
      var i = 0
      req.path("input").forEach { t =>
        val item = data.addObject()
        item.put("index", i)
        val arr = item.putArray("embedding")
        vectorFor(t.asText()).foreach(arr.add)
        i += 1
      }
      send(ex, 200, mapper.writeValueAsString(root))
    }
  })

  server.createContext("/v1/truncated", (ex: HttpExchange) => {
    if (!maybeFail(ex)) { // wrong width: embedDims - 1 values per vector
      val req = mapper.readTree(readBody(ex))
      val root = mapper.createObjectNode()
      val data = root.putArray("data")
      var i = 0
      req.path("input").forEach { t =>
        val item = data.addObject()
        item.put("index", i)
        val arr = item.putArray("embedding")
        vectorFor(t.asText()).dropRight(1).foreach(arr.add)
        i += 1
      }
      send(ex, 200, mapper.writeValueAsString(root))
    }
  })

  server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
    if (!maybeFail(ex)) {
      chatCalls.incrementAndGet()
      val req = mapper.readTree(readBody(ex))
      val streaming = req.path("stream").asBoolean(false)
      val lastUser = {
        var s = ""
        req.path("messages").forEach(m => if (m.path("role").asText() == "user") s = m.path("content").asText())
        s
      }
      if (!streaming) {
        val root = mapper.createObjectNode()
        val choice = root.putArray("choices").addObject()
        choice.putObject("message").put("content", s"echo:$lastUser")
        send(ex, 200, mapper.writeValueAsString(root))
      } else {
        ex.getResponseHeaders.add("Content-Type", "text/event-stream")
        ex.sendResponseHeaders(200, 0) // chunked
        val out = ex.getResponseBody
        def writeEvent(s: String): Unit = {
          val o = mapper.createObjectNode()
          o.putArray("choices").addObject().putObject("delta").put("content", s)
          out.write(s"data: ${mapper.writeValueAsString(o)}\n\n".getBytes(StandardCharsets.UTF_8))
          out.flush()
        }
        chatChunks.foreach { c => streamGate.foreach(_.acquire()); writeEvent(c) }
        out.write("data: [DONE]\n\n".getBytes(StandardCharsets.UTF_8))
        out.flush()
        ex.close()
      }
    }
  })

  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.start()

  val port: Int = server.getAddress.getPort
  def embeddingsUrl: String = s"http://127.0.0.1:$port/v1/embeddings"
  def truncatedUrl: String = s"http://127.0.0.1:$port/v1/truncated"
  def chatUrl: String = s"http://127.0.0.1:$port/v1/chat/completions"

  def stop(): Unit = server.stop(0)
}
