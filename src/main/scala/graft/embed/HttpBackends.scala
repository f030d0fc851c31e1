package graft.embed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** HTTP connectors for the embedding/chat seams — the production path the
  * reference reaches through litellm (`litellm.embedding()` /
  * `litellm.completion()`, ai_utils/backends/litellm.py:146-156, 175-186),
  * speaking the same wire shape those calls emit:
  *
  *  - embeddings: POST `{"model", "input": [texts]}` →
  *    `{"data": [{"index", "embedding": [floats]}]}`
  *  - chat: POST `{"model", "messages": [{"role","content"}], "stream"}` →
  *    `{"choices": [{"message": {"content"}}]}`, or, streamed, SSE
  *    `data: {"choices":[{"delta":{"content"}}]}` lines ending `data: [DONE]`
  *
  * Zero new dependencies: JDK 17's HttpClient + the Jackson classes Spark
  * already ships. Connectors are case classes of plain strings/numbers, so
  * they serialize into executor closures; the HTTP client itself is
  * rebuilt per-JVM (@transient lazy).
  *
  * Failure policy (shared, [[HttpSupport.postWithRetry]]): 429 and 5xx are
  * retried with exponential backoff (they are capacity/transient states, the
  * classes litellm's own retry logic covers), as are connect/IO errors;
  * any other 4xx fails fast — a malformed request never heals by retrying.
  * Exhausted retries surface the LAST status/body loudly.
  */
object HttpSupport {
  /** Shared across graft's HTTP connectors (thread-safe after config). */
  val mapper = new ObjectMapper()

  def client(requestTimeoutMs: Long): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(requestTimeoutMs))
      .build()

  private def retriable(status: Int): Boolean = status == 429 || status >= 500

  private def request(method: String, endpoint: String, body: Option[String],
                      apiKey: Option[String], requestTimeoutMs: Long): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .method(method, body.map(s => HttpRequest.BodyPublishers.ofString(s, StandardCharsets.UTF_8))
        .getOrElse(HttpRequest.BodyPublishers.noBody()))
    apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
    b.build()
  }

  /** Send a request, return (status, body); retry 429/5xx and IO errors per
    * the policy above, surfacing the last failure after `maxRetries`
    * RE-tries (0 = single attempt). Any other status RETURNS — what a 404
    * means (missing collection vs hard error) is the caller's semantics.
    */
  def sendWithRetry(http: HttpClient, method: String, endpoint: String,
                    body: Option[String], apiKey: Option[String],
                    maxRetries: Int, backoffMs: Long,
                    requestTimeoutMs: Long): (Int, String) = {
    var attempt = 0
    while (true) {
      val outcome: Either[Throwable, HttpResponse[String]] =
        try Right(http.send(request(method, endpoint, body, apiKey, requestTimeoutMs),
          HttpResponse.BodyHandlers.ofString()))
        catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(r) if !retriable(r.statusCode()) => return (r.statusCode(), r.body())
        case Right(r) if attempt >= maxRetries =>
          throw new IllegalStateException(
            s"$endpoint still failing after ${attempt + 1} attempts: " +
              s"last status ${r.statusCode()}: ${r.body().take(500)}")
        case Left(e) if attempt >= maxRetries =>
          throw new IllegalStateException(
            s"$endpoint unreachable after ${attempt + 1} attempts", e)
        case _ => // retriable — back off and go again
          Thread.sleep(backoffMs << attempt)
      }
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** POST expecting 200: convenience over [[sendWithRetry]] that fails
    * loudly on any non-200 (non-retriable statuses never heal by retrying).
    */
  def postWithRetry(http: HttpClient, endpoint: String, body: String,
                    apiKey: Option[String], maxRetries: Int, backoffMs: Long,
                    requestTimeoutMs: Long): String =
    sendWithRetry(http, "POST", endpoint, Some(body), apiKey, maxRetries,
      backoffMs, requestTimeoutMs) match {
      case (200, b) => b
      case (status, b) => throw new IllegalStateException(
        s"$endpoint returned $status (not retriable): ${b.take(500)}")
    }

  /** Streaming POST: returns (status, body stream). The caller owns the
    * stream; retry handling for streams lives in the caller because a
    * stream can only fail-before-first-byte cheaply.
    */
  def postStream(http: HttpClient, endpoint: String, body: String,
                 apiKey: Option[String],
                 requestTimeoutMs: Long): HttpResponse[java.io.InputStream] =
    http.send(request("POST", endpoint, Some(body), apiKey, requestTimeoutMs),
      HttpResponse.BodyHandlers.ofInputStream())
}

/** Embedding connector speaking the litellm/OpenAI embeddings wire shape.
  * `dims` is the DECLARED output width: a response vector of any other
  * length fails loudly (silently storing mis-sized vectors would poison
  * every downstream ANN structure). Batch size stays the caller's concern —
  * [[EmbedStage.embed]] calls once per 100-text partition chunk, matching
  * the reference's batching economics (storage/django.py:390-402).
  */
final case class HttpEmbeddingBackend(
    endpoint: String,
    model: String,
    dims: Int,
    tokenLimit: Int = 8191,
    apiKey: Option[String] = None,
    maxRetries: Int = 3,
    backoffMs: Long = 200,
    requestTimeoutMs: Long = 60000) extends EmbeddingBackend {

  @transient private lazy val http = HttpSupport.client(requestTimeoutMs)

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val root = HttpSupport.mapper.createObjectNode()
    root.put("model", model)
    val in = root.putArray("input")
    texts.foreach(in.add)
    val resp = HttpSupport.postWithRetry(http, endpoint,
      HttpSupport.mapper.writeValueAsString(root), apiKey, maxRetries,
      backoffMs, requestTimeoutMs)
    val data = HttpSupport.mapper.readTree(resp).path("data")
    require(data.isArray && data.size() == texts.size,
      s"embedding response has ${data.size()} vectors for ${texts.size} inputs")
    // order by the response's own index field (the wire contract does not
    // promise array order), then verify the declared width
    val out = new Array[Array[Float]](texts.size)
    data.forEach { node =>
      val idx = node.path("index").asInt(-1)
      require(idx >= 0 && idx < texts.size, s"embedding response index $idx out of range")
      val emb = node.path("embedding")
      if (emb.size() != dims)
        throw new IllegalStateException(
          s"model $model returned a ${emb.size()}-dim vector, expected $dims — " +
            "embedding dimensions are declared at index build time and must match")
      val v = new Array[Float](dims)
      var i = 0
      emb.forEach { x => v(i) = x.floatValue(); i += 1 }
      out(idx) = v
    }
    require(out.forall(_ != null), "embedding response missed at least one input index")
    out.toSeq
  }
}

object HttpEmbeddingBackend {
  /** Config-resolution constructor (reference from_settings,
    * litellm.py:103-139): dims/token limit come from the model registry
    * unless overridden — unknown model with no override fails loudly, like
    * the reference's ImproperlyConfigured.
    */
  def forModel(endpoint: String, modelId: String,
               dimsOverride: Option[Int] = None,
               tokenLimitOverride: Option[Int] = None,
               apiKey: Option[String] = None): HttpEmbeddingBackend =
    HttpEmbeddingBackend(endpoint, modelId,
      dims = graft.core.BackendRegistry.dims(modelId, dimsOverride),
      tokenLimit = graft.core.BackendRegistry.tokenLimit(modelId, tokenLimitOverride),
      apiKey = apiKey)
}

/** Chat connector (non-streaming + SSE streaming), litellm/OpenAI completion
  * wire shape. `chat` returns the first choice's message content (the
  * reference's AIResponse carries all choices but every call site reads
  * choices[0], storage/base.py:260-276). `chatStream` yields delta chunks
  * AS THEY ARRIVE — the iterator reads the SSE stream lazily, one `data:`
  * line per chunk, so a consumer renders tokens incrementally.
  */
final case class HttpChatBackend(
    endpoint: String,
    model: String,
    apiKey: Option[String] = None,
    maxRetries: Int = 3,
    backoffMs: Long = 200,
    requestTimeoutMs: Long = 60000) extends ChatBackend {

  @transient private lazy val http = HttpSupport.client(requestTimeoutMs)

  private def body(messages: Seq[ChatMessage], stream: Boolean): String = {
    val root = HttpSupport.mapper.createObjectNode()
    root.put("model", model)
    root.put("stream", stream)
    val ms = root.putArray("messages")
    messages.foreach { m =>
      val o = ms.addObject(); o.put("role", m.role); o.put("content", m.content)
    }
    HttpSupport.mapper.writeValueAsString(root)
  }

  override def chat(messages: Seq[ChatMessage]): String = {
    val resp = HttpSupport.postWithRetry(http, endpoint, body(messages, stream = false),
      apiKey, maxRetries, backoffMs, requestTimeoutMs)
    val content = HttpSupport.mapper.readTree(resp)
      .path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || content.isNull)
      throw new IllegalStateException(s"chat response carried no message content: ${resp.take(500)}")
    content.asText()
  }

  override def chatStream(messages: Seq[ChatMessage]): Iterator[String] = {
    // fail-before-first-byte (connect errors, 429/5xx status) is retried
    // like the non-streaming path; once bytes flow, a failure surfaces —
    // silently resuming mid-stream could replay or drop tokens
    var attempt = 0
    var resp: java.net.http.HttpResponse[java.io.InputStream] = null
    while (resp == null) {
      val outcome =
        try Right(HttpSupport.postStream(http, endpoint, body(messages, stream = true),
          apiKey, requestTimeoutMs))
        catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(r) if r.statusCode() == 200 => resp = r
        case Right(r) =>
          val bodyStr = try new String(r.body().readAllBytes(), StandardCharsets.UTF_8)
            finally r.body().close()
          if ((r.statusCode() == 429 || r.statusCode() >= 500) && attempt < maxRetries)
            Thread.sleep(backoffMs << attempt)
          else throw new IllegalStateException(
            s"$endpoint returned ${r.statusCode()}: ${bodyStr.take(500)}")
        case Left(e) =>
          if (attempt < maxRetries) Thread.sleep(backoffMs << attempt)
          else throw new IllegalStateException(s"$endpoint unreachable after ${attempt + 1} attempts", e)
      }
      attempt += 1
    }
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(resp.body(), StandardCharsets.UTF_8))
    // AutoCloseable so a consumer that abandons the stream early (preview
    // UIs, exceptions mid-consumption) can release the socket instead of
    // leaking it until GC; full consumption closes on [DONE]/EOF, and any
    // mid-stream failure closes before propagating
    new Iterator[String] with AutoCloseable {
      private var nextChunk: String = null
      private var done = false
      override def close(): Unit = if (!done) { done = true; reader.close() }
      private def advance(): Unit =
        try {
          while (nextChunk == null && !done) {
            val line = reader.readLine()
            if (line == null) close()
            else if (line.startsWith("data:")) {
              val payload = line.drop(5).trim
              if (payload == "[DONE]") close()
              else if (payload.nonEmpty) {
                val content = HttpSupport.mapper.readTree(payload)
                  .path("choices").path(0).path("delta").path("content")
                // empty/absent delta (role-only first chunk, keep-alives) → skip
                if (!content.isMissingNode && !content.isNull && content.asText().nonEmpty)
                  nextChunk = content.asText()
              }
            } // non-data lines (SSE comments, blank separators) → skip
          }
        } catch { case t: Throwable => close(); throw t }
      override def hasNext: Boolean = { advance(); nextChunk != null }
      override def next(): String = {
        advance()
        if (nextChunk == null) throw new NoSuchElementException("stream exhausted")
        val c = nextChunk; nextChunk = null; c
      }
    }
  }
}
