package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process REST collection service implementing the wire protocol
  * [[RestIndexStore]] documents — the offline stand-in for a qdrant /
  * weaviate-shaped endpoint. Collections live in memory: name →
  * (schema json, insertion-ordered id → row json).
  */
final class RestStoreStub {
  private val mapper = new ObjectMapper()
  private val collections =
    new java.util.concurrent.ConcurrentHashMap[String, (String, java.util.LinkedHashMap[Long, String])]()
  private val pointsPosts = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Number of POST /points append requests served (spec probe for the
    * executor-side per-partition upload path).
    */
  def pointsPostCount: Int = pointsPosts.get()

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def send(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  server.createContext("/collections", (ex: HttpExchange) => {
    try handle(ex)
    catch { case t: Throwable => send(ex, 500, s"""{"error":"${t.getMessage}"}""") }
  })

  private def handle(ex: HttpExchange): Unit = {
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    // parts: ("collections", name[, "points"[, "delete"]])
    val name = if (parts.length > 1) parts(1) else ""
    val method = ex.getRequestMethod
    (parts.drop(2).toList, method) match {
      case (Nil, "GET") =>
        Option(collections.get(name)) match {
          case Some((schema, _)) =>
            val o = mapper.createObjectNode(); o.put("schema", schema)
            send(ex, 200, mapper.writeValueAsString(o))
          case None => send(ex, 404, """{"error":"no such collection"}""")
        }
      case (Nil, "PUT") =>
        // schema + points land in ONE compute — atomic under the map's lock,
        // like qdrant's recreate_collection
        val body = mapper.readTree(readBody(ex))
        val schema = body.path("schema").asText()
        collections.compute(name, (_, prev) => {
          val pts =
            if (body.has("points")) {
              val m = new java.util.LinkedHashMap[Long, String]()
              body.path("points").forEach(p => m.put(p.path("doc_id").asLong(), p.toString))
              m
            } else if (prev == null) new java.util.LinkedHashMap[Long, String]()
            else prev._2
          (schema, pts)
        })
        send(ex, 200, "{}")
      case (Nil, "DELETE") =>
        if (collections.remove(name) != null) send(ex, 200, "{}")
        else send(ex, 404, """{"error":"no such collection"}""")
      case (List("points"), "GET") =>
        Option(collections.get(name)) match {
          case Some((_, pts)) =>
            val o = mapper.createObjectNode()
            val arr = o.putArray("points")
            pts.synchronized { pts.values().forEach(r => arr.add(mapper.readTree(r))) }
            send(ex, 200, mapper.writeValueAsString(o))
          case None => send(ex, 404, """{"error":"no such collection"}""")
        }
      case (List("points"), "POST") =>
        pointsPosts.incrementAndGet()
        Option(collections.get(name)) match {
          case Some((_, pts)) =>
            val incoming = mapper.readTree(readBody(ex)).path("points")
            pts.synchronized {
              incoming.forEach { p => pts.put(p.path("doc_id").asLong(), p.toString) }
            }
            send(ex, 200, "{}")
          case None => send(ex, 404, """{"error":"no such collection"}""")
        }
      case (List("points", "delete"), "POST") =>
        Option(collections.get(name)) match {
          case Some((_, pts)) =>
            val ids = mapper.readTree(readBody(ex)).path("ids")
            pts.synchronized { ids.forEach(id => pts.remove(id.asLong())) }
            send(ex, 200, "{}")
          case None => send(ex, 404, """{"error":"no such collection"}""")
        }
      case _ => send(ex, 405, """{"error":"unsupported"}""")
    }
  }

  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.start()

  val port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)
}
