package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process server speaking qdrant's REST wire protocol — the offline
  * stand-in a wire-faithful [[QdrantIndexStore]] must satisfy. Implements the
  * endpoints the reference's provider exercises through qdrant_client
  * (collections lifecycle, id-keyed points upsert, retrieve, scroll, delete,
  * cosine search with score_threshold and must_not/has_id filters) and
  * VALIDATES request shapes the way a real server would: unknown collections
  * 404, a vector whose length differs from the collection's configured size
  * is a 400, creating an existing collection is a 409.
  *
  * Every request is recorded in [[requests]] so specs can assert the exact
  * wire traffic (method, path, body) the store emits.
  */
final class QdrantStub {
  final case class Req(method: String, path: String, query: String, body: String)

  private val mapper = new ObjectMapper()
  val requests = new java.util.concurrent.ConcurrentLinkedQueue[Req]()

  /** name -> (vectorSize, distance, insertion-ordered id -> (vector, payloadJson)) */
  private final class Collection(val size: Int, val distance: String) {
    val points = new java.util.LinkedHashMap[String, (Array[Float], String)]()
  }
  private val collections =
    new java.util.concurrent.ConcurrentHashMap[String, Collection]()

  def pointCount(name: String): Int = Option(collections.get(name)).map { c =>
    c.points.synchronized { c.points.size() }
  }.getOrElse(0)

  def requestLog: Seq[Req] = {
    val it = requests.iterator(); val buf = scala.collection.mutable.ArrayBuffer.empty[Req]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def send(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def ok(result: JsonNode): String = {
    val o = mapper.createObjectNode()
    o.set[JsonNode]("result", result)
    o.put("status", "ok")
    mapper.writeValueAsString(o)
  }

  private def notFound(ex: HttpExchange): Unit =
    send(ex, 404, """{"status":{"error":"Not found: collection"},"time":0}""")

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  server.createContext("/collections", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case e: IllegalArgumentException =>
        send(ex, 400, s"""{"status":{"error":"${e.getMessage}"},"time":0}""")
      case t: Throwable =>
        send(ex, 500, s"""{"status":{"error":"${t.getMessage}"},"time":0}""")
    }
  })

  private def parseVector(node: JsonNode, size: Int): Array[Float] = {
    require(node.isArray, "point vector must be an array")
    require(node.size() == size,
      s"Wrong input: vector size ${node.size()} does not match collection size $size")
    val v = new Array[Float](node.size())
    var i = 0
    node.forEach { x => v(i) = x.floatValue(); i += 1 }
    v
  }

  private def idKey(id: JsonNode): String = {
    require(id.isTextual || id.canConvertToLong,
      "point id must be an unsigned integer or a UUID string")
    id.asText()
  }

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    val body = readBody(ex)
    requests.add(Req(method, path, Option(ex.getRequestURI.getQuery).getOrElse(""), body))
    val parts = path.split("/").filter(_.nonEmpty)
    val name = if (parts.length > 1) parts(1) else ""
    (parts.drop(2).toList, method) match {
      case (Nil, "GET") =>
        Option(collections.get(name)) match {
          case Some(c) =>
            val r = mapper.createObjectNode()
            r.put("status", "green")
            r.putObject("config").putObject("params").putObject("vectors")
              .put("size", c.size).put("distance", c.distance)
            send(ex, 200, ok(r))
          case None => notFound(ex)
        }
      case (Nil, "PUT") =>
        val cfg = mapper.readTree(body).path("vectors")
        require(cfg.path("size").canConvertToInt && cfg.path("size").asInt() > 0,
          "vectors.size must be a positive integer")
        val distance = cfg.path("distance").asText()
        require(Set("Cosine", "Euclid", "Dot").contains(distance),
          s"unknown distance: $distance")
        val prev = collections.putIfAbsent(name,
          new Collection(cfg.path("size").asInt(), distance))
        if (prev != null)
          send(ex, 409, """{"status":{"error":"collection already exists"},"time":0}""")
        else send(ex, 200, ok(mapper.getNodeFactory.booleanNode(true)))
      case (Nil, "DELETE") =>
        if (collections.remove(name) != null)
          send(ex, 200, ok(mapper.getNodeFactory.booleanNode(true)))
        else notFound(ex)
      case (List("points"), "PUT") =>
        Option(collections.get(name)) match {
          case Some(c) =>
            val pts = mapper.readTree(body).path("points")
            require(pts.isArray && pts.size() > 0, "points must be a non-empty array")
            c.points.synchronized {
              pts.forEach { p =>
                val key = idKey(p.path("id"))
                val vec = parseVector(p.path("vector"), c.size)
                // REAL qdrant NORMALIZES stored vectors for Cosine
                // collections and returns the normalized copy on
                // scroll/retrieve/search — reproduce that so clients
                // cannot silently depend on vector round-trip through the
                // point's own vector field
                val stored = if (c.distance == "Cosine") {
                  val n = math.sqrt(vec.map(x => x.toDouble * x).sum)
                  if (n > 0) vec.map(x => (x / n).toFloat) else vec
                } else vec
                c.points.put(key, (stored, p.path("payload").toString))
              }
            }
            val r = mapper.createObjectNode()
            r.put("operation_id", 0L); r.put("status", "completed")
            send(ex, 200, ok(r))
          case None => notFound(ex)
        }
      case (List("points"), "POST") => // retrieve by ids
        Option(collections.get(name)) match {
          case Some(c) =>
            val req = mapper.readTree(body)
            val out = mapper.createArrayNode()
            c.points.synchronized {
              req.path("ids").forEach { id =>
                Option(c.points.get(idKey(id))).foreach { case (vec, payload) =>
                  val o = out.addObject()
                  o.set[JsonNode]("id", id)
                  o.set[JsonNode]("payload", mapper.readTree(payload))
                  val v = o.putArray("vector"); vec.foreach(v.add)
                }
              }
            }
            send(ex, 200, ok(out))
          case None => notFound(ex)
        }
      case (List("points", "scroll"), "POST") =>
        Option(collections.get(name)) match {
          case Some(c) =>
            val req = mapper.readTree(body)
            val limit = req.path("limit").asInt(10)
            val withPayload = req.path("with_payload").asBoolean(false)
            val withVector = req.path("with_vector").asBoolean(false)
            val offset = if (req.has("offset")) req.path("offset").asInt(0) else 0
            val r = mapper.createObjectNode()
            val arr = r.putArray("points")
            var nextOffset = -1
            c.points.synchronized {
              val entries = new java.util.ArrayList(c.points.entrySet())
              val end = math.min(offset + limit, entries.size())
              (offset until end).foreach { i =>
                val e = entries.get(i)
                val o = arr.addObject()
                val key = e.getKey
                if (key.forall(_.isDigit)) o.put("id", key.toLong) else o.put("id", key)
                if (withPayload) o.set[JsonNode]("payload", mapper.readTree(e.getValue._2))
                if (withVector) { val v = o.putArray("vector"); e.getValue._1.foreach(v.add) }
              }
              if (end < entries.size()) nextOffset = end
            }
            if (nextOffset >= 0) r.put("next_page_offset", nextOffset)
            else r.putNull("next_page_offset")
            send(ex, 200, ok(r))
          case None => notFound(ex)
        }
      case (List("points", "delete"), "POST") =>
        Option(collections.get(name)) match {
          case Some(c) =>
            val ids = mapper.readTree(body).path("points")
            require(ids.isArray, "points must be an array of ids")
            c.points.synchronized { ids.forEach(id => c.points.remove(idKey(id))) }
            val r = mapper.createObjectNode()
            r.put("operation_id", 0L); r.put("status", "completed")
            send(ex, 200, ok(r))
          case None => notFound(ex)
        }
      case (List("points", "search"), "POST") =>
        Option(collections.get(name)) match {
          case Some(c) =>
            val req = mapper.readTree(body)
            val qv = parseVector(req.path("vector"), c.size)
            val limit = req.path("limit").asInt(10)
            val threshold =
              if (req.has("score_threshold")) Some(req.path("score_threshold").asDouble())
              else None
            val excluded = scala.collection.mutable.Set.empty[String]
            req.path("filter").path("must_not").forEach { cond =>
              cond.path("has_id").forEach(id => excluded += idKey(id))
            }
            val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
            val hits = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Array[Float], String)]
            c.points.synchronized {
              c.points.forEach { (key, pv) =>
                if (!excluded.contains(key)) {
                  val vn = math.sqrt(pv._1.map(x => x.toDouble * x).sum)
                  val dot = qv.zip(pv._1).map { case (a, b) => a.toDouble * b }.sum
                  val score = if (qn == 0 || vn == 0) 0.0 else dot / (qn * vn)
                  if (threshold.forall(score >= _)) hits += ((key, score, pv._1, pv._2))
                }
              }
            }
            val out = mapper.createArrayNode()
            hits.sortBy(-_._2).take(limit).foreach { case (key, score, vec, payload) =>
              val o = out.addObject()
              if (key.forall(_.isDigit)) o.put("id", key.toLong) else o.put("id", key)
              o.put("score", score)
              o.set[JsonNode]("payload", mapper.readTree(payload))
              val v = o.putArray("vector"); vec.foreach(v.add)
            }
            send(ex, 200, ok(out))
          case None => notFound(ex)
        }
      case _ => send(ex, 405, """{"status":{"error":"unsupported"},"time":0}""")
    }
  }

  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.start()

  val port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)
}
