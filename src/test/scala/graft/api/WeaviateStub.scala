package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process server speaking weaviate's REST + GraphQL wire protocol — the
  * offline stand-in a wire-faithful [[WeaviateIndexStore]] must satisfy:
  * schema class lifecycle, id-keyed batch objects, cursor-paged listing,
  * batch delete by where-filter, and GraphQL `Get { Class(nearVector: ...) }`
  * with cosine distance and `_additional { distance vector }`. Validates like
  * a real server: unknown classes 404 (or GraphQL errors), duplicate class
  * creation 422, class names must match weaviate's `[A-Z][_0-9A-Za-z]*`.
  * Records every request for wire-shape assertions.
  */
final class WeaviateStub {
  final case class Req(method: String, path: String, query: String, body: String)

  private val mapper = new ObjectMapper()
  val requests = new java.util.concurrent.ConcurrentLinkedQueue[Req]()

  private final class Cls(val description: String) {
    /** insertion-ordered uuid -> (vector, propertiesJson) */
    val objects = new java.util.LinkedHashMap[String, (Array[Float], String)]()
  }
  private val classes = new java.util.concurrent.ConcurrentHashMap[String, Cls]()

  def objectCount(name: String): Int = Option(classes.get(name)).map { c =>
    c.objects.synchronized { c.objects.size() }
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

  private def record(ex: HttpExchange): Req = {
    val r = Req(ex.getRequestMethod, ex.getRequestURI.getPath,
      Option(ex.getRequestURI.getQuery).getOrElse(""), readBody(ex))
    requests.add(r)
    r
  }

  private def guard(f: HttpExchange => Unit): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) =>
      try f(ex)
      catch {
        case e: IllegalArgumentException =>
          send(ex, 422, s"""{"error":[{"message":"${e.getMessage}"}]}""")
        case t: Throwable =>
          send(ex, 500, s"""{"error":[{"message":"${t.getMessage}"}]}""")
      }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  // ---- /v1/schema -------------------------------------------------------
  server.createContext("/v1/schema", guard { ex =>
    val req = record(ex)
    val parts = req.path.split("/").filter(_.nonEmpty) // v1, schema[, name]
    (parts.drop(2).toList, req.method) match {
      case (Nil, "POST") =>
        val body = mapper.readTree(req.body)
        val name = body.path("class").asText()
        require(name.matches("[A-Z][_0-9A-Za-z]*"),
          s"invalid class name: $name")
        val prev = classes.putIfAbsent(name, new Cls(body.path("description").asText()))
        require(prev == null, s"class $name already exists")
        send(ex, 200, req.body)
      case (List(name), "GET") =>
        Option(classes.get(name)) match {
          case Some(c) =>
            val o = mapper.createObjectNode()
            o.put("class", name); o.put("description", c.description)
            send(ex, 200, mapper.writeValueAsString(o))
          case None => send(ex, 404, "")
        }
      case (List(name), "DELETE") =>
        if (classes.remove(name) != null) send(ex, 200, "{}")
        else send(ex, 404, "")
      case _ => send(ex, 405, """{"error":[{"message":"unsupported"}]}""")
    }
  })

  // ---- /v1/batch/objects ------------------------------------------------
  server.createContext("/v1/batch", guard { ex =>
    val req = record(ex)
    (req.path, req.method) match {
      case ("/v1/batch/objects", "POST") =>
        val objs = mapper.readTree(req.body).path("objects")
        require(objs.isArray && objs.size() > 0, "objects must be a non-empty array")
        val results = mapper.createArrayNode()
        objs.forEach { o =>
          val name = o.path("class").asText()
          val c = Option(classes.get(name)).getOrElse(
            throw new IllegalArgumentException(s"class $name does not exist"))
          val id = o.path("id").asText()
          require(id.matches("[0-9a-f-]{36}"), s"object id must be a UUID: $id")
          val r = results.addObject()
          r.put("id", id)
          val vn = o.path("vector")
          // REAL weaviate reports per-object failures INSIDE a 200 response
          // (result.status=FAILED + errors) — e.g. an invalid vector fails
          // only that object; reproduce it so clients must check
          if (!vn.isArray || vn.size() == 0) {
            val res = r.putObject("result")
            res.put("status", "FAILED")
            res.putObject("errors").putArray("error")
              .addObject().put("message", "object must carry a non-empty vector")
          } else {
            val vec = new Array[Float](vn.size())
            var i = 0; vn.forEach { x => vec(i) = x.floatValue(); i += 1 }
            c.objects.synchronized {
              c.objects.put(id, (vec, o.path("properties").toString))
            }
            r.putObject("result").put("status", "SUCCESS")
          }
        }
        send(ex, 200, mapper.writeValueAsString(results))
      case ("/v1/batch/objects", "DELETE") =>
        val m = mapper.readTree(req.body).path("match")
        val name = m.path("class").asText()
        val c = Option(classes.get(name)).getOrElse(
          throw new IllegalArgumentException(s"class $name does not exist"))
        val where = m.path("where")
        require(where.path("operator").asText() == "ContainsAny",
          s"unsupported operator: ${where.path("operator").asText()}")
        require(where.path("path").path(0).asText() == "embedding_pk",
          "only embedding_pk where-paths are supported")
        // weaviate's array operators take the array-typed operand field
        require(where.has("valueIntArray"),
          "ContainsAny requires valueIntArray (scalar valueInt is for Equal-style operators)")
        val wanted = scala.collection.mutable.Set.empty[Long]
        where.path("valueIntArray").forEach(v => wanted += v.asLong())
        var matched = 0
        c.objects.synchronized {
          val it = c.objects.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val pk = mapper.readTree(e.getValue._2).path("embedding_pk").asLong()
            if (wanted.contains(pk)) { it.remove(); matched += 1 }
          }
        }
        val resp = mapper.createObjectNode()
        resp.putObject("results").put("matches", matched)
        send(ex, 200, mapper.writeValueAsString(resp))
      case _ => send(ex, 405, """{"error":[{"message":"unsupported"}]}""")
    }
  })

  // ---- /v1/objects (cursor-paged listing) -------------------------------
  server.createContext("/v1/objects", guard { ex =>
    val req = record(ex)
    val params = req.query.split("&").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toMap
    val name = params.getOrElse("class",
      throw new IllegalArgumentException("class parameter is required"))
    Option(classes.get(name)) match {
      case Some(c) =>
        val limit = params.get("limit").map(_.toInt).getOrElse(25)
        val after = params.get("after")
        val out = mapper.createObjectNode()
        val arr = out.putArray("objects")
        c.objects.synchronized {
          val entries = new java.util.ArrayList(c.objects.entrySet())
          val start = after match {
            case Some(a) =>
              val idx = (0 until entries.size()).find(i => entries.get(i).getKey == a)
              idx.map(_ + 1).getOrElse(entries.size())
            case None => 0
          }
          val end = math.min(start + limit, entries.size())
          (start until end).foreach { i =>
            val e = entries.get(i)
            val o = arr.addObject()
            o.put("class", name)
            o.put("id", e.getKey)
            o.set[JsonNode]("properties", mapper.readTree(e.getValue._2))
            if (params.get("include").contains("vector")) {
              val v = o.putArray("vector"); e.getValue._1.foreach(v.add)
            }
          }
        }
        send(ex, 200, mapper.writeValueAsString(out))
      case None => send(ex, 404, "")
    }
  })

  // ---- /v1/graphql (nearVector Get) -------------------------------------
  private val GetRe = """(?s)\{\s*Get\s*\{\s*(\w+)\s*\(([^)]*)\)\s*\{(.*?)\}\s*\}\s*\}""".r
  private val NearRe = """(?s)nearVector:\s*\{([^}]*)\}""".r
  private val VecRe = """vector:\s*\[([^\]]*)\]""".r
  private val DistRe = """distance:\s*([-0-9.eE]+)""".r
  private val LimitRe = """limit:\s*(\d+)""".r

  server.createContext("/v1/graphql", guard { ex =>
    val req = record(ex)
    val query = mapper.readTree(req.body).path("query").asText()
    def gqlError(msg: String): Unit = {
      val o = mapper.createObjectNode()
      o.putArray("errors").addObject().put("message", msg)
      send(ex, 200, mapper.writeValueAsString(o))
    }
    GetRe.findFirstMatchIn(query) match {
      case None => gqlError("could not parse Get query")
      case Some(m) =>
        val name = m.group(1); val args = m.group(2); val fields = m.group(3)
        Option(classes.get(name)) match {
          case None => gqlError(s"class $name does not exist")
          case Some(c) =>
            val nearOpt = NearRe.findFirstMatchIn(args).map(_.group(1))
            val qvOpt = nearOpt.flatMap(n => VecRe.findFirstMatchIn(n).map(_.group(1)))
              .map(_.split(",").map(_.trim.toFloat))
            if (nearOpt.isEmpty) gqlError("nearVector argument is required")
            else if (qvOpt.isEmpty) gqlError("nearVector.vector is required")
            else {
            val near = nearOpt.get
            val qv = qvOpt.get
            val maxDist = DistRe.findFirstMatchIn(near).map(_.group(1).toDouble)
            val limit = LimitRe.findFirstMatchIn(args).map(_.group(1).toInt).getOrElse(10)
            val wantVector = fields.contains("vector")
            val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
            val hits = scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Float], String)]
            c.objects.synchronized {
              c.objects.forEach { (_, obj) =>
                val vn = math.sqrt(obj._1.map(x => x.toDouble * x).sum)
                val dot = qv.zip(obj._1).map { case (a, b) => a.toDouble * b }.sum
                val dist = if (qn == 0 || vn == 0) 1.0 else 1.0 - dot / (qn * vn)
                if (maxDist.forall(dist <= _)) hits += ((dist, obj._1, obj._2))
              }
            }
            val root = mapper.createObjectNode()
            val arr = root.putObject("data").putObject("Get").putArray(name)
            hits.sortBy(_._1).take(limit).foreach { case (dist, vec, props) =>
              val o = arr.addObject()
              val p = mapper.readTree(props)
              o.set[JsonNode]("doc_json", p.path("doc_json"))
              o.set[JsonNode]("embedding_pk", p.path("embedding_pk"))
              val add = o.putObject("_additional")
              add.put("distance", dist)
              if (wantVector) { val v = add.putArray("vector"); vec.foreach(v.add) }
            }
            send(ex, 200, mapper.writeValueAsString(root))
            }
        }
    }
  })

  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.start()

  val port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)
}
