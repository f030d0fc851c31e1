package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** WARC (ISO 28500 Web ARChive) ingestion — the on-disk format of Common
  * Crawl, the canonical 100 TB training-corpus input. This is the step
  * BEFORE [[graft.ops.Html]]: archive bytes in, (uri, date, http status,
  * body) rows out, feeding extract → langID → quality → dedup → pack.
  *
  * Own from-scratch codec (headers per the WARC/1.0 spec; no external
  * parser): a WARC file is a sequence of records, each `WARC/1.0` + CRLF
  * header lines + empty line + `Content-Length` payload bytes + CRLF CRLF.
  * Common Crawl compresses each record as its OWN gzip member, concatenated
  * — member boundaries let readers resume mid-file; the JDK's
  * `GZIPInputStream` transparently walks concatenated members, so one
  * inflating stream yields the raw record sequence.
  *
  * Garbage-in contract (same as the media codecs): crawled archives carry
  * truncation and corruption; the parser NEVER throws on malformed input —
  * it skips to the next `WARC/` version line (bounded resync) and yields
  * only complete records. Memory stays bounded per record: a declared
  * Content-Length above `maxRecordBytes` is SKIPPED via stream-skip (no
  * allocation — a crafted 100 GB length cannot OOM an executor), and header
  * lines are capped at 64 KiB.
  */
object WarcCodec {

  final case class WarcRecord(warcType: String, targetUri: String,
                              warcDate: String, recordId: String,
                              contentType: String, content: Array[Byte])

  final case class HttpResponse(status: Int, contentType: String,
                                body: Array[Byte])

  private val MaxHeaderLine = 64 * 1024

  // ---- writer (re-archiving sink + deterministic fixtures) ----

  /** One record in wire form (headers only for non-empty fields). */
  def writeRecord(r: WarcRecord): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(r.warcType).append("\r\n")
    if (r.targetUri.nonEmpty) sb.append("WARC-Target-URI: ").append(r.targetUri).append("\r\n")
    if (r.warcDate.nonEmpty) sb.append("WARC-Date: ").append(r.warcDate).append("\r\n")
    if (r.recordId.nonEmpty) sb.append("WARC-Record-ID: ").append(r.recordId).append("\r\n")
    if (r.contentType.nonEmpty) sb.append("Content-Type: ").append(r.contentType).append("\r\n")
    sb.append("Content-Length: ").append(r.content.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(US_ASCII)
    val out = new Array[Byte](head.length + r.content.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(r.content, 0, out, head.length, r.content.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Wrap bytes as one gzip member (the Common Crawl per-record layout). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Serialize records as a `.warc.gz` byte stream: one gzip member each. */
  def writeWarcGz(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach(r => bos.write(gzipMember(writeRecord(r))))
    bos.toByteArray
  }

  /** Wrap bytes as one zstd frame — the `.warc.zst` per-record layout
    * Common Crawl is moving its archives to (iipc warc-specifications:
    * one frame per record, so readers resume at frame boundaries like
    * gzip members).
    */
  def zstdMember(bytes: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(bytes)

  /** A zstd SKIPPABLE frame (RFC 8878 §3.1.2: LE magic 0x184D2A5n +
    * LE32 length + opaque payload) — `.warc.zst` archives open with one
    * carrying the compression dictionary; conformant decoders skip it.
    */
  def zstdSkippableFrame(payload: Array[Byte], nibble: Int = 0): Array[Byte] = {
    require(nibble >= 0 && nibble <= 15, s"skippable magic nibble: $nibble")
    val out = new Array[Byte](8 + payload.length)
    val magic = 0x184D2A50 + nibble
    out(0) = (magic & 0xFF).toByte; out(1) = ((magic >> 8) & 0xFF).toByte
    out(2) = ((magic >> 16) & 0xFF).toByte; out(3) = ((magic >> 24) & 0xFF).toByte
    out(4) = (payload.length & 0xFF).toByte; out(5) = ((payload.length >> 8) & 0xFF).toByte
    out(6) = ((payload.length >> 16) & 0xFF).toByte; out(7) = ((payload.length >> 24) & 0xFF).toByte
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  /** Serialize records as a `.warc.zst` byte stream: an optional leading
    * skippable frame (stand-in for the dictionary slot — our members are
    * dictionary-less, so its payload is opaque metadata the reader must
    * SKIP) + one zstd frame per record. Dictionary-COMPRESSED archives
    * are a stated descope: without the dictionary their member frames
    * fail to decode and the reader ends that file cleanly (counted, not
    * crashed).
    */
  def writeWarcZst(records: Seq[WarcRecord], skippable: Boolean = true): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (skippable)
      bos.write(zstdSkippableFrame("graft-no-dict".getBytes("US-ASCII")))
    records.foreach(r => bos.write(zstdMember(writeRecord(r))))
    bos.toByteArray
  }

  /** Open a continuous zstd stream over concatenated frames (members +
    * skippable frames — libzstd's streaming decoder skips the latter).
    */
  private[sources] def zstdStream(in: InputStream): InputStream = {
    val z = new com.github.luben.zstd.ZstdInputStream(in)
    z.setContinuous(true)
    z
  }

  /** zstd magic sniff: a compressed frame (LE 0xFD2FB528) or a skippable
    * frame (LE 0x184D2A50–5F).
    */
  private[sources] def looksZstd(b: Array[Byte]): Boolean =
    b.length >= 4 &&
      (((b(0) & 0xFF) == 0x28 && (b(1) & 0xFF) == 0xB5 &&
        (b(2) & 0xFF) == 0x2F && (b(3) & 0xFF) == 0xFD) ||
       ((b(0) & 0xF0) == 0x50 && (b(1) & 0xFF) == 0x2A &&
        (b(2) & 0xFF) == 0x4D && (b(3) & 0xFF) == 0x18))

  // ---- parser ----

  /** Streaming record iterator over raw (already-inflated) WARC bytes.
    * One record in memory at a time; never throws on malformed input.
    */
  def parse(in: InputStream, maxRecordBytes: Long = 1L << 30): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val bin = new BufferedInputStream(in, 64 * 1024)
      private var nextRec: WarcRecord = _
      private var done = false

      /** Read one CRLF/LF-terminated ASCII line, capped; None at EOF.
        * Returns the line without its terminator. Overlong lines are
        * truncated in place (the tail reads as garbage lines and resync
        * handles them) — a binary blob with no newlines cannot buffer
        * unboundedly.
        */
      private def readLine(): Option[String] = {
        val buf = new ArrayBuffer[Byte](128)
        var c = bin.read()
        if (c < 0) return None
        while (c >= 0 && c != '\n') {
          if (buf.length < MaxHeaderLine) buf += c.toByte
          c = bin.read()
        }
        var n = buf.length
        if (n > 0 && buf(n - 1) == '\r') n -= 1
        Some(new String(buf.toArray, 0, n, US_ASCII))
      }

      private def readFully(len: Int): Option[Array[Byte]] = {
        val out = new Array[Byte](len)
        var got = 0
        while (got < len) {
          val n = bin.read(out, got, len - got)
          if (n < 0) return None // truncated mid-payload
          got += n
        }
        Some(out)
      }

      private def skipFully(len: Long): Boolean = {
        var left = len
        while (left > 0) {
          val n = bin.skip(left)
          if (n > 0) left -= n
          else if (bin.read() < 0) return false // EOF mid-skip
          else left -= 1
        }
        true
      }

      /** Advance to the next complete record; sets done at EOF. Malformed
        * headers / missing lengths / oversized payloads resync forward to
        * the next `WARC/` version line.
        */
      @annotation.tailrec
      private def advance(): Unit = {
        // resync: find a version line (the common case hits immediately)
        var line = readLine()
        while (line.isDefined && !line.get.startsWith("WARC/")) line = readLine()
        if (line.isEmpty) { done = true; return }
        // header block: Name: value until the empty line
        var warcType = ""; var uri = ""; var date = ""; var rid = ""; var ctype = ""
        var clen = -1L
        var ok = true
        var h = readLine()
        while (ok && h.isDefined && h.get.nonEmpty) {
          val ln = h.get
          val i = ln.indexOf(':')
          if (i > 0) {
            val k = ln.substring(0, i).trim.toLowerCase
            val v = ln.substring(i + 1).trim
            k match {
              case "warc-type" => warcType = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "warc-record-id" => rid = v
              case "content-type" => ctype = v
              case "content-length" =>
                clen = try v.toLong catch { case _: NumberFormatException => -1L }
              case _ => () // unknown headers pass through
            }
          } else ok = false // non-header junk before the blank line: resync
          h = readLine()
        }
        if (h.isEmpty) { done = true; return } // EOF inside headers
        if (!ok || clen < 0) advance() // malformed: resync from here
        else if (clen > maxRecordBytes) {
          // oversized payload: skip WITHOUT allocating, then continue
          if (skipFully(clen)) advance() else done = true
        } else readFully(clen.toInt) match {
          case None => done = true // truncated payload
          case Some(content) =>
            nextRec = WarcRecord(warcType, uri, date, rid, ctype, content)
          // trailing CRLFCRLF is consumed by the next advance()'s resync
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) {
          try advance()
          catch { case _: EOFException => done = true }
        }
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("end of WARC stream")
        val r = nextRec; nextRec = null; r
      }
    }

  /** Parse a byte array, auto-detecting gzip (0x1f 0x8b magic) and zstd
    * (compressed- or skippable-frame magic — `.warc.zst`, r18) — plain
    * `.warc`, per-member `.warc.gz` and per-frame `.warc.zst` all work.
    * Corrupt compressed data ends the iteration cleanly instead of
    * throwing.
    */
  def parseBytes(bytes: Array[Byte], maxRecordBytes: Long = 1L << 30): Iterator[WarcRecord] = {
    if (bytes == null || bytes.length < 2) return Iterator.empty
    val in: InputStream =
      if ((bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) {
        try new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
        catch { case _: java.io.IOException => return Iterator.empty }
      } else if (looksZstd(bytes)) {
        try zstdStream(new ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => return Iterator.empty }
      } else new ByteArrayInputStream(bytes)
    val inner = parse(in, maxRecordBytes)
    // inflater errors surface from hasNext on corrupt members: end cleanly
    new Iterator[WarcRecord] {
      private var dead = false
      override def hasNext: Boolean = !dead && {
        try inner.hasNext
        catch { case _: java.io.IOException => dead = true; false }
      }
      override def next(): WarcRecord =
        if (hasNext) inner.next() else throw new NoSuchElementException
    }
  }

  /** Decoded-body size cap: a crafted gzip bomb (or a lying chunk size)
    * can never allocate more than this per record on an executor — the
    * same 64 MiB ceiling as the PDF/ZIP codecs.
    */
  val MaxDecodedBody: Int = 64 * 1024 * 1024

  /** RFC 9112 §7.1 chunked transfer framing decode: hex-size line
    * (chunk extensions tolerated) + data + CRLF, repeated; the 0-size
    * chunk ends the body (trailer fields are discarded). TRUNCATED
    * input salvages the complete chunks read so far — the same posture
    * as the WARC payload walk; a malformed size line returns None
    * (framing garbage must not leak into text).
    */
  private[sources] def dechunk(b: Array[Byte],
                               maxBodyBytes: Int = MaxDecodedBody): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream(math.min(b.length, 1 << 16))
    var i = 0
    while (true) {
      var j = i
      while (j < b.length && b(j) != '\n') j += 1
      if (j >= b.length) return Some(out.toByteArray) // truncated at a size line
      var end = j
      if (end > i && b(end - 1) == '\r') end -= 1
      val sizeLine = new String(b, i, end - i, US_ASCII)
      val semi = sizeLine.indexOf(';')
      val hex = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      val size = try java.lang.Long.parseLong(hex, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0 || size > maxBodyBytes - out.size) return None
      i = j + 1
      if (size == 0) return Some(out.toByteArray)
      if (i + size > b.length) return Some(out.toByteArray) // truncated mid-chunk
      out.write(b, i, size.toInt)
      i += size.toInt
      if (i < b.length && b(i) == '\r') i += 1
      if (i < b.length && b(i) == '\n') i += 1
    }
    None // unreachable
  }

  /** Capped gzip-member inflate; truncated/corrupt input salvages the
    * bytes inflated so far (empty when the header itself is bad).
    */
  private[sources] def gunzipCapped(b: Array[Byte],
                                    maxBodyBytes: Int = MaxDecodedBody): Array[Byte] =
    inflateStream(try new GZIPInputStream(new ByteArrayInputStream(b), 64 * 1024)
      catch { case _: java.io.IOException => new ByteArrayInputStream(Array.emptyByteArray) },
      maxBodyBytes)

  /** Capped `deflate` Content-Encoding inflate: zlib-wrapped per RFC
    * 9110, with the raw-deflate retry real servers made customary.
    */
  private[sources] def inflateCapped(b: Array[Byte],
                                     maxBodyBytes: Int = MaxDecodedBody): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] =
      inflateStream(new java.util.zip.InflaterInputStream(
        new ByteArrayInputStream(b), new java.util.zip.Inflater(raw), 64 * 1024),
        maxBodyBytes)
    val zlib = run(raw = false)
    if (zlib.nonEmpty) zlib else run(raw = true)
  }

  private def inflateStream(in: InputStream, cap: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n > 0 && out.size < cap) {
        out.write(buf, 0, math.min(n, cap - out.size))
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () } // truncated: keep prefix
    finally { try in.close() catch { case _: java.io.IOException => () } }
    out.toByteArray
  }

  /** Split an `application/http; msgtype=response` payload into status /
    * Content-Type / body, and DECODE the body to its plain bytes:
    * `Transfer-Encoding: chunked` framing is removed first (wire order),
    * then `Content-Encoding: gzip`/`x-gzip`/`deflate` is inflated under
    * [[MaxDecodedBody]]. None when no HTTP status line or no blank-line
    * separator exists, when chunk framing is malformed, or when the
    * content coding is one we cannot interpret (br/zstd/...): an
    * undecodable body must be dropped loudly, never surfaced as garbage
    * text (garbage in, None out).
    */
  def parseHttp(content: Array[Byte],
                maxBodyBytes: Int = MaxDecodedBody): Option[HttpResponse] = {
    // find the CRLFCRLF (tolerate bare LFLF) header/body boundary
    var i = 0; var boundary = -1; var bodyStart = -1
    while (boundary < 0 && i + 1 < content.length) {
      if (content(i) == '\n') {
        if (content(i + 1) == '\n') { boundary = i; bodyStart = i + 2 }
        else if (i + 2 < content.length && content(i + 1) == '\r' && content(i + 2) == '\n') {
          boundary = i; bodyStart = i + 3
        }
      }
      i += 1
    }
    if (boundary < 0) return None
    val head = new String(content, 0, boundary, US_ASCII)
    val lines = head.split("\r?\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
    val parts = lines(0).split(" ")
    val status = if (parts.length >= 2) {
      try parts(1).toInt catch { case _: NumberFormatException => return None }
    } else return None
    def header(name: String): Option[String] = lines.iterator.drop(1)
      .map(l => (l, l.indexOf(':')))
      .collectFirst {
        case (l, i2) if i2 > 0 && l.substring(0, i2).trim.equalsIgnoreCase(name) =>
          l.substring(i2 + 1).trim
      }
    val ctype = header("content-type").getOrElse("")
    var body = java.util.Arrays.copyOfRange(content, bodyStart, content.length)
    if (header("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
      dechunk(body, maxBodyBytes) match {
        case Some(d) => body = d
        case None => return None
      }
    header("content-encoding").map(_.toLowerCase) match {
      case None | Some("") | Some("identity") => ()
      case Some("gzip") | Some("x-gzip") => body = gunzipCapped(body, maxBodyBytes)
      case Some("deflate") => body = inflateCapped(body, maxBodyBytes)
      case Some(_) => return None // br/zstd/...: uninterpretable, drop loudly
    }
    Some(HttpResponse(status, ctype, body))
  }

  /** Chunked transfer framing WRITER (fixtures + re-archiving twins):
    * lowercase hex sizes, CRLF-delimited, terminated by the 0 chunk.
    */
  def chunked(bytes: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val out = new ByteArrayOutputStream(bytes.length + 16 * (bytes.length / chunkSize + 2))
    var i = 0
    while (i < bytes.length) {
      val n = math.min(chunkSize, bytes.length - i)
      out.write(s"${n.toHexString}\r\n".getBytes(US_ASCII))
      out.write(bytes, i, n)
      out.write("\r\n".getBytes(US_ASCII))
      i += n
    }
    out.write("0\r\n\r\n".getBytes(US_ASCII))
    out.toByteArray
  }
}

/** DataFrame-level WARC readers. */
object Warc {

  val RecordSchemaFields: Seq[StructField] = Seq(
    StructField("rec_idx", LongType), // ordinal within the archive: WARC
    // files are ordered streams, and (path, rec_idx) is the stable record
    // identity downstream dedup needs for deterministic first-wins
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("record_id", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("body", BinaryType))

  private def recordRow(prefix: Seq[Any], idx: Long, r: WarcCodec.WarcRecord): Row = {
    val http = if (r.contentType.startsWith("application/http")) WarcCodec.parseHttp(r.content) else None
    Row.fromSeq(prefix ++ Seq(
      idx, r.warcType, r.targetUri, r.warcDate, r.recordId, r.contentType,
      r.content.length.toLong,
      http.map(h => Int.box(h.status)).orNull,
      http.map(_.contentType).orNull,
      http.map(_.body).getOrElse(r.content)))
  }

  /** Parse a binary column of WARC bytes (one archive per row — e.g. from
    * `spark.read.format("binaryFile")` or an upstream fetch), exploding to
    * one row per record. Bytes never shuffle: parse is partition-local and
    * only the (pruned) record fields flow on.
    */
  def parseRecords(df: DataFrame, idCol: String, bytesCol: String = "warc",
                   maxRecordBytes: Long = 1L << 30): DataFrame = {
    val outSchema = StructType(df.schema(idCol) +: RecordSchemaFields)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(bytesCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        WarcCodec.parseBytes(bytes, maxRecordBytes).zipWithIndex
          .map { case (rec, i) => recordRow(Seq(r.get(idIdx)), i.toLong, rec) }
      }
    }
  }

  /** Read a directory of `.warc` / `.warc.gz` files as a record DataFrame.
    *
    * Scale posture: files are listed driver-side (names only) and OPENED ON
    * EXECUTORS — each task streams its archive record-by-record through the
    * inflating iterator, so peak memory is one record, not one file (the
    * `binaryFile` source would materialize whole 1 GB archives). The
    * parallelism unit is the FILE — exactly how Common Crawl shards (a
    * segment is ~thousands of ~1 GB members), so a 1000-executor cluster
    * saturates on any real crawl. Gzip members are not split WITHIN a file
    * (member boundaries are not indexed); one pathological multi-TB file
    * would serialize — reshard upstream.
    */
  def readWarcFiles(spark: SparkSession, dir: String,
                    maxRecordBytes: Long = 1L << 30,
                    minPartitions: Int = 0,
                    extensions: Seq[String] = Seq(".warc", ".warc.gz", ".warc.zst")): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // `extensions` scopes the listing PER ROUTE: the HTML front door
    // reads only raw archives and the WET front door only extracted-text
    // sidecars (.wet/.wet.gz — same wire format, same streaming reader),
    // so a Common-Crawl-style directory holding both side by side is
    // never double-scanned by either
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile &&
        extensions.exists(ext => s.getPath.getName.endsWith(ext)))
      .map(_.getPath.toString).sorted.toSeq
    val par = math.max(if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism, 1)
    import spark.implicits._
    val paths = spark.createDataset(files).repartition(math.min(par, math.max(files.size, 1)))
    val outSchema = StructType(StructField("path", StringType) +: RecordSchemaFields)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    paths.toDF("path").mapPartitions { it =>
      // the drained-to-exhaustion close below never fires when a downstream
      // limit()/take() stops early — the task-completion listener closes
      // whatever stream is still open so the FS handle doesn't outlive the
      // task (r8 advice)
      var open: InputStream = null
      def closeOpen(): Unit = if (open != null) {
        try open.close() catch { case _: java.io.IOException => () }
        open = null
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOpen()))
      it.flatMap { pr =>
        val pathStr = pr.getString(0)
        val p = new org.apache.hadoop.fs.Path(pathStr)
        val in: InputStream = {
          val raw = p.getFileSystem(conf.value).open(p)
          if (pathStr.endsWith(".gz")) {
            try new GZIPInputStream(raw, 64 * 1024)
            catch { case _: java.io.IOException => raw.close(); new ByteArrayInputStream(Array.emptyByteArray) }
          } else if (pathStr.endsWith(".zst")) {
            try WarcCodec.zstdStream(raw)
            catch { case _: java.io.IOException => raw.close(); new ByteArrayInputStream(Array.emptyByteArray) }
          } else raw
        }
        open = in
        val inner = WarcCodec.parse(in, maxRecordBytes)
        // corrupt member mid-file: end this file's iteration, never throw
        new Iterator[Row] {
          private var dead = false
          private var idx = 0L
          override def hasNext: Boolean = !dead && {
            val h = try inner.hasNext
              catch { case _: java.io.IOException => dead = true; false }
            if (!h) { try in.close() catch { case _: java.io.IOException => () }
              if (open eq in) open = null }
            h
          }
          override def next(): Row =
            if (hasNext) { val r = recordRow(Seq(pathStr), idx, inner.next()); idx += 1; r }
            else throw new NoSuchElementException
        }
      }
    }
  }
}
