package graft.sources

import java.util.zip.Inflater

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** PDF text extraction — the document-source sibling of [[WarcCodec]]:
  * crawl corpora carry papers/books/reports as PDF, and a training-data
  * pipeline wants their TEXT on the same extract → langID → quality →
  * dedup → pack path as HTML. Own from-scratch reader (ISO 32000 / the
  * classic Adobe PDF spec); the only borrowed machinery is the JDK's
  * `Inflater` for FlateDecode, the same dependency posture as
  * [[graft.ops.PngCodec]].
  *
  * What parses:
  *  - indirect objects located by a ROBUST SCAN for `N G obj … endobj`
  *    (the posture of real-world extractors: xref tables in crawled PDFs
  *    are routinely wrong — offsets are never trusted);
  *  - the COS object grammar: dictionaries, arrays, names (with `#xx`
  *    escapes), literal strings (backslash escapes incl. octal and
  *    line continuations), hex strings, numbers, booleans, null,
  *    `N G R` references;
  *  - the document structure: trailer `/Root` → Catalog → `/Pages` tree
  *    (`/Kids` recursion, cycle-guarded) → `/Page` leaves in tree order;
  *    a PDF with a broken/absent trailer falls back to scanning for the
  *    `/Type /Catalog` object;
  *  - content streams: `/Length` direct or INDIRECT, raw or
  *    `/FlateDecode` (zlib, inflated under a hard cap; other filters
  *    skip that stream), `/Contents` a single stream or an array
  *    (concatenated in order);
  *  - the text operators inside BT…ET: `Tj`, `'`, `"`, `TJ` (array show
  *    — a kern number ≤ −180 thousandths renders as a space, the
  *    standard word-gap heuristic), with `T*`/`TD`/vertical `Td` treated
  *    as line breaks (suppressed when nothing has been emitted yet or a
  *    break just happened).
  *
  * ENCODING SCOPE (stated precisely): without a /ToUnicode table,
  * string bytes map through printable ASCII + latin-1 high bytes.
  * Fonts that CARRY a /ToUnicode CMap (the CID-keyed output of modern
  * generators) decode through it since r16: page /Resources → /Font →
  * /ToUnicode streams parse (codespacerange width, bfchar, bfrange
  * with incrementing or array destinations), `Tf` tracks the active
  * font, and show strings map width-byte codes to their UTF-16BE
  * expansions — unmapped wide codes emit nothing rather than raw code
  * bytes. Predefined (non-ToUnicode) CMaps like bare Identity-H remain
  * out of scope: without the table there is nothing to map through.
  *
  * Since r17, simple fonts WITHOUT a /ToUnicode consult their
  * /Encoding dictionary's /Differences array (ISO 32000 §9.6.6.1):
  * remapped codes resolve through a bounded Adobe-Glyph-List subset
  * (ASCII names, common Latin accents and punctuation) plus the
  * algorithmic `uniXXXX` / `uXXXX[XX]` forms; a remapped code whose
  * glyph name is not resolvable emits NOTHING (never the latin-1 byte
  * — the glyph is known to be something else), while codes the array
  * does not touch keep the latin-1 path. /ActualText replacement spans
  * (§14.9.4) are honored in the content-stream walk: `BDC` with an
  * inline property dict carrying /ActualText emits the replacement
  * (UTF-16BE with BOM, else PDFDocEncoding ≈ latin-1 in our printable
  * scope) and suppresses the enclosed show-text until the matching
  * `EMC`; named /Properties resources are out of scope (inline dicts
  * are what tagged-PDF writers emit for replacements).
  *
  * Garbage-in contract (family-wide): malformed, hostile or truncated
  * input yields `None` or the pages that did parse — never a throw, and
  * never an unbounded allocation (object count, per-stream inflation and
  * total text are all capped).
  */
object PdfCodec {

  final case class PdfDoc(nPages: Int, pages: Array[String])

  private val MaxObjects = 100000
  private val MaxStreamBytes = 64 << 20
  private val MaxTextChars = 16 << 20
  private val MaxKidDepth = 64

  // ---- COS value model ----
  private[sources] sealed trait Obj
  private[sources] final case class PNum(v: Double) extends Obj
  private[sources] final case class PName(v: String) extends Obj
  private[sources] final case class PStr(bytes: Array[Byte]) extends Obj
  private[sources] final case class PArr(items: Vector[Obj]) extends Obj
  private[sources] final case class PDict(m: Map[String, Obj]) extends Obj
  private[sources] final case class PRef(num: Int) extends Obj
  private[sources] final case class POp(name: String) extends Obj
  private[sources] case object PNull extends Obj

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent lexer/parser over a byte window. `parseNext`
    * returns one object (or operator keyword) and advances `pos`.
    */
  private final class Lexer(b: Array[Byte], var pos: Int, val end: Int) {
    def skipWs(): Unit = {
      var more = true
      while (more) {
        while (pos < end && isWs(b(pos) & 0xFF)) pos += 1
        if (pos < end && b(pos) == '%') { // comment to EOL
          while (pos < end && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else more = false
      }
    }
    def atEnd: Boolean = { skipWs(); pos >= end }

    def parseNext(depth: Int): Obj = {
      if (depth > 48) throw new IllegalStateException("depth")
      skipWs()
      if (pos >= end) throw new IllegalStateException("eof")
      val c = b(pos) & 0xFF
      c match {
        case '/' => parseName()
        case '(' => parseLiteralString()
        case '[' =>
          pos += 1
          var items = Vector.empty[Obj]
          skipWs()
          while (pos < end && b(pos) != ']') {
            items :+= parseNext(depth + 1)
            skipWs()
          }
          if (pos < end) pos += 1 // ']'
          PArr(items)
        case '<' =>
          if (pos + 1 < end && b(pos + 1) == '<') parseDict(depth)
          else parseHexString()
        case _ if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ => parseKeyword()
      }
    }

    private def parseName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < end && !isWs(b(pos) & 0xFF) && !isDelim(b(pos) & 0xFF)) {
        val ch = b(pos) & 0xFF
        if (ch == '#' && pos + 2 < end) {
          val h = Character.digit(b(pos + 1), 16)
          val l = Character.digit(b(pos + 2), 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(ch.toChar); pos += 1 }
        } else { sb.append(ch.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseLiteralString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < end && depth > 0) {
        val ch = b(pos) & 0xFF
        if (ch == '\\' && pos + 1 < end) {
          val e = b(pos + 1) & 0xFF
          e match {
            case 'n' => out.write('\n'); pos += 2
            case 'r' => out.write('\r'); pos += 2
            case 't' => out.write('\t'); pos += 2
            case 'b' => out.write('\b'); pos += 2
            case 'f' => out.write('\f'); pos += 2
            case '\r' => // line continuation (swallow optional \n)
              pos += 2
              if (pos < end && b(pos) == '\n') pos += 1
            case '\n' => pos += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0
              var k = 0
              pos += 1
              while (k < 3 && pos < end && b(pos) >= '0' && b(pos) <= '7') {
                v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
              }
              out.write(v & 0xFF)
            case other => out.write(other); pos += 2 // \( \) \\ and unknown
          }
        } else {
          if (ch == '(') depth += 1
          else if (ch == ')') depth -= 1
          if (depth > 0) out.write(ch)
          pos += 1
        }
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (pos < end && b(pos) != '>') {
        val d = Character.digit(b(pos), 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
        pos += 1
      }
      if (hi >= 0) out.write(hi << 4) // odd count: trailing 0 per spec
      if (pos < end) pos += 1 // '>'
      PStr(out.toByteArray)
    }

    private def parseDict(depth: Int): PDict = {
      pos += 2 // '<<'
      var m = Map.empty[String, Obj]
      skipWs()
      while (pos + 1 < end && !(b(pos) == '>' && b(pos + 1) == '>')) {
        if (b(pos) != '/') throw new IllegalStateException("dict key")
        val k = parseName().v
        val v = parseNext(depth + 1)
        m += (k -> v)
        skipWs()
      }
      pos = math.min(end, pos + 2) // '>>'
      PDict(m)
    }

    private def parseNumberOrRef(): Obj = {
      val start = pos
      if (b(pos) == '+' || b(pos) == '-') pos += 1
      while (pos < end && ((b(pos) >= '0' && b(pos) <= '9') || b(pos) == '.')) pos += 1
      val s = new String(b, start, pos - start, "ISO-8859-1")
      val v = try s.toDouble catch { case _: NumberFormatException =>
        throw new IllegalStateException("num") }
      // look ahead for "G R" → an indirect reference
      if (v >= 0 && v == math.floor(v)) {
        val save = pos
        skipWs()
        val gStart = pos
        while (pos < end && b(pos) >= '0' && b(pos) <= '9') pos += 1
        if (pos > gStart) {
          skipWs()
          if (pos < end && b(pos) == 'R' &&
            (pos + 1 >= end || isWs(b(pos + 1) & 0xFF) || isDelim(b(pos + 1) & 0xFF))) {
            pos += 1
            return PRef(v.toInt)
          }
        }
        pos = save
      }
      PNum(v)
    }

    private def parseKeyword(): Obj = {
      val start = pos
      while (pos < end && !isWs(b(pos) & 0xFF) && !isDelim(b(pos) & 0xFF)) pos += 1
      if (pos == start) { pos += 1; return POp(((b(start) & 0xFF).toChar).toString) }
      new String(b, start, pos - start, "ISO-8859-1") match {
        case "true" => PNum(1)
        case "false" => PNum(0)
        case "null" => PNull
        case kw => POp(kw)
      }
    }
  }

  /** One scanned indirect object: the byte window between `obj` and
    * `endobj` (stream payloads located lazily inside it).
    */
  private final case class RawObj(bodyStart: Int, bodyEnd: Int)

  private def findAscii(b: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.max(0, from)
    val last = b.length - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && b(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Extract the page texts of a PDF. None when the bytes are not a
    * parseable PDF with at least one page.
    */
  def extractText(bytes: Array[Byte]): Option[PdfDoc] = {
    try {
      if (bytes == null || bytes.length < 16) return None
      if (findAscii(bytes, "%PDF-", 0) != 0) return None

      // ---- robust object scan: "N G obj" … "endobj" ----
      val objs = scala.collection.mutable.HashMap.empty[Int, RawObj]
      var i = 0
      var found = 0
      while (i >= 0 && found < MaxObjects) {
        i = findAscii(bytes, "obj", i)
        if (i >= 0) {
          // walk back over "N G " — generation then number
          var p = i - 1
          while (p >= 0 && isWs(bytes(p) & 0xFF)) p -= 1
          val genEnd = p
          while (p >= 0 && bytes(p) >= '0' && bytes(p) <= '9') p -= 1
          val genStart = p + 1
          while (p >= 0 && isWs(bytes(p) & 0xFF)) p -= 1
          val numEnd = p
          while (p >= 0 && bytes(p) >= '0' && bytes(p) <= '9') p -= 1
          val numStart = p + 1
          if (genEnd >= genStart && numEnd >= numStart && numEnd - numStart < 9) {
            val num = new String(bytes, numStart, numEnd - numStart + 1, "ISO-8859-1").toInt
            val bodyStart = i + 3
            val endObj = findAscii(bytes, "endobj", bodyStart)
            val bodyEnd = if (endObj < 0) bytes.length else endObj
            if (!objs.contains(num)) { objs(num) = RawObj(bodyStart, bodyEnd); found += 1 }
            i = bodyEnd
          } else i = i + 3
        }
      }
      if (objs.isEmpty) return None

      val parsed = scala.collection.mutable.HashMap.empty[Int, Obj]
      // objects living INSIDE object streams (PDF 1.5+ /Type /ObjStm):
      // (objnum → pre-parsed value), filled by the pre-pass below
      val inStream = scala.collection.mutable.HashMap.empty[Int, Obj]
      def objOf(num: Int): Obj = parsed.get(num) match {
        case Some(o) => o
        case None =>
          // cache only values that cannot improve later: a successful
          // top-level parse, or an inStream fallback once the ObjStm
          // pre-pass has surfaced the number — memoizing a PNull
          // fallback DURING the pre-pass would pin an object whose only
          // good copy lives in a not-yet-read object stream (r15 advice)
          var fallback = false
          val v = objs.get(num) match {
            case Some(r) =>
              try new Lexer(bytes, r.bodyStart, r.bodyEnd).parseNext(0)
              catch { case _: Exception =>
                fallback = true; inStream.getOrElse(num, PNull)
              }
            case None => fallback = true; inStream.getOrElse(num, PNull)
          }
          if (!fallback || inStream.contains(num)) parsed(num) = v
          v
      }
      def deref(o: Obj): Obj = o match {
        case PRef(n) => objOf(n)
        case x => x
      }

      /** The stream payload of object `num`, after /Length resolution and
        * FlateDecode; None when absent, filtered unsupportedly or broken.
        */
      def streamData(num: Int): Option[Array[Byte]] = objs.get(num).flatMap { r =>
        // re-lex the dict HERE so the 'stream' keyword search starts at
        // the dict's end: a name or literal containing the bytes
        // 'stream' (/Title (my stream notes)) must not misposition the
        // data window (r15 advice)
        val lx = new Lexer(bytes, r.bodyStart, r.bodyEnd)
        val dict = (try lx.parseNext(0) catch { case _: Exception => PNull }) match {
          case d: PDict => d
          case _ => return None
        }
        val sk = findAscii(bytes, "stream", lx.pos)
        if (sk < 0 || sk >= r.bodyEnd) return None
        var dataStart = sk + 6
        if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
        if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
        val endStream = findAscii(bytes, "endstream", dataStart)
        val hardEnd = if (endStream < 0) r.bodyEnd else endStream
        val len = deref(dict.m.getOrElse("Length", PNull)) match {
          case PNum(v) if v >= 0 && v <= (hardEnd - dataStart).toDouble => v.toInt
          case _ => math.max(0, hardEnd - dataStart) // broken Length: to endstream
        }
        val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + len)
        deref(dict.m.getOrElse("Filter", PNull)) match {
          case PNull => Some(raw)
          case PName("FlateDecode") => inflateCapped(raw)
          case PArr(Vector(PName("FlateDecode"))) => inflateCapped(raw)
          case _ => None // unsupported filter: skip this stream
        }
      }

      // ---- pre-pass: surface objects stored INSIDE object streams
      // (PDF 1.5+ /Type /ObjStm — modern writers put the catalog, page
      // tree and page dicts there): inflate, read the N (objnum, offset)
      // header pairs, parse each object out of the decompressed buffer
      // at /First + offset. Top-level objects win on number collisions.
      objs.keysIterator.toSeq.sorted.foreach { n =>
        objOf(n) match {
          case PDict(m) if m.get("Type").contains(PName("ObjStm")) =>
            val nObjs = deref(m.getOrElse("N", PNull)) match {
              case PNum(v) if v >= 0 && v <= MaxObjects => v.toInt
              case _ => 0
            }
            val first = deref(m.getOrElse("First", PNull)) match {
              case PNum(v) if v >= 0 && v < Int.MaxValue => v.toInt
              case _ => -1
            }
            if (nObjs > 0 && first >= 0) streamData(n).foreach { data =>
              try {
                val hdr = new Lexer(data, 0, math.min(first, data.length))
                val pairs = new Array[(Int, Int)](nObjs)
                var i = 0
                var okH = true
                while (i < nObjs && okH) {
                  (hdr.parseNext(0), hdr.parseNext(0)) match {
                    case (PNum(on), PNum(off)) => pairs(i) = (on.toInt, off.toInt)
                    case _ => okH = false
                  }
                  i += 1
                }
                if (okH) pairs.foreach { case (on, off) =>
                  val p = first.toLong + off
                  // surface EVERY stream copy (first ObjStm wins among
                  // streams): top-level copies still take precedence in
                  // objOf's resolution order, but a CORRUPT top-level
                  // copy now falls back to this one (r15 advice)
                  if (p >= 0 && p < data.length && !inStream.contains(on)) {
                    try inStream(on) = new Lexer(data, p.toInt, data.length).parseNext(0)
                    catch { case _: Exception => }
                  }
                }
              } catch { case _: Exception => }
            }
          case _ =>
        }
      }

      // ---- document structure: trailer /Root, else catalog scan ----
      def catalogNum: Option[Int] = {
        var t = bytes.length
        var rootRef: Option[Int] = None
        while (rootRef.isEmpty && { t = lastIndexOfAscii(bytes, "trailer", t - 1); t >= 0 }) {
          try {
            val lx = new Lexer(bytes, t + 7, bytes.length)
            lx.parseNext(0) match {
              case PDict(m) => m.get("Root") match {
                case Some(PRef(n)) => rootRef = Some(n)
                case _ =>
              }
              case _ =>
            }
          } catch { case _: Exception => }
        }
        rootRef.orElse {
          objs.keysIterator.toSeq.sorted.find { n =>
            objOf(n) match {
              case PDict(m) => m.get("Type").contains(PName("Catalog"))
              case _ => false
            }
          }
        }.orElse {
          inStream.keysIterator.toSeq.sorted.find { n =>
            inStream(n) match {
              case PDict(m) => m.get("Type").contains(PName("Catalog"))
              case _ => false
            }
          }
        }
      }

      val pagesRoot = catalogNum.map(objOf).flatMap {
        case PDict(m) => m.get("Pages")
        case _ => None
      }

      // ---- page-tree walk (cycle-guarded, order-preserving) ----
      val pageDicts = scala.collection.mutable.ArrayBuffer.empty[PDict]
      val visited = scala.collection.mutable.HashSet.empty[Int]
      def walk(o: Obj, depth: Int): Unit = {
        if (depth > MaxKidDepth || pageDicts.length > 100000) return
        val node = o match {
          case PRef(n) =>
            if (!visited.add(n)) return
            objOf(n)
          case x => x
        }
        node match {
          case d @ PDict(m) =>
            m.get("Type") match {
              case Some(PName("Page")) => pageDicts += d
              case _ =>
                deref(m.getOrElse("Kids", PNull)) match {
                  case PArr(kids) => kids.foreach(k => walk(k, depth + 1))
                  case _ =>
                    // untyped leaf with /Contents: treat as a page
                    if (m.contains("Contents")) pageDicts += d
                }
            }
          case _ =>
        }
      }
      pagesRoot.foreach(walk(_, 0))
      if (pageDicts.isEmpty) {
        // last resort: any object that LOOKS like a page (either store)
        (objs.keysIterator.toSeq.sorted.map(objOf) ++
          inStream.keysIterator.toSeq.sorted.map(inStream(_))).foreach {
          case d @ PDict(m) if m.get("Type").contains(PName("Page")) => pageDicts += d
          case _ =>
        }
      }
      if (pageDicts.isEmpty) return None

      /** Per-page font table: /Resources → /Font → (name → ToUnicode
        * CMap), for the composite-font text path. A font without a
        * usable /ToUnicode stream falls back to its /Encoding
        * dictionary's /Differences array (r17, simple fonts); with
        * neither it maps to None and keeps the byte path.
        */
      def pageFonts(pd: PDict): Map[String, UniCMap] =
        deref(pd.m.getOrElse("Resources", PNull)) match {
          case PDict(res) => deref(res.getOrElse("Font", PNull)) match {
            case PDict(fonts) => fonts.flatMap { case (fname, fref) =>
              deref(fref) match {
                case PDict(fd) =>
                  val viaToUnicode = fd.get("ToUnicode") match {
                    case Some(PRef(tn)) => streamData(tn).flatMap(parseToUnicode)
                    case _ => None
                  }
                  val viaDifferences = viaToUnicode.orElse(
                    deref(fd.getOrElse("Encoding", PNull)) match {
                      case PDict(enc) => deref(enc.getOrElse("Differences", PNull)) match {
                        case PArr(items) => differencesCMap(items)
                        case _ => None
                      }
                      case _ => None
                    })
                  // r18: Identity-H composite font WITHOUT /ToUnicode —
                  // codes are glyph ids; invert the embedded FontFile2's
                  // own 'cmap' table (descendant → descriptor → font
                  // program). Unmappable gids keep emitting nothing.
                  val viaFontFile = viaDifferences.orElse(
                    deref(fd.getOrElse("Encoding", PNull)) match {
                      case PName("Identity-H") =>
                        deref(fd.getOrElse("DescendantFonts", PNull)) match {
                          case PArr(dfs) if dfs.nonEmpty =>
                            deref(dfs.head) match {
                              case PDict(desc) =>
                                deref(desc.getOrElse("FontDescriptor", PNull)) match {
                                  case PDict(fdesc) => fdesc.get("FontFile2") match {
                                    case Some(PRef(fn)) =>
                                      streamData(fn).flatMap(fontFile2CMap)
                                    case _ => None
                                  }
                                  case _ => None
                                }
                              case _ => None
                            }
                          case _ => None
                        }
                      case _ => None
                    })
                  viaFontFile.map(fname -> _)
                case _ => None
              }
            }
            case _ => Map.empty
          }
          case _ => Map.empty
        }

      // ---- per-page content → text ----
      var totalChars = 0
      val pages = pageDicts.iterator.map { pd =>
        val contentRefs: Seq[Int] = pd.m.get("Contents") match {
          case Some(PRef(n)) => Seq(n)
          case Some(PArr(items)) => items.collect { case PRef(n) => n }
          case _ => Seq.empty
        }
        val parts = contentRefs.flatMap(streamData)
        val data =
          if (parts.isEmpty) Array.emptyByteArray
          else if (parts.lengthCompare(1) == 0) parts.head
          else { // single pre-sized concat: pages carry MANY small streams
            val out = new java.io.ByteArrayOutputStream(parts.iterator.map(_.length).sum)
            parts.foreach(out.write)
            out.toByteArray
          }
        val fonts = pageFonts(pd)
        val t = if (data.isEmpty) "" else extractTextOps(data, MaxTextChars - totalChars, fonts)
        totalChars += t.length
        t
      }.toArray
      Some(PdfDoc(pages.length, pages))
    } catch { case _: Throwable => None }
  }

  private def lastIndexOfAscii(b: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.min(from, b.length - n.length)
    while (i >= 0) {
      var j = 0
      while (j < n.length && b(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i -= 1
    }
    -1
  }

  /** Inflate a zlib stream under [[MaxStreamBytes]]; None on any stall,
    * truncation, FDICT header or cap hit.
    */
  private def inflateCapped(in: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(math.min(in.length * 4, 1 << 20))
    val buf = new Array[Byte](64 * 1024)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // truncated / FDICT / stall
        out.write(buf, 0, n)
        if (out.size() > MaxStreamBytes) return None
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** A font's ToUnicode character map: fixed `width`-byte codes (1 or 2,
    * from the codespacerange — the widths real ToUnicode CMaps declare)
    * to their Unicode expansions.
    */
  private[sources] final case class UniCMap(width: Int, map: Map[Int, String])

  private val MaxCMapEntries = 65536

  /** Parse a /ToUnicode CMap stream (ISO 32000 §9.10.3 / Adobe CMap
    * grammar subset): `begincodespacerange` fixes the code width,
    * `beginbfchar` maps single codes, `beginbfrange` maps runs — with
    * either an incrementing destination string (last UTF-16 unit
    * advances, per spec) or an explicit destination array. Entry counts
    * are capped; a CMap with no mappings returns None (byte path).
    */
  private[sources] def parseToUnicode(data: Array[Byte]): Option[UniCMap] = {
    val lx = new Lexer(data, 0, data.length)
    var width = 0
    val m = scala.collection.mutable.HashMap.empty[Int, String]
    def codeOf(b: Array[Byte]): Int = {
      var v = 0
      var i = math.max(0, b.length - 4)
      while (i < b.length) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
      v
    }
    def utf16(b: Array[Byte], delta: Int): String = {
      if (b.length < 2 || b.length % 2 != 0) return ""
      val bb = java.util.Arrays.copyOf(b, b.length)
      if (delta != 0) { // the LAST code unit increments across a bfrange
        val last = ((bb(bb.length - 2) & 0xFF) << 8 | (bb(bb.length - 1) & 0xFF)) + delta
        bb(bb.length - 2) = ((last >> 8) & 0xFF).toByte
        bb(bb.length - 1) = (last & 0xFF).toByte
      }
      new String(bb, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[Obj]
    var section = "" // "", codespace, bfchar, bfrange
    try {
      while (!lx.atEnd && m.size < MaxCMapEntries) {
        lx.parseNext(0) match {
          case POp("begincodespacerange") => section = "codespace"; buf.clear()
          case POp("beginbfchar") => section = "bfchar"; buf.clear()
          case POp("beginbfrange") => section = "bfrange"; buf.clear()
          case POp(op) if op.startsWith("end") => section = ""; buf.clear()
          case v if section == "codespace" =>
            buf += v
            if (buf.length == 2) {
              (buf(0), buf(1)) match {
                case (PStr(lo), _) => width = math.max(width, math.min(lo.length, 2))
                case _ =>
              }
              buf.clear()
            }
          case v if section == "bfchar" =>
            buf += v
            if (buf.length == 2) {
              (buf(0), buf(1)) match {
                case (PStr(src), PStr(dst)) => m(codeOf(src)) = utf16(dst, 0)
                case _ =>
              }
              buf.clear()
            }
          case v if section == "bfrange" =>
            buf += v
            if (buf.length == 3) {
              (buf(0), buf(1), buf(2)) match {
                case (PStr(lo), PStr(hi), PStr(dst)) =>
                  val l = codeOf(lo); val h = codeOf(hi)
                  var c = l
                  while (c <= h && c - l < MaxCMapEntries && m.size < MaxCMapEntries) {
                    m(c) = utf16(dst, c - l); c += 1
                  }
                case (PStr(lo), PStr(hi), PArr(dsts)) =>
                  val l = codeOf(lo); val h = codeOf(hi)
                  var c = l
                  while (c <= h && (c - l) < dsts.length && m.size < MaxCMapEntries) {
                    dsts(c - l) match {
                      case PStr(d) => m(c) = utf16(d, 0)
                      case _ =>
                    }
                    c += 1
                  }
                case _ =>
              }
              buf.clear()
            }
          case _ => // header boilerplate (/CIDInit, findresource, ...)
        }
      }
    } catch { case _: Exception => /* malformed tail: keep what parsed */ }
    if (m.isEmpty) None else Some(UniCMap(if (width == 0) 1 else width, m.toMap))
  }

  /** Bounded Adobe-Glyph-List subset for /Differences resolution:
    * ASCII punctuation/digit/letter names, the common Latin accents,
    * and typographic punctuation — plus the ALGORITHMIC `uniXXXX`
    * (one or more 4-hex-digit UTF-16 units) and `uXXXX`–`uXXXXXX`
    * forms. Names outside this subset resolve to None and the caller
    * suppresses the code (emitting the raw byte for a remapped code
    * would be wrong by construction).
    */
  private val GlyphNames: Map[String, String] = {
    val ascii = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~")
    val digits = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine").zipWithIndex
      .map { case (n, i) => n -> ('0' + i).toChar.toString }.toMap
    val letters = (('a' to 'z') ++ ('A' to 'Z'))
      .map(c => c.toString -> c.toString).toMap
    val latin = Map(
      "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
      "atilde" -> "ã", "adieresis" -> "ä", "aring" -> "å", "ae" -> "æ",
      "ccedilla" -> "ç", "egrave" -> "è", "eacute" -> "é",
      "ecircumflex" -> "ê", "edieresis" -> "ë", "igrave" -> "ì",
      "iacute" -> "í", "icircumflex" -> "î", "idieresis" -> "ï",
      "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
      "ocircumflex" -> "ô", "otilde" -> "õ", "odieresis" -> "ö",
      "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú",
      "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
      "ydieresis" -> "ÿ", "germandbls" -> "ß", "thorn" -> "þ",
      "eth" -> "ð", "lslash" -> "ł", "Lslash" -> "Ł",
      "oe" -> "œ", "OE" -> "Œ", "scaron" -> "š",
      "Scaron" -> "Š", "zcaron" -> "ž", "Zcaron" -> "Ž",
      "Euro" -> "€", "bullet" -> "•", "dagger" -> "†",
      "daggerdbl" -> "‡", "ellipsis" -> "…",
      "emdash" -> "—", "endash" -> "–",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "guillemotleft" -> "«", "guillemotright" -> "»",
      "exclamdown" -> "¡", "questiondown" -> "¿", "degree" -> "°",
      "copyright" -> "©", "registered" -> "®", "trademark" -> "™",
      "sterling" -> "£", "yen" -> "¥", "cent" -> "¢", "section" -> "§",
      "paragraph" -> "¶", "mu" -> "µ", "middot" -> "·",
      "plusminus" -> "±", "multiply" -> "×", "divide" -> "÷")
    ascii ++ digits ++ letters ++ latin
  }

  private val UniName = "uni((?:[0-9A-Fa-f]{4})+)".r
  private val UName = "u([0-9A-Fa-f]{4,6})".r

  private[sources] def glyphToUnicode(name: String): Option[String] =
    GlyphNames.get(name).orElse(name match {
      case UniName(hex) =>
        // AGL: each 4-hex group is a UTF-16 unit EXCLUDING surrogates —
        // a lone D800-DFFF would make the page text invalid UTF-16
        val units = hex.grouped(4).map(h => Integer.parseInt(h, 16)).toSeq
        if (units.exists(u => u >= 0xD800 && u <= 0xDFFF)) None
        else Some(units.map(_.toChar).mkString)
      case UName(hex) =>
        val cp = Integer.parseInt(hex, 16)
        if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
          Some(new String(Character.toChars(cp)))
        else None
      case _ => None
    })

  /** Build a width-1 [[UniCMap]] from a simple font's /Encoding
    * /Differences array (ISO 32000 §9.6.6.1): integers set the next
    * code, names consume one code each. Remapped codes with an
    * unresolvable glyph name map to "" (suppressed); untouched codes
    * stay OUT of the map so the latin-1 path still applies to them.
    */
  /** Glyph→unicode table from an embedded TrueType font program
    * (/FontFile2) — the r18 fallback for Identity-H composite fonts
    * WITHOUT a /ToUnicode CMap (common in real-world corporate PDFs):
    * under Identity-H the 2-byte show-string codes are glyph ids, and
    * the font's own 'cmap' table (unicode → gid) INVERTED recovers the
    * text. Parses the sfnt table directory, picks the best 'cmap'
    * subtable (format 12 preferred over 4; Windows-platform preferred),
    * and inverts deterministically (a gid reachable from several
    * unicodes keeps the LOWEST). Caps bound hostile fonts (table count,
    * segment/group counts, total mapped chars); anything malformed
    * yields None — the byte path stays, nothing throws.
    */
  private[sources] def fontFile2CMap(font: Array[Byte]): Option[UniCMap] = {
    try {
      def u16(o: Int): Int = ((font(o) & 0xFF) << 8) | (font(o + 1) & 0xFF)
      def u32(o: Int): Long = ((font(o) & 0xFFL) << 24) | ((font(o + 1) & 0xFFL) << 16) |
        ((font(o + 2) & 0xFFL) << 8) | (font(o + 3) & 0xFFL)
      if (font.length < 12) return None
      val numTables = u16(4)
      if (numTables <= 0 || numTables > 64) return None
      var cmapOff = -1
      var i = 0
      while (i < numTables) {
        val rec = 12 + 16 * i
        if (rec + 16 <= font.length &&
            font(rec) == 'c' && font(rec + 1) == 'm' &&
            font(rec + 2) == 'a' && font(rec + 3) == 'p') {
          val off = u32(rec + 8)
          if (off < font.length) cmapOff = off.toInt
        }
        i += 1
      }
      if (cmapOff < 0 || cmapOff + 4 > font.length) return None
      val nSub = u16(cmapOff + 2)
      if (nSub <= 0 || nSub > 32) return None
      var best = -1
      var bestScore = -1
      i = 0
      while (i < nSub) {
        val rec = cmapOff + 4 + 8 * i
        if (rec + 8 <= font.length) {
          val plat = u16(rec)
          val off = cmapOff + u32(rec + 4).toInt
          if (off >= 0 && off + 4 <= font.length) {
            val score = (u16(off), plat) match {
              case (12, 3) => 5
              case (12, 0) => 4
              case (12, _) => 3
              case (4, 3) => 2
              case (4, _) => 1
              case _ => -1
            }
            if (score > bestScore) { bestScore = score; best = off }
          }
        }
        i += 1
      }
      if (best < 0) return None
      val gidUni = scala.collection.mutable.HashMap.empty[Int, Int]
      // `mapped` counts VISITED codes, not stored entries: a hostile font
      // whose every lookup lands on gid 0 must still trip the walk bound
      // (review finding — the gid!=0-only count let 134M-iteration fonts
      // evade the cap)
      var mapped = 0
      val MaxMapped = 1 << 17
      def record(gid: Int, uni: Int): Unit = {
        mapped += 1
        if (gid != 0) {
          val cur = gidUni.get(gid)
          if (cur.isEmpty || uni < cur.get) gidUni(gid) = uni
        }
      }
      u16(best) match {
        case 4 =>
          val segCount = u16(best + 6) / 2
          if (segCount <= 0 || segCount > 2048) return None
          val endAt = best + 14
          val startAt = endAt + 2 * segCount + 2 // +2: reservedPad
          val deltaAt = startAt + 2 * segCount
          val rangeAt = deltaAt + 2 * segCount
          if (rangeAt + 2 * segCount > font.length) return None
          var s = 0
          while (s < segCount && mapped < MaxMapped) {
            val end = u16(endAt + 2 * s)
            val start = u16(startAt + 2 * s)
            val delta = u16(deltaAt + 2 * s)
            val ro = u16(rangeAt + 2 * s)
            var c = start
            // the cap bounds the WALK, not just the map: a hostile font
            // with 2048 full-range segments must not spin 134M iterations
            while (c <= end && c != 0xFFFF && mapped < MaxMapped) {
              val gid =
                if (ro == 0) (c + delta) & 0xFFFF
                else {
                  val addr = rangeAt + 2 * s + ro + 2 * (c - start)
                  if (addr + 2 > font.length) 0
                  else {
                    val g0 = u16(addr)
                    if (g0 == 0) 0 else (g0 + delta) & 0xFFFF
                  }
                }
              record(gid, c)
              c += 1
            }
            s += 1
          }
        case 12 =>
          val nGroups = u32(best + 12)
          if (nGroups <= 0 || nGroups > 10000) return None
          var g = 0
          while (g < nGroups && mapped < MaxMapped) {
            val at = best + 16 + 12 * g
            if (at + 12 > font.length) return None
            val start = u32(at)
            val end = u32(at + 4)
            val startGid = u32(at + 8)
            if (end >= start && end - start < MaxMapped && end <= 0x10FFFF) {
              var c = start
              while (c <= end && mapped < MaxMapped) {
                record((startGid + (c - start)).toInt, c.toInt)
                c += 1
              }
            }
            g += 1
          }
        case _ => return None
      }
      if (gidUni.isEmpty) None
      else Some(UniCMap(2, gidUni.map { case (g, u) =>
        g -> new String(Character.toChars(u))
      }.toMap))
    } catch { case _: Exception => None }
  }

  private[sources] def differencesCMap(items: Vector[Obj]): Option[UniCMap] = {
    var code = -1
    val m = scala.collection.mutable.HashMap.empty[Int, String]
    items.foreach {
      case PNum(v) => code = v.toInt
      case PName(n) =>
        // ISO 32000 7.8: every name consumes one code slot — the counter
        // advances even when the current code is out of byte range (or no
        // integer has appeared yet), so names later in a malformed
        // /Differences array never misalign to wrong codes (r18 advice)
        if (code >= 0 && code <= 255) m(code) = glyphToUnicode(n).getOrElse("")
        code += 1
      case _ =>
    }
    if (m.isEmpty) None else Some(UniCMap(1, m.toMap))
  }

  /** Run the BT…ET text operators of a content stream. Kern ≤ −180
    * thousandths in TJ renders as a space; T* / TD / vertical Td break
    * lines (suppressed at start / after a break). `fonts` carries the
    * page's ToUnicode CMaps: after `/Fn size Tf`, show strings decode
    * through Fn's CMap — `width`-byte big-endian codes to their Unicode
    * expansions (unmapped wide codes emit nothing rather than garbage;
    * unmapped 1-byte codes keep the latin-1 path, partial CMaps are
    * common on simple fonts).
    */
  private[sources] def extractTextOps(data: Array[Byte], maxChars: Int,
                                      fonts: Map[String, UniCMap] = Map.empty): String = {
    val sb = new StringBuilder
    var cmap: Option[UniCMap] = None
    // /ActualText replacement spans: BDC/BMC nesting depth, and the depth
    // at which an ActualText span opened (its replacement already emitted
    // — all show-text until the matching EMC is suppressed)
    var mcDepth = 0
    var suppressFrom = -1
    def suppressed: Boolean = suppressFrom >= 0
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def emit(t: String): Unit = {
      var i = 0
      while (i < t.length && sb.length < maxChars) {
        val c = t.charAt(i)
        if (c == '\n' || c == '\r') newline()
        else if (c == '\t') sb.append(' ')
        else if (c >= 0x20 && c != 0x7F) sb.append(c)
        i += 1
      }
    }
    def show(s: Array[Byte]): Unit = if (!suppressed) cmap match {
      case Some(UniCMap(w, m)) if w > 1 =>
        var i = 0
        while (i + w <= s.length && sb.length < maxChars) {
          var code = 0
          var j = 0
          while (j < w) { code = (code << 8) | (s(i + j) & 0xFF); j += 1 }
          m.get(code).foreach(emit)
          i += w
        }
      case Some(UniCMap(_, m)) =>
        var i = 0
        while (i < s.length && sb.length < maxChars) {
          val c = s(i) & 0xFF
          m.get(c) match {
            case Some(t) => emit(t)
            case None =>
              if (c == '\n' || c == '\r') newline()
              else if (c == '\t') sb.append(' ')
              else if (c >= 0x20 && c != 0x7F) sb.append(c.toChar)
          }
          i += 1
        }
      case None =>
        var i = 0
        while (i < s.length && sb.length < maxChars) {
          val c = s(i) & 0xFF
          if (c == '\n' || c == '\r') newline()
          else if (c == '\t') sb.append(' ')
          else if (c >= 0x20 && c != 0x7F) sb.append(c.toChar)
          i += 1
        }
    }
    val lx = new Lexer(data, 0, data.length)
    val operands = scala.collection.mutable.ArrayBuffer.empty[Obj]
    try {
      while (!lx.atEnd && sb.length < maxChars) {
        lx.parseNext(0) match {
          case POp(op) =>
            op match {
              case "Tf" => operands.headOption.collect {
                case PName(f) => cmap = fonts.get(f)
              }
              case "Tj" => operands.lastOption.collect { case PStr(s) => show(s) }
              case "'" =>
                if (!suppressed) newline()
                operands.lastOption.collect { case PStr(s) => show(s) }
              case "\"" =>
                if (!suppressed) newline()
                operands.lastOption.collect { case PStr(s) => show(s) }
              case "TJ" => operands.lastOption.collect { case PArr(items) =>
                items.foreach {
                  case PStr(s) => show(s)
                  case PNum(v) if v <= -180 =>
                    if (!suppressed && sb.nonEmpty && sb.charAt(sb.length - 1) != ' ')
                      sb.append(' ')
                  case _ =>
                }
              }
              case "BDC" =>
                mcDepth += 1
                // inline property dict with /ActualText: emit the
                // replacement, suppress the span's own show-text
                if (!suppressed) operands.lastOption.collect {
                  case PDict(props) => props.get("ActualText").collect {
                    case PStr(b) =>
                      val t = if (b.length >= 2 && (b(0) & 0xFF) == 0xFE &&
                        (b(1) & 0xFF) == 0xFF)
                        new String(b, 2, b.length - 2,
                          java.nio.charset.StandardCharsets.UTF_16BE)
                      else new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
                      emit(t)
                      suppressFrom = mcDepth
                  }
                }
              case "BMC" => mcDepth += 1
              case "EMC" =>
                if (suppressFrom == mcDepth) suppressFrom = -1
                if (mcDepth > 0) mcDepth -= 1
              // line breaks are part of the REPLACED rendering inside an
              // /ActualText span (the canonical use is hyphenation repair
              // across a T* — "rec-" T* "ognize" replaced by "recognize"),
              // so they are suppressed with the span's show-text
              case "T*" => if (!suppressed) newline()
              case "TD" => if (!suppressed) newline()
              case "Td" => operands.lastOption.collect {
                case PNum(ty) if ty != 0 && !suppressed => newline()
              }
              case "BI" =>
                // inline image: binary payload would derail the
                // tokenizer — skip to the whitespace-delimited EI
                var q = lx.pos
                var found = -1
                while (found < 0 && q + 1 < data.length) {
                  if (data(q) == 'E' && data(q + 1) == 'I' &&
                    (q == 0 || isWs(data(q - 1) & 0xFF)) &&
                    (q + 2 >= data.length || isWs(data(q + 2) & 0xFF))) found = q + 2
                  q += 1
                }
                lx.pos = if (found < 0) data.length else found
              case _ => // positioning/state/path operators: no text
            }
            operands.clear()
          case v => operands += v
        }
      }
    } catch { case _: Exception => /* malformed tail: keep what we have */ }
    sb.toString
  }

  // ---- Spark surface ----

  /** (id, n_pages, text) per decodable PDF — extraction is partition-
    * local (`mapPartitions`, document bytes never shuffle; only the text
    * column flows on, into the standard text-pipeline operators).
    * Undecodable rows yield nothing. Pages join with a single newline.
    */
  def pdfTextDF(df: DataFrame, idCol: String, binaryCol: String = "media"): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_pages", LongType),
      StructField("text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else extractText(bytes).iterator.map { d =>
          Row(r.get(idIdx), d.nPages.toLong, d.pages.mkString("\n"))
        }
      }
    }
  }
}
