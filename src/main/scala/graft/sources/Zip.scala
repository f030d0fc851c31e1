package graft.sources

import java.util.zip.Inflater

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** ZIP container reading + DOCX text extraction — the second document
  * format a crawl corpus carries in volume (reports, theses, government
  * documents arrive as .docx). Same dependency posture as [[PdfCodec]]:
  * the JDK `Inflater` for raw-deflate entries, everything else from
  * scratch per the PKWARE APPNOTE layout.
  *
  * [[ZipCodec]]: End-Of-Central-Directory scan from the tail (comment
  * tolerated), central-directory walk (names, method, sizes, local
  * header offsets), entry reads through the LOCAL header (its own
  * name/extra lengths — they legitimately differ from the central
  * copy), stored (0) and deflate (8) methods, allocation capped.
  *
  * [[DocxCodec]]: `word/document.xml` → text by a sequential
  * WordprocessingML pass — `<w:t>` runs (XML entities decoded incl.
  * numeric), `</w:p>` and `<w:br/>` as line breaks, `<w:tab/>` as a
  * space; no DOM, single pass, output bounded.
  *
  * Garbage-in contract (family-wide): malformed/hostile input yields
  * `None`, never a throw, never an unbounded allocation.
  */
object ZipCodec {

  final case class Entry(name: String, method: Int, compressedSize: Long,
                         uncompressedSize: Long, localOffset: Long)

  private val MaxEntryBytes = 64L << 20
  private val MaxEntries = 65536

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong) | (u16(b, i + 2).toLong << 16)

  /** Central-directory entry list via the EOCD record. None when the
    * bytes are not a readable zip.
    */
  def entries(bytes: Array[Byte]): Option[Seq[Entry]] = {
    try {
      if (bytes == null || bytes.length < 22) return None
      // EOCD: PK\5\6, scan backwards over up to 64K of trailing comment
      var e = bytes.length - 22
      val stop = math.max(0, bytes.length - 22 - 65535)
      while (e >= stop && !(bytes(e) == 'P' && bytes(e + 1) == 'K' &&
        bytes(e + 2) == 5 && bytes(e + 3) == 6)) e -= 1
      if (e < stop) return None
      val count = u16(bytes, e + 10)
      val cdOff = u32(bytes, e + 16)
      if (count > MaxEntries || cdOff >= bytes.length) return None
      val out = Vector.newBuilder[Entry]
      var p = cdOff.toInt
      var i = 0
      while (i < count) {
        if (p + 46 > bytes.length ||
          !(bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 1 && bytes(p + 3) == 2))
          return Some(out.result()) // truncated central dir: keep what parsed
        val method = u16(bytes, p + 10)
        val csize = u32(bytes, p + 20)
        val usize = u32(bytes, p + 24)
        val nameLen = u16(bytes, p + 28)
        val extraLen = u16(bytes, p + 30)
        val commentLen = u16(bytes, p + 32)
        val lho = u32(bytes, p + 42)
        if (p + 46 + nameLen > bytes.length) return Some(out.result())
        val name = new String(bytes, p + 46, nameLen, "UTF-8")
        out += Entry(name, method, csize, usize, lho)
        p += 46 + nameLen + extraLen + commentLen
        i += 1
      }
      Some(out.result())
    } catch { case _: Throwable => None }
  }

  /** The decompressed bytes of `name` (exact match). Reads through the
    * LOCAL header at the entry's offset; stored and deflate methods.
    */
  def readEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    entries(bytes).flatMap(_.find(_.name == name)).flatMap { ent =>
      try {
        val p = ent.localOffset.toInt
        if (p < 0 || p + 30 > bytes.length ||
          !(bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 3 && bytes(p + 3) == 4))
          return None
        val nameLen = u16(bytes, p + 26)
        val extraLen = u16(bytes, p + 28)
        val dataStart = p + 30 + nameLen + extraLen
        if (ent.compressedSize > MaxEntryBytes || ent.uncompressedSize > MaxEntryBytes)
          return None
        val dataEnd = dataStart + ent.compressedSize.toInt
        if (dataStart > bytes.length || dataEnd > bytes.length || dataEnd < dataStart)
          return None
        val comp = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        ent.method match {
          case 0 => Some(comp) // stored
          case 8 =>
            val inf = new Inflater(true) // raw deflate
            inf.setInput(comp)
            val out = new Array[Byte](ent.uncompressedSize.toInt)
            var got = 0
            try {
              while (got < out.length && !inf.finished()) {
                val n = inf.inflate(out, got, out.length - got)
                if (n == 0 && !inf.finished()) return None
                got += n
              }
              // a central directory UNDERSTATING the real size would
              // otherwise yield a silently truncated entry: after the
              // buffer fills the inflater must agree the stream is done
              // (r15 advice) — probe with a 1-byte sink to settle it
              if (got == out.length && !inf.finished()) {
                val probe = new Array[Byte](1)
                if (inf.inflate(probe) > 0 || !inf.finished()) return None
              }
              if (got < out.length) None else Some(out)
            } finally inf.end()
          case _ => None // unsupported method
        }
      } catch { case _: Throwable => None }
    }
}

/** DOCX (Office Open XML wordprocessing) text extraction over
  * [[ZipCodec]] — see the container scaladoc for scope.
  */
object DocxCodec {

  final case class DocxDoc(nParagraphs: Int, text: String)

  private val MaxTextChars = 16 << 20

  /** Decode the XML character entities WordprocessingML uses. */
  private[sources] def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val ent = s.substring(i + 1, semi)
          val decoded: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(ent.substring(2), 16))))
              catch { case _: Exception => None }
            case _ if ent.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(ent.substring(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Sequential WordprocessingML pass: `<w:t>` text runs, `</w:p>` /
    * `<w:br/>` breaks, `<w:tab/>` spaces. Returns (paragraph count,
    * newline-joined text).
    */
  private[sources] def extractXml(xml: String): (Int, String) = {
    val sb = new StringBuilder
    var nPars = 0
    def breakLine(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    var i = 0
    while (i < xml.length && sb.length < MaxTextChars) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) i = xml.length
      else {
        val gt = xml.indexOf('>', lt + 1)
        if (gt < 0) i = xml.length
        else {
          val tag = xml.substring(lt + 1, gt)
          if (tag == "w:t" || tag.startsWith("w:t ")) {
            val close = xml.indexOf("</w:t>", gt + 1)
            if (close >= 0) {
              sb.append(decodeEntities(xml.substring(gt + 1, close)))
              i = close + 6
            } else i = gt + 1
          } else if (tag == "/w:p") {
            nPars += 1
            breakLine()
            i = gt + 1
          } else if (tag.startsWith("w:br") || tag.startsWith("w:cr")) {
            breakLine()
            i = gt + 1
          } else if (tag.startsWith("w:tab")) {
            if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
            i = gt + 1
          } else i = gt + 1
        }
      }
    }
    // trim the trailing paragraph break for a clean join
    while (sb.nonEmpty && sb.charAt(sb.length - 1) == '\n') sb.setLength(sb.length - 1)
    (nPars, sb.toString)
  }

  /** Extract the text of a DOCX file. None when the container or its
    * `word/document.xml` is unreadable.
    */
  def extractText(bytes: Array[Byte]): Option[DocxDoc] = {
    try {
      ZipCodec.readEntry(bytes, "word/document.xml").map { xml =>
        val (n, t) = extractXml(new String(xml, "UTF-8"))
        DocxDoc(n, t)
      }
    } catch { case _: Throwable => None }
  }

  /** (id, n_paragraphs, text) per decodable DOCX — partition-local, the
    * [[PdfCodec.pdfTextDF]] shape for the text pipeline.
    */
  def docxTextDF(df: DataFrame, idCol: String, binaryCol: String = "media"): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_paragraphs", LongType),
      StructField("text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else extractText(bytes).iterator.map { d =>
          Row(r.get(idIdx), d.nParagraphs.toLong, d.text)
        }
      }
    }
  }

  // ---- writer (deterministic fixtures + re-archiving) ----
  // (shared by the DOCX and EPUB fixtures — see writeZip below)

  /** A minimal valid ZIP from (name, bytes, deflate?) triples — correct
    * CRCs, local + central headers, EOCD.
    */
  def writeZip(files: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit = {
      bos.write((v & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
      bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 24) & 0xFF).toInt)
    }
    final case class Written(name: String, method: Int, crc: Long,
                             csize: Int, usize: Int, offset: Int)
    val written = files.map { case (name, data, deflate) =>
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val payload =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
          out.toByteArray
        }
      val offset = bos.size()
      val nameB = name.getBytes("UTF-8")
      bos.write('P'); bos.write('K'); bos.write(3); bos.write(4)
      le16(20); le16(0); le16(if (deflate) 8 else 0)
      le16(0); le16(0) // time, date
      le32(crc.getValue); le32(payload.length); le32(data.length)
      le16(nameB.length); le16(0)
      bos.write(nameB); bos.write(payload)
      Written(name, if (deflate) 8 else 0, crc.getValue, payload.length, data.length, offset)
    }
    val cdStart = bos.size()
    written.foreach { wr =>
      val nameB = wr.name.getBytes("UTF-8")
      bos.write('P'); bos.write('K'); bos.write(1); bos.write(2)
      le16(20); le16(20); le16(0); le16(wr.method)
      le16(0); le16(0)
      le32(wr.crc); le32(wr.csize); le32(wr.usize)
      le16(nameB.length); le16(0); le16(0)
      le16(0); le16(0); le32(0)
      le32(wr.offset)
      bos.write(nameB)
    }
    val cdSize = bos.size() - cdStart
    bos.write('P'); bos.write('K'); bos.write(5); bos.write(6)
    le16(0); le16(0); le16(written.length); le16(written.length)
    le32(cdSize); le32(cdStart); le16(0)
    bos.toByteArray
  }
}

/** EPUB text extraction — the third ZIP-borne document format: an EPUB
  * is a [[ZipCodec]] container (a `mimetype` entry and/or
  * `META-INF/container.xml`) of XHTML chapter files. Chapters extract
  * through EXACTLY the same strip/entity/space passes as the crawl's
  * HTML route ([[graft.ops.Html]] publishes them as data, applied here
  * string-side), in container order — OPF spine reordering is a stated
  * descope (practically the two orders agree).
  */
object EpubCodec {

  final case class EpubDoc(nChapters: Int, text: String)

  /** String-side twin of [[graft.ops.Html.extractColumn]] — the same
    * pass tables, so EPUB chapters and crawled HTML extract identically.
    */
  private[sources] def extractHtmlString(html: String): String = {
    var s = html
    graft.ops.Html.StripPasses.foreach { case (pat, repl) => s = s.replaceAll(pat, repl) }
    graft.ops.Html.EntityPasses.foreach { case (from, to) => s = s.replace(from, to) }
    graft.ops.Html.SpacePasses.foreach { case (pat, repl) => s = s.replaceAll(pat, repl) }
    s
  }

  /** Extract chapter texts (newline-joined, container order). None when
    * the bytes are not an EPUB-shaped zip with at least one chapter.
    */
  def extractText(bytes: Array[Byte]): Option[EpubDoc] = {
    try {
      ZipCodec.entries(bytes).flatMap { ents =>
        val isEpub = ents.exists(_.name == "mimetype") ||
          ents.exists(_.name == "META-INF/container.xml")
        val chapters = ents.filter { e =>
          val n = e.name.toLowerCase
          (n.endsWith(".xhtml") || n.endsWith(".html") || n.endsWith(".htm")) &&
            !n.startsWith("meta-inf/")
        }
        if (!isEpub || chapters.isEmpty) None
        else {
          val texts = chapters.flatMap(e => ZipCodec.readEntry(bytes, e.name))
            .map(b => extractHtmlString(new String(b, "UTF-8")))
          if (texts.isEmpty) None
          else Some(EpubDoc(texts.length, texts.mkString("\n")))
        }
      }
    } catch { case _: Throwable => None }
  }

  /** (id, n_chapters, text) per decodable EPUB — the
    * [[DocxCodec.docxTextDF]] shape.
    */
  def epubTextDF(df: DataFrame, idCol: String, binaryCol: String = "media"): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_chapters", LongType),
      StructField("text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else extractText(bytes).iterator.map { d =>
          Row(r.get(idIdx), d.nChapters.toLong, d.text)
        }
      }
    }
  }
}
