package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction: fixture round-trip against the exact closed-form
  * page text, array-of-contents concatenation, trailer-less catalog
  * fallback, the TJ kern word-gap boundary, string-escape goldens and the
  * malformed-input contract.
  */
class PdfCodecSpec extends AnyFunSuite {

  private def pageText(id: Long, p: Int): String = {
    val a = ((id * 31 + p * 7) % 97).toInt
    val b = ((id * 13 + p * 11) % 89).toInt
    s"Doc $id page $p (ok) A\nw$a w$b! hx"
  }

  test("fixture round-trip: every page extracts to the exact closed-form text") {
    for (id <- Seq(0L, 1L, 2L, 7L)) {
      val bytes = graft.SparkEntry.synthPdf(id)
      val raw = new String(bytes, "ISO-8859-1")
      if (id % 2 == 1) {
        // odd ids: the document structure lives INSIDE a compressed
        // object stream — nothing page-like is visible at top level
        assert(raw.contains("/ObjStm") && !raw.contains("/Type /Page"),
          s"id=$id must carry its page dicts only inside the ObjStm")
      } else assert(!raw.contains("/ObjStm"))
      val d = PdfCodec.extractText(bytes)
        .getOrElse(fail(s"id=$id did not parse"))
      val nSimple = (1 + id % 3).toInt
      assert(d.nPages == nSimple + 3)
      for (p <- 0 until nSimple)
        assert(d.pages(p) == pageText(id, p), s"id=$id page $p")
      // the r16 CID-keyed page: 2-byte codes through the /ToUnicode CMap
      assert(d.pages(nSimple) == s"Cid $id zy!", s"id=$id CID page")
      // the r17 Differences/ActualText page: A→é, B→ł, C suppressed,
      // q→ł via uni0142; both ActualText spans replace their show-text
      // (incl. the −400 kern inside the second span, which must not
      // leak a space)
      assert(d.pages(nSimple + 1) == s"Diff éłł word gap here real ${id}é!",
        s"id=$id Differences page")
      // the r18 Identity-H page WITHOUT /ToUnicode: glyph ids invert
      // through the embedded FontFile2 'cmap' (format 4 even / format 12
      // + supplementary plane odd); the trailing unmapped gid 999 emits
      // nothing
      val emoji = if (id % 2 == 1) "🌍 " else ""
      assert(d.pages(nSimple + 2) == s"cid ${emoji}go $id!",
        s"id=$id FontFile2 page")
    }
  }

  test("fontFile2CMap: format 4 and 12 parse + inversion; malformed fonts -> None") {
    val f4 = PdfCodec.fontFile2CMap(graft.SparkEntry.synthTtf(2L)).get
    assert(f4.width == 2)
    assert(f4.map(30) == "a" && f4.map(55) == "z" && f4.map(3) == " " &&
      f4.map(4) == "!" && f4.map(10) == "0" && f4.map(19) == "9")
    assert(!f4.map.contains(60) && !f4.map.contains(0))
    val f12 = PdfCodec.fontFile2CMap(graft.SparkEntry.synthTtf(3L)).get
    assert(f12.map(30) == "a" && f12.map(60) == "🌍",
      "format 12 must map the supplementary-plane group")
    // malformed: truncation at every prefix must never throw
    val ttf = graft.SparkEntry.synthTtf(3L)
    for (n <- 0 until ttf.length)
      assert(PdfCodec.fontFile2CMap(ttf.take(n)).forall(_.map.nonEmpty))
    assert(PdfCodec.fontFile2CMap("garbage not a font".getBytes).isEmpty)
    assert(PdfCodec.fontFile2CMap(Array.emptyByteArray).isEmpty)
    // hostile walk bound: a format-4 font whose segments each span the
    // full BMP must stop at the mapped-chars cap instead of walking
    // 2048 x 65535 iterations; result stays bounded and fast
    val hostile = {
      val bos = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
      def w32(v: Long): Unit = { w16(((v >> 16) & 0xFFFF).toInt); w16((v & 0xFFFF).toInt) }
      w32(0x00010000L); w16(1); w16(16); w16(0); w16(0)
      bos.write("cmap".getBytes("US-ASCII")); w32(0L); w32(28L); w32(2048L)
      w16(0); w16(1); w16(3); w16(1); w32(12L)
      val segs = 64
      w16(4); w16(16 + 8 * segs); w16(0); w16(2 * segs); w16(0); w16(0); w16(0)
      (0 until segs).foreach(_ => w16(0xFFFE)) // endCode: full BMP each
      w16(0)
      (0 until segs).foreach(_ => w16(0x0001)) // startCode
      (0 until segs).foreach(_ => w16(1))      // idDelta
      (0 until segs).foreach(_ => w16(0))      // idRangeOffset
      bos.toByteArray
    }
    val t0 = System.nanoTime()
    val hm = PdfCodec.fontFile2CMap(hostile)
    assert((System.nanoTime() - t0) / 1e9 < 2.0, "hostile font must not spin")
    assert(hm.forall(_.map.size <= (1 << 17)))
    // the all-gid-0 evasion (review finding): idRangeOffset pointing past
    // the font makes every lookup return 0 — the bound must count VISITED
    // codes, or the walk spins with nothing ever stored
    val hostile0 = hostile.clone()
    val roAt = 28 + 12 + 14 + 2 * 64 + 2 + 2 * 64 + 2 * 64
    for (s <- 0 until 64) { // idRangeOffset = 0x7FFE (far past the end)
      hostile0(roAt + 2 * s) = 0x7F.toByte
      hostile0(roAt + 2 * s + 1) = 0xFE.toByte
    }
    val t1 = System.nanoTime()
    val hm0 = PdfCodec.fontFile2CMap(hostile0)
    assert((System.nanoTime() - t1) / 1e9 < 2.0, "gid-0 hostile font must not spin")
    assert(hm0.isEmpty, "nothing mappable -> None")
  }

  test("ToUnicode CMaps: bfchar, incrementing bfrange, array bfrange, widths") {
    def cmap(s: String) = PdfCodec.parseToUnicode(s.getBytes("ISO-8859-1"))
    val two = cmap(
      "1 begincodespacerange <0000> <ffff> endcodespacerange " +
      "1 beginbfchar <0041> <0058> endbfchar " +
      "1 beginbfrange <0100> <0102> <0061> endbfrange " +
      "1 beginbfrange <0200> <0201> [<0077006F> <0057> ] endbfrange")
      .getOrElse(fail("two-byte cmap did not parse"))
    assert(two.width == 2)
    assert(two.map(0x41) == "X")
    assert(two.map(0x100) == "a" && two.map(0x101) == "b" && two.map(0x102) == "c")
    assert(two.map(0x200) == "wo", "multi-unit array destination")
    assert(two.map(0x201) == "W")
    val one = cmap(
      "1 begincodespacerange <00> <ff> endcodespacerange " +
      "1 beginbfchar <61> <03B1> endbfchar")
      .getOrElse(fail("one-byte cmap did not parse"))
    assert(one.width == 1 && one.map(0x61) == "α")
    assert(cmap("no mappings here").isEmpty, "empty CMap keeps the byte path")
    // unmapped wide codes emit nothing; Tf switches the active font
    val fonts = Map("F1" -> two)
    val t = PdfCodec.extractTextOps(
      "BT /F1 10 Tf <00410100FFFF0200> Tj ET".getBytes("ISO-8859-1"),
      1 << 20, fonts)
    assert(t == "Xawo", "mapped codes decode, the unmapped FFFF is dropped")
    // without Tf the byte path is unchanged
    assert(PdfCodec.extractTextOps("BT (plain) Tj ET".getBytes("ISO-8859-1"),
      1 << 20, fonts) == "plain")
  }

  test("glyph names: AGL subset, algorithmic uniXXXX/uXXXXXX, unknowns → None") {
    assert(PdfCodec.glyphToUnicode("a").contains("a"))
    assert(PdfCodec.glyphToUnicode("Q").contains("Q"))
    assert(PdfCodec.glyphToUnicode("seven").contains("7"))
    assert(PdfCodec.glyphToUnicode("space").contains(" "))
    assert(PdfCodec.glyphToUnicode("eacute").contains("é"))
    assert(PdfCodec.glyphToUnicode("germandbls").contains("ß"))
    assert(PdfCodec.glyphToUnicode("emdash").contains("—"))
    assert(PdfCodec.glyphToUnicode("uni0142").contains("ł"))
    assert(PdfCodec.glyphToUnicode("uni00480069").contains("Hi"),
      "multi-group uniXXXXYYYY concatenates UTF-16 units")
    assert(PdfCodec.glyphToUnicode("u1F600").contains(
      new String(Character.toChars(0x1F600))), "uXXXXX takes 4-6 hex digits")
    assert(PdfCodec.glyphToUnicode("uni014").isEmpty, "wrong digit count")
    // AGL excludes surrogates from both algorithmic forms: a lone
    // D800-DFFF would make the page text invalid UTF-16
    assert(PdfCodec.glyphToUnicode("uniD800").isEmpty, "surrogate uni form")
    assert(PdfCodec.glyphToUnicode("uni0041DFFF").isEmpty, "surrogate in a group")
    assert(PdfCodec.glyphToUnicode("uD9FF").isEmpty, "surrogate u form")
    assert(PdfCodec.glyphToUnicode("g123").isEmpty)
    assert(PdfCodec.glyphToUnicode("xqzzyglyph").isEmpty)
  }

  test("/Differences array: code counter, remap, unknown-name suppression") {
    import PdfCodec.{PNum, PName}
    val cm = PdfCodec.differencesCMap(Vector(
      PNum(65), PName("eacute"), PName("lslash"), PName("nosuchglyph"),
      PNum(113), PName("uni0142"))).getOrElse(fail("no cmap"))
    assert(cm.width == 1)
    assert(cm.map(65) == "é" && cm.map(66) == "ł", "names consume consecutive codes")
    assert(cm.map(67) == "", "unresolvable glyph name suppresses, never the raw byte")
    assert(cm.map(113) == "ł", "an integer resets the code counter")
    assert(!cm.map.contains(68) && !cm.map.contains(97),
      "untouched codes stay OUT of the map (latin-1 path)")
    assert(PdfCodec.differencesCMap(Vector(PName("a"))).isEmpty,
      "a name before any code integer is ignored")
    // end-to-end through the operator walk: remapped, suppressed and
    // untouched codes in one show string
    val t = PdfCodec.extractTextOps(
      "BT /F2 9 Tf (xAC!) Tj ET".getBytes("ISO-8859-1"),
      1 << 20, Map("F2" -> cm))
    assert(t == "xé!", "x,! latin-1; A→é; C suppressed")
  }

  test("/ActualText spans: replacement emitted, show-text and kerns suppressed, nesting") {
    def ops(s: String, fonts: Map[String, PdfCodec.UniCMap] = Map.empty) =
      PdfCodec.extractTextOps(s.getBytes("ISO-8859-1"), 1 << 20, fonts)
    // PDFDocEncoding (≈ latin-1) literal replacement
    assert(ops("BT (a ) Tj /Span << /ActualText (REAL) >> BDC (fake) Tj EMC ( b) Tj ET")
      == "a REAL b")
    // UTF-16BE with BOM
    assert(ops("BT /Span << /ActualText <FEFF00E9> >> BDC (x) Tj EMC ET") == "é")
    // TJ kerns inside the span must not leak a word gap
    assert(ops("BT /Span << /ActualText (R) >> BDC [(zz) -400 (z)] TJ EMC (!) Tj ET")
      == "R!")
    // nested marked content inside a suppressed span stays suppressed,
    // incl. an inner ActualText (the OUTER replacement wins)
    assert(ops("BT /Span << /ActualText (O) >> BDC (x) Tj " +
      "/Span << /ActualText (inner) >> BDC (y) Tj EMC (z) Tj EMC (k) Tj ET")
      == "Ok")
    // BMC/EMC without ActualText: pass-through; unbalanced EMC harmless
    assert(ops("BT /Tag BMC (kept) Tj EMC EMC (on) Tj ET") == "kepton")
    // BDC with a name operand (named /Properties resource): pass-through
    assert(ops("BT /Span /MC0 BDC (kept) Tj EMC ET") == "kept")
    // line breaks INSIDE a suppressed span are part of the replaced
    // rendering — the canonical /ActualText use is hyphenation repair
    // across a T*; the break must not leak into the output
    assert(ops("BT (a ) Tj /Span << /ActualText (recognize) >> BDC " +
      "(rec-) Tj T* (ognize) Tj EMC ( more) Tj ET") == "a recognize more")
    assert(ops("BT /Span << /ActualText (X) >> BDC (p) ' (q) \" EMC (y) Tj ET")
      == "Xy", "'/\" breaks suppressed too")
    // ...and breaks OUTSIDE spans still work
    assert(ops("BT (l1) Tj T* (l2) Tj ET") == "l1\nl2")
  }

  test("an ObjStm copy rescues an object whose top-level copy is corrupt") {
    // object 7 (the catalog) is CORRUPT at top level; its good copy
    // lives in object stream 8, which the pre-pass reads AFTER 7 — a
    // PNull fallback memoized during the pre-pass would pin the
    // corruption forever (r15 advice)
    val inner = Seq(
      7 -> "<< /Type /Catalog /Pages 2 0 R >> ",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >> ",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >> ")
    val offs = inner.scanLeft(0)((a, nb) => a + nb._2.length).init
    val header = inner.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + " "
    val payload = (header + inner.map(_._2).mkString).getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater(); d.setInput(payload); d.finish()
    val zbuf = new Array[Byte](8192); val zn = d.deflate(zbuf); d.end()
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("7 0 obj\n<< 3 >>\nendobj\n") // non-name dict key: parse throws
    w("4 0 obj\n<< /Length 14 >>\nstream\nBT (ok!) Tj ET\nendstream\nendobj\n")
    w(s"8 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length $zn /Filter /FlateDecode >>\nstream\n")
    bos.write(zbuf, 0, zn)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 7 0 R >>\n%%EOF\n")
    val doc = PdfCodec.extractText(bos.toByteArray).getOrElse(fail("did not parse"))
    assert(doc.nPages == 1 && doc.pages(0) == "ok!")
  }

  test("a /Title literal containing 'stream' must not shift the data window") {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      4 -> "<< /Title (my stream notes) /Length 15 >>\nstream\nBT (real) Tj ET\nendstream")
    val d = PdfCodec.extractText(pdf(objs)).getOrElse(fail("did not parse"))
    assert(d.pages(0) == "real",
      "the keyword search must start AFTER the parsed dict")
  }

  // a minimal hand-built PDF around the given body objects
  private def pdf(objects: Seq[(Int, String)], root: Int = 1,
                  withTrailer: Boolean = true): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    for ((n, body) <- objects) w(s"$n 0 obj\n$body\nendobj\n")
    if (withTrailer) w(s"trailer\n<< /Root $root 0 R >>\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("array /Contents concatenates streams in order; trailer-less PDFs fall back to catalog scan") {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
      4 -> "<< /Length 16 >>\nstream\nBT (first) Tj ET\nendstream",
      5 -> "<< /Length 18 >>\nstream\nBT ( second) Tj ET\nendstream")
    val withT = PdfCodec.extractText(pdf(objs)).getOrElse(fail("did not parse"))
    assert(withT.nPages == 1 && withT.pages(0) == "first second")
    val noT = PdfCodec.extractText(pdf(objs, withTrailer = false))
      .getOrElse(fail("trailer-less did not parse"))
    assert(noT.pages(0) == "first second",
      "catalog-scan fallback must find the same page")
  }

  test("TJ kern boundary: −180 is a word gap, −179 is not; duplicates collapse") {
    def t(ops: String): String =
      PdfCodec.extractTextOps(ops.getBytes("ISO-8859-1"), 1 << 20)
    assert(t("BT [(a) -180 (b)] TJ ET") == "a b")
    assert(t("BT [(a) -179 (b)] TJ ET") == "ab")
    assert(t("BT [(a) -500 -500 (b)] TJ ET") == "a b", "no double space")
    assert(t("BT (x) Tj T* T* (y) Tj ET") == "x\ny", "no double newline")
    assert(t("BT 0 -14 Td (u) Tj 5 0 Td (v) Tj ET") == "uv",
      "leading break suppressed; horizontal Td is not a break")
  }

  test("string escapes: octal, specials, continuations, hex with odd digits") {
    def t(ops: String): String =
      PdfCodec.extractTextOps(ops.getBytes("ISO-8859-1"), 1 << 20)
    assert(t("BT (\\101\\102\\103) Tj ET") == "ABC")
    assert(t("BT (a\\(b\\)c\\\\d) Tj ET") == "a(b)c\\d")
    assert(t("BT (one\\\ntwo) Tj ET") == "onetwo", "backslash-newline continuation")
    assert(t("BT <4 14 24 34> Tj ET") == "ABC@",
      "hex skips whitespace; the odd trailing digit pads with 0 (4 → 0x40)")
    assert(t("BT (tab\tx) Tj ET") == "tab x", "tab renders as space")
    // inline images: the binary payload between BI and EI must not
    // derail the tokenizer (it contains unbalanced delimiters)
    assert(t("BT (a) Tj BI /W 2 /H 1 ID \u0000(\u00ff<< EI (b) Tj ET") == "ab")
  }

  test("unsupported filters skip the stream; broken /Length falls back to endstream") {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
      5 -> "<< /Length 12 /Filter /LZWDecode >>\nstream\nBT (no) Tj ET\nendstream",
      6 -> "<< /Length 999999 >>\nstream\nBT (yes) Tj ET\nendstream")
    val d = PdfCodec.extractText(pdf(objs)).getOrElse(fail("did not parse"))
    assert(d.nPages == 2)
    assert(d.pages(0) == "", "unsupported filter yields no text, not a failure")
    assert(d.pages(1) == "yes", "oversized declared Length reads to endstream")
  }

  test("malformed input contract: garbage, truncation, non-PDF — never a throw") {
    assert(PdfCodec.extractText(null).isEmpty)
    assert(PdfCodec.extractText(Array.emptyByteArray).isEmpty)
    assert(PdfCodec.extractText("not a pdf at all".getBytes).isEmpty)
    val rnd = new scala.util.Random(7)
    assert(PdfCodec.extractText(Array.fill(4096)(rnd.nextInt().toByte)).isEmpty)
    val full = graft.SparkEntry.synthPdf(2L) // 3 pages
    // truncating keeps whatever structure still parses — and never throws
    for (frac <- Seq(0.2, 0.5, 0.8)) {
      val cut = full.take((full.length * frac).toInt)
      PdfCodec.extractText(cut) // must not throw
    }
    // a hostile Length on a FLATE stream must not over-allocate
    val bomb = pdf(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      4 -> "<< /Length 2000000000 /Filter /FlateDecode >>\nstream\nxx\nendstream"))
    val r = PdfCodec.extractText(bomb)
    assert(r.forall(_.pages.forall(_.isEmpty)))
  }
}
