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
      val d = PdfCodec.extractText(graft.SparkEntry.synthPdf(id))
        .getOrElse(fail(s"id=$id did not parse"))
      assert(d.nPages == (1 + id % 3).toInt)
      for (p <- 0 until d.nPages)
        assert(d.pages(p) == pageText(id, p), s"id=$id page $p")
    }
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
