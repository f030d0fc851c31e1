package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ZIP container reading + DOCX extraction: fixture round-trip, trailing
  * junk tolerance, both compression methods, entity decoding, break/tab
  * semantics and the malformed-input contract.
  */
class ZipDocxSpec extends AnyFunSuite {

  private def expected(id: Long): Seq[String] = {
    val nPars = (2 + id % 3).toInt
    (0 until nPars).map { p =>
      if (p == 0) s"Head $id tail <x>"
      else s"Paragraph $p of doc $id & w${(id * 17 + p * 5) % 61}"
    }
  }

  test("fixture round-trip: paragraphs, entities, tab join") {
    for (id <- Seq(0L, 1L, 2L, 9L)) {
      val d = DocxCodec.extractText(graft.SparkEntry.synthDocx(id))
        .getOrElse(fail(s"id=$id did not parse"))
      assert(d.nParagraphs == (2 + id % 3).toInt)
      assert(d.text == expected(id).mkString("\n"), s"id=$id")
    }
  }

  test("zip mechanics: stored + deflate entries, missing names, trailing junk") {
    val z = DocxCodec.writeZip(Seq(
      ("a.txt", "stored payload".getBytes, false),
      ("b/c.txt", ("deflate me " * 50).getBytes, true)))
    assert(ZipCodec.entries(z).get.map(_.name) == Seq("a.txt", "b/c.txt"))
    assert(new String(ZipCodec.readEntry(z, "a.txt").get) == "stored payload")
    assert(new String(ZipCodec.readEntry(z, "b/c.txt").get) == "deflate me " * 50)
    assert(ZipCodec.readEntry(z, "nope.txt").isEmpty)
    // trailing junk after EOCD (zip comments / appended bytes) tolerated
    val junk = z ++ Array.fill(100)(0x5A.toByte)
    assert(new String(ZipCodec.readEntry(junk, "a.txt").get) == "stored payload")
  }

  test("WordprocessingML pass: numeric entities, w:br, trailing break trim") {
    val (n, t) = DocxCodec.extractXml(
      "<w:body><w:p><w:r><w:t>&#65;&#x42;c</w:t><w:br/><w:t>d</w:t></w:r></w:p>" +
        "<w:p><w:r><w:t>last</w:t></w:r></w:p></w:body>")
    assert(n == 2)
    assert(t == "ABc\nd\nlast")
    assert(DocxCodec.decodeEntities("a&amp;b&lt;c&gt;d&quot;e&apos;f&bogus;g") ==
      "a&b<c>d\"e'f&bogus;g")
  }

  test("EPUB: chapters extract through the crawl HTML passes, container order") {
    for (id <- Seq(0L, 1L, 2L, 5L)) {
      val d = EpubCodec.extractText(graft.SparkEntry.synthEpub(id))
        .getOrElse(fail(s"id=$id did not parse"))
      val nCh = (1 + id % 3).toInt
      assert(d.nChapters == nCh)
      val want = (0 until nCh).map { k =>
        s"Chapter $k of $id\nBody text ${(id * 7 + k * 3) % 53} & more."
      }.mkString("\n")
      assert(d.text == want, s"id=$id")
    }
    // a plain zip without EPUB markers is not an EPUB
    val notEpub = DocxCodec.writeZip(Seq(("a.xhtml", "<p>x</p>".getBytes, false)))
    assert(EpubCodec.extractText(notEpub).isEmpty)
    // the string-side HTML passes are the SAME tables the crawl uses
    assert(EpubCodec.extractHtmlString(
      "<html><head><title>T</title></head><body><p>a &amp; b</p></body></html>") == "a & b")
    assert(EpubCodec.extractText(null).isEmpty)
    assert(EpubCodec.extractText("junk".getBytes).isEmpty)
  }

  test("an understated central-directory size is a loud None, not truncation") {
    // the CD claims HALF the real uncompressed size: without the
    // finished() probe the entry would come back silently truncated
    // (r15 advice)
    val data = ("payload " * 40).getBytes
    val z = DocxCodec.writeZip(Seq(("d.txt", data, true)))
    var i = z.length - 22
    while (!(z(i) == 'P' && z(i + 1) == 'K' && z(i + 2) == 5 && z(i + 3) == 6)) i -= 1
    val cd = (z(i + 16) & 0xFF) | ((z(i + 17) & 0xFF) << 8) |
      ((z(i + 18) & 0xFF) << 16) | ((z(i + 19) & 0xFF) << 24)
    val lying = z.clone()
    val small = data.length / 2
    lying(cd + 24) = (small & 0xFF).toByte
    lying(cd + 25) = ((small >> 8) & 0xFF).toByte
    lying(cd + 26) = 0; lying(cd + 27) = 0
    assert(ZipCodec.readEntry(z, "d.txt").exists(_.sameElements(data)))
    assert(ZipCodec.readEntry(lying, "d.txt").isEmpty,
      "an inflate that continues past the declared size must be rejected")
  }

  test("malformed input contract: garbage, truncation, lying sizes — never a throw") {
    assert(DocxCodec.extractText(null).isEmpty)
    assert(DocxCodec.extractText(Array.emptyByteArray).isEmpty)
    assert(DocxCodec.extractText("PKPKPK not a zip".getBytes).isEmpty)
    val rnd = new scala.util.Random(13)
    assert(DocxCodec.extractText(Array.fill(4096)(rnd.nextInt().toByte)).isEmpty)
    val full = graft.SparkEntry.synthDocx(1L)
    for (frac <- Seq(0.3, 0.6, 0.9))
      DocxCodec.extractText(full.take((full.length * frac).toInt)) // no throw
    // a central-directory size bomb must not allocate: patch the
    // uncompressed size field of word/document.xml's central entry
    val bomb = full.clone()
    val cd = {
      var i = bomb.length - 22
      while (!(bomb(i) == 'P' && bomb(i + 1) == 'K' && bomb(i + 2) == 5 && bomb(i + 3) == 6)) i -= 1
      ((bomb(i + 16) & 0xFF) | ((bomb(i + 17) & 0xFF) << 8) |
        ((bomb(i + 18) & 0xFF) << 16) | ((bomb(i + 19) & 0xFF) << 24))
    }
    // second central entry: skip the first ([Content_Types].xml)
    val firstNameLen = (bomb(cd + 28) & 0xFF) | ((bomb(cd + 29) & 0xFF) << 8)
    val second = cd + 46 + firstNameLen
    // uncompressed size at +24: write 0x7FFFFFFF
    bomb(second + 24) = 0xFF.toByte; bomb(second + 25) = 0xFF.toByte
    bomb(second + 26) = 0xFF.toByte; bomb(second + 27) = 0x7F.toByte
    assert(DocxCodec.extractText(bomb).isEmpty, "size bomb must be rejected")
  }
}
