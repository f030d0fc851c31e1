package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import WarcCodec.{WarcRecord, parseBytes, writeRecord, writeWarcGz,
  writeWarcZst, zstdMember, zstdSkippableFrame, gzipMember}

class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rec(i: Int, typ: String = "response",
                  body: String = ""): WarcRecord = {
    val content =
      if (typ == "response")
        (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>doc $i</p>$body").getBytes(UTF_8)
      else s"payload $i $body".getBytes(UTF_8)
    WarcRecord(typ, s"http://e.x/$i", "2024-01-01T00:00:00Z", s"<urn:uuid:$i>",
      if (typ == "response") "application/http; msgtype=response" else "text/plain",
      content)
  }

  test("plain round-trip: write N records, parse back exactly") {
    val recs = Seq(rec(1), rec(2, "request"), rec(3, "warcinfo"), rec(4))
    val raw = recs.flatMap(r => writeRecord(r).toSeq).toArray
    val back = parseBytes(raw).toSeq
    assert(back.map(_.targetUri) == recs.map(_.targetUri))
    assert(back.map(_.warcType) == recs.map(_.warcType))
    assert(back.zip(recs).forall { case (a, b) => a.content.sameElements(b.content) })
  }

  test("gzip multi-member round-trip (the Common Crawl layout)") {
    val recs = (1 to 20).map(i => rec(i, body = "x" * (i * 37)))
    val back = parseBytes(writeWarcGz(recs)).toSeq
    assert(back.size == 20)
    assert(back.zip(recs).forall { case (a, b) => a.content.sameElements(b.content) })
  }

  test("zstd multi-frame round-trip incl. the skippable dictionary-slot frame (r18)") {
    val recs = (1 to 15).map(i => rec(i, body = "z" * (i * 53)))
    // with and without the leading skippable frame
    for (skip <- Seq(true, false)) {
      val back = parseBytes(writeWarcZst(recs, skippable = skip)).toSeq
      assert(back.size == 15, s"skippable=$skip")
      assert(back.zip(recs).forall { case (a, b) => a.content.sameElements(b.content) })
    }
    // magic sniff: compressed frame, skippable-first, gzip, plain
    assert(WarcCodec.looksZstd(zstdMember(Array[Byte](1, 2, 3))))
    assert(WarcCodec.looksZstd(zstdSkippableFrame(Array[Byte](9))))
    assert(!WarcCodec.looksZstd(gzipMember(Array[Byte](1))))
    assert(!WarcCodec.looksZstd("WARC/1.0\r\n".getBytes))
    // corrupt zstd ends cleanly like gzip
    val z = writeWarcZst(Seq(rec(1), rec(2)))
    val flipped = z.clone(); flipped(z.length / 2) = (flipped(z.length / 2) ^ 0x55).toByte
    parseBytes(flipped).size // must not throw
    // truncation sweep never throws
    (0 until z.length by 11).foreach { cut =>
      parseBytes(java.util.Arrays.copyOf(z, cut)).size
    }
  }

  test("truncation at every byte boundary never throws, yields only complete records") {
    val full = (1 to 3).flatMap(r => writeRecord(rec(r)).toSeq).toArray
    (0 until full.length by 7).foreach { cut =>
      val n = parseBytes(java.util.Arrays.copyOf(full, cut)).size
      assert(n <= 3)
    }
    // cutting inside record 3's payload keeps records 1-2
    val r12 = writeRecord(rec(1)).length + writeRecord(rec(2)).length
    assert(parseBytes(java.util.Arrays.copyOf(full, r12 + 30)).size == 2)
  }

  test("corrupt gzip data ends cleanly; random garbage yields zero records") {
    val gz = writeWarcGz(Seq(rec(1), rec(2)))
    val flipped = gz.clone(); flipped(gz.length / 2) = (flipped(gz.length / 2) ^ 0x55).toByte
    parseBytes(flipped).size // must not throw (count is whatever survived)
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(2048))(rnd.nextInt().toByte)
      parseBytes(junk).size // never throws
    }
    assert(parseBytes(Array.emptyByteArray).isEmpty)
    assert(parseBytes(null).isEmpty)
  }

  test("resync: a malformed record between two valid ones is skipped, not fatal") {
    val good1 = writeRecord(rec(1))
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nno content length here\r\n\r\n".getBytes(UTF_8)
    val good2 = writeRecord(rec(2))
    val back = parseBytes(good1 ++ bad ++ good2).toSeq
    assert(back.map(_.targetUri) == Seq("http://e.x/1", "http://e.x/2"))
  }

  test("declared Content-Length above maxRecordBytes is skipped without allocation") {
    val big = rec(1, body = "y" * 5000)
    val small = rec(2)
    val raw = writeRecord(big) ++ writeRecord(small)
    val back = parseBytes(raw, maxRecordBytes = 1024).toSeq
    assert(back.map(_.targetUri) == Seq("http://e.x/2"))
    // a crafted header declaring 100 GB must parse (skip to EOF) instantly
    val crafted = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 107374182400\r\n\r\n").getBytes(UTF_8) ++ writeRecord(small)
    assert(parseBytes(crafted).isEmpty) // skip hits EOF: no surviving record
  }

  test("http split: status + content-type parse; garbage yields None") {
    val h = WarcCodec.parseHttp(
      "HTTP/1.1 404 Not Found\r\ncontent-TYPE:  text/plain \r\nX: y\r\n\r\nbody!".getBytes(UTF_8))
    assert(h.exists(r => r.status == 404 && r.contentType == "text/plain" &&
      new String(r.body, UTF_8) == "body!"))
    assert(WarcCodec.parseHttp("no status line\r\n\r\nx".getBytes(UTF_8)).isEmpty)
    assert(WarcCodec.parseHttp("HTTP/1.1 200 OK\r\nnever a blank line".getBytes(UTF_8)).isEmpty)
    assert(WarcCodec.parseHttp("HTTP/1.1 abc\r\n\r\nx".getBytes(UTF_8)).isEmpty)
  }

  test("http body decode: chunked framing, gzip/deflate codings, caps and salvage") {
    val plain = ("x" * 2000 + "END").getBytes(UTF_8)
    def resp(headers: String, body: Array[Byte]): Array[Byte] =
      s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$headers\r\n".getBytes(UTF_8) ++ body
    // chunked: multi-chunk with ragged tail + chunk extension tolerated
    val ch = WarcCodec.chunked(plain, 7)
    val extIdx = new String(ch, UTF_8).indexOf("\r\n")
    val withExt = (new String(ch.take(extIdx), UTF_8) + ";ext=1\r\n").getBytes(UTF_8) ++ ch.drop(extIdx + 2)
    for (b <- Seq(ch, withExt)) {
      val r = WarcCodec.parseHttp(resp("Transfer-Encoding: chunked\r\n", b))
      assert(r.exists(_.body.sameElements(plain)))
    }
    // gzip + x-gzip content coding
    for (name <- Seq("gzip", "x-gzip")) {
      val r = WarcCodec.parseHttp(resp(s"Content-Encoding: $name\r\n", WarcCodec.gzipMember(plain)))
      assert(r.exists(_.body.sameElements(plain)), name)
    }
    // deflate: zlib-wrapped AND raw (both in the wild)
    def deflate(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(plain); d.finish()
      val buf = new Array[Byte](8192)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    for (raw <- Seq(false, true)) {
      val r = WarcCodec.parseHttp(resp("Content-Encoding: deflate\r\n", deflate(raw)))
      assert(r.exists(_.body.sameElements(plain)), s"raw=$raw")
    }
    // chunked OUTSIDE gzip (wire order): de-chunk, then inflate
    val both = WarcCodec.parseHttp(resp(
      "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
      WarcCodec.chunked(WarcCodec.gzipMember(plain), 11)))
    assert(both.exists(_.body.sameElements(plain)))
    // malformed chunk size line: loud None, never framing garbage as text
    assert(WarcCodec.parseHttp(resp("Transfer-Encoding: chunked\r\n",
      "zz\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8))).isEmpty)
    // unknown coding (br): loud None
    assert(WarcCodec.parseHttp(resp("Content-Encoding: br\r\n", plain)).isEmpty)
    // truncated chunked body salvages complete chunks
    val trunc = WarcCodec.parseHttp(resp("Transfer-Encoding: chunked\r\n", ch.take(18)))
    assert(trunc.exists(r => r.body.length < plain.length &&
      plain.startsWith(r.body) && r.body.length >= 7))
    // truncated gzip salvages the inflated prefix
    val gz = WarcCodec.gzipMember(plain)
    val gtr = WarcCodec.parseHttp(resp("Content-Encoding: gzip\r\n", gz.take(gz.length - 6)))
    assert(gtr.exists(r => plain.startsWith(r.body)))
    // a lying chunk size larger than the cap is rejected, not allocated
    assert(WarcCodec.parseHttp(resp("Transfer-Encoding: chunked\r\n",
      "fffffff0\r\nx".getBytes(UTF_8)), maxBodyBytes = 1 << 20).isEmpty)
    // decoded-size cap bounds a bomb: 128 MiB of zeros caps at maxBodyBytes
    val bomb = WarcCodec.gzipMember(new Array[Byte](8 << 20))
    val capped = WarcCodec.parseHttp(resp("Content-Encoding: gzip\r\n", bomb),
      maxBodyBytes = 1 << 16)
    assert(capped.exists(_.body.length == (1 << 16)))
  }

  test("readWarcFiles: executor-opened streaming read over a directory") {
    val dir = Files.createTempDirectory("warc_spec").toFile
    try {
      (0 until 4).foreach { f =>
        val recs = (0 until 5).map(i => rec(f * 100 + i))
        val (bytes, name) = (f % 3) match {
          case 0 => (writeWarcGz(recs), s"part-$f.warc.gz")
          case 1 => (recs.flatMap(r => writeRecord(r).toSeq).toArray, s"part-$f.warc")
          case _ => (writeWarcZst(recs), s"part-$f.warc.zst") // r18
        }
        Files.write(new java.io.File(dir, name).toPath, bytes)
      }
      // a non-warc file must be ignored
      Files.write(new java.io.File(dir, "_SUCCESS").toPath, Array[Byte](1))
      val df = Warc.readWarcFiles(spark, dir.getAbsolutePath)
      val rows = df.collect()
      assert(rows.length == 20)
      assert(rows.forall(_.getAs[Int]("http_status") == 200))
      assert(rows.map(_.getAs[String]("target_uri")).distinct.length == 20)
      // bodies really are the html payload (http head split off)
      val b = rows.find(_.getAs[String]("target_uri") == "http://e.x/101").get
      assert(new String(b.getAs[Array[Byte]]("body"), UTF_8) == "<p>doc 101</p>")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("parseRecords keeps the id column and prunes to record rows") {
    import spark.implicits._
    val df = Seq((7L, writeWarcGz(Seq(rec(70), rec(71)))),
      (8L, writeWarcGz(Seq(rec(80))))).toDF("doc_id", "warc")
    val out = Warc.parseRecords(df, "doc_id").orderBy("target_uri").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[String]("target_uri"))).toSeq ==
      Seq((7L, "http://e.x/70"), (7L, "http://e.x/71"), (8L, "http://e.x/80")))
  }
}
