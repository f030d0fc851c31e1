package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.WarcCodec
import graft.sources.WarcCodec.WarcRecord

class CrawlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def respRec(uri: String, html: String,
                      status: Int = 200,
                      ctype: String = "text/html; charset=UTF-8"): WarcRecord = {
    val http = (s"HTTP/1.1 $status X\r\nContent-Type: $ctype\r\n\r\n" + html).getBytes(UTF_8)
    WarcRecord("response", uri, "2024-01-01T00:00:00Z", s"<urn:$uri>",
      "application/http; msgtype=response", http)
  }

  test("mixed archive: PDFs route through PdfCodec beside HTML, same pipeline") {
    val dir = Files.createTempDirectory("crawl_pdf_spec").toFile
    try {
      val html = "<html><body><p>An ordinary html page with plenty of words here.</p></body></html>"
      val pdfBytes = graft.SparkEntry.synthPdf(5L) // 3 pages
      val pdfRec = {
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n").getBytes(UTF_8) ++ pdfBytes
        WarcRecord("response", "http://mix.com/paper", "2024-01-01T00:00:00Z",
          "<urn:pdf>", "application/http; msgtype=response", http)
      }
      val broken = {
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n").getBytes(UTF_8) ++
          "not really a pdf".getBytes(UTF_8)
        WarcRecord("response", "http://mix.com/corrupt", "2024-01-01T00:00:00Z",
          "<urn:bad>", "application/http; msgtype=response", http)
      }
      val docxRec = {
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: application/vnd.openxmlformats-" +
          "officedocument.wordprocessingml.document\r\n\r\n").getBytes(UTF_8) ++
          graft.SparkEntry.synthDocx(4L) // 3 paragraphs
        WarcRecord("response", "http://mix.com/report", "2024-01-01T00:00:00Z",
          "<urn:docx>", "application/http; msgtype=response", http)
      }
      Files.write(new java.io.File(dir, "m.warc.gz").toPath, WarcCodec.writeWarcGz(Seq(
        respRec("http://mix.com/page", html), pdfRec, broken, docxRec)))
      val out = Crawl.ingest(spark, dir.getAbsolutePath).orderBy("url_canon").collect()
      // the corrupt PDF extracts to "" and is length-filtered out
      assert(out.map(_.getAs[String]("url_canon")).toSeq ==
        Seq("http://mix.com/page", "http://mix.com/paper", "http://mix.com/report"))
      val paper = out(1)
      // boilerplate filter keeps each simple page's 6-word first line
      // plus the CID page's !-terminated ToUnicode line (r16), the
      // Differences/ActualText page's line (r17) and the Identity-H
      // FontFile2-cmap page's line (r18 — id 5 is odd: format 12 with
      // the supplementary-plane glyph)
      assert(paper.getAs[String]("text") ==
        (0 until 3).map(p => s"Doc 5 page $p (ok) A").mkString("\n") +
          "\nCid 5 zy!\nDiff éłł word gap here real 5é!\ncid 🌍 go 5!")
      assert(paper.getAs[String]("title") == "" && paper.getAs[Long]("n_links") == 0L)
      val report = out(2)
      // docx: paragraph 0 is short (boilerplate-dropped), 1..2 survive
      assert(report.getAs[String]("text") ==
        (1 until 3).map(p => s"Paragraph $p of doc 4 & w${(4 * 17 + p * 5) % 61}").mkString("\n"))
      val page = out(0)
      assert(page.getAs[String]("text").contains("ordinary html page"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("blockBoilerplate: jusText kernel on HTML rows, line rule on plain rows, one exchange") {
    val dir = Files.createTempDirectory("crawl_justext").toFile
    try {
      val goodPara = "<p>" +
        "it is the case that the run was good and " * 5 + "the page ends here.</p>"
      val page = "<html><head><title>T</title></head><body>" + goodPara +
        "<p>in short yes</p>" + goodPara +
        "<div><a href=\"/a\">home page link text goes here</a> " +
        "<a href=\"/b\">more link text for density</a> go to the next pages now.</div>" +
        "</body></html>"
      val plainRec = {
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
          "nav crumb\nA full plain sentence with enough words inside.").getBytes(UTF_8)
        WarcRecord("response", "http://jt.com/plain", "2024-01-01T00:00:00Z",
          "<urn:plain>", "application/http; msgtype=response", http)
      }
      // two files: the url-dedup exchange's distribution is non-trivial
      // (the ingest plan pin's convention)
      Files.write(new java.io.File(dir, "j.warc.gz").toPath,
        WarcCodec.writeWarcGz(Seq(respRec("http://jt.com/page", page))))
      Files.write(new java.io.File(dir, "j2.warc.gz").toPath,
        WarcCodec.writeWarcGz(Seq(plainRec)))
      val out = Crawl.ingest(spark, dir.getAbsolutePath, blockBoilerplate = true)
        .orderBy("url_canon").collect()
      val html = out(0)
      // good paragraphs kept, promoted short kept, link-dense nav DROPPED
      // (the line rule would have kept it: ends '.', >= 5 words)
      val lines = html.getAs[String]("text").split("\n")
      assert(lines.length == 3 && lines(1) == "in short yes", lines.mkString("|"))
      assert(!html.getAs[String]("text").contains("next pages"), html.getAs[String]("text"))
      // plain-text rows (no markup to segment) still ride the LINE rule
      assert(out(1).getAs[String]("text") ==
        "A full plain sentence with enough words inside.")
      // the one-exchange ingest plan survives block mode (the kernel is
      // in-row; the relational jusText form would have added three)
      val p = Crawl.ingest(spark, dir.getAbsolutePath, blockBoilerplate = true)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("end-to-end: archives to clean deduplicated training docs") {
    val dir = Files.createTempDirectory("crawl_spec").toFile
    try {
      val page = "<html><head><title>T</title></head><body>" +
        "<p>This page has a real paragraph with many words inside it.</p>" +
        "<p>Menu</p></body></html>"
      // file 0: the page + a tracking-variant duplicate + a 404 + an image
      Files.write(new java.io.File(dir, "a.warc.gz").toPath, WarcCodec.writeWarcGz(Seq(
        respRec("http://GOOD.com/x", page),
        respRec("http://good.com/x?utm_source=tw", "<p>recrawl variant later alphabetically</p>"),
        respRec("http://good.com/404", "<p>gone</p>", status = 404),
        respRec("http://good.com/img", "fakepng", ctype = "image/png"))))
      // file 1: a blocklisted domain + a second good page
      Files.write(new java.io.File(dir, "b.warc.gz").toPath, WarcCodec.writeWarcGz(Seq(
        respRec("http://www.spam.biz/y", "<p>buy stuff now cheap deals forever and ever</p>"),
        respRec("http://other.org/z", "<p>Another genuine sentence with plenty of words here.</p>"))))
      val out = Crawl.ingest(spark, dir.getAbsolutePath,
        blockedDomains = Some(Seq("spam.biz").toDF("domain")))
        .orderBy("url_canon").collect()
      assert(out.map(_.getAs[String]("url_canon")).toSeq ==
        Seq("http://good.com/x", "http://other.org/z"))
      val good = out(0)
      // tracking variant deduped to the FIRST record (path a.warc.gz, page),
      // boilerplate line "Menu" dropped, title extracted
      assert(good.getAs[String]("text") ==
        "This page has a real paragraph with many words inside it.")
      assert(good.getAs[String]("title") == "T")
      assert(good.getAs[String]("url_domain") == "good.com")
      // doc_id is the deterministic url hash: stable across runs
      val again = Crawl.ingest(spark, dir.getAbsolutePath,
        blockedDomains = Some(Seq("spam.biz").toDF("domain")))
        .orderBy("url_canon").collect()
      assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  // r8 advice: header values are case-insensitive (RFC 9110) and a declared
  // latin-1 charset must not be decoded as UTF-8 (mojibake)
  test("content-type match is case-insensitive; declared latin-1 charset decodes correctly") {
    val dir = Files.createTempDirectory("crawl_charset").toFile
    try {
      val latinHtml = "<html><body><p>café naïve résumé words and more words here.</p></body></html>"
      val latinBytes = latinHtml.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val http = ("HTTP/1.1 200 X\r\nContent-Type: Text/HTML; Charset=ISO-8859-1\r\n\r\n"
        .getBytes(UTF_8) ++ latinBytes)
      val rec = WarcRecord("response", "http://latin.example/p", "2024-01-01T00:00:00Z",
        "<urn:latin>", "application/http; msgtype=response", http)
      Files.write(new java.io.File(dir, "l.warc.gz").toPath, WarcCodec.writeWarcGz(Seq(
        rec,
        respRec("http://upper.example/q",
          "<p>an uppercase content type page with several words in it.</p>",
          ctype = "TEXT/HTML"))))
      val out = Crawl.ingest(spark, dir.getAbsolutePath).orderBy("url_canon").collect()
      // both survive the filter (Text/HTML and TEXT/HTML), and the latin-1
      // body round-trips its accented characters
      assert(out.map(_.getAs[String]("url_canon")).toSeq ==
        Seq("http://latin.example/p", "http://upper.example/q"))
      assert(out(0).getAs[String]("text").contains("café naïve résumé"),
        out(0).getAs[String]("text"))
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  // review finding: Spark's built-in decode() rejects windows-1252 (not in
  // its VALID_CHARSETS) with a runtime error — the decode must go through
  // the JVM charset table, and unknown charsets must fall back, not fail
  test("windows-1252 and unknown charsets decode without failing the job") {
    val dir = Files.createTempDirectory("crawl_cp1252").toFile
    try {
      // € (U+20AC) is 0x80 in windows-1252 — mojibake under latin-1/UTF-8
      val cpHtml = "<p>price one hundred € in total for everything.</p>"
      val cpBytes = cpHtml.getBytes(java.nio.charset.Charset.forName("windows-1252"))
      val http = ("HTTP/1.1 200 X\r\nContent-Type: text/html; charset=windows-1252\r\n\r\n"
        .getBytes(UTF_8) ++ cpBytes)
      val rec = WarcRecord("response", "http://cp.example/p", "2024-01-01T00:00:00Z",
        "<urn:cp>", "application/http; msgtype=response", http)
      Files.write(new java.io.File(dir, "c.warc.gz").toPath, WarcCodec.writeWarcGz(Seq(
        rec,
        respRec("http://weird.example/q",
          "<p>a page declaring a bogus charset with many words here.</p>",
          ctype = "text/html; charset=x-no-such-charset"))))
      val out = Crawl.ingest(spark, dir.getAbsolutePath).orderBy("url_canon").collect()
      assert(out.map(_.getAs[String]("url_canon")).toSeq ==
        Seq("http://cp.example/p", "http://weird.example/q"))
      assert(out(0).getAs[String]("text").contains("one hundred €"),
        out(0).getAs[String]("text"))
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  // r16 verdict #8: the prescan contract — when the HTTP header carries no
  // charset parameter, BOTH `<meta charset=...>` and the legacy
  // `<meta http-equiv="Content-Type" content="...; charset=...">` form must
  // be sniffed from the first 1024 body bytes, in either attribute order
  // and with single or double quotes
  test("meta charset prescan: both meta forms, both attribute orders, both quote styles") {
    val dir = Files.createTempDirectory("crawl_meta_charset").toFile
    try {
      // € (U+20AC) is 0x80 in windows-1252: only a correct sniff decodes it
      val metas = Seq(
        "a" -> """<meta charset="windows-1252">""",
        "b" -> """<meta charset='windows-1252'>""",
        "c" -> """<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">""",
        "d" -> """<meta content='text/html; charset=windows-1252' http-equiv='Content-Type'>""")
      val recs = metas.map { case (path, meta) =>
        val html = s"<html><head>$meta</head><body>" +
          "<p>price one hundred € in total for everything.</p></body></html>"
        val body = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
        // header deliberately carries NO charset parameter → prescan decides
        val http = "HTTP/1.1 200 X\r\nContent-Type: text/html\r\n\r\n".getBytes(UTF_8) ++ body
        WarcRecord("response", s"http://meta.example/$path", "2024-01-01T00:00:00Z",
          s"<urn:meta-$path>", "application/http; msgtype=response", http)
      }
      Files.write(new java.io.File(dir, "m.warc.gz").toPath, WarcCodec.writeWarcGz(recs))
      val out = Crawl.ingest(spark, dir.getAbsolutePath).orderBy("url_canon").collect()
      assert(out.length == 4, out.map(_.getAs[String]("url_canon")).mkString(","))
      for (row <- out)
        assert(row.getAs[String]("text").contains("one hundred €"),
          s"${row.getAs[String]("url_canon")}: ${row.getAs[String]("text")}")
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  // r17: opt-in mojibake repair on the HTML route — a page whose
  // declared charset hides an upstream double-encoding
  test("ingest(fixMojibake = true) repairs double-encoded pages; default untouched") {
    val dir = Files.createTempDirectory("crawl_moji").toFile
    try {
      val clean = "<head><title>Café menu</title></head>" +
        "<p>Price was café style €5 total here!</p>"
      // the server double-encoded: UTF-8 bytes re-read as cp1252 and
      // re-served as UTF-8 (header truthfully says utf-8 — of the
      // garbled chars)
      val garbled = new String(clean.getBytes(UTF_8),
        java.nio.charset.Charset.forName("windows-1252"))
      Files.write(new java.io.File(dir, "m.warc.gz").toPath, WarcCodec.writeWarcGz(Seq(
        respRec("http://moji.example/p", garbled))))
      val off = Crawl.ingest(spark, dir.getAbsolutePath).collect()
      assert(off.length == 1 && off(0).getAs[String]("text").contains("cafÃ©"),
        s"default passes the garble through: ${off(0).getAs[String]("text")}")
      val on = Crawl.ingest(spark, dir.getAbsolutePath, fixMojibake = true).collect()
      assert(on.length == 1 && on(0).getAs[String]("text") ==
        "Price was café style €5 total here!", on(0).getAs[String]("text"))
      // the title column is repaired too (review finding: dedup keys /
      // display would otherwise keep the garble)
      assert(on(0).getAs[String]("title") == "Café menu",
        on(0).getAs[String]("title"))
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  // r17: the WET front door — conversion records only, warcinfo dropped,
  // URL canon + dedup + boilerplate apply, blocklist honored
  test("ingestWet: conversion records through canon/dedup/boilerplate; warcinfo and blocked domains drop") {
    val dir = Files.createTempDirectory("crawl_wet").toFile
    try {
      def conv(uri: String, text: String, tag: String) =
        WarcRecord("conversion", uri, "2024-01-01T00:00:00Z", s"<urn:$tag>",
          "text/plain", text.getBytes(UTF_8))
      val info = WarcRecord("warcinfo", "", "2024-01-01T00:00:00Z", "<urn:i>",
        "application/warc-fields", "software: x\r\n".getBytes(UTF_8))
      val recs = Seq(
        info,
        conv("http://Keep.example/a?utm_source=t",
          "Six words of wet text é!\nmenu\nAnother kept line with five words.", "a1"),
        // same canonical URL, later record: must lose the dedup
        conv("http://keep.example/a", "DUPLICATE must not survive!", "a2"),
        conv("http://blocked.example/b", "Blocked domain text with many words!", "b"),
        // a stray response record in the same file: ignored by the WET route
        respRec("http://keep.example/resp", "<p>http response record ignored here.</p>"))
      Files.write(new java.io.File(dir, "seg.warc.wet.gz").toPath,
        WarcCodec.writeWarcGz(recs))
      // r18: zstd WET sidecar beside the gzip one — same route, same
      // reader, skippable frame skipped
      Files.write(new java.io.File(dir, "seg2.warc.wet.zst").toPath,
        WarcCodec.writeWarcZst(Seq(
          conv("http://zkeep.example/z", "Zstd wet line with five words.", "z1"))))
      val blocked = spark.createDataFrame(Seq(Tuple1("blocked.example"))).toDF("domain")
      val out = Crawl.ingestWet(spark, dir.getAbsolutePath,
        blockedDomains = Some(blocked)).orderBy("url_canon").collect()
      assert(out.map(_.getAs[String]("url_canon")).toSeq ==
        Seq("http://keep.example/a", "http://zkeep.example/z"))
      assert(out(1).getAs[String]("text") == "Zstd wet line with five words.")
      assert(out(0).getAs[String]("text") ==
        "Six words of wet text é!\nAnother kept line with five words.")
      assert(out(0).getAs[String]("title") == "" && out(0).getAs[Long]("n_links") == 0L)
      // fixMojibake = true repairs upstream double-encodings in the same
      // projection
      val garbled = new String(
        "Wet garbled body é with é enough words here!".getBytes(UTF_8),
        java.nio.charset.Charset.forName("windows-1252"))
      Files.write(new java.io.File(dir, "g.warc.wet.gz").toPath,
        WarcCodec.writeWarcGz(Seq(conv("http://garbled.example/g", garbled, "g"))))
      val fixed = Crawl.ingestWet(spark, dir.getAbsolutePath, fixMojibake = true)
        .filter(org.apache.spark.sql.functions.col("url_domain") === "garbled.example")
        .collect()
      assert(fixed.length == 1)
      assert(fixed(0).getAs[String]("text") ==
        "Wet garbled body é with é enough words here!", fixed(0).getAs[String]("text"))
      // plan shape, with AND without the repair: exactly ONE hash exchange
      // (the url dedup — two files make its distribution non-trivial, the
      // ingest pin's convention); text bytes cross it once
      for (fix <- Seq(false, true)) {
        val p = Crawl.ingestWet(spark, dir.getAbsolutePath, fixMojibake = fix)
          .queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, s"fix=$fix:\n$p")
      }
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("robots table: disallowed paths dropped end-to-end, incl. query-only URLs") {
    val dir = Files.createTempDirectory("crawl_robots").toFile
    try {
      val robotsTxt = "User-agent: *\nDisallow: /private\nDisallow: /*?\n"
      Files.write(new java.io.File(dir, "r.warc.gz").toPath, WarcCodec.writeWarcGz(Seq(
        respRec("http://polite.example/ok",
          "<p>a public page with plenty of ordinary words in it.</p>"),
        respRec("http://polite.example/private/x",
          "<p>a private page that the crawler must not ingest at all.</p>"),
        // query-only canonical URL (scheme://host?q=1): the r10-advice case —
        // the path regex swallowed '?q=1' into the authority and Disallow: /*?
        // was silently bypassed
        respRec("http://polite.example?q=1",
          "<p>a tracked query variant page with several words inside.</p>"),
        respRec("http://norobots.example/z",
          "<p>a host with no robots row is allowed by default here.</p>"))))
      val robots = Seq(("polite.example", robotsTxt)).toDF("host", "robots_txt")
      val out = Crawl.ingest(spark, dir.getAbsolutePath, robots = Some(robots))
        .orderBy("url_canon").collect()
      assert(out.map(_.getAs[String]("url_canon")).toSeq ==
        Seq("http://norobots.example/z", "http://polite.example/ok"))
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("robotsPath: request target for rule matching") {
    val in = Seq(
      "http://a.com/x/y?q=1", "http://a.com/x", "http://a.com/",
      "http://a.com", "http://a.com?q=1", "http://a.com?q=1&r=2")
      .toDF("u")
    val got = in.select(Crawl.robotsPath(org.apache.spark.sql.functions.col("u")))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("/x/y?q=1", "/x", "/", "/", "/?q=1", "/?q=1&r=2"))
  }

  test("plan: one exchange (url dedup), blocklist broadcast, bytes never shuffle") {
    val dir = Files.createTempDirectory("crawl_plan").toFile
    try {
      // multiple files => multiple partitions, so the dedup distribution is
      // NOT trivially satisfied (with one file Spark correctly elides it)
      (0 until 4).foreach(f =>
        Files.write(new java.io.File(dir, s"p$f.warc.gz").toPath,
          WarcCodec.writeWarcGz(Seq(respRec(s"http://a$f.com/1", "<p>words here</p>")))))
      val df = Crawl.ingest(spark, dir.getAbsolutePath,
        blockedDomains = Some(Seq("x.y").toDF("domain")),
        robots = Some(Seq(("x.y", "User-agent: *\nDisallow: /p\n"))
          .toDF("host", "robots_txt")))
      val plan = df.queryExecution.executedPlan.toString
      val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nHash == 1, s"want exactly the dedup exchange, got $nHash:\n$plan")
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
      // the one hash exchange carries only the partial-aggregate columns
      // (url/domain + min_by state) — record metadata is projected away
      // before it (the raw names appear only inside the partition-local
      // SerializeFromObject that materializes parser output)
      val exchangeLine = plan.linesIterator.find(_.contains("Exchange hashpartitioning")).get
      assert(!exchangeLine.contains("content_type") && !exchangeLine.contains("record_id"), exchangeLine)
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }
}
