package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.{textfn, textkernel}

/** Equivalence of the compiled kernels with their higher-order-function
  * column formulations (which are the semantic reference — they mirror the
  * DuckDB oracle SQL 1:1). Any drift here would silently break oracles.
  */
class TextKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val samples: Seq[String] = Seq(
    "The quick brown Fox! jumps; over 42 lazy dogs...",
    "",
    "   leading and trailing   ",
    "one",
    "a b",
    "tab\tsep\nnewline  double  space",
    "punct-only !!! ??? ...",
    "numbers 123 456 mixed a1b2c3",
    "repeat repeat repeat repeat words words",
    (1 to 200).map(i => s"w$i").mkString(" ")
  ) ++ {
    val rnd = new scala.util.Random(11)
    (1 to 40).map(_ => (0 until rnd.nextInt(60)).map(_ =>
      (1 to 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(28)).toChar).mkString).mkString(" "))
  }

  def df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("repetition_stats == naive grouped-count reference over the sample set") {
    samples.foreach { s =>
      val got = TextKernel.repetitionStats(s).toSeq
      val ws = TextKernel.tokens(s).toSeq
      val bi = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val tri = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val expect = Seq[Long](
        ws.length, ws.distinct.length,
        bi.length, if (bi.isEmpty) 0 else bi.groupBy(identity).values.map(_.length).max,
        tri.length, tri.groupBy(identity).values.map(_.length).filter(_ > 1).sum)
      assert(got == expect, s"text=$s")
    }
  }

  test("word_tokens == filter(split(lower, regex))") {
    val rows = df.select(
      textkernel.word_tokens(col("text")).as("k"),
      textfn.words(col("text")).as("h")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("token_stats == regex token-count columns") {
    val rows = df.select(
      textkernel.token_stats(col("text")).as("k"),
      textfn.naiveTokenCount(col("text")).as("naive"),
      textfn.whitespaceTokenCount(col("text")).cast("long").as("ws"),
      textfn.bpeishTokenCount(col("text")).cast("long").as("bpe")).collect()
    rows.foreach { r =>
      val k = r.getStruct(0)
      assert(k.getLong(0) == r.getLong(1), s"naive mismatch: $r")
      assert(k.getLong(1) == r.getLong(2), s"ws mismatch: $r")
      assert(k.getLong(2) == r.getLong(3), s"bpe mismatch: $r")
    }
  }

  test("shingle_hashes == sorted hex60 over wordShingles") {
    val rows = df.select(
      textkernel.shingle_hashes(col("text"), 3).as("k"),
      sort_array(transform(textfn.wordShingles(textfn.words(col("text")), 3),
        s => textfn.hexhash60(s))).as("h")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("minhash_sig == array_min of per-seed hex60 over shingles") {
    val hof = (0 until 4).map(j => textfn.minhash(
      textfn.wordShingles(textfn.words(col("text")), 3), j).as(s"h$j"))
    val rows = df.select(textkernel.minhash_sig(col("text"), 4, 3).as("k") +: hof: _*).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) (1 to 4).foreach(i => assert(r.isNullAt(i)))
      else {
        val sig = r.getSeq[Long](0)
        (0 until 4).foreach(j => assert(sig(j) == r.getLong(j + 1)))
      }
    }
  }

  test("simhash_fast == HOF simhash") {
    val rows = df.select(
      textkernel.simhash_fast(col("text"), 16).as("k"),
      textfn.simhash(textfn.words(col("text")), 16).as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("jaccard_sorted == set jaccard on the same shingle sets") {
    val pairs = df.as("a").crossJoin(df.limit(5).as("b"))
      .select(
        textkernel.jaccard_sorted(
          textkernel.shingle_hashes(col("a.text"), 3),
          textkernel.shingle_hashes(col("b.text"), 3)).as("k"),
        textfn.jaccard(
          transform(textfn.wordShingles(textfn.words(col("a.text")), 3), s => textfn.hexhash60(s)),
          transform(textfn.wordShingles(textfn.words(col("b.text")), 3), s => textfn.hexhash60(s))).as("h"))
      .collect()
    pairs.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("marker_hits == size(filter(words, isin))") {
    val markers = Seq("the", "a", "and", "w1", "w42")
    val rows = df.select(
      textkernel.marker_hits(col("text"), markers).as("k"),
      size(filter(textfn.words(col("text")), w => w.isin(markers.map(x => x: Any): _*))).cast("long").as("h"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("BloomFilterCache: one deserialized copy per distinct filter, LRU-bounded") {
    import graft.functions.BloomFilterCache
    def bytesOf(seed: Int): Array[Byte] = {
      val f = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (0 until 50).foreach(i => f.putString(s"item-$seed-$i"))
      val bos = new java.io.ByteArrayOutputStream()
      f.writeTo(bos)
      bos.toByteArray
    }
    val b1 = bytesOf(1)
    // identical bytes (even a DIFFERENT array instance) → the SAME filter
    // object: the per-task copies the expression tree deserializes all share
    // one executor-wide bit array
    val f1 = BloomFilterCache.get(b1)
    val f2 = BloomFilterCache.get(b1.clone())
    assert(f1 eq f2, "same serialized bytes must yield one shared instance")
    assert(f1.mightContainString("item-1-0") && !f1.mightContainString("nope"))
    // the cache is bounded: flooding with distinct filters evicts LRU
    (2 to 10).foreach(s => BloomFilterCache.get(bytesOf(s)))
    assert(BloomFilterCache.size <= 4, s"cache must stay bounded: ${BloomFilterCache.size}")
    // an evicted filter still WORKS (re-deserialized on demand)
    assert(BloomFilterCache.get(b1).mightContainString("item-1-0"))
  }

  test("winnow_fp == array_min of hex60 over char 5-grams of normalized text") {
    val norm = concat_ws(" ", textfn.words(col("text")))
    val grams = when(length(norm) >= 5,
      transform(sequence(lit(1), length(norm) - lit(4)), i => norm.substr(i, lit(5))))
      .otherwise(array(norm))
    val rows = df.select(
      textkernel.winnow_fp(col("text")).as("k"),
      array_min(transform(grams, g => textfn.hexhash60(g))).as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"winnow mismatch"))
  }

  test("fix_mojibake: unwinds 1-2 levels, never touches clean/ambiguous text") {
    import java.nio.charset.Charset
    import java.nio.charset.StandardCharsets.UTF_8
    val cp1252 = Charset.forName("windows-1252")
    def garble(s: String): String = new String(s.getBytes(UTF_8), cp1252)
    // avoids UTF-8 bytes 0x81/0x8D/0x8F/0x90/0x9D: Java's cp1252 decoder
    // maps those undefined bytes to U+FFFD, which DESTROYS information —
    // garbling through it is lossy and correctly unfixable (asserted below)
    // ('—' is also excluded: its LEVEL-1 garble '”' re-garbles through
    // the lossy 0x9D slot — '–' keeps the dash class double-safe)
    val clean = "Café cost €42 – ‘fine’, naïve résumé… œuvre!"
    val once = garble(clean)
    val twice = garble(once)
    assert(once != clean && twice != once)
    // scala-side contract
    assert(FixMojibakeExpr.fix(once) == clean, once)
    assert(FixMojibakeExpr.fix(twice) == clean, twice)
    // r18 advice: the unwind no longer caps at 3 levels — 4×/5×-encoded
    // text repairs FULLY (the loop self-terminates: each accepted level
    // strictly shortens the string)
    assert(FixMojibakeExpr.fix(garble(garble(twice))) == clean, "4 levels")
    assert(FixMojibakeExpr.fix(garble(garble(garble(twice)))) == clean, "5 levels")
    assert(FixMojibakeExpr.fix(clean) == clean, "clean text untouched")
    assert(FixMojibakeExpr.fix("plain ascii only!") == "plain ascii only!")
    // single-encoded latin-1-looking text is NOT valid UTF-8 after the
    // reverse map — must pass through (the conservative gate)
    assert(FixMojibakeExpr.fix("naïve café") == "naïve café")
    // chars outside sloppy-cp1252 (e.g. CJK) block the whole-string map
    assert(FixMojibakeExpr.fix("Ã© 中文") == "Ã© 中文")
    assert(FixMojibakeExpr.fix("") == "")
    // latin-1-decoded mojibake (C1 controls instead of cp1252 specials)
    // reverses through the sloppy identity path too — INCLUDING chars
    // whose UTF-8 bytes hit cp1252's undefined slots (”: E2 80 9D)
    val withQuote = "a “fine” day!"
    val latin1Garbled = new String(withQuote.getBytes(UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(FixMojibakeExpr.fix(latin1Garbled) == withQuote, "latin-1 flavor")
    // ...but the JAVA-cp1252-garbled flavor of the same text carries
    // U+FFFD (byte 0x9D is undefined): information destroyed upstream,
    // the kernel must refuse rather than guess
    val lossy = garble(withQuote)
    assert(lossy.contains('�') && FixMojibakeExpr.fix(lossy) == lossy)
    // column form
    val out = Seq(once, twice, clean, "ascii").toDF("t")
      .select(textkernel.fix_mojibake(col("t"))).as[String].collect()
    assert(out.toSeq == Seq(clean, clean, clean, "ascii"))
  }

  test("fix_mojibake properties: total, idempotent, never introduces U+FFFD") {
    // deterministic seeded sweep over hostile inputs (the codec-family
    // discipline): random unicode soup, random latin-1-range strings,
    // random garbles of random clean strings, control chars, surrogates
    val rnd = new scala.util.Random(23)
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    def randomString(n: Int, maxCp: Int): String = {
      val sb = new StringBuilder
      while (sb.length < n) {
        val cp = rnd.nextInt(maxCp)
        if (!(cp >= 0xD800 && cp <= 0xDFFF)) sb.appendAll(Character.toChars(cp))
      }
      sb.toString
    }
    for (trial <- 0 until 400) {
      val s = trial % 4 match {
        case 0 => randomString(1 + rnd.nextInt(60), 0x100)   // latin-1 range
        case 1 => randomString(1 + rnd.nextInt(60), 0x3000)  // BMP soup
        case 2 => // a real garble of clean-ish text
          val base = randomString(1 + rnd.nextInt(40), 0x250)
          new String(base.getBytes(java.nio.charset.StandardCharsets.UTF_8), cp1252)
        case _ => // raw bytes latin-1-decoded (any byte soup is a valid string)
          val b = new Array[Byte](1 + rnd.nextInt(60)); rnd.nextBytes(b)
          new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      }
      val f = FixMojibakeExpr.fix(s) // total: must not throw
      assert(FixMojibakeExpr.fix(f) == f, s"not idempotent on trial $trial")
      if (!s.contains('�'))
        assert(!f.contains('�'), s"introduced U+FFFD on trial $trial")
    }
    // lone surrogates (invalid UTF-16 input) must pass through untouched
    val lone = "a\uD800b"
    assert(FixMojibakeExpr.fix(lone) == lone)
  }
}
