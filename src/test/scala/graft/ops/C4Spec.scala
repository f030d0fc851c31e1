package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextKernel

/** Hand-computed goldens for the C4 line-level cleaning kernel
  * (TextKernel.c4LineStats) and the c4Filter page rules — the unit-level
  * twin of the q_c4_filter oracle gate (which runs the same rules against
  * the DuckDB replay at sf0.01).
  */
class C4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(s: String, minWords: Int = 5) = {
    val (c, clean) = TextKernel.c4LineStats(s, minWords)
    (c.toSeq, clean)
  }

  test("c4LineStats golden: empty doc is one line, zero kept, clean=\"\"") {
    assert(stats("") == (Seq(1L, 0L, 0L), ""))
  }

  test("c4LineStats golden: CRLF trim keeps terminal punctuation visible") {
    val t = "This line is long enough today.\r\nshort one.\r\nAnd here is the second keeper!"
    val (c, clean) = stats(t)
    // line 2 has terminal punct but only 2 words → dropped
    assert(c == Seq(3L, 2L, 2L))
    assert(clean == "This line is long enough today.\nAnd here is the second keeper!")
  }

  test("c4LineStats golden: closing quote counts as terminal punctuation") {
    val (c, clean) = stats("They replied \"we will be there soon\"")
    assert(c == Seq(1L, 1L, 0L)) // kept, but no [.!?] marks inside
    assert(clean == "They replied \"we will be there soon\"")
  }

  test("c4LineStats golden: javascript is dropped case-insensitively") {
    assert(stats("Please enable JAVASCRIPT to continue reading.") == (Seq(1L, 0L, 0L), ""))
    assert(stats("Please enable JavaScript to continue reading.") == (Seq(1L, 0L, 0L), ""))
    // ...but only as a substring of the LINE, not a word-boundary match
    assert(stats("Their javascripting hobby kept them busy daily.")._1(1) == 0L)
  }

  test("c4LineStats golden: word-count floor and space/tab trim") {
    assert(stats("Four tiny words here.") == (Seq(1L, 0L, 0L), ""))
    assert(stats("\t  Hello there my good friend.  \t") ==
      (Seq(1L, 1L, 1L), "Hello there my good friend."))
    // minLineWords is a parameter: the same line passes at 4
    assert(stats("Four tiny words here.", minWords = 4) ==
      (Seq(1L, 1L, 1L), "Four tiny words here."))
  }

  test("c4LineStats golden: no terminal punctuation → dropped") {
    assert(stats("this perfectly long line just never ends") == (Seq(1L, 0L, 0L), ""))
  }

  test("c4Filter: page rules (sentences, lorem, brace, bad words) and keep") {
    val three = "One fine sentence sits right here. Another one arrives just after that! A third question then follows here?"
    val docs = Seq(
      (1L, three),                                            // 3 marks → keep
      (2L, three + "\nLorem Ipsum dolor sits right here fine."), // page lorem
      (3L, three + "\nvar x = { a: 1 };"),                    // page brace
      (4L, "Indeed VERBOTEN! appears loudly in here. More text follows in sentence two. Third sentence closes the set."),
      (5L, "Only two sentences live here today. The second one ends the document!")) // < 3 marks
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Filter(docs, blockedWords = Seq("Verboten"))
    val r = out.collect().map(x => x.getAs[Long]("doc_id") -> x).toMap

    assert(r(1L).getAs[Long]("n_lines") == 1L)
    assert(r(1L).getAs[Long]("n_lines_kept") == 1L)
    assert(r(1L).getAs[Long]("n_sentences") == 3L)
    assert(r(1L).getAs[Boolean]("keep"))

    assert(r(2L).getAs[Boolean]("has_lorem") && !r(2L).getAs[Boolean]("keep"))
    // the lorem LINE is still kept in clean_text (page rule reads the original)
    assert(r(2L).getAs[Long]("n_lines_kept") == 2L)

    assert(r(3L).getAs[Boolean]("has_brace") && !r(3L).getAs[Boolean]("keep"))
    // the brace line ends in ';' → not kept as a line either
    assert(r(3L).getAs[Long]("n_lines_kept") == 1L)

    // blocked word hits through case and punctuation via the token model;
    // regression pin: a non-empty list must resolve against the renamed
    // text column (was an unresolved-column AnalysisException)
    assert(r(4L).getAs[Boolean]("has_bad_word") && !r(4L).getAs[Boolean]("keep"))
    assert(r(4L).getAs[Long]("n_sentences") == 4L) // ! counts as a mark too
    assert(!r(1L).getAs[Boolean]("has_bad_word"))

    assert(r(5L).getAs[Long]("n_sentences") == 2L && !r(5L).getAs[Boolean]("keep"))

    // plan: one kernel pass + projection — zero exchanges
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("c4Filter: minSentences boundary is inclusive") {
    val docs = Seq((1L, "Two marks only right here today. Second sentence ends it all now!"))
      .toDF("doc_id", "text")
    assert(!TextAnalysis.c4Filter(docs, minSentences = 3).collect()(0).getAs[Boolean]("keep"))
    assert(TextAnalysis.c4Filter(docs, minSentences = 2).collect()(0).getAs[Boolean]("keep"))
  }

  test("c4FilterFromFile: one-token-per-line blocklist, comments and case folded") {
    val f = java.nio.file.Files.createTempFile("badwords", ".txt")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      "# the published lists ship one token per line",
      "  Verboten  ", "", "forbidden", "verboten"))  // dup + blank + comment
    val docs = Seq(
      (1L, "This page mentions verboten content in its first sentence here. " +
        "It keeps going with more words now. And a third sentence closes it."),
      (2L, "This page is perfectly clean in its first sentence right here. " +
        "It keeps going with more words now. And a third sentence closes it."))
      .toDF("doc_id", "text")
    val words = TextAnalysis.loadBlockedWords(spark, f.toString)
    assert(words == Seq("verboten", "forbidden"), words.toString)
    val out = TextAnalysis.c4FilterFromFile(docs, f.toString)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("has_bad_word") && !out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("has_bad_word") && out(2L).getAs[Boolean]("keep"))
    java.nio.file.Files.delete(f)
  }
}
