package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.TextKernel

class GopherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gopherStats golden: hand-computed counters") {
    // [nWords, wordChars, alphaWords, nHash, nEllipsis, nLines,
    //  bulletLines, ellipsisEndLines, stopDistinct]
    assert(TextKernel.gopherStats("one two three").toSeq ==
      Seq(3L, 11L, 3L, 0L, 0L, 1L, 0L, 0L, 0L))
    val b = "- bullet item\n* another\nnormal line...\nthe #tag of and that 99 ...\n…"
    assert(TextKernel.gopherStats(b).toSeq ==
      Seq(15L, 54L, 10L, 1L, 3L, 5L, 2L, 3L, 4L))
    // astral chars count as ONE code point (DuckDB length semantics);
    // math-alphabet letters are NOT [A-Za-z]
    assert(TextKernel.gopherStats("𝒜𝒜 b").toSeq ==
      Seq(2L, 3L, 1L, 0L, 0L, 1L, 0L, 0L, 0L))
    // empty text: split("") is one empty line, zero words
    assert(TextKernel.gopherStats("").toSeq ==
      Seq(0L, 0L, 0L, 0L, 0L, 1L, 0L, 0L, 0L))
    // non-overlapping ellipsis scan: 4 dots = one match; 6 dots = two
    assert(TextKernel.gopherStats("....")(4) == 1L)
    assert(TextKernel.gopherStats("......")(4) == 2L)
    // stopwords hit through punctuation/case via the alnum token model
    assert(TextKernel.gopherStats("The, cat OF dog. the")(8) == 2L)
  }

  test("gopherFilter: rule verdicts and keep on a tiny corpus") {
    val good = ((1 to 12).flatMap(i =>
      Seq("the", "quick", "brown", "foxes", "jumped", "over")) ++
      Seq("lazy", "dogs", "that", "have", "been", "with", "us")).mkString(" ")
    val docs = Seq(
      (1L, good),                      // 79 words, stop-rich, clean → keep
      (2L, "too short to pass"),       // fails rule_words
      (3L, Seq.fill(60)("#9").mkString(" "))) // symbol + alpha + stop fails
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherFilter(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"), r(1L).toString)
    assert(!r(2L).getAs[Boolean]("rule_words") && !r(2L).getAs[Boolean]("keep"))
    val d3 = r(3L)
    assert(!d3.getAs[Boolean]("rule_symbol") && !d3.getAs[Boolean]("rule_alpha")
      && !d3.getAs[Boolean]("rule_stop") && !d3.getAs[Boolean]("keep"))
    assert(d3.getAs[Boolean]("rule_bullet") && d3.getAs[Boolean]("rule_ellipsis"))
    // plan: zero exchanges — one kernel pass + projection
    val p = TextAnalysis.gopherFilter(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
