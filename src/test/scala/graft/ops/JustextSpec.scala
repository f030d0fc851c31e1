package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** jusText block-level boilerplate (Pomikálek 2011): block segmentation,
  * context-free classification (link density / length / stopword
  * density / ©), and the two context-sensitive revise passes. Hand-built
  * pages with known classifications; the cross-engine hash gate is
  * q_boilerplate_blocks in SparkEntry.
  */
class JustextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodPara =
    "<p>it is the case that the run was good and it is the case that the run " +
      "was good and it is the case that the run was good and it is the case " +
      "that the run was good and it is the case that the run was good and so on.</p>"

  private def classesOf(html: String): Seq[(Long, String, String)] =
    Html.justextBlocks(Seq((1L, html)).toDF("doc_id", "html"))
      .orderBy("block_idx")
      .select("block_idx", "cf_class", "final_class")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("context-free: long stopword-dense prose is GOOD, nav links are BAD") {
    val html = goodPara +
      "<div><a href=\"/a\">home page link text here</a> " +
      "<a href=\"/b\">about us page link text</a> go to the next pages now.</div>"
    val r = classesOf(html)
    assert(r(0)._2 == "good" && r(0)._3 == "good")
    assert(r(1)._2 == "bad" && r(1)._3 == "bad", s"nav must be bad: ${r(1)}")
    // the LINE rule would have kept the nav (ends in '.', >= 5 words) —
    // the disagreement the block upgrade exists for
    val lineKept = Html.dropBoilerplateLines(
      Html.extractText(Seq((1L, html)).toDF("doc_id", "html"))).collect()(0)
      .getAs[String]("text")
    assert(lineKept.contains("go to the next pages now."),
      "line rule keeps the nav; block rule must not")
  }

  test("short block between GOOD neighbors inherits GOOD; between BAD stays BAD") {
    val nav = "<div><a href=\"/a\">home page link text goes here</a> " +
      "<a href=\"/b\">more link text for density</a> filler.</div>"
    val html = goodPara + "<p>in short yes</p>" + goodPara +
      nav + "<p>tiny note here</p>" + nav
    val r = classesOf(html)
    assert(r(1)._2 == "short" && r(1)._3 == "good",
      s"short between goods must become good: ${r(1)}")
    assert(r(4)._2 == "short" && r(4)._3 == "bad",
      s"short between bads must stay bad: ${r(4)}")
    // line rule drops 'in short yes' (3 words, no terminal punctuation):
    // the second disagreement direction
    val lineKept = Html.dropBoilerplateLines(
      Html.extractText(Seq((1L, html)).toDF("doc_id", "html"))).collect()(0)
      .getAs[String]("text")
    assert(!lineKept.contains("in short yes"))
  }

  test("neargood revise: bad/bad context demotes, any good neighbor promotes") {
    // 16 words, 5 stopword hits (the, and, with, on, they) = 0.3125 in
    // [0.30, 0.32) -> NEAR-GOOD context-free; length >= 70 chars
    val nearGood = "<p>the cat and dog ran with mouse on mats they all " +
      "sat very well here now</p>"
    assert(nearGood.length - 7 >= 70)
    val nav = "<div><a href=\"/a\">home page link text goes here</a> " +
      "<a href=\"/b\">more link text for density</a> filler.</div>"
    val promoted = classesOf(goodPara + nearGood + nav)
    assert(promoted(1)._2 == "neargood" && promoted(1)._3 == "good", promoted(1).toString)
    val demoted = classesOf(nav + nearGood + nav)
    assert(demoted(1)._2 == "neargood" && demoted(1)._3 == "bad", demoted(1).toString)
  }

  test("short next to a neargood on the bad side promotes (the jusText mixed rule)") {
    // layout: good, short, neargood, nav(bad): the short's good/bad
    // neighbors are (good, bad) — mixed — but the nearest non-short
    // block on its BAD side is NEAR-GOOD, so jusText promotes it
    val nearGood = "<p>the cat and dog ran with mouse on mats they all " +
      "sat very well here now</p>"
    val nav = "<div><a href=\"/a\">home page link text goes here</a> " +
      "<a href=\"/b\">more link text for density</a> filler.</div>"
    val r = classesOf(goodPara + "<p>tiny note</p>" + nearGood + nav)
    assert(r(1)._2 == "short" && r(1)._3 == "good", r(1).toString)
    // with the neargood replaced by a BAD block, the same shape demotes
    val r2 = classesOf(goodPara + "<p>spacer text paragraph</p>".replace(
      "spacer text paragraph", "x1 x2 x3 x4 x5 x6 x7 x8 x9 xa xb xc xd xe xf " +
        "xg xh xi xj xk xl xm xn xo xp xq xr xs xt xu") + "<p>tiny note</p>" + nav)
    assert(r2(2)._2 == "short" && r2(2)._3 == "bad", r2(2).toString)
  }

  test("© and link-bearing short blocks are BAD; empty blocks vanish; densities exact") {
    val html = goodPara +
      "<p>© 2020 the company and all of the rights that are held by it remain.</p>" +
      "<p><a href=\"/x\">tiny</a></p><p></p><p>   </p>"
    val stats = Html.justextBlocks(Seq((1L, html)).toDF("doc_id", "html"))
      .orderBy("block_idx").collect()
    assert(stats.length == 3, "empty/whitespace blocks must not survive segmentation")
    assert(stats(1).getAs[String]("cf_class") == "bad", "© rule")
    // short AND link-bearing -> bad even though < 70 chars
    assert(stats(2).getAs[String]("cf_class") == "bad")
    // exact densities: integer ratios
    val good = stats(0)
    assert(good.getAs[Long]("link_chars") == 0L)
    assert(good.getAs[Double]("stop_density") > 0.32)
  }

  test("row-local kernel (Justext.goodText) equals the relational form on varied pages") {
    // the ingest path runs the kernel; the gate/oracle run the windows —
    // they must never diverge. Sweep structurally varied pages incl.
    // same-class runs, edge blocks, all-bad and empty pages.
    val nav = "<div><a href=\"/a\">home page link text goes here</a> " +
      "<a href=\"/b\">more link text for density</a> filler.</div>"
    val nearGood = "<p>the cat and dog ran with mouse on mats they all " +
      "sat very well here now</p>"
    val pages = Seq(
      goodPara + "<p>in short yes</p>" + goodPara + nav + "<p>tiny</p>" + nav,
      nav + nearGood + nav,
      goodPara + "<p>a</p><p>b</p><p>c</p>" + goodPara,
      "<p>short one</p><p>short two</p>",
      nearGood + nearGood + nearGood,
      goodPara + "<p>tiny note</p>" + nearGood + nav,
      "<head><title>x</title></head><script>var a=1;</script>" + goodPara,
      "", "<p></p>", "plain text with no tags at all here")
    val df = pages.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    val relational = Html.dropBoilerplateBlocks(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((h, i) <- pages.zipWithIndex) {
      val kernel = Justext.goodText(h)
      // dropBoilerplateBlocks emits no row for pages with zero good
      // blocks; the kernel emits "" — same contract
      assert(kernel == relational.getOrElse(i.toLong, ""),
        s"kernel vs relational diverge on page $i: '$kernel' vs '${relational.get(i.toLong)}'")
    }
  }

  test("kernel is O(n) in blocks: a 100k-short-block page finishes fast") {
    // the review finding: per-block neighbor rescans made an all-short
    // page quadratic; with prefix/suffix arrays this must be instant
    val page = "<p>x</p>" * 100000
    val t0 = System.nanoTime()
    val out = Justext.goodText(page)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "all-short page must not be quadratic")
    assert(out == "", "all-short page between bad edges keeps nothing")
  }

  test("dropBoilerplateBlocks keeps GOOD text only, order-preserving") {
    val html = goodPara + "<p>in short yes</p>" + goodPara +
      "<div><a href=\"/a\">home page link text goes here</a> " +
      "<a href=\"/b\">more link text for density</a> filler.</div>"
    val r = Html.dropBoilerplateBlocks(Seq((7L, html)).toDF("doc_id", "html"))
      .collect()(0)
    val txt = r.getAs[String]("text")
    assert(txt.contains("in short yes"), "promoted short survives")
    assert(!txt.contains("filler"), "nav dropped")
    val lines = txt.split("\n")
    assert(lines.length == 3 && lines(1) == "in short yes", "order preserved")
  }
}
