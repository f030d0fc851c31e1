package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): (String, Long, String) = {
    val r = Html.extractText(Seq((1L, html)).toDF("doc_id", "html")).head()
    (r.getAs[String]("title"), r.getAs[Long]("n_links"), r.getAs[String]("text"))
  }

  test("golden extraction: tags strip, blocks break lines, entities decode once") {
    val html = "<html><head><title> My &amp; Page </title>" +
      "<style>body{color:red}</style></head><body>" +
      "<script>if(1<2){alert(\"x\")}</script>" +
      "<h1 class=\"big\">Head</h1><p>one two</p><p>three</p>" +
      "<div>link <a href=\"http://a/\">here</a> &lt;kept&gt; &amp;lt;</div>" +
      "<!-- secret --></body></html>"
    val (title, nLinks, text) = extract(html)
    assert(title == "My & Page")
    assert(nLinks == 1L)
    // script/style/comment content gone, block tags became line breaks,
    // inline tags became spaces, entities decoded exactly one level
    assert(text == "Head\none two\nthree\nlink here <kept> &lt;")
  }

  test("script strip runs before the generic tag strip (raw < inside script)") {
    // the generic <[^>]*> pass would eat "<2){..." as a tag and leave script
    // residue; the dedicated pass must remove the whole block first
    val (_, _, text) = extract("<p>a</p><script>for(i=0;i<2;i++){x(\"<b>\")}</script><p>b</p>")
    assert(text == "a\nb")
  }

  test("whitespace normalizes: pretty-printed and minified extract equally") {
    val pretty = "<body>\n  <p>\n    alpha   beta\n  </p>\n  <p>gamma</p>\n</body>"
    val minified = "<body><p>alpha beta</p><p>gamma</p></body>"
    assert(extract(pretty)._3 == extract(minified)._3)
    assert(extract(pretty)._3 == "alpha beta\ngamma")
  }

  test("title absent -> empty string; no-markup text passes through") {
    val (title, nLinks, text) = extract("just plain text.")
    assert(title == "" && nLinks == 0L && text == "just plain text.")
  }

  test("hostile input never throws: unterminated script swallows the tail") {
    // .*? with no closing </script> matches nothing -> the generic strip
    // removes the tag tokens; content is garbage-in garbage-out but no error
    val rows = Seq(
      (1L, "<script>never closed"),
      (2L, "<"), (3L, ">"), (4L, ""),
      (5L, "<p" /* unterminated tag */),
      (6L, "&amp;&amp;&unknown;"))
      .toDF("doc_id", "html")
    val out = Html.extractText(rows).collect()
    assert(out.length == 6)
    // one decode level only; unknown entities stay verbatim
    assert(out.find(_.getLong(0) == 6L).get.getAs[String]("text") == "&&&unknown;")
  }

  test("null html row yields null outputs, not an exception") {
    val rows = Seq((1L, Option.empty[String]), (2L, Some("<p>x y z</p>")))
      .toDF("doc_id", "html")
    val out = Html.extractText(rows).orderBy("doc_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("text")))
    assert(out(1).getAs[String]("text") == "x y z")
  }

  test("boilerplate filter: short unpunctuated lines drop, prose survives") {
    val extracted = Seq((1L,
      "Home\nAbout Us\nThis is a real sentence with plenty of words in it\nShort but ends.\nBuy now"))
      .toDF("doc_id", "text")
    val kept = Html.dropBoilerplateLines(extracted).head().getAs[String]("text")
    assert(kept == "This is a real sentence with plenty of words in it\nShort but ends.")
  }

  test("boilerplate filter on all-boilerplate doc yields empty text") {
    val kept = Html.dropBoilerplateLines(Seq((1L, "Home\nNav\nMenu")).toDF("doc_id", "text"))
      .head().getAs[String]("text")
    assert(kept == "")
  }

  test("extraction is a zero-exchange projection (scan-speed at any scale)") {
    val df = Html.extractText(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("html", concat(lit("<p>"), col("text"), lit("</p>"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
