package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's golden text-splitting tests
  * (tests/test_ai_utils/test_text_splitting.py:9-39) plus seeded-random
  * splitter properties (SURVEY.md §5 plan item 2).
  */
class TextSplitterSpec extends AnyFunSuite {

  val sample1: String =
    """Lorem ipsum dolor sit amet, consectetur adipiscing elit.
      |    Morbi ornare magna et urna volutpat, ut fermentum velit tincidunt.
      |    Aliquam erat volutpat. Nam erat mi, porta eu scelerisque sed, pharetra eget quam.
      |    Sed aliquet massa purus, vel sagittis libero fermentum nec.
      |    Donec placerat leo in tortor semper, sit amet venenatis ipsum tincidunt. Fusce at porttitor orci.
      |    Donec nibh diam, consectetur a sagittis eu, laoreet vitae erat.
      |    Aliquam bibendum dolor sed ornare aliquet. Aliquam sodales,
      |    felis nec aliquet condimentum, sem lacus placerat est...""".stripMargin
  val sample2: String = sample1 + "\n\n    Test."

  test("naive token counter matches reference golden values 143/146") {
    assert(NaiveTokenCounter.count(sample1) == 143)
    assert(NaiveTokenCounter.count(sample2) == 146)
  }

  test("dummy length calculator returns char length") {
    assert(CharLengthCounter.count(sample1) == sample1.length)
  }

  test("long text splits into more than one chunk under a small budget") {
    // reference test_django_converter.py:24-34 shape: 1000 chars, budget 100
    val text = (1 to 200).map(i => s"word$i").mkString(" ")
    val splitter = new RecursiveCharacterTextSplitter(100, 10, CharLengthCounter.count)
    val chunks = splitter.splitText(text)
    assert(chunks.length > 1)
    assert(chunks.forall(_.length <= 100))
  }

  test("splitter prefers paragraph, then newline, then space separators") {
    val text = "para one is here\n\npara two is here\n\npara three"
    val splitter = new RecursiveCharacterTextSplitter(20, 0, CharLengthCounter.count)
    val chunks = splitter.splitText(text)
    assert(chunks.contains("para one is here"))
    assert(chunks.contains("para two is here"))
  }

  test("identity on short text") {
    val splitter = new RecursiveCharacterTextSplitter(1000, 100, NaiveTokenCounter.count)
    assert(splitter.splitText("short text") == Seq("short text"))
  }

  test("dummy splitter is identity") {
    assert(DummySplitter.splitText(sample1) == Seq(sample1))
  }

  test("chunk overlap carries tail content forward") {
    val text = (1 to 40).map(i => f"w$i%02d").mkString(" ")
    val splitter = new RecursiveCharacterTextSplitter(40, 20, CharLengthCounter.count)
    val chunks = splitter.splitText(text)
    assert(chunks.length > 1)
    // with overlap, consecutive chunks share some words
    val shared = chunks.sliding(2).count {
      case Seq(a, b) => a.split(" ").toSet.intersect(b.split(" ").toSet).nonEmpty
      case _ => false
    }
    assert(shared > 0)
  }

  private def randomWordText(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(120)
    (0 until n).map(_ => (1 to 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
  }

  test("property: chunks are non-empty, trimmed, and within budget (char length)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val text = randomWordText(rnd)
      val budget = 10 + rnd.nextInt(50)
      val splitter = new RecursiveCharacterTextSplitter(budget, budget / 4, CharLengthCounter.count)
      val chunks = splitter.splitText(text)
      assert(chunks.forall(c => c.nonEmpty && c == c.trim))
      // single words ≤ 9 chars < budget ⇒ every chunk fits the budget
      assert(chunks.forall(_.length <= budget))
    }
  }

  test("property: every input word appears in some chunk") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val text = randomWordText(rnd)
      val splitter = new RecursiveCharacterTextSplitter(30, 0, CharLengthCounter.count)
      val chunks = splitter.splitText(text)
      val inputWords = text.split(" ").filter(_.nonEmpty).toSet
      val outputWords = chunks.flatMap(_.split(" ")).filter(_.nonEmpty).toSet
      assert(inputWords.subsetOf(outputWords))
    }
  }
}
