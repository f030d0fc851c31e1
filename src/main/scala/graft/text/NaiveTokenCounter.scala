package graft.text

import java.util.regex.Pattern

/** Naive token-count estimator: ceil(max(ceil(chars/4), ceil(words*0.75))).
  *
  * Behavioral port of the reference's NaiveTextSplitterCalculator
  * (ai_utils/text_splitting/naive.py:31-55): words are matches of the regex
  * `[^\w\s]|\w+` (a word run OR a single non-word-non-space char). Golden
  * values: 143 / 146 for the two lorem fixtures
  * (tests/test_ai_utils/test_text_splitting.py:30-39).
  *
  * Note: we use ASCII `\w` semantics (Java default, same as RE2/DuckDB) so the
  * SQL oracle `ceil(greatest(ceil(length(t)/4), ceil(len(regexp_extract_all(
  * t,'[^\w\s]|\w+'))*0.75)))` matches exactly; the reference's Python `\w` is
  * Unicode — divergence only on non-ASCII word chars.
  */
object NaiveTokenCounter {
  private val wordPattern = Pattern.compile("[^\\w\\s]|\\w+")

  def wordCount(text: String): Int = {
    val m = wordPattern.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def count(text: String): Int = {
    val tokenCharCount = math.ceil(text.length / 4.0)
    val tokenWordCount = math.ceil(wordCount(text) * 0.75)
    math.ceil(math.max(tokenCharCount, tokenWordCount)).toInt
  }
}

/** Identity length calculator (reference text_splitting/dummy.py:24-26). */
object CharLengthCounter {
  def count(text: String): Int = text.length
}
