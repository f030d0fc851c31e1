package graft.text

import scala.collection.mutable.ArrayBuffer

/** Recursive character text splitter — behavioral port of the reference's
  * vendored LangChain splitter (ai_utils/text_splitting/langchain.py:59-177;
  * MIT-licensed LangChain algorithm, reimplemented in Scala).
  *
  * Semantics (matched precisely; pinned by golden tests):
  *  - separators tried in order: "\n\n", "\n", " ", "" (char-split last);
  *  - a piece whose length (per `lengthFn`) is < chunkSize is a "good split";
  *    over-long pieces are recursively split with the remaining separators;
  *  - good splits are greedily merged up to chunkSize, joined WITH the
  *    separator, keeping a sliding-overlap tail of up to `chunkOverlap`;
  *  - merged chunks are whitespace-stripped; empty chunks dropped;
  *  - a chunk can exceed chunkSize when a single unsplittable piece does
  *    (the reference logs a warning rather than failing).
  *
  * `lengthFn` defaults to [[NaiveTokenCounter.count]] — the reference drives
  * chunk_size in TOKENS with this estimator (storage/django.py:292-295).
  */
final class RecursiveCharacterTextSplitter(
    val chunkSize: Int,
    val chunkOverlap: Int = 100,
    val lengthFn: String => Int = NaiveTokenCounter.count,
    val separators: Seq[String] = Seq("\n\n", "\n", " ", "")
) extends Serializable {

  def splitText(text: String): Seq[String] = splitRec(text, separators)

  /** Split on a literal separator; empty separator = per-character split;
    * empty pieces removed (langchain.py:40-56, keep_separator=False path).
    */
  private def splitWithSeparator(text: String, separator: String): Seq[String] = {
    val splits =
      if (separator.isEmpty) text.map(_.toString)
      else splitLiteralNoLimit(text, separator)
    splits.filter(_.nonEmpty)
  }

  /** Python re.split(sep, text) with a literal separator: keeps interior and
    * trailing empty strings (filtered by caller), no limit. Scala's
    * String.split drops trailing empties by default, so implement manually.
    */
  private def splitLiteralNoLimit(text: String, sep: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var start = 0
    var idx = text.indexOf(sep, start)
    while (idx >= 0) {
      out += text.substring(start, idx)
      start = idx + sep.length
      idx = text.indexOf(sep, start)
    }
    out += text.substring(start)
    out.toSeq
  }

  private def splitRec(text: String, seps: Seq[String]): Seq[String] = {
    val finalChunks = ArrayBuffer.empty[String]
    // Pick the first separator present in the text; remember the rest.
    var separator = seps.last
    var newSeparators: Seq[String] = Nil
    var i = 0
    var found = false
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty) { separator = s; found = true }
      else if (text.contains(s)) { separator = s; newSeparators = seps.drop(i + 1); found = true }
      i += 1
    }

    val splits = splitWithSeparator(text, separator)
    val goodSplits = ArrayBuffer.empty[String]
    for (s <- splits) {
      if (lengthFn(s) < chunkSize) goodSplits += s
      else {
        if (goodSplits.nonEmpty) {
          finalChunks ++= mergeSplits(goodSplits.toSeq, separator)
          goodSplits.clear()
        }
        if (newSeparators.isEmpty) finalChunks += s
        else finalChunks ++= splitRec(s, newSeparators)
      }
    }
    if (goodSplits.nonEmpty) finalChunks ++= mergeSplits(goodSplits.toSeq, separator)
    finalChunks.toSeq
  }

  /** Greedy merge with sliding overlap tail (langchain.py:128-168). */
  private def mergeSplits(splits: Seq[String], separator: String): Seq[String] = {
    val separatorLen = lengthFn(separator)
    val docs = ArrayBuffer.empty[String]
    var currentDoc = Vector.empty[String]
    var total = 0
    for (d <- splits) {
      val len = lengthFn(d)
      if (total + len + (if (currentDoc.nonEmpty) separatorLen else 0) > chunkSize) {
        if (currentDoc.nonEmpty) {
          joinDocs(currentDoc, separator).foreach(docs += _)
          // Pop from the front while over the overlap budget, or while the
          // next piece still wouldn't fit.
          var continue = true
          while (continue && (total > chunkOverlap ||
                 (total + len + (if (currentDoc.nonEmpty) separatorLen else 0) > chunkSize && total > 0))) {
            if (currentDoc.isEmpty) continue = false
            else {
              total -= lengthFn(currentDoc.head) + (if (currentDoc.length > 1) separatorLen else 0)
              currentDoc = currentDoc.tail
            }
          }
        }
      }
      currentDoc = currentDoc :+ d
      total += len + (if (currentDoc.length > 1) separatorLen else 0)
    }
    joinDocs(currentDoc, separator).foreach(docs += _)
    docs.toSeq
  }

  private def joinDocs(docs: Seq[String], separator: String): Option[String] = {
    val text = docs.mkString(separator).trim
    if (text.isEmpty) None else Some(text)
  }
}

/** Identity splitter — reference test fixture (text_splitting/dummy.py:9-21). */
object DummySplitter extends Serializable {
  def splitText(text: String): Seq[String] = Seq(text)
}
