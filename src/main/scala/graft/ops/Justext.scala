package graft.ops

/** Row-local jusText (Pomikálek 2011) — the same segmentation,
  * context-free classification and two revise passes as the relational
  * [[Html.justextBlocks]] (JustextSpec pins them EQUAL on the gate
  * fixture), as a pure per-document function for the crawl front door:
  * every step is doc-local, so running it in-row keeps
  * [[Crawl.ingest]]'s one-exchange plan — the 100 TB shape — where the
  * relational form (explode + doc-keyed windows + regroup) would add
  * three. The relational twin exists because the DuckDB oracle replays
  * windows, not JVM loops; this kernel exists because the ingest path
  * must not pay exchanges for per-row work.
  */
object Justext {

  final case class Block(text: String, nChars: Int, nWords: Int, nStop: Int,
                         linkChars: Int, cfClass: String, finalClass: String)

  private val preRes = Html.StripPasses.take(4).map(p => java.util.regex.Pattern.compile(p._1))
  private val blockRe = java.util.regex.Pattern.compile(Html.StripPasses(4)._1)
  private val tagRe = java.util.regex.Pattern.compile("<[^>]*>")
  private val wsRe = java.util.regex.Pattern.compile("[ \\t\\r\\n]+")
  private val anchorRe = java.util.regex.Pattern.compile(Html.AnchorRe)
  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Html.JustextStopwords.foreach(s.add)
    s
  }

  private def clean(s: String): String = {
    var t = tagRe.matcher(s).replaceAll(" ")
    for ((from, to) <- Html.EntityPasses) t = t.replace(from, to)
    wsRe.matcher(t).replaceAll(" ").trim
  }

  /** Segment + classify one page — the [[Html.justextBlocks]] logic as a
    * single in-row pass. Returns surviving (non-empty) blocks in page
    * order with context-free and final classes.
    */
  def blocks(html: String): Array[Block] = {
    var pre = html
    for (re <- preRes) pre = re.matcher(pre).replaceAll(" ")
    val raws = blockRe.matcher(pre).replaceAll("\n").split("\n", -1)
    val bs = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (raw <- raws) {
      val text = clean(raw)
      if (text.nonEmpty) {
        val words = graft.functions.TextKernel.tokens(text)
        var nStop = 0
        for (w <- words) if (stopSet.contains(w)) nStop += 1
        var linkChars = 0
        val m = anchorRe.matcher(raw)
        while (m.find()) linkChars += clean(m.group(2)).length
        val nChars = text.length
        val ld = linkChars.toDouble / nChars
        val sd = nStop.toDouble / math.max(words.length, 1)
        val cf =
          if (ld > Html.MaxLinkDensity) "bad"
          else if (text.contains("©")) "bad"
          else if (nChars < Html.LengthLow) { if (linkChars > 0) "bad" else "short" }
          else if (sd >= Html.StopwordsHigh) { if (nChars > Html.LengthHigh) "good" else "neargood" }
          else if (sd >= Html.StopwordsLow) "neargood"
          else "bad"
        bs += Block(text, nChars, words.length, nStop, linkChars, cf, cf)
      }
    }
    val n = bs.length
    // nearest-neighbor classes PRECOMPUTED in one pass per direction
    // (page edges read 'bad') — the running-last_value shape of the
    // relational twin. The former per-block rescan was O(n²): a page of
    // 100k short blocks walked to the edge four times per block (review
    // finding); these prefix/suffix arrays make the kernel O(n).
    def nearest(classes: Int => String, accept: String => Boolean): (Array[String], Array[String]) = {
      val prev = new Array[String](n)
      val next = new Array[String](n)
      var last = "bad"
      var i = 0
      while (i < n) { prev(i) = last; if (accept(classes(i))) last = classes(i); i += 1 }
      last = "bad"
      i = n - 1
      while (i >= 0) { next(i) = last; if (accept(classes(i))) last = classes(i); i -= 1 }
      (prev, next)
    }
    val isGB = (c: String) => c == "good" || c == "bad"
    val nonShort = (c: String) => c != "short"
    // revise pass 1: short blocks over context-free classes
    val (pgb1, ngb1) = nearest(bs(_).cfClass, isGB)
    val (pns1, nns1) = nearest(bs(_).cfClass, nonShort)
    val c2 = Array.tabulate(n) { i =>
      val cf = bs(i).cfClass
      if (cf != "short") cf
      else if (pgb1(i) == "good" && ngb1(i) == "good") "good"
      else if (pgb1(i) == "bad" && ngb1(i) == "bad") "bad"
      else if ((pgb1(i) == "bad" && pns1(i) == "neargood") ||
               (ngb1(i) == "bad" && nns1(i) == "neargood")) "good"
      else "bad"
    }
    // revise pass 2: neargood over the short-resolved classes
    val (pgb2, ngb2) = nearest(c2(_), isGB)
    val fin = Array.tabulate(n) { i =>
      if (c2(i) != "neargood") c2(i)
      else if (pgb2(i) == "bad" && ngb2(i) == "bad") "bad"
      else "good"
    }
    Array.tabulate(n)(i => bs(i).copy(finalClass = fin(i)))
  }

  /** GOOD-block page text, one line per block, page order — the in-row
    * twin of [[Html.dropBoilerplateBlocks]].
    */
  def goodText(html: String): String = {
    val sb = new java.lang.StringBuilder()
    for (b <- blocks(html); if b.finalClass == "good") {
      if (sb.length > 0) sb.append('\n')
      sb.append(b.text)
    }
    sb.toString
  }
}
