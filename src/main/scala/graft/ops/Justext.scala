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
    // nearest neighbor scans (page edges read 'bad'), over cf classes
    def neighbor(i: Int, step: Int, classes: Int => String,
                 accept: String => Boolean): String = {
      var j = i + step
      while (j >= 0 && j < n && !accept(classes(j))) j += step
      if (j >= 0 && j < n) classes(j) else "bad"
    }
    val isGB = (c: String) => c == "good" || c == "bad"
    val nonShort = (c: String) => c != "short"
    // revise pass 1: short blocks over context-free classes
    val c2 = Array.tabulate(n) { i =>
      val cf = bs(i).cfClass
      if (cf != "short") cf
      else {
        val pgb = neighbor(i, -1, bs(_).cfClass, isGB)
        val ngb = neighbor(i, +1, bs(_).cfClass, isGB)
        if (pgb == "good" && ngb == "good") "good"
        else if (pgb == "bad" && ngb == "bad") "bad"
        else if ((pgb == "bad" && neighbor(i, -1, bs(_).cfClass, nonShort) == "neargood") ||
                 (ngb == "bad" && neighbor(i, +1, bs(_).cfClass, nonShort) == "neargood")) "good"
        else "bad"
      }
    }
    // revise pass 2: neargood over the short-resolved classes
    val fin = Array.tabulate(n) { i =>
      if (c2(i) != "neargood") c2(i)
      else {
        val pgb = neighbor(i, -1, c2(_), isGB)
        val ngb = neighbor(i, +1, c2(_), isGB)
        if (pgb == "bad" && ngb == "bad") "bad" else "good"
      }
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
