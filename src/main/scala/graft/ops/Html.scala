package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the FRONT END of a crawled-corpus
  * pipeline (raw markup in, clean text out), feeding the downstream stages
  * this engine already ships (langID → quality → dedup → pack).
  *
  * The reference indexes CMS-rendered rich text, so its pipeline starts from
  * clean text; a 100 TB Common-Crawl-scale corpus starts from raw HTML.
  * This module is the markup-removal step equivalent to what trafilatura /
  * jusText do in Python pipelines, re-expressed as DETERMINISTIC sequential
  * regex/replace passes so the DuckDB oracle can replay extraction verbatim
  * (same discipline as [[TextAnalysis.redactPii]]): every pattern stays in
  * the Java-regex ∩ RE2 common subset (inline `(?is)` flags, lazy
  * quantifiers, char classes, ASCII `\b` — all identical in both engines).
  *
  * Scale posture: pure per-row codegen'd projections — zero exchanges, scan
  * speed at any corpus size; column pruning means the html column is read
  * only when extraction is in the plan.
  */
object Html {

  /** Tag-strip passes, applied IN ORDER (each sees the prior pass's output):
    * the whole `<head>` drops first (title/meta/style live there — title is
    * surfaced separately by [[titleColumn]]), then script/style/comment
    * blocks drop wholesale (their character data is code, not prose —
    * keeping it poisons quality/langID downstream; body scripts exist, so
    * these passes are needed even after the head drop), block
    * boundaries become newlines BEFORE the generic tag strip erases them
    * (so paragraph structure survives for line-level boilerplate filtering),
    * and every remaining tag becomes a space.
    */
  val StripPasses: Seq[(String, String)] = Seq(
    ("(?is)<head\\b[^>]*>.*?</head>", " "),
    ("(?is)<script\\b[^>]*>.*?</script>", " "),
    ("(?is)<style\\b[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    ("(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|header|footer|nav)\\b[^>]*/?>", "\n"),
    ("<[^>]*>", " "))

  /** Entity decode as LITERAL replaces (exact `replace()` in both engines),
    * `&amp;` strictly LAST: decoding everything else first means the escaped
    * escape `&amp;lt;` yields the literal text `&lt;` (one decode level),
    * never `<` (double decode) — and because decode runs AFTER tag strip, a
    * decoded `<` can never be re-interpreted as markup.
    */
  val EntityPasses: Seq[(String, String)] = Seq(
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"))

  /** Whitespace normalization after strip+decode: horizontal runs collapse
    * to one space, space hugging a newline drops, newline runs collapse,
    * and the ends trim — so extraction output is stable under arbitrary
    * source formatting (pretty-printed vs minified HTML extract equally).
    */
  val SpacePasses: Seq[(String, String)] = Seq(
    ("[ \\t\\r]+", " "),
    (" ?\\n ?", "\n"),
    ("\\n+", "\n"),
    ("^\\n|\\n$", ""))

  /** The full extraction pipeline over one string column. */
  def extractColumn(html: Column): Column = {
    val stripped = StripPasses.foldLeft(html) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }
    val decoded = EntityPasses.foldLeft(stripped) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    SpacePasses.foldLeft(decoded) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }
  }

  /** `<title>` text (first match, entity-decoded + space-normalized), empty
    * string when absent.
    */
  def titleColumn(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1)
    val decoded = EntityPasses.foldLeft(raw) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, lit("[ \\t\\r\\n]+"), lit(" ")))
  }

  /** Extract (title, text, n_links) from an HTML column. `n_links` (anchor
    * count) is the raw signal link-density boilerplate heuristics use.
    */
  def extractText(docs: DataFrame, htmlCol: String = "html",
                  idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      titleColumn(col(htmlCol)).as("title"),
      regexp_count(col(htmlCol), lit("(?i)<a\\b")).cast("long").as("n_links"),
      extractColumn(col(htmlCol)).as("text"))

  /** jusText-lite line-level boilerplate filter over EXTRACTED text: a line
    * survives when it has at least `minWords` words OR ends in terminal
    * punctuation (navigation crumbs / button labels are short and
    * unpunctuated; prose sentences are either long or end in `.!?`).
    * Order-preserving by construction — the line array never explodes, the
    * filter is an array HOF on the row (bounded by the document's own line
    * count), so this too is a zero-exchange projection.
    */
  def dropBoilerplateLines(extracted: DataFrame, textCol: String = "text",
                           minWords: Int = 5): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1: $minWords")
    extracted.withColumn(textCol, keptLinesColumn(col(textCol), minWords))
  }

  /** The [[dropBoilerplateLines]] rule as a column (so callers mixing
    * line- and block-filtered rows can apply it per-row).
    */
  def keptLinesColumn(c: Column, minWords: Int = 5): Column =
    array_join(filter(split(c, "\n"),
      ln => regexp_count(ln, lit("[^ ]+")) >= minWords || ln.rlike("[.!?]$")), "\n")

  /** Anchor pattern shared by the Spark extraction and the DuckDB twin
    * (Java-regex ∩ RE2 subset): double-quoted href, lazy inner text.
    */
  val AnchorRe = "(?is)<a\\b[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"

  // ---------------------------------------------------------------- jusText

  /** jusText parameters (Pomikálek 2011 defaults — the published
    * algorithm CCNet-grade corpora run for block-level boilerplate).
    */
  val MaxLinkDensity = 0.2
  val LengthLow = 70
  val LengthHigh = 200
  val StopwordsLow = 0.30
  val StopwordsHigh = 0.32

  /** Function-word list for stopword density. jusText takes the stoplist
    * as a parameter (it ships one per language); this is a compact
    * English default shared VERBATIM with the DuckDB oracle
    * ([[stopwordsSqlList]]). Density denominators use the engine's
    * lower-alnum word tokens, so punctuation never glues to a word
    * (jusText's whitespace split would keep "good." unmatched — a
    * documented, strictly-more-robust divergence).
    */
  val JustextStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "was", "for", "on", "with", "as", "at", "by", "be", "this", "are",
    "from", "but", "not", "have", "had", "he", "she", "they", "we")

  /** The stoplist as a DuckDB list literal. */
  def stopwordsSqlList: String =
    JustextStopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Block-boundary tag pattern — the [[StripPasses]] newline pass. */
  val BlockTagRe: String = StripPasses(4)._1

  /** Per-block text clean shared by block text and anchor-text length:
    * strip remaining (inline) tags, decode entities, collapse
    * whitespace, trim. Head/script/style/comments are gone doc-level
    * before segmentation, so this sees only inline markup.
    */
  private def cleanBlock(c: Column): Column = {
    val stripped = regexp_replace(c, lit("<[^>]*>"), lit(" "))
    val decoded = EntityPasses.foldLeft(stripped) { case (x, (from, to)) =>
      replace(x, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, lit("[ \\t\\r\\n]+"), lit(" ")))
  }

  /** jusText block segmentation + classification (Pomikálek 2011 — the
    * algorithm behind the corpora CCNet-grade pipelines actually ship,
    * upgrading [[dropBoilerplateLines]]' one-line heuristic):
    *
    *  1. SEGMENT: drop head/script/style/comments doc-level, cut the
    *     page at block-level tags, clean each block's text; empty blocks
    *     vanish before any neighbor logic (jusText paragraphs).
    *  2. CONTEXT-FREE classify each block:
    *     link_density > 0.2 → bad; '©' → bad; length < 70 → bad if any
    *     link chars else short; stopword density ≥ 0.32 → good if
    *     length > 200 else neargood; ≥ 0.30 → neargood; else bad.
    *  3. CONTEXT-SENSITIVE revise (the published two passes, exactly):
    *     SHORT blocks take their nearest good/bad neighbors (page edge =
    *     bad): good+good → good, bad+bad → bad, mixed → good only when
    *     the nearest non-short block on a bad side is NEAR-GOOD; then
    *     NEAR-GOOD blocks (over the short-resolved classes) demote to
    *     bad only in bad+bad context. Heading promotion
    *     (max_heading_distance) is NOT implemented — segmentation does
    *     not track the opening tag; documented descope.
    *
    * All neighbor logic is per-document window functions: ONE doc-keyed
    * exchange, then every window reuses the partitioning; blocks are
    * bounded by the page, never the corpus. Returns one row per
    * surviving block: (idCol, block_idx, text, n_chars, n_words,
    * n_stop, link_chars, link_density, stop_density, cf_class,
    * final_class).
    */
  def justextBlocks(docs: DataFrame, htmlCol: String = "html",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pre = StripPasses.take(4).foldLeft(col(htmlCol)) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }
    val raws = split(regexp_replace(pre, lit(BlockTagRe), lit("\n")), "\n")
    // per-block stats are computed HERE, below the doc-keyed window exchange
    // (r19, guide §2.3): the tokenizer/stopword kernels and the per-anchor
    // link-text clean run on the scan side's full parallelism (the window
    // input is tiny, so AQE coalesces the post-shuffle side to ~1 partition
    // — computing them above the exchange serialized exactly the expensive
    // columns), and the exchange then carries the five stat longs instead
    // of the raw block markup
    val blocks = docs
      .select(col(idCol), posexplode(raws).as(Seq("__i0", "__raw")))
      .withColumn("text", cleanBlock(col("__raw")))
      .filter(col("text") =!= "")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_words",
        size(graft.functions.textkernel.word_tokens(col("text"))).cast("long"))
      .withColumn("n_stop",
        graft.functions.textkernel.marker_hits(col("text"), JustextStopwords))
      .withColumn("link_chars", aggregate(
        transform(regexp_extract_all(col("__raw"), lit(AnchorRe), lit(2)),
          x => length(cleanBlock(x))),
        lit(0L), (acc, x) => acc + x))
      .drop("__raw")
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__i0"))
    val stats = blocks
      .withColumn("block_idx", (row_number().over(byDoc) - 1).cast("long"))
      .withColumn("link_density", col("link_chars") / col("n_chars"))
      .withColumn("stop_density", col("n_stop") / greatest(col("n_words"), lit(1L)))
    val cf = stats.withColumn("cf_class",
      when(col("link_density") > MaxLinkDensity, "bad")
        .when(col("text").contains("©"), "bad")
        .when(col("n_chars") < LengthLow,
          when(col("link_chars") > 0, "bad").otherwise("short"))
        .when(col("stop_density") >= StopwordsHigh,
          when(col("n_chars") > LengthHigh, "good").otherwise("neargood"))
        .when(col("stop_density") >= StopwordsLow, "neargood")
        .otherwise("bad"))
    // revise pass 1 (short): nearest context-free good/bad neighbors
    // (page edges read as bad), plus the nearest non-short class for the
    // mixed-context neargood rule
    val ord = Window.partitionBy(col(idCol)).orderBy(col("block_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ordDesc = Window.partitionBy(col(idCol)).orderBy(col("block_idx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    def gb(c: Column) = when(c.isin("good", "bad"), c)
    def nonShort(c: Column) = when(c =!= "short", c)
    val ctx = cf
      .withColumn("__pgb", coalesce(last(gb(col("cf_class")), ignoreNulls = true).over(ord), lit("bad")))
      .withColumn("__ngb", coalesce(last(gb(col("cf_class")), ignoreNulls = true).over(ordDesc), lit("bad")))
      .withColumn("__pany", coalesce(last(nonShort(col("cf_class")), ignoreNulls = true).over(ord), lit("bad")))
      .withColumn("__nany", coalesce(last(nonShort(col("cf_class")), ignoreNulls = true).over(ordDesc), lit("bad")))
    val shortResolved = ctx.withColumn("__c2",
      when(col("cf_class") =!= "short", col("cf_class"))
        .when(col("__pgb") === "good" && col("__ngb") === "good", "good")
        .when(col("__pgb") === "bad" && col("__ngb") === "bad", "bad")
        .when((col("__pgb") === "bad" && col("__pany") === "neargood") ||
              (col("__ngb") === "bad" && col("__nany") === "neargood"), "good")
        .otherwise("bad"))
    // revise pass 2 (neargood): neighbors over the SHORT-RESOLVED
    // classes (a promoted short counts as good here — jusText applies
    // new_classes before the neargood loop)
    val fin = shortResolved
      .withColumn("__pgb2", coalesce(last(gb(col("__c2")), ignoreNulls = true).over(ord), lit("bad")))
      .withColumn("__ngb2", coalesce(last(gb(col("__c2")), ignoreNulls = true).over(ordDesc), lit("bad")))
      .withColumn("final_class",
        when(col("__c2") =!= "neargood", col("__c2"))
          .when(col("__pgb2") === "bad" && col("__ngb2") === "bad", "bad")
          .otherwise("good"))
    fin.select(col(idCol), col("block_idx"), col("text"), col("n_chars"),
      col("n_words"), col("n_stop"), col("link_chars"), col("link_density"),
      col("stop_density"), col("cf_class"), col("final_class"))
  }

  /** jusText-filtered page text: GOOD blocks only, page order preserved,
    * one line per block — the block-level upgrade of
    * [[dropBoilerplateLines]] for the crawl route.
    */
  def dropBoilerplateBlocks(docs: DataFrame, htmlCol: String = "html",
                            idCol: String = "doc_id"): DataFrame =
    justextBlocks(docs, htmlCol, idCol)
      .filter(col("final_class") === "good")
      .groupBy(col(idCol))
      .agg(concat_ws("\n", transform(sort_array(collect_list(
        struct(col("block_idx"), col("text")))), s => s.getField("text"))).as("text"))

  /** Outlink extraction — the edge-list producer for link-graph work
    * (anchor-text corpora, [[LinkGraph.pageRank]]): one row per
    * `<a href="...">` with the href and its whitespace-normalized anchor
    * text. Both captures come from the SAME pattern's match sequence, so
    * `arrays_zip` aligns them positionally by construction. Explode is the
    * only row-multiplying step; the plan stays exchange-free.
    */
  def extractLinks(docs: DataFrame, htmlCol: String = "html",
                   idCol: String = "doc_id"): DataFrame = {
    val pairs = arrays_zip(
      regexp_extract_all(col(htmlCol), lit(AnchorRe), lit(1)),
      regexp_extract_all(col(htmlCol), lit(AnchorRe), lit(2)))
    docs.select(col(idCol), posexplode(pairs).as(Seq("link_idx", "__p")))
      .select(col(idCol), col("link_idx").cast("long").as("link_idx"),
        col("__p.0").as("href"),
        trim(regexp_replace(col("__p.1"), "[ \\t\\r\\n]+", " ")).as("anchor"))
  }

  /** Media-reference pattern shared by the Spark extraction and the DuckDB
    * twin (Java-regex ∩ RE2 subset, like [[AnchorRe]]): the four src-bearing
    * media elements, double-quoted src. The `[\s"']` delimiter before `src`
    * keeps attributes that merely END in src (`data-src="lazy.png"`,
    * `poster-src=...` — routine lazy-loading markup) from being extracted
    * as fetchable references; single-quoted/unquoted src remains out of
    * scope, same documented limitation as [[AnchorRe]]'s href.
    */
  val MediaRe = "(?is)<(img|audio|video|source)\\b[^>]*[\\s\"']src=\"([^\"]*)\"[^>]*>"

  /** Media-reference extraction — [[extractLinks]]' twin for BINARY assets:
    * the producer feeding a media-fetch pipeline
    * ([[graft.ops.Multimodal]] decode/dedup runs on what this finds). One
    * row per `img`/`audio`/`video`/`source` element with a `src`
    * attribute: (id, media_idx, tag lower-cased, src). Same positional
    * `arrays_zip` construction — both captures come from ONE pattern's
    * match sequence — and explode is the only row-multiplying step; the
    * plan stays exchange-free.
    */
  def extractMediaRefs(docs: DataFrame, htmlCol: String = "html",
                       idCol: String = "doc_id"): DataFrame = {
    val pairs = arrays_zip(
      regexp_extract_all(col(htmlCol), lit(MediaRe), lit(1)),
      regexp_extract_all(col(htmlCol), lit(MediaRe), lit(2)))
    docs.select(col(idCol), posexplode(pairs).as(Seq("media_idx", "__p")))
      .select(col(idCol), col("media_idx").cast("long").as("media_idx"),
        lower(col("__p.0")).as("tag"), col("__p.1").as("src"))
  }
}
