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
    val kept = filter(split(col(textCol), "\n"),
      ln => regexp_count(ln, lit("[^ ]+")) >= minWords || ln.rlike("[.!?]$"))
    extracted.withColumn(textCol, array_join(kept, "\n"))
  }

  /** Anchor pattern shared by the Spark extraction and the DuckDB twin
    * (Java-regex ∩ RE2 subset): double-quoted href, lazy inner text.
    */
  val AnchorRe = "(?is)<a\\b[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"

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
