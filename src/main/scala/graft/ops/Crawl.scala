package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** One-call crawl front door: WARC archives in, clean deduplicated training
  * documents out — the composition of the pieces this engine ships
  * individually ([[graft.sources.WarcCodec]] → [[Html]] → [[Urls]]), each
  * of which is oracle-gated on its own (q_warc_extract, q_html_extract,
  * q_boilerplate, q_url_canon, q_url_dedup).
  *
  * Pipeline (the CCNet/C4 front-end order — cheapest filters first):
  *  1. stream-parse the archives (executor-opened files, one record in
  *     memory at a time);
  *  2. keep HTTP 200 HTML responses only;
  *  3. canonicalize URLs, drop blocklisted domains (string ops — before
  *     any content work);
  *  4. URL-level dedup: first record per canonical URL survives (min
  *     (crawl file, record index) — re-crawls and tracking variants drop
  *     before the expensive content stages);
  *  5. extract text ([[Html.extractText]]) + line-level boilerplate drop.
  *
  * Output: (doc_id, url_canon, url_domain, title, n_links, text) — doc_id
  * is a deterministic 60-bit hash of the canonical URL, the join key the
  * downstream stages (langID / quality / content dedup / packing) expect.
  * Everything after the per-URL dedup groupBy is projection-only; the one
  * shuffle carries (url, small fields), never archive bytes.
  */
object Crawl {

  def ingest(spark: SparkSession, warcDir: String,
             blockedDomains: Option[DataFrame] = None,
             minTextChars: Int = 1): DataFrame = {
    // header names/values are case-insensitive (RFC 9110): match
    // 'Text/HTML' too, and honour a declared charset parameter
    val records = Warc.readWarcFiles(spark, warcDir)
      .filter(col("http_status") === 200 &&
        lower(col("http_content_type")).startsWith("text/html"))
      .select(col("path"), col("rec_idx"), col("target_uri").as("url"), col("body"),
        lower(regexp_extract(col("http_content_type"),
          "(?i)charset=\"?([A-Za-z0-9_\\-]+)", 1)).as("charset"))
    val canon = Urls.canonicalize(records).filter(col("url_canon").isNotNull)
    val allowed = blockedDomains match {
      case Some(bl) =>
        require(bl.columns.contains("domain"),
          s"blocklist needs a 'domain' column: ${bl.columns.mkString(",")}")
        canon.join(
          broadcast(bl.select(lower(col("domain")).as("url_domain")).distinct()),
          Seq("url_domain"), "left_anti")
      case None => canon
    }
    // first-per-canonical-URL: min_by keyed on (path, rec_idx) — one
    // map-side-combined exchange on the canonical URL; deterministic
    // because (archive name, record ordinal) totally orders the crawl
    val deduped = allowed
      .groupBy("url_canon", "url_domain")
      .agg(min_by(col("body"), struct(col("path"), col("rec_idx"))).as("body"),
        min_by(col("charset"), struct(col("path"), col("rec_idx"))).as("charset"))
    // extraction columns inlined (not Html.extractText) so url_domain rides
    // the same projection — no join back, nothing after the dedup shuffles.
    // Decode honours the surviving record's declared charset through the
    // JVM's FULL charset table (Spark's built-in `decode` rejects
    // windows-1252 — a top-3 crawl encoding — with a runtime error);
    // unknown names and undecodable bytes fall back to UTF-8/U+FFFD — a
    // crawl row must never fail the job
    val withHtml = deduped.withColumn("html",
      graft.functions.textkernel.decode_charset(col("body"),
        when(col("charset") === "", lit("utf-8")).otherwise(col("charset"))))
    val extracted = withHtml.select(col("url_canon"), col("url_domain"),
      Html.titleColumn(col("html")).as("title"),
      regexp_count(col("html"), lit("(?i)<a\\b")).cast("long").as("n_links"),
      Html.extractColumn(col("html")).as("text"))
    Html.dropBoilerplateLines(extracted)
      .filter(length(col("text")) >= minTextChars)
      .select(
        graft.functions.textfn.hexhash60(col("url_canon")).as("doc_id"),
        col("url_canon"), col("url_domain"), col("title"), col("n_links"),
        col("text"))
  }
}
