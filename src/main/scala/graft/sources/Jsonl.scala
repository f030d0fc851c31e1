package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines corpus source/sink — the interchange format LLM training
  * corpora actually ship in (The Pile, RedPajama, Dolma: one JSON document
  * per line, gzip/zstd-compressed shards). Spark's JSON datasource already
  * splits by line and decompresses registered codecs per FILE, so the
  * parallelism unit is the shard — the same posture as the WARC reader
  * (graft.sources.Warc): the driver lists names, executors stream bytes.
  *
  * Scale rules encoded here, not left to the caller:
  *  - **Schema is REQUIRED.** `spark.read.json` without a schema runs a
  *    full inference scan first — at 100 TB that is a second pass over the
  *    corpus before any work starts. Passing the schema makes ingest
  *    single-pass; unknown fields are dropped, missing ones are null.
  *  - **Corrupt lines are quarantined, not fatal**: PERMISSIVE mode with a
  *    `_corrupt` column (a crawl-derived shard always has a few broken
  *    lines; dying at line 4 billion is not an option). Callers filter or
  *    count them via the returned column.
  *  - gzip shards are NOT splittable — one task per shard member. Shard
  *    the corpus at write time (`writeJsonlGz` keeps partition count) so
  *    shard count, not shard size, sets the parallelism.
  */
object Jsonl {

  /** Read one-JSON-object-per-line shards (plain, .gz, or any extension
    * Hadoop has a codec for) with an explicit schema. Adds a `_corrupt`
    * string column: null for clean rows, the raw line for broken ones.
    *
    * Implemented as text-scan + `from_json` rather than `spark.read.json`'s
    * columnNameOfCorruptRecord: Spark refuses queries that reference the
    * datasource-internal corrupt column without caching the whole relation
    * first (SPARK-21610) — a non-starter at corpus scale. `from_json`
    * yields a null struct on an unparseable line, in one scan with no
    * caching requirement. A null STRUCT carries a null `_corrupt` too —
    * empty/whitespace-only lines parse to a null struct, not a populated
    * corrupt row — so `_corrupt` is surfaced explicitly as
    * coalesce(struct._corrupt, raw-line-when-struct-null): every
    * unparseable line, blank ones included, lands in quarantine instead of
    * passing a `_corrupt IS NULL` filter as a phantom all-null row.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    val withCorrupt = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")).as("__r"))
      .select(schema.fieldNames.map(f => col(s"__r.$f").as(f)).toSeq :+
        coalesce(col("__r._corrupt"), when(col("__r").isNull, col("value")))
          .as("_corrupt"): _*)
  }

  /** Write a DataFrame as gzip JSON-Lines shards, preserving the input's
    * partitioning (one shard per task — size shards upstream with
    * `repartition`, they set the READ parallelism of every later ingest).
    */
  def writeJsonlGz(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)
}
