package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{EmbeddingField, IndexConfig}
import graft.embed.{EmbeddingBackend, EmbedStage}
import graft.text.RecursiveCharacterTextSplitter

/** Batch index-build pipeline — Spark re-expression of the reference's
  * rebuild path (storage/django.py:320-402, 478-491; SURVEY.md §3.3):
  *
  *   read sources → union → project fields (important/splittable) →
  *   explode(splitText) → important-prefix → hash-diff vs stored index →
  *   embed changed chunks (batched, partition-local) → union unchanged →
  *   overwrite index parquet
  *
  * Control stays on the driver; executors only cross the network inside the
  * mapPartitions embedding stage. At scale each stage is shuffle-free except
  * the diff join (hash-partitioned on the object key).
  */
object IndexBuild {

  /** P1-P3: project configured embedding fields into two concatenated text
    * columns (reference storage/django.py:408-432 — values joined with "\n";
    * `important` fields are prepended to every chunk downstream).
    * Validates configured columns against the schema, failing fast
    * (reference check wagtailai.WA001, storage/django.py:126-156).
    */
  def extractFields(df: DataFrame, config: IndexConfig): DataFrame = {
    val missing = EmbeddingField.dedup(config.fields).map(_.column)
      .filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty, s"embedding_fields reference nonexistent columns: ${missing.mkString(",")}")
    val imp = config.importantCols
    val spl = config.splittableCols
    df.withColumn("important_text",
        if (imp.isEmpty) lit("") else concat_ws("\n", imp.map(col): _*))
      .withColumn("splittable_text",
        if (spl.isEmpty) lit("") else concat_ws("\n", spl.map(col): _*))
  }

  /** T2-T3 + P2: split `splittable_text` into chunks (recursive character
    * splitter under the token budget), one output row per chunk, each chunk
    * prefixed with the important text + "\n" (reference
    * storage/django.py:429-440: chunk_size=token_limit, overlap=100).
    * UDF + explode = a Generator in the plan; stays inside codegen stages
    * around it and parallelizes per-row.
    */
  def chunk(df: DataFrame, config: IndexConfig): DataFrame = {
    val splitter = new RecursiveCharacterTextSplitter(config.tokenLimit, config.chunkOverlap)
    val splitUdf = udf((s: String) => if (s == null) Seq.empty[String] else splitter.splitText(s))
    // posexplode keeps the splitter's positional order as chunk_index — the
    // reference's input-order restore (O3, storage/django.py:377-383) for
    // free, with no window/shuffle
    // the prefix is UNCONDITIONAL, exactly as the reference formats
    // f"{important_text}\n{chunk}" (storage/django.py:429-432) — objects
    // with no important fields get a leading "\n", keeping content (and
    // hence content hashes in diffAgainstIndex) byte-identical to a
    // reference-faithful port
    df.select(col("*"), posexplode(splitUdf(col("splittable_text"))).as(Seq("chunk_index", "__chunk")))
      .withColumn("content", concat(col("important_text"), lit("\n"), col("__chunk")))
      .drop("__chunk")
  }

  /** A3/A4: incremental change detection. An object is UNCHANGED iff the SET
    * of its chunk contents equals the set of contents stored in the index
    * (reference storage/django.py:267-277, 320-383). Returns (changedChunks,
    * unchangedStoredDocs): re-embed only the former, carry the latter.
    *
    * Both sides aggregate a sorted set of sha2(content) per key — a map-side
    * partially-aggregated hash-agg, then one hash join on key. At 100 TB this
    * is the one shuffle of the build, on the natural key.
    */
  def diffAgainstIndex(newChunks: DataFrame, storedIndex: Option[DataFrame]): (DataFrame, DataFrame) = {
    storedIndex match {
      case None => (newChunks, newChunks.sparkSession.emptyDataFrame)
      case Some(stored) =>
        val newSig = newChunks.groupBy("key")
          .agg(sort_array(collect_set(sha2(col("content"), 256))).as("__new_sig"))
        val storedKeyed = stored.withColumn("key", col("object_keys").getItem(0))
        val storedSig = storedKeyed.groupBy("key")
          .agg(sort_array(collect_set(sha2(col("content"), 256))).as("__old_sig"))
        val changedKeys = newSig.join(storedSig, Seq("key"), "left")
          .filter(col("__old_sig").isNull || col("__new_sig") =!= col("__old_sig"))
          .select("key")
        val changed = newChunks.join(changedKeys, Seq("key"), "left_semi")
        val unchanged = storedKeyed.join(changedKeys, Seq("key"), "left_anti")
          .join(newSig.select("key"), Seq("key"), "left_semi") // drop deleted objects
          .drop("key")
        (changed, unchanged)
    }
  }

  /** Full build: chunks → embed → Document rows. `keyCol` provides the
    * source identity; object_keys = [ "<table>:<id>", "<parent>:<id>", … ]
    * in MRO order, most specific first (reference `_keys_for_instance`,
    * storage/django.py:279-285), so hydration/lookup by a base-class key
    * finds the document. Metadata carries the object identity beyond the
    * table name (reference storage/models.py:34-53 usage).
    */
  def buildDocuments(source: DataFrame, config: IndexConfig, backend: EmbeddingBackend,
                     table: String, idCol: String,
                     storedIndex: Option[DataFrame] = None,
                     embedBatchSize: Int = 100): DataFrame = {
    val keyed = source.withColumn("key", concat_ws(":", lit(table), col(idCol)))
    val chunks = chunk(extractFields(keyed, config), config)
      .select(col("key"), col("chunk_index"), col("content"))
    val (changed, unchanged) = diffAgainstIndex(chunks, storedIndex)
    val embedded = EmbedStage.embed(changed, "content", backend, embedBatchSize)
    val objId = split(col("key"), ":", 2).getItem(1)
    val keyCols = (lit(table) +: config.parentTables.map(lit)).map(t => concat_ws(":", t, objId))
    val docs = embedded.select(
      xxhash64(col("key"), col("chunk_index")).as("doc_id"),
      array(keyCols: _*).as("object_keys"),
      col("vector"),
      col("content"),
      map(lit("table"), lit(table), lit("object_id"), objId,
        lit("chunk_index"), col("chunk_index").cast("string")).as("metadata"))
    if (storedIndex.isEmpty) docs
    else docs.unionByName(unchanged.select("doc_id", "object_keys", "vector", "content", "metadata"))
  }

  /** S7/S10-S12 sinks, routed through the versioned
    * [[graft.api.ParquetIndexStore]] (atomic replace; readers of a prior
    * version keep working). At 100 TB additionally partition each version
    * by index_name / key-hash bucket.
    */
  def writeIndex(docs: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    val store = new graft.api.ParquetIndexStore(docs.sparkSession, path)
    mode match {
      case "overwrite" => store.replace(docs)
      case "append"    => store.upsert(docs) // old-wins conflict-ignore
      case other       => throw new IllegalArgumentException(
        s"writeIndex mode must be overwrite|append, got $other")
    }
  }

  def readIndex(spark: SparkSession, path: String): DataFrame =
    new graft.api.ParquetIndexStore(spark, path).read()

  def deleteByDocIds(index: DataFrame, docIds: DataFrame): DataFrame =
    index.join(org.apache.spark.sql.functions.broadcast(docIds), Seq("doc_id"), "left_anti")
}
