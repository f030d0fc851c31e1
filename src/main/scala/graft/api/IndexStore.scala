package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable index storage — the Spark analog of the reference's
  * StorageProvider seam (storage/base.py:48-71, storage/__init__.py:29-49):
  * every index operation (`read`/`replace`/`upsert`/`delete`/`clear`) is a
  * provider op, so a qdrant/weaviate/pgvector-shaped connector only has to
  * implement this trait; the engine and [[VectorIndex]] never touch the
  * physical layout directly.
  *
  * Writer contract: compound mutations (`upsert`/`delete` are
  * read-then-replace) assume a SINGLE writer at a time. Concurrent writers
  * never corrupt storage (version dirs are reservation-protected), but the
  * last manifest flip wins, so one racing mutation's effect can be lost.
  * Serialize writers externally (e.g. one streaming query per index).
  */
trait IndexStore {
  /** Current index contents; throws if the index does not exist. */
  def read(): DataFrame

  /** None iff the index verifiably does NOT exist. A transient read failure
    * (FS hiccup, corrupt footer, permissions) PROPAGATES instead of being
    * mistaken for an empty index — `upsert`'s None branch would otherwise
    * replace the whole index with just the new batch.
    */
  def readOption(): Option[DataFrame] = if (exists) Some(read()) else None

  /** Atomically replace the whole index with `docs` (doc_id-deduped).
    * Readers holding a DataFrame from a previous `read()` keep working.
    */
  def replace(docs: DataFrame): Unit
  /** Conflict-ignore upsert, reference-faithful OLD-WINS semantics
    * (pgvector provider bulk_create(ignore_conflicts=True) keeps the
    * existing row on a doc_id conflict, provider.py:65-72) — and
    * deterministic, unlike a dropDuplicates over a union whose survivor
    * depends on partition order.
    */
  def upsert(docs: DataFrame): Unit
  def delete(docIds: Seq[Long]): Unit
  /** Remove every document; subsequent `read()` throws until re-written. */
  def clear(): Unit
  def exists: Boolean
}

/** Parquet-backed store with versioned atomic swaps (see [[VersionedDir]]
  * for the layout and reader/writer guarantees). `keepVersions` controls how
  * many versions stay readable for in-flight readers (default 2 = current +
  * previous; raise it for long-running readers that may lag more rebuilds).
  * A legacy flat layout (parquet directly under `root`) is still readable.
  */
final class ParquetIndexStore(spark: SparkSession, root: String,
                              keepVersions: Int = 2) extends IndexStore {

  private val dir = new VersionedDir(spark, root, keepVersions)

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val rootPath = new Path(root)

  override def exists: Boolean = dir.exists || legacyExists

  private def legacyExists: Boolean = {
    val f = fs
    f.exists(rootPath) && f.listStatus(rootPath).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  override def read(): DataFrame = dir.currentDir match {
    case Some(d) =>
      val base = spark.read.parquet(d)
      val deltas = dir.listDeltas
      if (deltas.isEmpty) base else mergeOnRead(base, deltas)
    case None => spark.read.parquet(root) // legacy flat layout (or throw)
  }

  /** NEW-WINS merge of the base version with its delta sidecars: per doc_id
    * the highest-sequence copy survives, and any row (base or older delta)
    * sharing an object key with a LATER delta is shadowed — the same
    * semantics as the full-rewrite upsert it replaces, computed with
    * equi-joins only (the delta side is small by construction, so the join
    * build sides broadcast under AQE).
    */
  private def mergeOnRead(base: DataFrame, deltas: Seq[(Long, String)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val all = (base.withColumn("__seq", lit(0L)) +: deltas.map { case (s, p) =>
      spark.read.parquet(p).withColumn("__seq", lit(s)) }).reduce(_.unionByName(_))
    // latest copy per doc_id (an unchanged object re-batched keeps one row)
    val latestSeq = all.groupBy("doc_id").agg(max("__seq").as("__seq"))
    val latest = all.join(latestSeq, Seq("doc_id", "__seq"))
    val touched = deltas.map { case (s, p) =>
        spark.read.parquet(p).select(explode(col("object_keys")).as("__key"), lit(s).as("__tseq")) }
      .reduce(_.unionByName(_))
      .groupBy("__key").agg(max("__tseq").as("__max_seq"))
    val shadowed = latest
      .select(col("doc_id"), col("__seq"), explode(col("object_keys")).as("__key"))
      .join(touched, Seq("__key"))
      .filter(col("__max_seq") > col("__seq"))
      .select("doc_id").distinct()
    latest.join(shadowed, Seq("doc_id"), "left_anti").drop("__seq")
  }

  /** O(batch) incremental write: the batch lands as a delta sidecar of the
    * active version instead of rewriting the index; [[read]] resolves
    * new-wins. First write (no base) falls back to [[replace]]. Fold the
    * accumulated deltas into a full version with [[foldDeltas]].
    */
  def appendDelta(docs: DataFrame): Unit =
    if (!dir.exists) replace(docs)
    else dir.appendDelta { tmpDir =>
      docs.dropDuplicates("doc_id").write.mode("overwrite").parquet(tmpDir)
    }

  /** Number of delta sidecars pending against the active version. */
  def deltaCount: Int = dir.listDeltas.size

  /** Fold pending deltas into a full base version (readers keep the prior
    * version + its sidecars; the swap is atomic as ever).
    */
  def foldDeltas(): Unit = if (deltaCount > 0) replace(read())

  override def replace(docs: DataFrame): Unit =
    dir.replaceWith { versionDir =>
      docs.dropDuplicates("doc_id").write.mode("overwrite").parquet(versionDir)
    }

  override def upsert(docs: DataFrame): Unit = readOption() match {
    case None => replace(docs)
    case Some(existing) =>
      // old-wins: only doc_ids not already present are inserted
      replace(docs.join(existing.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(existing))
  }

  override def delete(docIds: Seq[Long]): Unit = {
    import spark.implicits._
    readOption().foreach { existing =>
      replace(existing.join(docIds.toDF("doc_id"), Seq("doc_id"), "left_anti"))
    }
  }

  override def clear(): Unit = dir.deleteAll()

  /** Rewrite the active version bin-packed to `targetFileMB` files — heals
    * the small-file accretion of repeated upsert/replace cycles without
    * interrupting readers (atomic versioned swap, like any other write).
    */
  def compact(targetFileMB: Int = 128): Unit = {
    foldDeltas() // dir.compact reads the base version only — fold first
    dir.compact(spark, None, targetFileMB)
  }
}

/** Driver-memory store — the second [[IndexStore]] impl, proving the
  * provider seam the reference gets from its numpy in-memory provider
  * (storage/numpy/provider.py; storage/__init__.py:29-49). Holds collected
  * Document rows on the driver; suitable for tests and small indexes only
  * (an external qdrant/weaviate/pgvector connector implements the same five
  * ops against its service API). Mutators are synchronized so interleaved
  * read-then-replace sequences can't drop one side's rows.
  */
final class InMemoryIndexStore(spark: SparkSession) extends IndexStore {
  @volatile private var rows: Option[(Seq[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType)] = None

  override def exists: Boolean = rows.isDefined

  override def read(): DataFrame = rows match {
    case Some((rs, schema)) =>
      spark.createDataFrame(spark.sparkContext.parallelize(rs, math.max(1, rs.size / 1000 + 1)), schema)
    case None => throw new IllegalStateException("index does not exist")
  }

  override def replace(docs: DataFrame): Unit = synchronized {
    val d = docs.dropDuplicates("doc_id")
    rows = Some((d.collect().toSeq, d.schema))
  }

  override def upsert(docs: DataFrame): Unit = synchronized {
    rows match {
      case None => replace(docs)
      case Some(_) =>
        val existing = read()
        replace(docs.join(existing.select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(existing))
    }
  }

  override def delete(docIds: Seq[Long]): Unit = synchronized {
    import spark.implicits._
    if (rows.isDefined)
      replace(read().join(docIds.toDF("doc_id"), Seq("doc_id"), "left_anti"))
  }

  override def clear(): Unit = synchronized { rows = None }
}
