package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable index storage — the Spark analog of the reference's
  * StorageProvider seam (storage/base.py:48-71, storage/__init__.py:29-49):
  * every index operation (`read`/`replace`/`upsert`/`delete`/`clear`) is a
  * provider op, so a qdrant/weaviate/pgvector-shaped connector only has to
  * implement this trait; the engine and [[VectorIndex]] never touch the
  * physical layout directly.
  */
trait IndexStore {
  /** Current index contents; throws if the index does not exist. */
  def read(): DataFrame
  def readOption(): Option[DataFrame] =
    try Some(read()) catch { case _: Throwable => None }
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

/** Parquet-backed store with versioned atomic swaps.
  *
  * Layout under `root`:
  * {{{
  *   root/v00001/…parquet       immutable version directories
  *   root/v00002/…parquet
  *   root/_CURRENT              manifest: name of the active version dir
  * }}}
  *
  * Mutations write a NEW version directory, then flip the manifest — no
  * point at which the active data is deleted (the delete-then-rename swap
  * this replaces had a window where the index path was absent, and an
  * unchecked rename). Readers that resolved an older version keep reading
  * its still-present files; only versions older than current-1 are pruned.
  * A legacy flat layout (parquet directly under `root`) is still readable.
  */
final class ParquetIndexStore(spark: SparkSession, root: String) extends IndexStore {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val rootPath = new Path(root)
  private def manifestPath = new Path(rootPath, "_CURRENT")

  private def currentVersion: Option[String] = {
    val f = fs
    if (f.exists(manifestPath)) {
      val in = f.open(manifestPath)
      try {
        val v = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (v.nonEmpty) Some(v) else None
      } finally in.close()
    } else listVersions.lastOption // manifest flip window / crash: newest wins
  }

  private def listVersions: Seq[String] = {
    val f = fs
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.matches("v\\d{5}")).sorted
  }

  override def exists: Boolean = currentVersion.isDefined || legacyExists

  private def legacyExists: Boolean = {
    val f = fs
    f.exists(rootPath) && f.listStatus(rootPath).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  override def read(): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(new Path(rootPath, v).toString)
    case None    => spark.read.parquet(root) // legacy flat layout (or throw)
  }

  override def replace(docs: DataFrame): Unit = {
    val f = fs
    val next = "v%05d".format(
      listVersions.lastOption.map(_.drop(1).toInt).getOrElse(0) + 1)
    docs.dropDuplicates("doc_id").write.mode("overwrite")
      .parquet(new Path(rootPath, next).toString)
    // flip the manifest: write-new + delete-old + rename; the only window is
    // on the one-line manifest, and currentVersion falls back to the newest
    // version dir, so a crash mid-flip still resolves to `next`
    val tmp = new Path(rootPath, "_CURRENT_tmp")
    val out = f.create(tmp, true)
    try out.write(next.getBytes("UTF-8")) finally out.close()
    if (f.exists(manifestPath)) f.delete(manifestPath, false)
    require(f.rename(tmp, manifestPath), s"manifest flip failed for $root -> $next")
    // keep current + previous for in-flight readers, prune the rest
    listVersions.dropRight(2).foreach(v => f.delete(new Path(rootPath, v), true))
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

  override def clear(): Unit = {
    val f = fs
    if (f.exists(rootPath)) f.delete(rootPath, true)
  }
}

/** Driver-memory store — the second [[IndexStore]] impl, proving the
  * provider seam the reference gets from its numpy in-memory provider
  * (storage/numpy/provider.py; storage/__init__.py:29-49). Holds collected
  * Document rows on the driver; suitable for tests and small indexes only
  * (an external qdrant/weaviate/pgvector connector implements the same five
  * ops against its service API).
  */
final class InMemoryIndexStore(spark: SparkSession) extends IndexStore {
  @volatile private var rows: Option[(Seq[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType)] = None

  override def exists: Boolean = rows.isDefined

  override def read(): DataFrame = rows match {
    case Some((rs, schema)) =>
      spark.createDataFrame(spark.sparkContext.parallelize(rs, math.max(1, rs.size / 1000 + 1)), schema)
    case None => throw new IllegalStateException("index does not exist")
  }

  override def replace(docs: DataFrame): Unit = {
    val d = docs.dropDuplicates("doc_id")
    rows = Some((d.collect().toSeq, d.schema))
  }

  override def upsert(docs: DataFrame): Unit = rows match {
    case None => replace(docs)
    case Some(_) =>
      val existing = read()
      replace(docs.join(existing.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(existing))
  }

  override def delete(docIds: Seq[Long]): Unit = {
    import spark.implicits._
    if (rows.isDefined)
      replace(read().join(docIds.toDF("doc_id"), Seq("doc_id"), "left_anti"))
  }

  override def clear(): Unit = rows = None
}
