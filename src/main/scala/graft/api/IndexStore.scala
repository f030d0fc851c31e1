package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * HIGHEST-NUMBERED installed version wins resolution — a slower writer
  * holding a lower reserved number loses even if its flip marker lands
  * last — so one racing mutation's effect can be lost. Serialize writers
  * externally (e.g. one streaming query per index).
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

  /** Insert rows the CALLER already proved conflict-free and doc_id-deduped
    * ([[VectorIndex.upsert]] runs the old-wins probe once for its ANN
    * maintenance) — impls override to skip re-deriving the conflict set
    * (the parquet store's second index scan, a REST store's second
    * full-collection download). Default: a plain `upsert`, which on a
    * conflict-free batch degenerates to the same insert.
    */
  private[graft] def insertPrechecked(inserted: DataFrame): Unit = upsert(inserted)
}

/** Connector capability: the backing service answers similarity search
  * SERVER-side (qdrant `POST /points/search`, weaviate GraphQL
  * `nearVector`) — the reference's `get_similar_documents` runs there too
  * (storage/qdrant/provider.py:63-104, storage/weaviate/provider.py:65-121).
  * [[VectorIndex]] routes exact cosine searches through this instead of
  * downloading the collection and scanning it in Spark: only the k hits
  * cross the wire. Scores are cosine similarity; `similarityThreshold`
  * must be in [0, 1] and is only enforced server-side when > 0 (the
  * reference's convention — 0 means unfiltered).
  */
trait ServerSideSearch { this: IndexStore =>
  def searchSimilar(queryVector: Seq[Float], limit: Int = 5,
                    similarityThreshold: Double = 0.0): DataFrame
}

/** Parquet-backed store with versioned atomic swaps (see [[VersionedDir]]
  * for the layout and reader/writer guarantees). `keepVersions` controls how
  * many versions stay readable for in-flight readers (default 2 = current +
  * previous; raise it for long-running readers that may lag more rebuilds).
  * A legacy flat layout (parquet directly under `root`) is still readable.
  */
final class ParquetIndexStore(spark: SparkSession, root: String,
                              keepVersions: Int = 2,
                              /** Auto-fold threshold: when an upsert/delete
                                * leaves this many delta sidecars pending,
                                * they fold into a fresh base version (one
                                * amortized rewrite instead of a rewrite per
                                * mutation; merge-on-read depth stays
                                * bounded). Streaming drives its own cadence
                                * via `compactEvery` instead.
                                */
                              foldEvery: Int = 16) extends IndexStore {

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

  /** Merge of the base version with its delta sidecars, by delta kind.
    * The base relation is never shuffled or widened: every resolution step
    * is a BROADCAST equi-join against a delta-derived side (small by
    * construction — O(pending mutations), never O(index)); only delta rows
    * themselves go through a (tiny) latest-per-doc aggregation. At 100 TB a
    * merge-on-read therefore costs one pruned base scan + broadcast
    * hash-join filters, not an index-wide shuffle.
    *
    *  - "put" (streaming batch): per doc_id the highest-sequence copy
    *    survives, and any row sharing an object key with a LATER put delta
    *    is shadowed — the batch REPLACES all documents of its touched keys
    *    (same semantics as the full-rewrite it replaces);
    *  - "add" (conflict-checked upsert insert): rows simply union in — the
    *    writer already dropped doc_id conflicts (old-wins), and an insert
    *    must NOT shadow other chunks sharing its object key;
    *  - "del" (tombstones, doc_id-only rows): a doc_id is dropped unless a
    *    LATER delta re-introduced it.
    */
  private def mergeOnRead(base: DataFrame, deltas: Seq[VersionedDir.DeltaRef]): DataFrame = {
    import org.apache.spark.sql.functions._
    // The explicit broadcast hint bypasses autoBroadcastJoinThreshold, so it
    // is only safe while the pending delta set is genuinely small. Streaming
    // "put" sidecars are whole micro-batches and up to foldEvery can be
    // pending: measure them (cheap FS metadata sum) and drop the hint past
    // the cap — AQE then picks the join strategy from actual runtime sizes.
    val hint: DataFrame => DataFrame = {
      val f = fs
      val pendingBytes = deltas.iterator
        .map(d => f.getContentSummary(new Path(d.path)).getLength).sum
      val cap = spark.conf.getOption("graft.store.broadcastDeltaMaxBytes")
        .map(_.toLong).getOrElse(64L << 20)
      if (pendingBytes <= cap) broadcast _ else identity _
    }
    val (dels, lives) = deltas.partition(_.kind == "del")
    // r20 (guide §6): every delta read carries an EXPLICIT schema — "put"/
    // "add" sidecars are written from index-schema rows by construction and
    // "del" tombstones are bare doc_id files, so re-inferring each sidecar's
    // schema from its footers is pure driver overhead repeated on every
    // merge-on-read (one footer read + file-listing round per delta per
    // search on the incremental gates).
    val baseSchema = base.schema
    val tombSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    val deltaRows = lives.map { d =>
      spark.read.schema(baseSchema).parquet(d.path).withColumn("__seq", lit(d.seq)) }
      .reduceOption(_.unionByName(_))
    // latest copy per doc_id AMONG DELTAS (an unchanged object re-batched
    // keeps one row); base copies of those ids are shadowed by an anti-join
    val deltaLatest = deltaRows.map { rows =>
      rows.join(rows.groupBy("doc_id").agg(max("__seq").as("__seq")),
        Seq("doc_id", "__seq"))
    }
    val baseLive = deltaRows match {
      case Some(rows) =>
        base.join(hint(rows.select("doc_id").distinct()), Seq("doc_id"), "left_anti")
      case None => base
    }
    val latest = deltaLatest.foldLeft(baseLive.withColumn("__seq", lit(0L)))(_.unionByName(_))
    val puts = lives.filter(_.kind == "put")
    val unshadowed = if (puts.isEmpty) latest else {
      val touched = puts.map { d =>
          spark.read.schema(baseSchema).parquet(d.path).select(explode(col("object_keys")).as("__key"), lit(d.seq).as("__tseq")) }
        .reduce(_.unionByName(_))
        .groupBy("__key").agg(max("__tseq").as("__max_seq"))
      val shadowed = latest
        .select(col("doc_id"), col("__seq"), explode(col("object_keys")).as("__key"))
        .join(hint(touched), Seq("__key"))
        .filter(col("__max_seq") > col("__seq"))
        .select("doc_id").distinct()
      latest.join(hint(shadowed), Seq("doc_id"), "left_anti")
    }
    val surviving = if (dels.isEmpty) unshadowed else {
      val tombs = dels.map { d =>
          spark.read.schema(tombSchema).parquet(d.path).select(col("doc_id"), lit(d.seq).as("__dseq")) }
        .reduce(_.unionByName(_))
        .groupBy("doc_id").agg(max("__dseq").as("__dseq"))
      unshadowed.join(hint(tombs), Seq("doc_id"), "left")
        .filter(col("__dseq").isNull || col("__dseq") < col("__seq"))
        .drop("__dseq")
    }
    surviving.drop("__seq")
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

  /** Full versions are laid out RANGE-partitioned and sorted by doc_id:
    * every file carries a tight, non-overlapping doc_id min/max footer, so
    * id-probing reads (upsert's conflict semi-join, key lookups, hydration)
    * skip whole files instead of scanning the index. Costs nothing extra —
    * dropDuplicates reuses the range exchange (RangePartitioning satisfies
    * the aggregation's clustering), so it's one shuffle either way.
    */
  override def replace(docs: DataFrame): Unit =
    dir.replaceWith { versionDir =>
      docs.repartitionByRange(col("doc_id")).dropDuplicates("doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(versionDir)
    }

  /** O(batch) write: the conflict check reads the index (a scan — at scale,
    * the layout's min/max doc_id footer stats prune it), but only the
    * genuinely-new rows are WRITTEN, as an "add" delta. The legacy flat
    * layout (no versioned base to append to) falls back to read-and-replace.
    */
  override def upsert(docs: DataFrame): Unit = readOption() match {
    case None => replace(docs)
    case Some(existing) =>
      import org.apache.spark.sql.functions.broadcast
      // old-wins: only doc_ids not already present are inserted. The
      // conflict set is found by probing the column-pruned index id scan
      // with a BROADCAST of the batch ids (left_semi, index streamed) —
      // never by making the index the build side of an anti-join, which
      // would shuffle O(index) ids per upsert. Persisted: the emptiness
      // check and the write must not each re-run the probe.
      val conflicts = existing.select("doc_id")
        .join(broadcast(docs.select("doc_id").distinct()), Seq("doc_id"), "left_semi")
      val inserted = docs.join(broadcast(conflicts), Seq("doc_id"), "left_anti")
        .dropDuplicates("doc_id").persist()
      try writeInserted(inserted, existing)
      finally inserted.unpersist(false)
  }

  /** Write rows the CALLER already proved conflict-free (and doc_id-deduped)
    * — [[graft.api.VectorIndex.upsert]] performs the old-wins probe once for
    * its own ANN maintenance, and this entry point spares the second
    * identical index id scan `upsert` would run. Same delta kind, fold
    * cadence, and no-op skip as [[upsert]].
    */
  override private[graft] def insertPrechecked(inserted: DataFrame): Unit = readOption() match {
    case None           => replace(inserted)
    case Some(existing) => writeInserted(inserted, existing)
  }

  /** Shared tail of [[upsert]]/[[insertPrechecked]]: `inserted` must be
    * conflict-free and deduped. An all-conflict batch is a NO-OP — writing
    * an empty "add" sidecar would still tick foldEvery, so idempotent
    * replays would trigger pointless full folds.
    */
  private def writeInserted(inserted: DataFrame, existing: DataFrame): Unit =
    if (!inserted.isEmpty) {
      if (dir.exists) {
        dir.appendDelta({ tmp =>
          inserted.write.mode("overwrite").parquet(tmp)
        }, kind = "add")
        if (deltaCount >= foldEvery) foldDeltas()
      } else replace(inserted.unionByName(existing))
    }

  /** O(batch) write: ids land as a "del" tombstone delta; the rows vanish
    * at merge-on-read and physically at the next fold/compact.
    */
  override def delete(docIds: Seq[Long]): Unit = if (docIds.nonEmpty) {
    import spark.implicits._
    if (dir.exists) {
      dir.appendDelta({ tmp =>
        docIds.toDF("doc_id").write.mode("overwrite").parquet(tmp)
      }, kind = "del")
      if (deltaCount >= foldEvery) foldDeltas()
    } else readOption().foreach { existing =>
      replace(existing.join(
        org.apache.spark.sql.functions.broadcast(docIds.toDF("doc_id")),
        Seq("doc_id"), "left_anti"))
    }
  }

  override def clear(): Unit = dir.deleteAll()

  /** Rewrite the active version bin-packed to `targetFileMB` files — heals
    * the small-file accretion of repeated upsert/replace cycles without
    * interrupting readers (atomic versioned swap, like any other write).
    */
  def compact(targetFileMB: Int = 128): Unit = {
    foldDeltas() // dir.compact reads the base version only — fold first
    dir.compact(spark, None, targetFileMB, sortCol = Some("doc_id"))
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
