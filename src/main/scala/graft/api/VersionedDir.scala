package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned directory with atomic manifest swaps — the storage mechanic
  * shared by [[ParquetIndexStore]] (document indexes) and the ANN index
  * writes (bucket/cell-partitioned layouts,
  * [[graft.ops.SimilaritySearch.lshIndexWrite]] / `ivfIndexWrite`).
  *
  * Layout under `root`:
  * {{{
  *   root/v00001/…            immutable version directories (any layout,
  *   root/v00002/…            including partitionBy subdirs)
  *   root/_FLIP_v00002        install markers: atomic-created AFTER the
  *                            version's data is complete, never mutated;
  *                            active version = newest marker with a dir
  *   root/_CURRENT            legacy single-file manifest (read-only compat)
  * }}}
  *
  * Guarantees:
  *  - readers: a reader that resolved a version keeps reading its files;
  *    `keepVersions` versions are retained (default 2 = current + previous),
  *    so a reader at most one rebuild behind always completes. Longer-lived
  *    readers need a larger `keepVersions` (reader-lease is the caller's
  *    contract).
  *  - writers: the next version NAME is reserved via an atomic marker-file
  *    create, so two racing writers can never write into the same version
  *    directory (no clobber). Installation is one atomic marker create per
  *    version — nothing shared is deleted or renamed, so racing flips
  *    resolve to the numerically NEWEST installed version in every
  *    interleaving. A read-modify-write sequence (e.g. upsert) still needs
  *    single-writer discipline for SEMANTIC atomicity — that is the
  *    documented contract.
  */
final class VersionedDir(spark: SparkSession, val root: String, keepVersions: Int = 2) {
  require(keepVersions >= 1, "keepVersions must be >= 1")

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val rootPath = new Path(root)
  private def manifestPath = new Path(rootPath, "_CURRENT")

  /** Active version resolution, newest-installed-wins: the highest-numbered
    * `_FLIP_v*` marker whose version dir still exists. Markers are written
    * by ATOMIC CREATE after the version's data is complete and are NEVER
    * overwritten or renamed, so there is no window in which two writers can
    * regress each other (the delete+rename single-manifest scheme this
    * replaces had an unfixable check-then-act race). Fallbacks, in order:
    * a legacy `_CURRENT` manifest (pre-marker layouts stay readable), then
    * the newest version dir (crash between data write and marker create —
    * the data is complete at that point).
    */
  def currentVersion: Option[String] = {
    val f = fs
    val markers =
      if (!f.exists(rootPath)) Seq.empty
      else f.listStatus(rootPath).toSeq.map(_.getPath.getName)
        .filter(_.matches("_FLIP_v\\d+")).map(_.drop("_FLIP_".length))
    val dirs = listVersions.toSet
    markers.filter(dirs.contains).sortBy(_.drop(1).toLong).lastOption.orElse {
      if (f.exists(manifestPath)) {
        val in = f.open(manifestPath)
        try {
          val v = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          if (v.nonEmpty && dirs.contains(v)) Some(v) else listVersions.lastOption
        } finally in.close()
      } else listVersions.lastOption
    }
  }

  /** Absolute path of the active version directory. */
  def currentDir: Option[String] =
    currentVersion.map(v => new Path(rootPath, v).toString)

  /** Version names, NUMERICALLY sorted (v\d+ of any width — "v%05d" is only
    * a cosmetic default; past v99999 names grow a digit and lexicographic
    * order would misorder them).
    */
  def listVersions: Seq[String] = {
    val f = fs
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.matches("v\\d+")).sortBy(_.drop(1).toLong)
  }

  def exists: Boolean = currentVersion.isDefined

  def read(): DataFrame = currentDir match {
    case Some(d) => spark.read.parquet(d)
    case None    => throw new IllegalStateException(s"no version present under $root")
  }

  /** Atomically reserve the next version name: an atomic create of a marker
    * file fails on collision, so a concurrent writer moves on to the next
    * number instead of writing into the same directory.
    *
    * On HDFS-like filesystems `create(overwrite = false)` is atomic, but the
    * LOCAL filesystem implements it as a non-atomic exists-then-create — two
    * racing writers could both "win" the same marker and clobber one
    * version. Local paths therefore go through NIO `Files.createFile`
    * (O_CREAT|O_EXCL — a true atomic claim).
    */
  private def atomicCreate(f: FileSystem, p: Path): Boolean = f match {
    case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
      try { java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath)); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    case other =>
      try other.createNewFile(p)
      catch { case _: java.io.IOException => false }
  }

  private def reserve(f: FileSystem): (String, Path) = {
    var n = listVersions.lastOption.map(_.drop(1).toLong).getOrElse(0L) + 1
    var attempts = 0
    while (attempts < 10000) {
      val name = "v%05d".format(n)
      val marker = new Path(rootPath, s".reserve_$name")
      if (atomicCreate(f, marker)) return (name, marker)
      n += 1; attempts += 1
    }
    throw new IllegalStateException(s"could not reserve a version dir under $root")
  }

  /** Write a new version via `write(versionDirPath)`, install its flip
    * marker, prune versions beyond `keepVersions`. The active data is never
    * deleted mid-swap. A crash between data write and marker create leaves
    * the PREVIOUS installed version active (the written-but-unmarked dir is
    * simply never resolved); only a first, never-installed root falls back
    * to newest-dir resolution.
    */
  def replaceWith(write: String => Unit): Unit = {
    val f = fs
    f.mkdirs(rootPath)
    // the marker is NOT deleted on success — it guards its number until the
    // version is pruned. Deleting it early would let a racing writer that
    // computed a stale next-number re-claim an existing version dir.
    val (next, _) = reserve(f)
    try write(new Path(rootPath, next).toString)
    catch { case e: Throwable =>
      // remove the partial version dir so the no-manifest newest-wins
      // fallback can never resolve to a half-written version; the burned
      // marker just makes the next writer skip this number
      f.delete(new Path(rootPath, next), true)
      throw e
    }
    // install = one ATOMIC CREATE of this version's own marker file. No
    // shared manifest is ever deleted or renamed, so concurrent writers
    // cannot regress each other: resolution ([[currentVersion]]) picks the
    // newest installed marker deterministically, whatever order flips land
    // in. (The previous single-file delete+rename had a check-then-act
    // window in which a slow older writer could overwrite a newer one's
    // manifest — unfixable without filesystem compare-and-swap.)
    require(atomicCreate(f, new Path(rootPath, s"_FLIP_$next")) ||
        f.exists(new Path(rootPath, s"_FLIP_$next")),
      s"could not install flip marker for $root/$next")
    // a stale legacy manifest would shadow nothing (markers win resolution)
    // but clean it up so pre-marker readers of this layout don't misresolve
    if (f.exists(manifestPath)) f.delete(manifestPath, false)
    listVersions.dropRight(keepVersions).foreach { v =>
      f.delete(new Path(rootPath, v), true)
      f.delete(new Path(rootPath, s"$v.deltas"), true) // sidecars die with their base
      f.delete(new Path(rootPath, s"_FLIP_$v"), false) // marker dies with its version
      f.delete(new Path(rootPath, s".reserve_$v"), false)
    }
  }

  def deleteAll(): Unit = {
    val f = fs
    if (f.exists(rootPath)) f.delete(rootPath, true)
  }

  // ------- delta sidecars: O(batch) appends beside the ACTIVE version -------
  //
  // Layout: root/<version>.deltas/d00000001/… — immutable, sequence-numbered
  // delta directories belonging to ONE base version ("v\d+\.deltas" does not
  // match the version regex, so they are invisible to listVersions). A new
  // base version starts with zero deltas; pruning a version prunes its
  // sidecars. Writes land in a dot-prefixed temp dir and RENAME into place,
  // so a reader listing deltas never sees a half-written one. How deltas
  // merge with the base (shadowing, tombstones) is the CALLER's semantics —
  // this class only provides the atomic append + listing.

  private def deltaRoot(version: String) = new Path(rootPath, s"$version.deltas")

  /** Sequence-numbered delta dirs of the ACTIVE version, oldest first. A
    * `_kind` suffix on the dir name tags the delta's merge semantics for
    * the caller (unsuffixed dirs read back as kind "put" — the original
    * replace-touched-keys kind, so pre-kind layouts stay readable).
    */
  def listDeltas: Seq[VersionedDir.DeltaRef] = currentVersion match {
    case None => Seq.empty
    case Some(v) =>
      val f = fs
      val dr = deltaRoot(v)
      if (!f.exists(dr)) Seq.empty
      else f.listStatus(dr).toSeq
        .filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.matches("d\\d+(_[a-z]+)?"))
        .map { p =>
          val (num, kind) = p.getName.drop(1).split("_", 2) match {
            case Array(n)    => (n.toLong, "put")
            case Array(n, k) => (n.toLong, k)
          }
          VersionedDir.DeltaRef(num, kind, p.toString)
        }
        .sortBy(_.seq)
  }

  /** Append one delta beside the active version via `write(tmpDir)`; the
    * temp dir renames into its final sequence-numbered name on success.
    * Single-writer contract (same as replaceWith read-modify-write).
    */
  def appendDelta(write: String => Unit, kind: String = "put"): Unit = {
    require(kind.matches("[a-z]+"), s"delta kind must be lowercase letters: $kind")
    val v = currentVersion.getOrElse(
      throw new IllegalStateException(s"no base version to append a delta to under $root"))
    val f = fs
    val dr = deltaRoot(v)
    f.mkdirs(dr)
    val next = listDeltas.lastOption.map(_.seq).getOrElse(0L) + 1
    val name = "d%08d".format(next) + (if (kind == "put") "" else s"_$kind")
    val tmp = new Path(dr, s".tmp_$name")
    f.delete(tmp, true)
    try write(tmp.toString)
    catch { case e: Throwable => f.delete(tmp, true); throw e }
    require(f.rename(tmp, new Path(dr, name)), s"delta rename failed for $root/$v/$name")
  }

  /** Compact the ACTIVE version into a new version with `targetFileMB`-sized
    * files (bin-packed read → coalesced write; per partition-dir layouts the
    * repartition keys on the partition column, keeping one file per dir).
    * Small-file accretion is the silent killer of long-lived indexes at
    * scale: every streaming upsert/rebuild cycle writes task-count files,
    * and a year of micro-batches turns a scan into millions of opens.
    * Compaction is just `replaceWith` — readers keep their version, the
    * swap is atomic, old versions prune by `keepVersions`.
    */
  def compact(spark: SparkSession, partitionCol: Option[String] = None,
              targetFileMB: Int = 128, sortCol: Option[String] = None): Unit = {
    val src = currentDir.getOrElse(
      throw new IllegalStateException(s"nothing to compact under $root"))
    val f = fs
    def dirBytes(p: Path): Long = f.getContentSummary(p).getLength
    val bytes = dirBytes(new Path(src))
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt +
      (if (bytes % (targetFileMB.toLong << 20) > 0) 1 else 0))
    replaceWith { dir =>
      val df = spark.read.parquet(src)
      (partitionCol, sortCol) match {
        case (Some(c), _) =>
          df.repartition(org.apache.spark.sql.functions.col(c))
            .write.mode("overwrite").partitionBy(c).parquet(dir)
        case (None, Some(s)) =>
          // keep the store's zone-map layout: range-partitioned to the
          // bin-packed file count, sorted within files → tight min/max
          df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(s))
            .sortWithinPartitions(s).write.mode("overwrite").parquet(dir)
        case (None, None) =>
          df.repartition(nFiles).write.mode("overwrite").parquet(dir)
      }
      // side tables (_codebooks/_centroids, tiny by design) carry over so
      // the compacted version stays self-contained
      f.listStatus(new Path(src)).filter(s => s.isDirectory && s.getPath.getName.startsWith("_"))
        .foreach { s =>
          VersionedDir.readSide(spark, s.getPath.toString).coalesce(1)
            .write.mode("overwrite").parquet(s"$dir/${s.getPath.getName}")
        }
    }
  }
}

object VersionedDir {
  /** One delta sidecar of a base version: its sequence number (merge order),
    * its merge-semantics kind ("put" replace-touched-keys / "add" old-wins
    * insert / "del" tombstones — interpreted by the caller), and its path.
    */
  final case class DeltaRef(seq: Long, kind: String, path: String)

  /** Resolve a path that may be a versioned root OR a plain directory: the
    * active version dir if a manifest/version layout is present, the path
    * itself otherwise. Readers pin the resolved CONCRETE version dir, so a
    * concurrent `replaceWith` cannot pull files out from under a plan built
    * from the resolved path (within `keepVersions` rebuilds).
    */
  def resolve(spark: SparkSession, root: String): String =
    new VersionedDir(spark, root).currentDir.getOrElse(root)

  /** Read an underscore-prefixed side table (`_centroids`/`_codebooks`/…)
    * by its DATA FILES' exact paths: pointing `spark.read.parquet` at the
    * `_`-prefixed directory itself trips Spark's hidden-path filter and
    * logs "All paths were ignored" on EVERY read — hundreds of WARN lines
    * per bench run across the quantized-index tiers. Listing the part
    * files and handing Spark concrete file paths reads the same data
    * silently (the `_` filter applies to path basenames; plain
    * `part-*.parquet` names pass).
    */
  def readSide(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status = if (f.exists(p)) f.listStatus(p) else Array.empty[org.apache.hadoop.fs.FileStatus]
    // FLAT-LAYOUT CONTRACT: side tables are written as a single directory
    // of part files (coalesce(1), no partitionBy) — this helper lists only
    // immediate plain files, so a PARTITIONED side table (subdirectories)
    // would silently fall back to the directory read and reintroduce the
    // hidden-path WARN flood this exists to avoid. Fail loudly instead.
    val subdirs = status.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_")
      && !s.getPath.getName.startsWith("."))
    require(subdirs.isEmpty,
      s"readSide($dir): side tables must be written flat (no partitionBy); " +
      s"found subdirectories: ${subdirs.map(_.getPath.getName).mkString(", ")}")
    val files = status.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet")
    }.map(_.getPath.toString)
    // empty/missing dir: fall through to the directory read so the caller
    // gets Spark's usual unable-to-infer-schema error, not a new one
    if (files.isEmpty) spark.read.parquet(dir)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
