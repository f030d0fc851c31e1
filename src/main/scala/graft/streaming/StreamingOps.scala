package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.core.IndexConfig
import graft.embed.EmbeddingBackend
import graft.functions.textkernel._
import graft.pipeline.IndexBuild

/** Structured Streaming extensions (SURVEY.md §2.10: the reference has no
  * stream processing — this is the scale extension reserved by the build
  * plan): incremental index maintenance and event-time session state.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts over an event stream — streaming twin
    * of [[graft.ops.Events.tumblingDaily]].
    */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour",
                     windowLength: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))

  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, start: Long, end: Long, n_events: Long)

  /** These state functions drive eviction with `setTimeoutDuration`, which
    * is only legal under ProcessingTimeTimeout — an EventTimeTimeout would
    * throw in the executor and fail every micro-batch. Reject it at plan
    * time with a clear message instead.
    */
  private def requireProcessingTimeOrNone(timeout: GroupStateTimeout): Unit =
    require(timeout == GroupStateTimeout.NoTimeout() ||
      timeout == GroupStateTimeout.ProcessingTimeTimeout(),
      s"only NoTimeout or ProcessingTimeTimeout is supported (eviction uses " +
        s"setTimeoutDuration, a processing-time mechanism); got $timeout")

  /** Custom per-key session state via flatMapGroupsWithState: emits a session
    * when `gapSeconds` of event-time inactivity elapse (processing-time
    * timeout drives the flush). Streaming twin of
    * [[graft.ops.Events.sessionize]].
    */
  def sessions(events: DataFrame, gapSeconds: Long = 1800,
               timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
              (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    requireProcessingTimeOrNone(timeout)
    val useTimeout = timeout != GroupStateTimeout.NoTimeout()
    events.selectExpr("user_id", "CAST(ts AS LONG) AS ts_sec")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => SessionOut(userId, s.start, s.last, s.n))
            state.remove()
            out.iterator
          } else {
            val ts = rows.map(_._2).toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (t <- ts) {
              cur match {
                case Some(s) if t - s.last <= gapSeconds =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000)
            closed.reverseIterator
          }
      }.toDF()
  }

  /** Exact dedup over a document stream: normalized-content hash (same
    * md5-of-word-stream as [[graft.ops.Dedup.exact]]) deduplicated with
    * WATERMARK-BOUNDED state — the state store holds one entry per distinct
    * hash seen within the watermark horizon and is evicted as event time
    * advances. A plain `dropDuplicates` on an unbounded ingest stream grows
    * state forever; at 100 TB/day this is the difference between a working
    * pipeline and an OOM.
    */
  def streamingExactDedup(docs: DataFrame, textCol: String = "text",
                          tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(concat_ws(" ", word_tokens(col(textCol)))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming CROSS-CORPUS exact dedup: drop stream documents whose
    * normalized fingerprint was already accepted into a persisted
    * REFERENCE corpus — the live-ingest half of
    * [[graft.ops.Dedup.crossCorpusExactDedupBloom]]. The reference is a
    * Bloom filter built once per accepted dump
    * ([[graft.ops.Dedup.buildFingerprintBloom]]) and probed per row as a
    * STATELESS filter — no state store at all, so unlike the within-stream
    * dedups there is no watermark to size and nothing to evict; compose
    * with [[streamingExactDedup]] afterwards to also dedup the stream
    * against itself. The bloom side errs toward dropping (fpp false
    * positives discard a few fresh docs — the cheap, safe direction for
    * training-data ingest; size fpp accordingly). Returns the stream rows
    * that are NOT in the reference.
    */
  def streamingCrossCorpusDedup(docs: DataFrame, filterBytes: Array[Byte],
                                textCol: String = "text"): DataFrame =
    docs.withColumn("__fp", md5(concat_ws(" ", word_tokens(col(textCol)))))
      .filter(!graft.functions.textkernel.bloom_might_contain(col("__fp"), filterBytes))
      .drop("__fp")

  /** Streaming URL-level dedup for a live crawl feed: canonicalize
    * ([[graft.ops.Urls.canonicalColumn]] — tracking params, fragments,
    * case, default ports all collapse) and keep the first arrival per
    * canonical URL within the watermark. State is bounded exactly like
    * [[streamingExactDedup]]: `dropDuplicatesWithinWatermark` evicts keys
    * older than the watermark, so re-crawls inside the horizon drop and
    * state never grows with the full URL history (an unbounded crawl
    * frontier would OOM plain `dropDuplicates`). Unparseable URLs
    * (null canonical) are dropped — they carry no dedup identity.
    */
  def streamingUrlDedup(docs: DataFrame, urlCol: String = "url",
                        tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("url_canon", graft.ops.Urls.canonicalColumn(col(urlCol)))
      .filter(col("url_canon").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url_canon")

  /** Streaming media-level perceptual dedup for a live media crawl:
    * fingerprint each arriving clip/image inside the partition
    * ([[graft.ops.Multimodal.withMediaFingerprint]] — audio energy
    * fingerprint for PCM WAV, dHash for decodable images) and keep the
    * first arrival per fingerprint within the watermark. The media BYTES
    * never enter the state store — state is one row per distinct 8-byte
    * fingerprint inside the horizon, evicted as event time advances (the
    * same bounded-state trade as [[streamingExactDedup]]). Undecodable
    * rows drop — they carry no dedup identity.
    */
  def streamingMediaDedup(media: DataFrame, binaryCol: String = "media",
                          tsCol: String = "ts", watermark: String = "1 hour",
                          kind: String = "audio"): DataFrame =
    graft.ops.Multimodal.withMediaFingerprint(media, binaryCol, "media_fp", kind)
      .filter(col("media_fp").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("media_fp")

  final case class BucketRep(repId: Long, sig: Seq[Long])
  final case class NearDupCand(id_a: Long, id_b: Long, band: Int, est_jaccard: Double)

  /** Streaming near-dup candidates: MinHash band buckets with a per-bucket
    * REPRESENTATIVE kept in keyed state — the streaming twin of the batch
    * hot-bucket discipline ([[graft.ops.Dedup.cappedBucketPairs]]). The
    * first-seen doc (min id within its arrival batch) becomes the bucket's
    * star center; every later arrival emits one candidate pair
    * `(rep, doc)` with the signature-agreement Jaccard estimate. State is
    * one (id, signature) per OCCUPIED (band, bucket) — O(#buckets), and
    * each arriving doc does O(bands) state lookups — never a growing join,
    * never B² pairs, no matter how hot a bucket runs. Idle bucket
    * representatives are EVICTED after `idleTimeout` of processing-time
    * inactivity (r5 verdict #8: `NoTimeout` state grows with every bucket
    * ever occupied — unbounded on unbounded ingest). A doc arriving after
    * its bucket's representative expired just becomes the fresh
    * representative — candidate recall across quiet periods traded for
    * bounded state, the same trade the watermark-bounded exact dedup above
    * makes. Tests driving via `processAllAvailable` pass `NoTimeout` (that
    * combination never settles otherwise).
    *
    * Downstream: exact-verify candidate pairs in batch (join shingles by
    * id) or act on the estimate directly for aggressive ingest filtering.
    */
  def streamingNearDupCandidates(docs: DataFrame, textCol: String = "text",
                                 numHashes: Int = 8, rowsPerBand: Int = 2,
                                 shingleSize: Int = 3,
                                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout(),
                                 idleTimeout: String = "1 hour")
                                (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    requireProcessingTimeOrNone(timeout)
    val numBands = numHashes / rowsPerBand
    val useTimeout = timeout != GroupStateTimeout.NoTimeout()
    val sig = docs
      .withColumn("__sig", minhash_sig(col(textCol), numHashes, shingleSize))
      .filter(col("__sig").isNotNull && forall(col("__sig"), x => x.isNotNull))
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(col("__sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), md5(concat_ws("_", parts: _*)).as("bucket"))
    }
    sig.select(col("doc_id").cast("long"), explode(array(bandCols: _*)).as("bb"), col("__sig"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"), col("__sig"))
      .as[(Long, Int, String, Seq[Long])]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BucketRep, NearDupCand](
        OutputMode.Append(), timeout) {
        case ((band, _), rows, state: GroupState[BucketRep]) =>
          if (state.hasTimedOut) {
            state.remove() // idle bucket: evict the representative
            Iterator.empty
          } else {
            // sort within the micro-batch so the representative choice (and
            // therefore the emitted pairs) is deterministic under re-execution
            val sorted = rows.toSeq.sortBy(_._1)
            var rep = state.getOption
            val out = Seq.newBuilder[NearDupCand]
            for ((id, _, _, s) <- sorted) {
              rep match {
                case None => rep = Some(BucketRep(id, s))
                case Some(r0) if r0.repId == id => () // replay of the rep itself
                case Some(r0) =>
                  val n = math.min(r0.sig.length, s.length)
                  val agree = (0 until n).count(i => r0.sig(i) == s(i))
                  out += NearDupCand(r0.repId, id, band,
                    if (n == 0) 0.0 else agree.toDouble / n)
              }
            }
            rep.foreach(state.update)
            if (useTimeout) state.setTimeoutDuration(idleTimeout)
            out.result().iterator
          }
      }.toDF()
  }

  /** Incremental index maintenance: every micro-batch of changed source rows
    * runs the batch diff-and-embed pipeline and lands as an O(batch) DELTA
    * sidecar of the versioned index ([[graft.api.ParquetIndexStore
    * .appendDelta]]); readers resolve new-wins merge-on-read, and every
    * `compactEvery` batches the deltas fold into a full base version. The
    * A4 incremental rebuild (reference storage/django.py:320-383) lifted
    * onto `foreachBatch` — without the full-index rewrite per batch the
    * naive lift would cost.
    */
  def incrementalIndex(sourceStream: DataFrame, config: IndexConfig,
                       backend: EmbeddingBackend, table: String, idCol: String,
                       indexPath: String, checkpoint: String,
                       compactEvery: Int = 10): StreamingQuery =
    incrementalIndexInto(sourceStream, checkpoint,
      new graft.api.ParquetIndexStore(sourceStream.sparkSession, indexPath),
      config, backend, table, idCol, compactEvery, (_, _) => ())

  /** [[incrementalIndex]] against a full [[graft.api.VectorIndex]]: each
    * micro-batch goes through the index's own store AND patches its ANN
    * side structures incrementally (changed vectors assigned against the
    * EXISTING centroids/codebooks/hyperplanes — no per-batch retrain), so a
    * `search(mode = Lsh/Ivf)` issued after a batch sees the stream's
    * documents through the pruned path. Versioned swaps mean a search
    * planned mid-batch still completes.
    */
  def incrementalIndex(sourceStream: DataFrame, index: graft.api.VectorIndex,
                       checkpoint: String): StreamingQuery =
    incrementalIndex(sourceStream, index, checkpoint, compactEvery = 10)

  /** [[incrementalIndex]] with an explicit delta-fold cadence. */
  def incrementalIndex(sourceStream: DataFrame, index: graft.api.VectorIndex,
                       checkpoint: String, compactEvery: Int): StreamingQuery =
    incrementalIndexInto(sourceStream, checkpoint, index.store, index.config,
      index.backend, index.sourceTable, index.idColumn, compactEvery,
      (docs, removed) => index.refreshAnnIncremental(docs, removed))

  private def incrementalIndexInto(sourceStream: DataFrame, checkpoint: String,
                                   store: graft.api.IndexStore, config: IndexConfig,
                                   backend: EmbeddingBackend, table: String, idCol: String,
                                   compactEvery: Int,
                                   afterBatch: (DataFrame, DataFrame) => Unit): StreamingQuery =
    sourceStream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { // an empty trigger must not accrete empty deltas
          val spark = batch.sparkSession
          val stored = store.readOption()
          // PERSIST for the batch: docs is consumed by the store write, the
          // removed-ids computation, and (via afterBatch) one ANN delta per
          // structure — without the cache the chunk+diff+EMBED pipeline (the
          // expensive stage, possibly a remote model call per row) would
          // re-run up to ~5x per micro-batch, and a non-deterministic
          // backend could even store a different vector than the ANN deltas
          val docs = IndexBuild.buildDocuments(batch, config, backend, table, idCol, stored)
            .persist()
          // stored doc_ids displaced by this batch (their object key was
          // re-embedded under new ids) — EQUI-join on the exploded key, never
          // an array_contains θ-join (which plans as a nested loop over the
          // whole stored index)
          val removed = (stored match {
            case Some(s) =>
              val touched = docs.select(explode(col("object_keys")).as("__k")).distinct()
              s.select(col("doc_id"), explode(col("object_keys")).as("__k"))
                .join(broadcast(touched), Seq("__k")).select("doc_id").distinct()
                .join(broadcast(docs.select("doc_id")), Seq("doc_id"), "left_anti")
            case None => spark.range(0).select(col("id").as("doc_id"))
          }).persist()
          try {
            store match {
              case p: graft.api.ParquetIndexStore =>
                p.appendDelta(docs) // O(batch); merge-on-read shadows old copies
                if (p.deltaCount >= compactEvery) p.foldDeltas()
              case other =>
                // stores without delta support get the same semantics as one
                // equi-join merge + replace through the provider seam
                val merged = stored match {
                  case Some(s) => s.join(broadcast(removed.unionByName(docs.select("doc_id"))),
                      Seq("doc_id"), "left_anti").unionByName(docs)
                  case None => docs
                }
                other.replace(merged)
            }
            afterBatch(docs, removed)
          } finally {
            docs.unpersist(false)
            removed.unpersist(false)
          }
        }
      }
      .start()
}
