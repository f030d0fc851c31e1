package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.core.IndexConfig
import graft.embed.EmbeddingBackend
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

  /** Custom per-key session state via flatMapGroupsWithState: emits a session
    * when `gapSeconds` of event-time inactivity elapse (processing-time
    * timeout drives the flush). Streaming twin of
    * [[graft.ops.Events.sessionize]].
    */
  def sessions(events: DataFrame, gapSeconds: Long = 1800,
               timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
              (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
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

  /** Incremental index maintenance: every micro-batch of changed source rows
    * runs the batch diff-and-embed pipeline and upserts the index — the A4
    * incremental rebuild (reference storage/django.py:320-383) lifted onto
    * `foreachBatch`, exactly as SURVEY.md §2.10 reserves.
    */
  def incrementalIndex(sourceStream: DataFrame, config: IndexConfig,
                       backend: EmbeddingBackend, table: String, idCol: String,
                       indexPath: String, checkpoint: String): StreamingQuery =
    incrementalIndexInto(sourceStream, checkpoint,
      new graft.api.ParquetIndexStore(sourceStream.sparkSession, indexPath),
      config, backend, table, idCol, () => ())

  /** [[incrementalIndex]] against a full [[graft.api.VectorIndex]]: each
    * micro-batch goes through the index's own store AND refreshes its ANN
    * side structures, so a `search(mode = Lsh/Ivf)` issued after a batch
    * sees the stream's documents through the pruned path. Versioned swaps
    * mean a search planned mid-batch still completes.
    */
  def incrementalIndex(sourceStream: DataFrame, index: graft.api.VectorIndex,
                       checkpoint: String): StreamingQuery =
    incrementalIndexInto(sourceStream, checkpoint, index.store, index.config,
      index.backend, index.sourceTable, index.idColumn, () => index.refreshAnn())

  private def incrementalIndexInto(sourceStream: DataFrame, checkpoint: String,
                                   store: graft.api.IndexStore, config: IndexConfig,
                                   backend: EmbeddingBackend, table: String, idCol: String,
                                   afterBatch: () => Unit): StreamingQuery =
    sourceStream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val stored = store.readOption()
        val docs = IndexBuild.buildDocuments(batch, config, backend, table, idCol, stored)
        // overwrite-with-union = upsert for the touched keys; the store's
        // versioned replace keeps concurrent readers on the prior version
        val merged = stored match {
          case Some(s) =>
            val touched = docs.select(explode(col("object_keys")).as("k")).distinct()
            s.join(touched, array_contains(s("object_keys"), col("k")), "left_anti")
              .drop("k").unionByName(docs)
          case None => docs
        }
        store.replace(merged)
        afterBatch()
      }
      .start()
}
