package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table — batch twins of the
  * Structured Streaming operators in [[graft.streaming.StreamingOps]]
  * (same semantics; the streaming versions add watermarking/state).
  */
object Events {

  /** Tumbling event-time window aggregation: per (day, event_type) counts
    * and value sums. Values are summed as scaled integers (micro-units) so
    * the sum is exact and engine/shuffle-order independent — double sums are
    * order-dependent, and decimal sums proved JIT-hostile in the generated
    * aggregate loop (interpreter fallbacks under code-cache pressure).
    */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").getField("start").cast("date").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 1000000).cast("long")) / 1000000.0).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Sessionization (batch form): a new session starts after a gap of more
    * than `gapMinutes` of inactivity per user. Two windows over the same
    * user/ts partitioning — one shuffle, reused across both window functions.
    * The streaming twin uses flatMapGroupsWithState.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val withGap = events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev_ts")) > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_index", sum(col("__new_session")).over(byUser))
    withGap.groupBy(col("user_id"), col("session_index"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** JSON property extraction (events.props is a JSON string). */
  def extractProps(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
}
