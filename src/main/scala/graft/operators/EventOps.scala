package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time analytics over the `events` table — the batch semantics
  * that the Structured Streaming path (graft.streaming.EventStream)
  * shares. The reference has no streaming (SURVEY.md §2.9); these are
  * the deliberate scale extensions. Aggregations group on
  * (time bucket, type): one shuffle keyed by the group — at 100 TB the
  * bucket+type key is high-cardinality enough to spread, and partial
  * aggregation collapses rows map-side first.
  */
object EventOps {

  /** E1 tumbling window: hourly counts/sums per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** E2 sessionization: per user, a >30-min silence gap starts a new
    * session (classic lag+cumsum). One shuffle on user_id; the window
    * sort is per-user, so skew only if one user dominates. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"),
        (unix_timestamp(max(col("ts"))) -
          unix_timestamp(min(col("ts")))).as("duration_s"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** E3 sliding window (1h window, 30min slide) — each event lands in 2
    * buckets; expressed with the built-in `window()` generator. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
}
