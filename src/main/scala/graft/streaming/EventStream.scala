package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingest — the streaming re-expression of the
  * reference's batch bulk-import loop (kuko6/tweets-elastic
  * `src/main.py:106-162`): instead of keyset pagination + hand-rolled
  * chunking, a file/memory source streams micro-batches through the
  * same transforms and a `foreachBatch`/parquet sink, with event-time
  * watermarks bounding state. SURVEY.md §2.9 marks this as a deliberate
  * extension.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window aggregation over a streaming frame —
    * identical group semantics to EventOps.tumbling, late data beyond
    * 10 minutes dropped, state bounded by the watermark. */
  def windowedCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** File-source ingest of an events directory, windowed, written as
    * parquet via foreachBatch (the S6 bulk-sink analog with exactly-once
    * per micro-batch). */
  def ingest(spark: SparkSession, srcDir: String, outDir: String,
             checkpoint: String): StreamingQuery = {
    val stream = spark.readStream.schema(eventSchema).parquet(srcDir)
    windowedCounts(stream).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Gap-based session windows on a stream — Spark's native
    * `session_window` (dynamic-length windows closed by the watermark);
    * the streaming twin of EventOps.sessionize. */
  def sessionWindows(stream: DataFrame, gap: String = "30 minutes"): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup: drop re-delivered events by id within the
    * watermark horizon — the exactly-once ingest guard a pipeline puts
    * in front of the bulk sink (state bounded by the watermark). */
  def dedupedStream(stream: DataFrame): DataFrame =
    stream.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom per-key state: running per-user event counter via
    * mapGroupsWithState (the reference's driver-side `processed_rows`
    * accounting, `src/main.py:128-156`, done as distributed state). */
  case class UserCount(userId: Long, n: Long)
  def runningUserCounts(spark: SparkSession, stream: DataFrame): DataFrame = {
    import spark.implicits._
    stream.selectExpr("user_id", "event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          UserCount(user, n)
      }
      .toDF()
  }
}
