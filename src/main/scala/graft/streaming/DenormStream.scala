package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming version of the flagship denorm ETL (SURVEY.md §7 M5): the
  * reference's batch fetch-loop (`src/main.py:106-162`) becomes a file
  * stream of new `orders` micro-batches joined against STATIC
  * dimension/child frames — the stream-static join pattern. Each
  * micro-batch produces the same nested documents as the batch
  * `Denorm.docs` (verified in DenormStreamSpec), so incremental ingest
  * and backfill share one transform. At scale the child aggregates are
  * maintained tables (or are re-read per trigger); the stream side only
  * ever shuffles its own micro-batch. */
object DenormStream {

  /** Denorm transform over a (possibly streaming) orders frame with
    * static customer + pre-aggregated child frames. */
  def docsFrom(orders: DataFrame, cust: DataFrame, items: DataFrame,
               anns: DataFrame): DataFrame = {
    val itemsType = items.schema("items").dataType
    val annsType = anns.schema("annotations").dataType
    orders
      .join(cust, orders("o_custkey") === cust("c_custkey"), "inner")
      .join(items, orders("o_orderkey") === items("order_id"), "left")
      .join(anns.withColumnRenamed("order_id", "a_order_id"),
        orders("o_orderkey") === col("a_order_id"), "left")
      .select(
        orders("o_orderkey").as("id"),
        orders("o_orderstatus").as("status"),
        orders("o_orderpriority").as("priority"),
        orders("o_totalprice").as("total_price"),
        orders("o_orderdate").as("created_at"),
        struct(
          cust("c_custkey").as("id"),
          cust("c_name").as("name"),
          cust("c_mktsegment").as("segment"),
          cust("c_acctbal").as("acctbal")).as("author"),
        coalesce(col("items"), array().cast(itemsType)).as("items"),
        coalesce(col("annotations"),
          array().cast(annsType)).as("annotations"))
  }

  /** Incremental ingest: watch `ordersDir` for new order files, denorm
    * each micro-batch against the static frames, append parquet. */
  def ingest(spark: SparkSession, ordersDir: String, sfDir: String,
             outDir: String, checkpoint: String): StreamingQuery = {
    val static = graft.Tables.orders(spark, sfDir)
    val ordersStream = spark.readStream.schema(static.schema)
      .parquet(ordersDir)
    val docs = docsFrom(ordersStream,
      graft.Tables.customer(spark, sfDir),
      graft.operators.Denorm.itemsPerOrder(spark, sfDir),
      graft.operators.Denorm.annotationsPerOrder(spark, sfDir))
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
