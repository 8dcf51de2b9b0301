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
    * static customer + the FUSED child relation
    * (`Denorm.childrenPerOrder` — both arrays from one aggregation,
    * so the static side shuffles once per trigger, not once per child
    * collection). */
  def docsFromChildren(orders: DataFrame, cust: DataFrame,
                       children: DataFrame): DataFrame = {
    val itemsType = children.schema("items").dataType
    val annsType = children.schema("annotations").dataType
    orders
      .join(cust, orders("o_custkey") === cust("c_custkey"), "inner")
      .join(children, orders("o_orderkey") === children("order_id"), "left")
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

  /** ST4, driver-runnable: the flagship denorm ETL run as a REAL
    * stream — orders arrive as a file stream, customer and the fused
    * child frame are static, the stream-static left joins are
    * stateless (append mode, no watermark needed), and the memory-sink
    * result must equal the batch denorm. The flat verification
    * projection (id, author, child-array sizes) rides INSIDE the
    * streaming query, so the sink stores four scalars per order — the
    * nested arrays are built and measured but never collected. */
  def runDenorm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Paths.get(dir, "orders.parquet")
    val schema = spark.read.parquet(path.toString).schema
    val ordersStream = spark.readStream.schema(schema)
      .parquet(EventStream.streamableDir(path))
    // A stream-static join re-evaluates the static plan EVERY trigger:
    // live (un-materialized), each micro-batch would re-run the full
    // lineitem shuffle + both collect_lists. The child aggregate is a
    // MAINTAINED TABLE (Denorm.childrenTable — built once per corpus
    // version, re-read per trigger), which is also the 100 TB shape:
    // the aggregate doesn't fit executor memory there, the trigger
    // re-reads the compacted table. Reading parquet instead of caching
    // also keeps the stream run off the driver-heap columnar cache —
    // pinning 150 k array-of-struct rows into a long-lived JVM's heap
    // mid-bench was the round-6 st4 tail-latency suspect.
    val cust = graft.Tables.customer(spark, dir)
    val children = graft.operators.Denorm.childrenTable(spark, dir)
    val docs = docsFromChildren(ordersStream, cust, children)
    val flat = docs.select(col("id"), col("author.id").as("author_id"),
      size(col("items")).as("n_items"),
      size(col("annotations")).as("n_annotations"))
    val table = EventStream.runToMemory(flat, OutputMode.Append, "st4_")
    spark.table(table).orderBy(col("id"))
  }

  /** Incremental ingest: watch `ordersDir` for new order files, denorm
    * each micro-batch against the static frames, append parquet. The
    * static sides are persisted ONCE for the stream's lifetime (see
    * [[ingestWith]]) — before round 7 this path re-ran the full
    * lineitem shuffle + collect_lists on every micro-batch. */
  def ingest(spark: SparkSession, ordersDir: String, sfDir: String,
             outDir: String, checkpoint: String,
             maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    ingestWith(spark, ordersDir,
      graft.Tables.customer(spark, sfDir),
      graft.operators.Denorm.childrenTable(spark, sfDir),
      outDir, checkpoint, maxFilesPerTrigger)

  /** [[ingest]] with caller-supplied static frames — the seam the
    * scan-count probe in DenormStreamSpec uses to PROVE the
    * once-per-run materialization. Both frames are persisted and
    * materialized here, before the first trigger, and released by a
    * termination listener when THIS query ends (the query runs async,
    * so a `finally` can't scope the cache). */
  def ingestWith(spark: SparkSession, ordersDir: String, cust: DataFrame,
                 children: DataFrame, outDir: String, checkpoint: String,
                 maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    // schema from the files if any have landed, else from the orders
    // TABLE contract — a watcher started on a still-empty directory
    // must start fine and pick files up as they arrive (it did before
    // the files-first inference; keep both paths working)
    val schema =
      try spark.read.parquet(ordersDir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") ||
              e.getMessage.contains("PATH_NOT_FOUND") =>
          graft.operators.Denorm.ordersSchema
      }
    val custP = cust.persist()
    val childrenP = children.persist()
    // The unpersisting listener must be registered BEFORE start(): an
    // AvailableNow query over a tiny/empty directory can terminate
    // before a post-start registration, and the missed termination
    // event would pin both frames for the session lifetime. The
    // listener can't know the query id pre-start, so the query gets a
    // UNIQUE NAME and the listener learns its id from the started
    // event (delivered on the same ordered bus as — and therefore
    // strictly before — the termination event it must catch).
    val qname = s"denorm_ingest_${java.util.UUID.randomUUID()}"
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        @volatile private var qid: Option[java.util.UUID] = None
        private def release(): Unit = {
          custP.unpersist(blocking = false)
          childrenP.unpersist(blocking = false)
          spark.streams.removeListener(this)
        }
        override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
          if (e.name == qname) qid = Some(e.id)
        override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (qid.contains(e.id)) release()
      }
    spark.streams.addListener(listener)
    // anything failing before start() must release the pins — after a
    // successful start the termination listener owns them
    try {
      childrenP.count(); custP.count()
      val reader = spark.readStream.schema(schema)
      maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val ordersStream = reader.parquet(ordersDir)
      val docs = docsFromChildren(ordersStream, custP, childrenP)
      docs.writeStream
        .queryName(qname)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", outDir)
        .trigger(Trigger.AvailableNow())
        .start()
    } catch {
      case e: Throwable =>
        custP.unpersist(blocking = false)
        childrenP.unpersist(blocking = false)
        spark.streams.removeListener(listener)
        throw e
    }
  }
}
