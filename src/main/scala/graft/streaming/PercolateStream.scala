package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Percolate

/** Streaming percolation — the alerting deployment of the percolator
  * (ES's canonical percolate use-case: match every arriving document
  * against the standing alert queries and emit hits as they happen).
  *
  * The stream side is STATELESS: the stored-query table broadcasts to
  * every task and each micro-batch percolates independently — no state
  * store, no watermark, unbounded throughput by partitioning alone. That
  * is exactly the property that makes percolation deployable on the
  * ingest path at 100 TB/day: it composes with the dedup/denorm stream
  * stages without adding shuffle or state.
  */
object PercolateStream {

  /** The documents table as a file-source stream (symlinked single
    * parquet, like [[EventStream.eventsStream]]). */
  def docsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Paths.get(dir, "documents.parquet")
    val schema = spark.read.parquet(path.toString).schema
    spark.readStream.schema(schema)
      .parquet(EventStream.streamableDir(path))
  }

  /** ST8: streaming percolate run end-to-end. Append mode — every hit
    * is final the moment its micro-batch completes (stateless operator,
    * nothing is ever retracted) — so on a finite input the emitted set
    * must equal the batch percolator exactly (the pc1 oracle, shared
    * verbatim). */
  def runPercolate(spark: SparkSession, dir: String): DataFrame = {
    val hits = Percolate.percolate(docsStream(spark, dir))
    val table = EventStream.runToMemory(hits, OutputMode.Append, "st8_")
    spark.table(table).orderBy(col("doc_id"), col("query_id"))
  }
}
