package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * These parquet tables play the role of the reference's normalized
  * Postgres schema (kuko6/tweets-elastic `src/main.py:52-97`):
  * orders→conversations, customer→authors, lineitem→child collections,
  * part/supplier/nation/region→dimension lookups, documents→tweet text,
  * events→stream, embeddings→similarity extension (SURVEY.md §7).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * microsecond timestamp — the sub-microsecond part of the synthetic
    * data is zero, so this is lossless here; at scale the same trick
    * applies (nanos → micros is a plain projection). */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integral `div`, NOT `/`: long / long is double division in the
      // Column DSL, and 2024-epoch nanos exceed 2⁵³ — the round-trip
      // through double was off by 1 µs on some rows
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
