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

  /** Upstream writers have shipped `events.ts` under several parquet
    * encodings over time — TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects outright, hence `nanosAsLong`), plain microsecond
    * timestamp-without-timezone (read back as TIMESTAMP_NTZ), and true
    * TIMESTAMP. The ingest contract of this engine is a single
    * `TimestampType` column regardless of encoding (the reference pins
    * ingest typing the same way via an explicit date format in its
    * mapping), so normalize all three here. NTZ → TIMESTAMP is a
    * lossless reinterpretation under the pinned UTC session timezone. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    // SCOPED conf flip (round-13 review: the old unconditional set
    // left nanosAsLong on for the whole session, so a later parquet
    // read of an UNRELATED nanos-encoded table would silently decode
    // raw longs instead of hitting normalizeTs's loud refusal). The
    // flag matters at schema-resolution time — `spark.read.parquet`
    // reads footers eagerly and the resolved relation carries its own
    // hadoop conf snapshot — so restoring right after the read leaves
    // this frame's execution unaffected (exercised by every e/st
    // query run after other tables' reads).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.withColumn("ts", normalizeTs(df.schema("ts").dataType))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** `ts` under any historical encoding → one `TimestampType` column.
    * Shared by the batch reader above and the streaming ingest
    * (`streaming.EventStream.eventsStream`). */
  private[graft] def normalizeTs(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    dt match {
      // nanos-as-long: integral `div`, NOT `/` — long / long is double
      // division in the Column DSL, and 2024-epoch nanos exceed 2⁵³;
      // the round-trip through double was off by 1 µs on some rows
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other; expected " +
        "TIMESTAMP(NANOS) long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
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
