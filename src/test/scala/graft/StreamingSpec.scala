package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.streaming.EventStream

/** Streaming ≡ batch: the watermarked windowed aggregation over the
  * events stream must produce the same groups as the batch query. */
class StreamingSpec extends SparkSpec {

  test("file-source stream with watermark matches batch tumbling agg") {
    val tmp = Files.createTempDirectory("graft-stream").toFile
    val src = new java.io.File(tmp, "src"); src.mkdirs()
    val out = new java.io.File(tmp, "out")
    val ckpt = new java.io.File(tmp, "ckpt")

    // stage the events table as the stream source directory
    Tables.events(spark, sf).write.mode("overwrite")
      .parquet(src.getAbsolutePath)

    val q = EventStream.ingest(spark, src.getAbsolutePath,
      out.getAbsolutePath, ckpt.getAbsolutePath)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(out.getAbsolutePath)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    // append mode + AvailableNow flushes all windows once the source is
    // exhausted (watermark advances past the max event time); the last
    // open window is only emitted if the watermark passes it, so allow
    // the batch side to have at most one extra (trailing) group per type
    val sGroups = streamed.select("win_start", "event_type", "n").collect()
      .map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    val bGroups = batch.collect()
      .map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    sGroups.foreach { case (k, n) => assert(bGroups(k) == n) }
    assert(sGroups.size >= bGroups.size - bGroups.keys.map(_._2).toSet.size)
  }

  test("streaming session windows match the batch sessionizer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val q = EventStream.sessionWindows(df, "30 minutes").writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    def t(m: String) = java.sql.Timestamp.valueOf(m)
    // user 7: two sessions separated by a 2h silence; user 8: one
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), 7L, "a", 1.0, "{}"),
      (2L, t("2024-01-01 10:10:00"), 7L, "a", 2.0, "{}"),
      (3L, t("2024-01-01 12:30:00"), 7L, "a", 3.0, "{}"),
      (4L, t("2024-01-01 10:05:00"), 8L, "a", 4.0, "{}"))
    q.processAllAvailable()
    // advance the watermark far enough to close every session
    mem.addData((5L, t("2024-01-02 00:00:00"), 9L, "a", 0.0, "{}"))
    q.processAllAvailable()
    val rows = spark.sql("select * from sessions").collect()
      .map(r => (r.getLong(2), r.getTimestamp(0).toString, r.getLong(3)))
      .toSet
    assert(rows.contains((7L, "2024-01-01 10:00:00.0", 2L)))
    assert(rows.contains((7L, "2024-01-01 12:30:00.0", 1L)))
    assert(rows.contains((8L, "2024-01-01 10:05:00.0", 1L)))
    q.stop()
  }

  test("streaming dedup drops re-delivered event ids within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val q = EventStream.dedupedStream(df).writeStream
      .format("memory").queryName("deduped").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData((1L, t0, 7L, "a", 1.0, "{}"), (1L, t0, 7L, "a", 1.0, "{}"),
      (2L, t0, 7L, "a", 1.0, "{}"))
    q.processAllAvailable()
    mem.addData((1L, t0, 7L, "a", 1.0, "{}")) // re-delivery, same batch horizon
    q.processAllAvailable()
    val ids = spark.sql("select event_id from deduped").collect()
      .map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L))
    q.stop()
  }

  test("stateful running user counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val counts = EventStream.runningUserCounts(spark, df)
    val q = counts.writeStream.format("memory").queryName("ucounts")
      .outputMode("update").start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData((1L, t, 7L, "click", 1.0, "{}"), (2L, t, 7L, "click", 1.0, "{}"),
      (3L, t, 8L, "view", 1.0, "{}"))
    q.processAllAvailable()
    mem.addData((4L, t, 7L, "click", 1.0, "{}"))
    q.processAllAvailable()
    val last = spark.sql("select * from ucounts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last(7L) == 3L && last(8L) == 1L)
    q.stop()
  }

  test("funnel state machine advances across micro-batches, in-batch order-free") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val machine = EventStream.funnelMachine(spark, df,
      Seq("signup", "click", "purchase"))
    val q = machine.writeStream.format("memory").queryName("funnel_t")
      .outputMode("update").start()
    def t(m: String) = java.sql.Timestamp.valueOf(m)
    // batch 1: user 7's click is DELIVERED before its signup (arrival
    // disorder inside one batch) — the in-batch time sort must still
    // count both stages; user 8 clicks before signing up in EVENT time
    // — must stay at stage 1
    mem.addData(
      (1L, t("2024-01-01 10:05:00"), 7L, "click", 1.0, "{}"),
      (2L, t("2024-01-01 10:00:00"), 7L, "signup", 1.0, "{}"),
      (3L, t("2024-01-01 09:00:00"), 8L, "click", 1.0, "{}"),
      (4L, t("2024-01-01 09:30:00"), 8L, "signup", 1.0, "{}"))
    q.processAllAvailable()
    // batch 2: user 7 purchases (advances to 3); user 8's later click
    // now satisfies strictly-after (advances to 2)
    mem.addData(
      (5L, t("2024-01-01 10:10:00"), 7L, "purchase", 1.0, "{}"),
      (6L, t("2024-01-01 09:45:00"), 8L, "click", 1.0, "{}"))
    q.processAllAvailable()
    val last = spark.sql("select * from funnel_t").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last(7L) == 3, s"user 7 reached ${last(7L)}")
    assert(last(8L) == 2, s"user 8 reached ${last(8L)}")
    q.stop()
  }

  test("retention machine across micro-batches: a late earlier week MOVES the cohort") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val machine = EventStream.retentionMachine(spark, df)
    val q = machine.writeStream.format("memory").queryName("ret_t")
      .outputMode("update").start()
    def t(m: String) = java.sql.Timestamp.valueOf(m)
    // batch 1: user 7 active in weeks of Jan-08 and Jan-22 (Mondays);
    // cohort Jan-08, offsets {0, 2}
    mem.addData(
      (1L, t("2024-01-09 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, t("2024-01-23 10:00:00"), 7L, "view", 1.0, "{}"))
    q.processAllAvailable()
    // batch 2: an EARLIER week (Jan-01) arrives late — retention is
    // order-insensitive, so the cohort must MOVE back a week and every
    // offset reshift: cohort Jan-01, offsets {0, 1, 3}
    mem.addData((3L, t("2024-01-03 10:00:00"), 7L, "click", 1.0, "{}"))
    q.processAllAvailable()
    val snaps = spark.sql("select * from ret_t").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getSeq[Long](3)))
    val epochDays = (m: String) =>
      java.time.LocalDate.parse(m).toEpochDay
    assert(snaps.contains((2, epochDays("2024-01-08"), Seq(0L, 2L))),
      s"batch-1 snapshot missing: ${snaps.mkString(", ")}")
    // converged = max-nWeeks snapshot
    val last = snaps.maxBy(_._1)
    assert(last == ((3, epochDays("2024-01-01"), Seq(0L, 1L, 3L))),
      s"cohort must move back on a late earlier week, got $last")
    q.stop()
  }

  test("driver streaming entries converge to the batch answer") {
    // st2: the dedup ingest of a double-delivered input must equal the
    // single-copy batch aggregate — the strongest of the three
    // convergence contracts (st1/st3 share the machinery and get the
    // full DuckDB differential in the driver gate)
    val streamed = EventStream.runDedupIngest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed == batch)
  }

  test("restart resumes from the checkpoint without reprocessing") {
    import spark.implicits._
    // the exactly-once-across-restarts contract: a second query on the
    // SAME checkpoint must pick up only files that arrived after the
    // first run — no duplicates, no gaps
    def dir(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (src, sink, ck) = (dir("rs_src"), dir("rs_sink"), dir("rs_ck"))
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val schema = ev.schema
    def runOnce(): Unit = {
      spark.readStream.schema(schema).parquet(src)
        .writeStream
        .option("checkpointLocation", ck)
        .format("parquet").option("path", sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    val batch1 = ev.filter(col("event_id") % 2 === 0)
    val batch2 = ev.filter(col("event_id") % 2 =!= 0)
    batch1.write.mode("append").parquet(src)
    runOnce()
    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst == batch1.count())
    batch2.write.mode("append").parquet(src)
    runOnce() // fresh query object, same checkpoint — a restart
    val ids = spark.read.parquet(sink).select("event_id")
      .as[Long].collect().sorted.toSeq
    // every event exactly once: batch1 NOT reprocessed, batch2 complete
    assert(ids == ev.select("event_id").as[Long].collect().sorted.toSeq)
  }

  test("stream-stream interval join equals the batch non-equi join") {
    val streamed = EventStream.runStreamJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val batch = p.join(c, col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") <= col("pts"))
      .select(col("pid"), col("cid"), col("pu")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
