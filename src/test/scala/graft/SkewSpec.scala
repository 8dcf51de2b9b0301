package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted two-phase aggregations must equal their direct forms. */
class SkewSpec extends SparkSpec {

  lazy val li = Tables.lineitem(spark, sf)

  test("salted collect_list equals direct sorted collect per key") {
    val direct = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(col("l_linenumber"),
        col("l_partkey")))).as("items"))
    val salted = Skew.saltedCollect(li, "l_orderkey",
      struct(col("l_linenumber"), col("l_partkey")), col("l_linenumber"))
    assert(direct.join(salted.withColumnRenamed("items", "items2"),
      "l_orderkey")
      .filter(col("items") =!= col("items2")).count() == 0)
    assert(salted.count() == direct.count())
  }

  test("salted sum equals direct sum per key") {
    val direct = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total"), count(lit(1)).as("n"))
    val salted = Skew.saltedSum(li, "l_orderkey", col("l_quantity"),
      col("l_linenumber"))
    val joined = direct.withColumnRenamed("total", "t1")
      .withColumnRenamed("n", "n1").join(salted, "l_orderkey")
    assert(joined.filter(col("t1") =!= col("total") ||
      col("n1") =!= col("n")).count() == 0)
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // the other half of the skew story: salting fixes skewed AGGS
    // (above); AQE's runtime skew-join split fixes skewed JOINS — this
    // locks that the engine configuration actually triggers it, so a
    // hot key never serializes one reducer at 100 TB. Thresholds are
    // scaled down to fire on test-sized data; production leaves the
    // defaults.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force SMJ at plan time AND stop AQE re-converting to broadcast
      // at runtime (either would erase the skew-split site)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 80% of fact rows pile on one join key; dim side is uniform.
      // Both join inputs must be PLAIN shuffles for the skew rule to
      // match (SMJ(Sort(Shuffle), Sort(Shuffle))) — a distinct() here
      // would wedge an aggregate between shuffle and sort, so the dim
      // keys are planted as a literal frame instead
      // the tiny test parquet reads as ONE map task, and AQE can only
      // split a skewed reduce partition along map-output boundaries —
      // fan the scan out first so the hot partition is splittable
      // (real 100 TB inputs have thousands of map tasks; this is
      // test-scale plumbing, not part of the technique)
      val fact = li.repartition(8).select(
        when(col("l_orderkey") % 10 < 8, 0L)
          .otherwise(col("l_orderkey")).as("k"),
        col("l_quantity"))
      import spark.implicits._
      val dim = (0L until 1000L).map(k => (k, 1L)).toDF("k", "w")
      val j = fact.join(dim, "k")
      // execute THIS dataframe: count() would plan a different query
      // whose adaptive plan is never the one inspected below
      val n = j.collect().length
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
