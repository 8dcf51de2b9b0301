package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sink

/** Plan-level proof of partition pruning on a date-partitioned layout. */
class PartitionSpec extends SparkSpec {

  test("partitioned write + filter prunes partitions at the scan") {
    val tmp = Files.createTempDirectory("graft-part").toString
    val orders = Tables.orders(spark, sf)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    Sink.partitionedWrite(orders, "order_month", tmp)

    val q = spark.read.parquet(tmp)
      .filter(col("order_month") === "2000-01" && col("o_totalprice") > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("order_month"), plan)
    // pruned scan touches only the one partition's files
    val prunedFiles = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.partitionCount.toLong
      }
    assert(prunedFiles.contains(1L), s"expected 1 partition, got $prunedFiles")
    // correctness: equals unpartitioned filter
    val expect = Tables.orders(spark, sf)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === "2000-01")
      .count()
    assert(q.count() == expect && expect > 0)
  }
}
