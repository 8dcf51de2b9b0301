package graft

import org.apache.spark.sql.functions._
import graft.sources.Sink

/** Plan-level proof that bucketing co-locates the join: two tables
  * bucketed+sorted on the join key join with NO shuffle exchange and
  * NO sort (bucket layout satisfies both requirements). */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans with zero exchanges") {
    Sink.bucketedTable(Tables.orders(spark, sf), "b_orders", "o_orderkey")
    Sink.bucketedTable(
      Tables.lineitem(spark, sf).groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty")),
      "b_items", "l_orderkey")
    val joined = spark.table("b_orders")
      .hint("merge") // force SMJ so the exchange question is meaningful
      .join(spark.table("b_items"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(joined.count() > 0)
    // correctness identical to the unbucketed join
    val direct = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty")),
        col("o_orderkey") === col("l_orderkey"))
    assert(joined.count() == direct.count())
  }

  test("aggregation on the bucket key also avoids the shuffle") {
    val agg = spark.table("b_orders").groupBy("o_custkey").count()
    val aggOnKey = spark.table("b_orders").groupBy("o_orderkey").count()
    val planOnKey = aggOnKey.queryExecution.executedPlan.toString
    val planOffKey = agg.queryExecution.executedPlan.toString
    assert(!planOnKey.contains("Exchange"))
    assert(planOffKey.contains("Exchange")) // sanity: off-key does shuffle
  }
}
