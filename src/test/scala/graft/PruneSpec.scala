package graft

import org.apache.spark.sql.functions._
import graft.operators.Prune

class PruneSpec extends SparkSpec {
  import spark.implicits._

  private def urgent = Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT")

  test("bloom prefilter: one-sided — keeps every match, prunes most rest") {
    val li = Tables.lineitem(spark, sf)
    val passed = Prune.bloomPrefilter(li, urgent, "l_orderkey", "o_orderkey")
    val exactKeys = li.join(urgent.select("o_orderkey"),
        li("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey").distinct().as[Long].collect().toSet
    val passedKeys = passed.select("l_orderkey").distinct()
      .as[Long].collect().toSet
    // never drops a matching row (the property the exact join relies on)
    assert(exactKeys.subsetOf(passedKeys))
    // actually prunes: non-matching keys mostly fail the sketch
    val total = li.select("l_orderkey").distinct().count()
    assert(passedKeys.size < total,
      s"bloom passed all $total keys - no pruning happened")
    // with ~2k items in the default 8M-bit sketch the fp rate is ~0:
    // allow 1% slack over exact before calling it broken
    assert(passedKeys.size <= exactKeys.size + 1 + (total - exactKeys.size) / 100)
  }

  test("bloom functions are SQL-callable with a scalar-subquery build") {
    graft.functions.GraftFunctions.register(spark)
    Tables.lineitem(spark, sf).createOrReplaceTempView("li_bf")
    Tables.orders(spark, sf).createOrReplaceTempView("ord_bf")
    val n = spark.sql(
      """SELECT count(*) FROM li_bf
         WHERE might_contain((SELECT bloom_filter_agg(xxhash64(o_orderkey))
                              FROM ord_bf WHERE o_orderpriority = '1-URGENT'),
                             xxhash64(l_orderkey))""").head.getLong(0)
    val exact = Tables.lineitem(spark, sf)
      .join(urgent.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val total = Tables.lineitem(spark, sf).count()
    assert(n >= exact && n < total)
  }
}
