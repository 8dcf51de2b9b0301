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
}
