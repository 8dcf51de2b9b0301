package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"========== $q ==========")
      println(SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
