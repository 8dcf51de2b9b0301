package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: run named queries (cold + warm) against a
  * scale dir and print wall times; `explain` flag dumps the formatted
  * physical plan. Usage:
  *   runMain graft.Prof <sfDir> [explain] q1 q2 ...
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val explain = args.length > 1 && args(1) == "explain"
    val names = args.drop(if (explain) 2 else 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    names.foreach { q =>
      if (explain) SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      for (run <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[prof] $q $run ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
