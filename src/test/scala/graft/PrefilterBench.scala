package graft

import org.apache.spark.sql.functions._
import graft.functions.Analyzers

/** Dev-only micro-measurement: the TokenMatchPrefilter win on a
  * selective term query at sf0.1 (run via Test/runMain). */
object PrefilterBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def q(s: org.apache.spark.sql.SparkSession): Long = {
      val tk = Analyzers.tokenize(lower(col("text")))
      Tables.documents(s, sf)
        .filter(array_contains(tk, "vectorized") || array_contains(tk, "mergesort"))
        .count()
    }
    // warm both paths once, then time alternating runs
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(graft.plans.TokenMatchPrefilter)
    q(spark); q(s2)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      assert(n >= 0); dt
    }
    val plain = (1 to 5).map(_ => time(q(spark))).min
    val pre = (1 to 5).map(_ => time(q(s2))).min
    println(f"plain=$plain%.3f s prefiltered=$pre%.3f s speedup=${plain / pre}%.2fx")
    spark.stop()
  }
}
