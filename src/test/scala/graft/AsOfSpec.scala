package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** The as-of join's boundary semantics on a hand-checkable timeline. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("inclusive bound, carry-forward, and the no-version-yet null") {
    val fact = Seq(
      ("k", 5L), ("k", 10L), ("k", 15L), ("k", 25L), // around v1@10, v2@20
      ("other", 100L)                                // key with no dim rows
    ).toDF("key", "t").select(col("key"),
      timestamp_seconds(col("t")).as("ts"))
    val dim = Seq(("k", 10L, "v1"), ("k", 20L, "v2"))
      .toDF("key", "t", "ver").select(col("key"),
        timestamp_seconds(col("t")).as("eff"), col("ver"))
    val out = AsOf.asofLeft(fact, dim, "key", "ts", "eff",
        struct(col("ver")))
      .select(col("key"), unix_timestamp(col("ts")).as("t"),
        col("asof.ver").as("ver"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(out == Set(
      ("k", 5L, None),          // before any version
      ("k", 10L, Some("v1")),   // version effective AT the fact applies
      ("k", 15L, Some("v1")),   // carried forward
      ("k", 25L, Some("v2")),   // superseded by v2@20
      ("other", 100L, None)))   // key never versioned
  }
}
