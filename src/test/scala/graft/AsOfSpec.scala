package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** The as-of join's boundary semantics on a hand-checkable timeline. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("overlap join pairs intersecting sessions exactly once across hour buckets") {
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // u1 [10:50, 11:10] spans two hour buckets; u4 [10:55, 11:15] too
    // (their pair surfaces in BOTH buckets — distinct must collapse
    // it); u2 is a point session at 11:00; u3 is disjoint.
    val events = Seq(
      (1L, ts(10, 50)), (1L, ts(11, 10)),
      (2L, ts(11, 0)),
      (3L, ts(9, 0)),
      (4L, ts(10, 55)), (4L, ts(11, 15))
    ).toDF("user_id", "ts")
    val got = graft.operators.EventOps.overlapJoin(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      (1L, 2L) -> ((1L, 0L)),   // point touch: one overlap, 0 seconds
      (1L, 4L) -> ((1L, 900L)), // [10:55, 11:10] — once, despite 2 buckets
      (2L, 4L) -> ((1L, 0L))
    ))

    // the concurrency cap: keep only the 2 earliest sessions per hour
    // bucket — u2's point session (11:00) falls out of the 11:00
    // bucket behind u1/u4 (earlier starts), so only (1,4) survives;
    // deterministic earliest-first prefix, a strict subset of exact
    val capped = graft.operators.EventOps
      .overlapJoin(events, maxPerBucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 4L)), capped.toString)
  }

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

  test("range join results are independent of the bucketing bin width") {
    // overlapping intervals: facts in the overlap match BOTH; the
    // half-open end excludes a fact exactly at interval end
    val fact = Seq(50L, 150L, 250L, 350L).toDF("t")
      .select(timestamp_seconds(col("t")).as("ts"))
    val dim = Seq(("a", 0L, 200L), ("b", 100L, 300L), ("c", 300L, 350L))
      .toDF("name", "s0", "e0")
      .select(col("name"), timestamp_seconds(col("s0")).as("s"),
        timestamp_seconds(col("e0")).as("e"))
    def run(bin: Long) = AsOf.rangeJoin(fact, "ts", dim, "s", "e",
        struct(col("name")), bin)
      .select(unix_timestamp(col("ts")).as("t"), col("range.name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = Set(
      (50L, "a"), (150L, "a"), (150L, "b"),  // 150 in the a∩b overlap
      (250L, "b"))                           // 350 = c's end — excluded
    Seq(7L, 100L, 10000L).foreach { bin =>
      assert(run(bin) == expected, s"bin=$bin drifted")
    }
  }

  test("inclusive-end range join admits the end instant and point intervals") {
    val fact = Seq(100L, 200L, 300L).toDF("t")
      .select(timestamp_seconds(col("t")).as("ts"))
    val dim = Seq(("i", 100L, 200L), ("pt", 300L, 300L))
      .toDF("name", "s0", "e0")
      .select(col("name"), timestamp_seconds(col("s0")).as("s"),
        timestamp_seconds(col("e0")).as("e"))
    def run(bin: Long) = AsOf.rangeJoin(fact, "ts", dim, "s", "e",
        struct(col("name")), bin, endInclusive = true)
      .select(unix_timestamp(col("ts")).as("t"), col("range.name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = Set(
      (100L, "i"), (200L, "i"),  // BETWEEN keeps the end instant...
      (300L, "pt"))              // ...and a start=end point interval is valid
    // bucketing is purely an access path in this mode too: the result
    // must not depend on where bin boundaries fall relative to the
    // inclusive end instants
    Seq(7L, 60L, 100L, 10000L).foreach { bin =>
      assert(run(bin) == expected, s"bin=$bin drifted")
    }
  }

  test("a fact frame carrying a scratch/output column fails loudly") {
    // withColumn REPLACES same-named columns: without the guard the
    // fact's own _asof would be clobbered and the output would carry
    // the column twice — the corruption must be an error, not a result
    val dim = Seq(("k", 10L, "v")).toDF("key", "t", "ver")
      .select(col("key"), timestamp_seconds(col("t")).as("eff"), col("ver"))
    Seq("_asof", "asof", "_t", "_is_fact", "_dimv").foreach { bad =>
      val fact = Seq(("k", 5L, "x")).toDF("key", "t", bad)
        .select(col("key"), timestamp_seconds(col("t")).as("ts"), col(bad))
      val e = intercept[IllegalArgumentException] {
        AsOf.asofLeft(fact, dim, "key", "ts", "eff", struct(col("ver")))
      }
      assert(e.getMessage.contains(bad), s"guard missed $bad")
    }
    Seq("_bin", "_s", "_e", "range").foreach { bad =>
      val fact = Seq((5L, "x")).toDF("t", bad)
        .select(timestamp_seconds(col("t")).as("ts"), col(bad))
      val rdim = Seq(("a", 0L, 10L)).toDF("name", "s0", "e0")
        .select(col("name"), timestamp_seconds(col("s0")).as("s"),
          timestamp_seconds(col("e0")).as("e"))
      val e = intercept[IllegalArgumentException] {
        AsOf.rangeJoin(fact, "ts", rdim, "s", "e", struct(col("name")), 60L)
      }
      assert(e.getMessage.contains(bad), s"rangeJoin guard missed $bad")
    }
  }
}
