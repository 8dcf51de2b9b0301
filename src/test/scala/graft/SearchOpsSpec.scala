package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, Search}

/** Round-5 search/analytics additions: top_hits, field collapsing,
  * rescore windows, the staged funnel. Each is oracle-gated in
  * SparkEntry; here live the plan locks and the semantic edges the
  * differential can't pin (window membership, stage ordering).
  */
class SearchOpsSpec extends SparkSpec {

  test("funnel stages are ordered and strictly sequential") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes all three in order
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      // user 2 clicked BEFORE signing up — stage 2 must not count it
      (2L, "2024-01-01 09:00:00", "click"),
      (2L, "2024-01-01 09:30:00", "signup"),
      // user 3 signs up only
      (3L, "2024-01-01 08:00:00", "signup"),
      // user 4 purchase exactly AT the click instant — strictly-after
      // semantics exclude stage 3
      (4L, "2024-01-01 07:00:00", "signup"),
      (4L, "2024-01-01 07:30:00", "click"),
      (4L, "2024-01-01 07:30:00", "purchase"))
      .toDF("user_id", "s", "event_type")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"),
        col("event_type"))
    val r = EventOps.funnel(ev, Seq("signup", "click", "purchase"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("1_signup" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("funnel counts are monotone non-increasing on real data") {
    val r = SparkEntry.queries("e7_funnel")(spark, sf)
      .collect().map(_.getLong(1))
    assert(r.length == 3 && r(0) >= r(1) && r(1) >= r(2))
    assert(r(0) > 0)
  }

  test("collapse: one hit per source, group counts match the scored base") {
    val hits = Search.collapse(spark, sf, "spark", k = 10).collect()
    val sources = hits.map(_.getString(0))
    assert(sources.distinct.length == sources.length,
      "collapsed results must be unique per field value")
    // scores globally non-increasing
    val scores = hits.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // n_in_group: every source's total match count from an independent
    // aggregation of the same match query
    val counts = Search.topHits(spark, sf, "spark", k = Int.MaxValue)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    hits.foreach { h =>
      assert(h.getLong(3) == counts(h.getString(0)),
        s"inner-hit count for ${h.getString(0)}")
    }
  }

  test("top_hits and collapse plan the per-bucket cut as WindowGroupLimit") {
    val p1 = Search.topHits(spark, sf, "spark", k = 2)
      .queryExecution.executedPlan.toString
    assert(p1.contains("WindowGroupLimit"), p1)
    val p2 = Search.collapse(spark, sf, "spark", k = 10)
      .queryExecution.executedPlan.toString
    assert(p2.contains("WindowGroupLimit"), p2)
  }

  test("rescore only reorders within the primary window") {
    val rescored = Search.rescore(spark, sf, Seq("table", "scan"),
      "table scan", window = 50, k = 20).collect()
    assert(rescored.nonEmpty && rescored.length <= 20)
    // every rescored hit must come from the primary top-50 — the
    // secondary scorer can reorder the window, never grow it
    val primaryTop = Search.searchBm25(spark, sf, Seq("table", "scan"), k = 50)
      .collect().map(_.getLong(0)).toSet
    rescored.foreach(r => assert(primaryTop.contains(r.getLong(0)),
      s"doc ${r.getLong(0)} outside the primary window"))
    // final = primary + 2·phrase_n, recomputed from the row itself
    rescored.foreach { r =>
      val want = BigDecimal(r.getDouble(1) + 2.0 * r.getLong(2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - want) < 1e-9)
    }
    // rescore plans a two-phase top-k for the window cut, not a global
    // sort + filter
    val p = Search.rescore(spark, sf, Seq("table", "scan"), "table scan")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bpe train: hand-computed merges, frequency-ordered, tie-broken") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val r = graft.operators.TextStats.bpeTrain(spark, docs, steps = 5)
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4)))
    // vocab: aa×2 → ' a a ', ab×1 → ' a b '. Step 1: (a,a) count 2
    // beats (a,b) count 1; step 2 merges the survivor; then exhausted
    // — the loop must stop early, not fail
    assert(r.toSeq == Seq((1L, "a", "a", "aa", 2L), (2L, "a", "b", "ab", 1L)))
  }

  test("bpe train: run semantics are the declared non-overlapping scan") {
    import spark.implicits._
    // 'aaaa' = [a,a,a,a]: pair (a,a) occurs 3 times (overlapping
    // adjacencies all count). The merge pass scans ' a a a a ' for
    // ' a a ' non-overlapping left-to-right: the first match consumes
    // chars 0-4 and the scan resumes in the INPUT, where 'a a ' has no
    // leading space — exactly ONE replacement, yielding [aa, a, a].
    // (Reference BPE would greedily merge twice; the declared scan
    // semantics are what both engines replay.)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r = graft.operators.TextStats.bpeTrain(spark, docs, steps = 2)
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(4)))
    assert(r(0) == ((1L, "a", "a", 3L)))
    // after ' aa a a ': adjacencies (aa,a) and (a,a), both count 1 —
    // lexicographic tie-break picks (a,a)
    assert(r(1) == ((2L, "a", "a", 1L)))
  }

  test("min_should_match: every hit matches at least the threshold") {
    val r = Search.minShouldMatch(spark, sf, Seq("table", "spark", "merge"),
      minMatch = 2, k = 20).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getLong(1) >= 2 && row.getLong(1) <= 3))
    val scores = r.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("simpson diversity: degenerate bounds") {
    val r = SparkEntry.queries("x25_simpson")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val bp = row.getLong(2)
      assert(bp >= 0 && bp <= 10000)
      assert(row.getLong(1) > 0)
    }
  }

  test("eql sequence: greedy-latest chains, strict order, inclusive span bound") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val ev = Seq(
      // u1: the EARLY signup overruns the 1h span, the later one fits
      // — only the greedy-latest chain finds it
      (1L, ts("00:00:00"), "signup"), (1L, ts("01:45:00"), "signup"),
      (1L, ts("02:00:00"), "click"), (1L, ts("02:30:00"), "purchase"),
      // u2: no click between signup and purchase
      (2L, ts("10:00:00"), "signup"), (2L, ts("10:30:00"), "purchase"),
      // u3: click BEFORE the signup — strict order fails
      (3L, ts("05:00:00"), "click"), (3L, ts("05:30:00"), "signup"),
      (3L, ts("06:00:00"), "purchase"),
      // u4: chain spanning exactly maxspan — inclusive bound counts it
      (4L, ts("07:00:00"), "signup"), (4L, ts("07:20:00"), "click"),
      (4L, ts("08:00:00"), "purchase")
    ).zipWithIndex.map { case ((u, t, ty), i) => (i.toLong, u, t, ty) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = graft.operators.EventOps.eqlSequence(ev,
      Seq("signup", "click", "purchase"), maxspanSeconds = 3600L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3600L, 2L, 2L)))
  }

  test("eql sequence: randomized equivalence with the exists-triple spec") {
    import spark.implicits._
    // 40 random scenarios, users namespaced per scenario, ONE Spark
    // pass; the greedy-latest window chain must agree with a plain
    // Scala brute force of the specification — including planted
    // EQUAL timestamps (strictness) and span-boundary chains
    val rnd = new scala.util.Random(42)
    val stages = Seq("signup", "click", "purchase")
    val types = stages ++ Seq("view", "error")
    val span = 3000L
    val events = (0 until 40).flatMap { set =>
      val nUsers = 3 + rnd.nextInt(6)
      (0 until nUsers).flatMap { u =>
        val user = set * 1000L + u
        (0 until 3 + rnd.nextInt(10)).map { _ =>
          // coarse second grid so equal timestamps actually occur
          (user, rnd.nextInt(50) * 100L, types(rnd.nextInt(types.size)))
        }
      }
    }.zipWithIndex.map { case ((u, sec, ty), i) => (i.toLong, u, sec, ty) }
    // brute force over microseconds, strict ordering, inclusive span
    val byUser = events.groupBy(_._2)
    val validPurchases = events.filter { case (_, u, pSec, ty) =>
      ty == "purchase" && byUser(u).exists { case (_, _, cSec, cTy) =>
        cTy == "click" && cSec < pSec && byUser(u).exists {
          case (_, _, sSec, sTy) =>
            sTy == "signup" && sSec < cSec && pSec - sSec <= span
        }
      }
    }
    val df = events.toDF("event_id", "user_id", "sec", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"), col("event_type"))
    val r = graft.operators.EventOps.eqlSequence(df, stages, span)
      .collect().head
    assert(r.getLong(1) == validPurchases.map(_._2).distinct.size.toLong,
      "n_users must match the brute-force specification")
    assert(r.getLong(2) == validPurchases.size.toLong,
      "n_matches must match the brute-force specification")
  }

  test("eql hits: emits the greedy-latest chain per match; count agrees with the sequence summary") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    def us(s: String) = ts(s).getTime * 1000L
    val ev = Seq(
      (1L, ts("00:00:00"), "signup"), (1L, ts("01:45:00"), "signup"),
      (1L, ts("02:00:00"), "click"), (1L, ts("02:30:00"), "purchase"),
      (2L, ts("10:00:00"), "signup"), (2L, ts("10:30:00"), "purchase"),
      (3L, ts("05:00:00"), "click"), (3L, ts("05:30:00"), "signup"),
      (3L, ts("06:00:00"), "purchase"),
      (4L, ts("07:00:00"), "signup"), (4L, ts("07:20:00"), "click"),
      (4L, ts("08:00:00"), "purchase")
    ).zipWithIndex.map { case ((u, t, ty), i) => (i.toLong, u, t, ty) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val hits = graft.operators.EventOps.eqlHits(ev,
      Seq("signup", "click", "purchase"), maxspanSeconds = 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // u1's chain must carry the GREEDY-LATEST signup (01:45, which
    // fits the span), never the 00:00 one that overruns it
    assert(hits.toSeq == Seq(
      (1L, us("01:45:00"), us("02:00:00"), us("02:30:00")),
      (4L, us("07:00:00"), us("07:20:00"), us("08:00:00"))), hits.toSeq)
  }

  test("eql hits: randomized — every emitted chain is a valid sequence; count matches the summary") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337)
    val stages = Seq("signup", "click", "purchase")
    val types = stages ++ Seq("view", "error")
    val span = 3000L
    val events = (0 until 30).flatMap { set =>
      (0 until 3 + rnd.nextInt(6)).flatMap { u =>
        val user = set * 1000L + u
        (0 until 3 + rnd.nextInt(10)).map { _ =>
          (user, rnd.nextInt(50) * 100L, types(rnd.nextInt(types.size)))
        }
      }
    }.zipWithIndex.map { case ((u, sec, ty), i) => (i.toLong, u, sec, ty) }
    val df = events.toDF("event_id", "user_id", "sec", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"), col("event_type"))
    val hits = graft.operators.EventOps.eqlHits(df, stages, span).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val summary = graft.operators.EventOps.eqlSequence(df, stages, span)
      .collect().head
    assert(hits.length.toLong == summary.getLong(2),
      "one hit row per counted match")
    assert(hits.map(_._1).distinct.length.toLong == summary.getLong(1))
    // each chain: right stage at each timestamp, strict order, span
    val evSet = events.map { case (_, u, sec, ty) => (u, sec * 1000000L, ty) }.toSet
    hits.foreach { case (u, s, c, p) =>
      assert(evSet((u, s, "signup")) && evSet((u, c, "click")) &&
        evSet((u, p, "purchase")), s"chain events must exist: ($u,$s,$c,$p)")
      assert(s < c && c < p && p - s <= span * 1000000L,
        s"chain must be strictly ordered within span: ($u,$s,$c,$p)")
    }
  }

  test("retention: cohorts by first ISO week, offsets exact, bp against offset-0") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 is a Monday. u1 active weeks 0,1,2; u2 only week 0
    // (two events, one active week — distinct collapses); u3 first
    // seen week 1, active weeks 1,2.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-05 23:00:00")),
      (3L, ts("2024-01-10 10:00:00")), (3L, ts("2024-01-17 10:00:00"))
    ).toDF("user_id", "ts")
    val rows = EventOps.retention(ev).collect().map(r =>
      (r.getTimestamp(0).toString.take(10), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows == Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 10000L)),
      ("2024-01-01", 1L) -> ((1L, 2L, 5000L)),
      ("2024-01-01", 2L) -> ((1L, 2L, 5000L)),
      ("2024-01-08", 0L) -> ((1L, 1L, 10000L)),
      ("2024-01-08", 1L) -> ((1L, 1L, 10000L))))
  }
}
