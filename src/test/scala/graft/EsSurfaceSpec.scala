package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Invariant tests for the round-4 ES-surface additions (composite
  * agg, histogram with empty-bucket fill, rare_terms, pipeline aggs,
  * runtime fields, phrase match, more_like_this, completion suggester,
  * highlighting). Exact values are hash-verified against DuckDB by the
  * driver at sf0.01; these tests lock the SEMANTIC invariants each
  * query promises, on sf0.001.
  */
class EsSurfaceSpec extends SparkSpec {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("a9 composite page: ≤ size rows, all strictly after the after-key, key-ordered") {
    val rows = run("a9_composite_agg")
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")))
    assert(rows.length <= 10)
    assert(rows.forall { case (s, l) =>
      s > "src12" || (s == "src12" && l > "fr") })
    assert(rows.sameElements(rows.sorted))
  }

  test("a10 histogram: contiguous interval-50 buckets, zero-filled, counts sum to corpus size") {
    val rows = run("a10_histogram")
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("doc_count")))
    val buckets = rows.map(_._1)
    assert(buckets.zip(buckets.tail).forall { case (a, b) => b == a + 50 })
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == total)
    assert(rows.forall(_._2 >= 0))
  }

  test("a11 rare_terms: nonempty tail, every term within max_doc_count") {
    val rows = run("a11_rare_terms")
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_count") <= 2))
  }

  test("w7 pipeline aggs: derivative/cum/moving recompute from the buckets") {
    val rows = run("w7_pipeline_aggs")
    val n = rows.map(_.getAs[Long]("n"))
    assert(rows.head.isNullAt(rows.head.fieldIndex("derivative")))
    rows.zipWithIndex.drop(1).foreach { case (r, i) =>
      assert(r.getAs[Long]("derivative") == n(i) - n(i - 1)) }
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("cum_n") == n.take(i + 1).sum)
      val win = n.slice(math.max(0, i - 2), i + 1)
      val want = BigDecimal(win.sum.toDouble / win.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("moving_avg") - want) < 1e-9)
    }
    assert(rows.last.getAs[Long]("cum_n") == Tables.events(spark, sf).count())
  }

  test("p11 runtime field: typed JSON extraction, exact integer avg parts") {
    val rows = run("p11_json_extract")
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val s = r.getAs[Long]("sum_k")
      assert(n > 0 && s >= 50 * n) // filter k >= 50 holds for every summand
      assert(math.abs(r.getAs[Double]("avg_k") - s.toDouble / n) < 1e-6)
    }
  }

  test("p10 phrase: three-valued logic pinned, phrase implies slop-1") {
    val rows = run("p10_phrase_match")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("phrase")))
      assert(!r.isNullAt(r.fieldIndex("near_slop1")))
      val p = r.getAs[Boolean]("phrase"); val near = r.getAs[Boolean]("near_slop1")
      assert(p || near)
      assert(!p || near) // exact adjacency is a slop-1 match too
    }
  }

  test("f6 more_like_this: ≤20 hits, match counts within [1, max_query_terms], descending") {
    val rows = run("f6_more_like_this")
    assert(rows.nonEmpty && rows.length <= 20)
    val m = rows.map(_.getAs[Long]("n_matched"))
    assert(m.forall(x => x >= 1 && x <= 10))
    assert(m.zip(m.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[Long]("doc_id") != 0L)) // seed excluded
  }

  test("t13 suggester: prefix honored, weight-ranked") {
    val rows = run("t13_autocomplete")
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getAs[String]("token").startsWith("s")))
    val w = rows.map(_.getAs[Long]("weight"))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b })
  }

  test("f7 decay: score monotone-decreasing in day distance, max at smallest dist") {
    val rows = run("f7_decay_score")
    assert(rows.length == 20)
    val byDist = rows.map(r =>
      (r.getAs[Long]("dist_days"), r.getAs[Double]("score")))
    assert(byDist.forall { case (dd, sc) =>
      math.abs(sc - math.pow(0.5, math.pow(dd / 180.0, 2))) < 1e-6 })
    val d = rows.map(_.getAs[Long]("dist_days"))
    assert(d.zip(d.tail).forall { case (a, b) => a <= b }) // score desc ≡ dist asc
  }

  test("a13 filters agg: named buckets equal three independent counts") {
    val rows = run("a13_filters_agg")
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("doc_count")).toMap
    val o = Tables.orders(spark, sf)
    assert(rows("finished") == o.filter("o_orderstatus = 'F'").count())
    assert(rows("high_value") == o.filter("o_totalprice > 200000.0").count())
    assert(rows("urgent") == o.filter("o_orderpriority LIKE '1%'").count())
  }

  test("a14 percentile_ranks: ranks monotone in threshold, bounded [0,1]") {
    val rows = run("a14_percentile_ranks")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[Double]("rank_1k"),
        r.getAs[Double]("rank_5k"), r.getAs[Double]("rank_20k"))
      assert(a >= 0 && a <= b && b <= c && c <= 1.0)
    }
  }

  test("g1 pagerank: exact match against a driver-side fixed-point replay") {
    val ids = Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val S = 1000000000000L
    val nodes = ids.toSet
    val edges = ids.flatMap(i => Seq(i -> i / 2, i -> i / 3))
      .filter { case (s0, d0) => d0 >= 1 && d0 != s0 }.distinct
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    var r = nodes.map(_ -> S).toMap
    for (_ <- 1 to 3) {
      val cin = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s0, _) => r(s0) / deg(s0) }.sum }
      r = nodes.map(n => n -> (15L * S + 85L * cin.getOrElse(n, 0L)) / 100L).toMap
    }
    val want = r.toSeq.sortBy { case (id, rk) => (-rk, id) }.take(20)
    val got = run("g1_pagerank").map(x =>
      (x.getAs[Long]("id"), x.getAs[Long]("r"))).toSeq
    assert(got == want)
  }

  test("x24 temperature mixing flattens: acceptance rate non-increasing in source size") {
    val rows = run("x24_temp_mixture")
    assert(rows.nonEmpty)
    rows.foreach { x =>
      assert(x.getAs[Long]("rate_bp") >= 0 && x.getAs[Long]("rate_bp") <= 10000)
      assert(x.getAs[Long]("n_sampled") <= x.getAs[Long]("n"))
    }
    val bySize = rows.sortBy(_.getAs[Long]("n"))
      .map(x => (x.getAs[Long]("n"), x.getAs[Long]("rate_bp")))
    bySize.sliding(2).foreach { case Array((n1, r1), (n2, r2)) =>
      if (n1 < n2) assert(r1 >= r2, s"rate must not grow with size: $bySize")
      case _ => ()
    }
  }

  test("f9 multi_match: keyword-field boost dominates, scores descending") {
    val rows = run("f9_multi_match")
    assert(rows.nonEmpty && rows.length <= 20)
    val sc = rows.map(_.getAs[Double]("score"))
    assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    assert(sc.forall(_ > 0))
  }

  test("a15 weighted_avg matches a float recompute and stays in the value range") {
    val rows = run("a15_weighted_avg")
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val g = li(r.getString(0))
      val want = g.map(x => x.getDouble(1) * x.getDouble(2)).sum /
        g.map(_.getDouble(2)).sum
      assert(math.abs(r.getAs[Double]("weighted_avg_price") - want) < 1e-3)
      assert(r.getAs[Long]("wq") == g.map(_.getDouble(2)).sum.round)
    }
  }

  test("w8 search_after: page strictly after the cursor, keyset-ordered") {
    val rows = run("w8_search_after")
      .map(r => (r.getAs[Long]("dist_days"), r.getAs[Long]("o_orderkey")))
    assert(rows.length == 20)
    assert(rows.forall { case (dd, k) => dd > 30 || (dd == 30 && k > 0) })
    assert(rows.sameElements(rows.sorted))
  }

  test("h1 highlight: every fragment wraps the match, context clamped to ±30") {
    val rows = run("h1_highlight")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[String]("fragment")
      val i = f.indexOf("<em>")
      assert(i >= 0 && i <= 30)
      assert(f.substring(i + 4, i + 12).equalsIgnoreCase("customer"))
      assert(f.substring(i + 12).startsWith("</em>"))
      assert(f.length - (i + 17) <= 30)
    }
  }

  test("a31 shard-merge protocol: bounds cover the truth, exhausted shards add 0") {
    import spark.implicits._
    import graft.operators.Search
    // planted 4-shard fixture (shardSize=2, topSize=3): shard0 is
    // EXHAUSTED (1 < shardSize terms -> smin = 0), 'hot' tops shards
    // 1 and 2 but misses shard3's top-2, 'c' is kept only in shard3
    def shardOf(id: Long): Int = ((id * 2654435761L) % 4294967296L % 4).toInt
    val byShard = (1L to 400L).groupBy(shardOf).map { case (k, v) =>
      k -> v.toVector }
    def docs(shard: Int, n: Int, offset: Int): Seq[Long] =
      byShard(shard).slice(offset, offset + n)
    val postings = Seq(
      // shard0: only 'a' on one doc -> returns everything, exhausted
      docs(0, 1, 0).map(("a", _)),
      // shard1: hot=3, a=2, b=1 -> kept: hot, a; smin=2
      docs(1, 3, 0).map(("hot", _)), docs(1, 2, 3).map(("a", _)),
      docs(1, 1, 5).map(("b", _)),
      // shard2: hot=3, a=2, c=1 -> kept: hot, a; smin=2
      docs(2, 3, 0).map(("hot", _)), docs(2, 2, 3).map(("a", _)),
      docs(2, 1, 5).map(("c", _)),
      // shard3: a=3, c=3, hot=1 -> kept: a, c; smin=3 (hot dropped!)
      docs(3, 3, 0).map(("a", _)), docs(3, 3, 3).map(("c", _)),
      docs(3, 1, 6).map(("hot", _))
    ).flatten.toDF("term", "doc_id")
    val out = Search.termsShardError(postings, nShards = 4,
        shardSize = 2, topSize = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exact protocol output: a kept everywhere (bound 0); hot reported
    // from shards 1+2 only, bound = shard3's smin (3) + exhausted
    // shard0's 0; c reported from shard3 only, bound = 2+2+0
    assert(out.toSeq == Seq(("a", 8L, 0L), ("hot", 6L, 3L), ("c", 3L, 4L)),
      out.mkString(", "))
    // the ES contract: reported + bound >= TRUE count for every term
    val truth = Map("a" -> 8L, "hot" -> 7L, "c" -> 4L)
    out.foreach { case (t, n, e) =>
      assert(n + e >= truth(t), s"$t bound fails to cover the truth")
    }
    // the kept frame appears three times in the plan and is NOT
    // persisted (a cache pin here would leak per invocation, an eager
    // collect would break laziness); the three occurrences must share
    // ONE computed exchange — ReuseExchange is the mechanism, locked
    // here so a plan change that silently recomputes the shard
    // responses three times fails loudly. (AQE's pre-execution plan
    // string hides the reuse markers, so assert with AQE off — the
    // adaptive path reuses shuffle stages by the same identity.)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Search.termsShardError(postings, nShards = 4,
        shardSize = 2, topSize = 3).queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
