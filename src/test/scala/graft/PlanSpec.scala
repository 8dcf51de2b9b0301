package graft

/** Plan-shape regression locks: the physical-plan properties that make
  * these operators scale (COVERAGE.md §plan-audit) must not silently
  * degrade. Substring checks on the executed plan, kept deliberately
  * coarse so they survive Spark upgrades. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("range filter pushes predicates into the parquet scan") {
    val p = plan("p5_range_filter")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(c_acctbal"), p)
  }

  test("top-k queries plan as TakeOrderedAndProject (no global sort)") {
    assert(plan("w2_topk").contains("TakeOrderedAndProject"))
    assert(plan("f1_scored_search").contains("TakeOrderedAndProject"))
  }

  test("denorm joins dims via broadcast, never nested-loop/cartesian") {
    val p = plan("denorm_docs")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("scalar aggregation is partial+final (map-side combine)") {
    val p = plan("a1_agg")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
  }

  test("dedup signature aggregation stays off nested-loop paths") {
    val p = plan("d2_minhash_pairs")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tiled cosine all-pairs never plans a nested-loop broadcast") {
    val p = plan("d5_cosine_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a3 percentiles run as hash aggregates, not an object buffer") {
    // the histogram plan keeps every aggregate in codegen'd
    // HashAggregate; the builtin percentile's value->count map would
    // appear as ObjectHashAggregate (unbounded per-group state)
    val p = plan("a3_stats_agg")
    assert(!p.contains("ObjectHashAggregate"), p)
  }

  test("large ETL outputs carry no final global sort") {
    // physical row order is canonicalized by the verification harness;
    // a trailing range-exchange + full sort is pure overhead (ordering
    // remains only where it IS the semantics: top-k / keyset / ranked)
    Seq("s10_match_all", "j6_bridge", "j11_parent_scalar",
      "denorm_roundtrip").foreach { q =>
      val p = plan(q)
      assert(!p.contains("rangepartitioning"), s"$q:\n$p")
    }
  }

  test("range join is a grain-bucketed equi join, never a nested loop") {
    val p = plan("e6_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("decontamination probes a broadcast eval set, corpus unshuffled") {
    val p = plan("d9_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("contamination fraction broadcasts the eval gram set, corpus unshuffled") {
    val p = plan("d16_contamination_fraction")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("percolator broadcasts the stored queries; corpus never shuffles") {
    val p = plan("pc1_percolate")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only exchange is the final presentation sort — the document
    // side flows scan → project → broadcast-join → filter unshuffled
    assert(!p.contains("hashpartitioning"), p)
  }

  test("bigram LM degrades to shuffle equi-joins past the broadcast threshold, never a nested loop") {
    // the x33 scale claim plan-locked (was COVERAGE prose only): the
    // LM tables broadcast at test scale, but a corpus-scale vocabulary
    // exceeds any broadcast threshold — force that regime (threshold
    // -1 on a cloned session) and the three LM joins must degrade to
    // shuffle EQUI-joins (the distributed KenLM-application shape),
    // never a nested-loop or cartesian fallback. The single permitted
    // BroadcastNestedLoopJoin is the one-row n_ref scalar crossJoin,
    // whose explicit broadcast() hint survives the threshold.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = graft.operators.TextStats
      .bigramScore(Tables.documents(s2, sf))
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1, p)
  }

  test("matrix_stats is one scan + one scalar agg, no object buffers") {
    val p = plan("a24_matrix_stats")
    assert(!p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("hashpartitioning"), p)
    assert("Exchange SinglePartition".r.findAllMatchIn(p).size == 1, p)
  }

  test("sequence packing windows are bucket-partitioned, not global") {
    // the N-row running sum must shuffle by BUCKET (parallel windows);
    // the only single-partition exchange allowed is the B-row
    // bucket-offset prefix
    val p = graft.operators.TextStats
      .packChunks(Tables.documents(spark, sf), budget = 2048)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"), p)
    // no global range sort of the corpus feeds a window (the W1 trap)
    assert(!p.contains("rangepartitioning(doc_id"), p)
  }

  test("epoch-shuffle ranks are bucket-partitioned, not global") {
    // same discipline for the hash-order permutation: the per-row
    // row_number shuffles by the hash-prefix bucket; no global range
    // partitioning of the corpus appears anywhere in the plan
    val p = graft.operators.TextStats
      .shuffleBatches(Tables.documents(spark, sf), batchSize = 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"), p)
    assert(!p.contains("rangepartitioning(skey"), p)
    assert(!p.contains("rangepartitioning(doc_id"), p)
  }

  test("source cap plans a map-side group limit before the shuffle") {
    // the rank-<=-cap filter must be recognized as WindowGroupLimit
    // (SPARK-37099): each task keeps its local top-cap rows per domain
    // BEFORE the exchange, so a hot domain never floods the sort
    val p = plan("x16_source_cap")
    assert(p.contains("WindowGroupLimit"), p)
    // same discipline for the significant-terms per-category top-k
    assert(plan("a8_significant_terms").contains("WindowGroupLimit"))
  }

  test("percent_rank buckets the fact window, no 3-partition sort") {
    // the round-5 scale flag: Window.partitionBy(l_returnflag) alone
    // funnels the fact table into three single-task sorts. The two-pass
    // Rank operator must shuffle the fact rows by (flag, bucket) only.
    val p = plan("w10_percent_rank")
    // old shape: windowspecdefinition(l_returnflag#8, l_extendedprice#5
    // ASC, …) — a fact-ordering window partitioned by flag alone
    assert("windowspecdefinition\\(l_returnflag#\\d+, l_extendedprice".r
      .findFirstIn(p).isEmpty,
      s"fact window partitioned by the low-cardinality flag alone:\n$p")
    // ranks are arithmetic, never window percent_rank/cume_dist
    assert(!p.contains("percent_rank(") && !p.contains("cume_dist("), p)
    // the fact-size rank window must include the value bucket in its
    // PARTITION keys — require the order columns after bucket so this
    // cannot also match the tiny offsets prefix-sum window
    // (partitionBy(flag).orderBy(bucket)), which would leave the
    // 3-partition-sort lock resting on the first assertion alone
    assert("windowspecdefinition\\(l_returnflag#\\d+, bucket#\\d+, l_extendedprice".r
      .findFirstIn(p).isDefined, p)
  }

  test("hybrid RRF legs plan as distributed top-k, fusion never sorts the corpus") {
    // both retrieval legs must stay TakeOrderedAndProject (shard-local
    // then global top-k) — a regression to a global Sort + Limit would
    // range-shuffle the whole corpus per leg
    val p = plan("h2_hybrid_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 2, p)
    // (BroadcastNestedLoopJoin IS present and fine here: it is the
    // one-row probe-vector crossJoin(broadcast(...)) — the accepted
    // tiny-stats pattern — not a corpus-pair join)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("as-of join is one keyed window pass, never a range join") {
    val p = plan("j15_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the carry-forward runs as a keyed window over the unioned
    // timeline (partitionBy event_type), not an unpartitioned sort
    assert("windowspecdefinition\\(event_type#\\d+, _t#".r
      .findFirstIn(p).isDefined, p)
  }

  test("rare_terms recovery join survives a Zipfian tail (no forced broadcast)") {
    // on a natural corpus the ≤max_doc_count tail is MOST of the
    // vocabulary — billions of hashes at 100 TB — so the term-recovery
    // join must NOT hard-broadcast the tail: a broadcast() hint ignores
    // autoBroadcastJoinThreshold and OOMs instead of degrading. Fixture:
    // every doc contributes unique rare bigrams (the all-tail corpus).
    // With the static broadcast threshold forced off, only a FORCED
    // hint could still produce a BroadcastExchange — its absence plus
    // the ShuffledHashJoin is the size-guard, while AQE stays free to
    // promote from runtime stats on corpora where the tail is small.
    import spark.implicits._
    val docs = (1 to 300)
      .map(i => (i.toLong, s"common base tail$i word$i"))
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.Search.rareTerms(docs, maxDocCount = 2)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("BroadcastExchange"), p)
      // and the long tail actually comes back: ≥2 unique-to-doc
      // bigrams per doc survive the ≤2-doc cut
      assert(df.count() >= 600L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
