package graft

import org.apache.spark.sql.functions._
import graft.functions.Analyzers
import graft.operators._

/** Degenerate-input semantics: empty corpora, single documents, null
  * and empty text. The synthetic testdata never produces these, but a
  * library user's first real corpus will — every operator must return
  * an empty/defined result, never throw, and the null policy must be
  * consistent (analyzers propagate null; dedup/stats treat null text
  * as empty). */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val one = Seq((1L, "a single document")).toDF("doc_id", "text")
  private lazy val nulls = Seq((1L, null), (2L, ""), (3L, "  \t "),
    (4L, "real text here")).asInstanceOf[Seq[(Long, String)]]
    .toDF("doc_id", "text")

  test("dedup family on an empty corpus returns empty, never throws") {
    assert(Dedup.exact(empty).count() == 0)
    assert(Dedup.minhashPairs(empty, threshold = 0.5).count() == 0)
    assert(Dedup.simhashPairs(empty, maxHamming = 10).count() == 0)
    assert(Dedup.jaccardPairs(empty, threshold = 0.5).count() == 0)
  }

  test("dedup family on a single document: no pairs, doc survives apply") {
    assert(Dedup.minhashPairs(one, threshold = 0.5).count() == 0)
    assert(Dedup.simhashPairs(one, maxHamming = 10).count() == 0)
    val pairs = Dedup.jaccardPairs(one, threshold = 0.5)
    assert(pairs.count() == 0)
    assert(Dedup.applyDedup(one, pairs).count() == 1)
  }

  test("analyzer pipelines: null propagates, empty/blank yield empty arrays") {
    val r = nulls.select(col("doc_id"),
      Analyzers.englando(col("text")).as("eng"),
      Analyzers.customNgram(col("text")).as("ng"),
      Analyzers.customShingles(col("text")).as("sh"),
      Analyzers.tokenize(col("text")).as("toks"))
      .orderBy(col("doc_id")).collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2) && r(0).isNullAt(3))
    Seq(1, 2).foreach { i => // "" and blank
      assert(r(i).getSeq[String](1).isEmpty, s"row $i englando")
      assert(r(i).getSeq[String](4).isEmpty, s"row $i tokenize")
    }
    assert(r(3).getSeq[String](1).nonEmpty)
  }

  test("text stats on null/empty text are defined (zero counts, no NaN crash)") {
    val q = TextStats.quality(nulls).orderBy(col("doc_id")).collect()
    assert(q.length == 4)
    // null text: counts must be 0/null, not a thrown NPE
    val tc = TextStats.tokenCounts(nulls).orderBy(col("doc_id")).collect()
    assert(tc.length == 4)
    assert(tc(1).getLong(1) == 0L && tc(1).getLong(2) == 0L) // "" row
  }

  test("exact dedup groups null and empty-normalized text without loss") {
    val d = Dedup.exact(nulls)
    // every input doc is accounted for in some group
    assert(d.agg(sum(col("n_dups"))).head().getLong(0) == 4L)
  }

  test("quantiles on empty input return empty, on all-equal return the value") {
    assert(Quantiles.exactPercentiles(
      Seq.empty[(String, Double)].toDF("k", "v"), "k", "v",
      Seq("med" -> 0.5)).count() == 0)
    val allEq = Quantiles.exactPercentiles(
      Seq(("k", 3.0), ("k", 3.0), ("k", 3.0)).toDF("k", "v"), "k", "v",
      Seq("med" -> 0.5, "p99" -> 0.99)).head()
    assert(allEq.getAs[Double]("med") == 3.0)
    assert(allEq.getAs[Double]("p99") == 3.0)
  }

  test("zero vector is excluded from knn, identically in batch and single") {
    // cosine is undefined for a zero embedding — and under ANSI SQL
    // (Spark 4 default) the norm division would abort the whole query
    // with DIVIDE_BY_ZERO. withNorm drops zero vectors, so they are
    // not neighbors on any path rather than a mid-query crash.
    val emb = Seq(
      (1L, 0L, Array(1f, 0f, 0f)), (2L, 0L, Array(0f, 0f, 0f)),
      (3L, 0L, Array(0.9f, 0.1f, 0f)), (4L, 0L, Array(0f, 1f, 0f)),
      (5L, 0L, Array(0.8f, 0.2f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val single = operators.Similarity.knnBrute(emb, 1L, 3)
      .select("vec_id").as[Long].collect().toSeq
    val batch = operators.Similarity.knnBruteBatch(emb, Seq(1L), 3)
      .orderBy(col("rank")).select("vec_id").as[Long].collect().toSeq
    assert(batch == single)
    assert(!single.contains(2L) && single.length == 3)
  }

  test("event windows on an empty event table are empty, not an error") {
    val e = Seq.empty[(java.sql.Timestamp, Long, String, Double)]
      .toDF("ts", "user_id", "event_type", "value")
    assert(EventOps.tumbling(e).count() == 0)
    assert(EventOps.sessionize(e).count() == 0)
    assert(EventOps.sliding(e).count() == 0)
  }

  test("as-of join carries the newest prior purchase, inclusive at ties") {
    val t = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:0$s:00")
    val events = Seq(
      (1L, t(0), 7L, "click", 1.0),    // before any purchase -> 0.0
      (2L, t(1), 7L, "purchase", 5.0), // its own purchase (ts <= ts) -> 5.0
      (3L, t(2), 7L, "click", 1.0),    // after first purchase -> 5.0
      (4L, t(3), 7L, "purchase", 9.0),
      (5L, t(4), 7L, "click", 1.0),    // newest wins -> 9.0
      (6L, t(2), 8L, "click", 1.0))    // other user, no purchases -> 0.0
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.asofJoin(events).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 5.0, 3L -> 5.0,
      4L -> 9.0, 5L -> 9.0, 6L -> 0.0))
  }

  test("dup clustering with no pairs: every doc is its own singleton") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(docs, noPairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(Dedup.applyClusterDedup(docs, Dedup.dupClusters(docs, noPairs))
      .count() == 3)
  }

  test("contamination against an empty eval set flags nothing") {
    val train = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val noEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.contamination(train, noEval, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSet == Set((1L, 0L, false), (2L, 0L, false)))
  }

  test("funnel on empty events and on stage-free events returns zero counts") {
    import spark.implicits._
    val schema = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      "view")).toDF("user_id", "ts", "event_type")
    val empty = schema.filter(lit(false))
    val r0 = graft.operators.EventOps
      .funnel(empty, Seq("signup", "click")).collect()
    assert(r0.map(_.getLong(1)).toSeq == Seq(0L, 0L),
      "empty input still reports every stage, at zero")
    // events exist but none is a funnel stage
    val r1 = graft.operators.EventOps
      .funnel(schema, Seq("signup", "click")).collect()
    assert(r1.map(_.getLong(1)).toSeq == Seq(0L, 0L))
  }

  test("bpe train on an empty corpus learns nothing, never throws") {
    import spark.implicits._
    val empty = Seq((1L, "x")).toDF("doc_id", "text").filter(lit(false))
    assert(graft.operators.TextStats.bpeTrain(spark, empty, steps = 3)
      .collect().isEmpty)
    // single-char vocabulary: no adjacent pairs anywhere
    val chars = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(graft.operators.TextStats.bpeTrain(spark, chars, steps = 3)
      .collect().isEmpty)
  }

  test("audio decode on an empty data chunk yields zero stats, valid header") {
    val dec = new graft.operators.Multimodal.MediaDecoder
    val empty = graft.operators.Multimodal.makeWav(8000, 1, Seq.empty)
    assert(dec.decodeAudio("wav", empty) == ((8000, 1, 0L, 0, 0L)))
  }

  test("sequence packing handles empty and single-doc corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.packChunks(empty, budget = 10).count() == 0)
    val one = Seq((7L, "a b c")).toDF("doc_id", "text")
    val row = TextStats.packChunks(one, budget = 10).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((7L, 3L, 0L, 0L)))
  }

  // ---- funnelMachine's convergence contract and its one remaining
  // documented approximation (monotone locks) probed against the
  // batch funnel it must converge to ---------------------------------

  private def funnelEvents = Seq(
    // user 7: stages arrive in REVERSE order across three micro-batches
    // (purchase, then click, then signup), event times consistent —
    // the buffered candidates must convert once the prerequisite lands
    (1L, "2024-01-01 10:20:00", 7L, "purchase"),
    (2L, "2024-01-01 10:10:00", 7L, "click"),
    (3L, "2024-01-01 10:00:00", 7L, "signup"))

  private def runMachine(batches: Seq[Seq[(Long, String, Long, String)]],
                         horizon: String = "1 hour"): Map[Long, Int] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val name = "funnel_edge_" + java.util.UUID.randomUUID().toString
      .replaceAll("-", "")
    val q = graft.streaming.EventStream
      .funnelMachine(spark, df, Seq("signup", "click", "purchase"), horizon)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .start()
    batches.foreach { b =>
      mem.addData(b.map { case (id, ts, u, tpe) =>
        (id, java.sql.Timestamp.valueOf(ts), u, tpe, 1.0, "{}") })
      q.processAllAvailable()
    }
    val out = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }
    q.stop()
    out
  }

  private def batchReached(evs: Seq[(Long, String, Long, String)]): Long = {
    // highest stage the batch e7 oracle counts the user into
    val df = evs.map { case (id, ts, u, tpe) =>
      (id, java.sql.Timestamp.valueOf(ts), u, tpe) }
      .toDF("event_id", "ts", "user_id", "event_type")
    EventOps.funnel(df, Seq("signup", "click", "purchase"))
      .filter(col("n_users") > 0).count()
  }

  test("funnel: prerequisite arriving in a LATER micro-batch still converts") {
    val batches = funnelEvents.map { case (id, ts, u, tpe) =>
      Seq((id, ts, u, tpe)) } // one event per micro-batch, reverse order
    val streamed = runMachine(batches)
    assert(streamed(7L) == 3, s"streamed reached ${streamed(7L)}")
    // convergence claim: equals the batch funnel over the same events
    assert(batchReached(funnelEvents.map { case (id, ts, u, tpe) =>
      (id, ts, u, tpe) }) == 3L)
  }

  test("funnel: early candidates never crowd out the late qualifier (horizon-bounded buffer)") {
    // stage-2 candidates 10:00 / 10:05 / 10:30 arrive before the
    // prerequisite; signup then locks at 10:10, so only the 10:30
    // candidate qualifies. The round-8 machine capped the buffer at
    // the K smallest candidates and an inadequate K dropped 10:30,
    // losing the conversion. The horizon-bounded buffer retains every
    // candidate the watermark could still let qualify, so convergence
    // to the batch oracle is UNCONDITIONAL for in-horizon disorder —
    // no tuning knob to get wrong.
    val evs = Seq(
      (1L, "2024-01-01 10:00:00", 9L, "click"),
      (2L, "2024-01-01 10:05:00", 9L, "click"),
      (3L, "2024-01-01 10:30:00", 9L, "click"),
      (4L, "2024-01-01 10:10:00", 9L, "signup"))
    val batches = Seq(evs.take(3), evs.drop(3))
    val streamed = runMachine(batches)
    assert(batchReached(evs) == 2L)
    assert(streamed(9L) == 2, s"streamed reached ${streamed(9L)}")
  }

  test("funnel: disorder beyond the horizon is dropped by the watermark, by contract") {
    // the flip side of the unconditional-convergence claim: the
    // claim is scoped to IN-HORIZON disorder. A prerequisite arriving
    // more than `horizon` behind the stream's max event time is
    // filtered by the watermark before the state machine sees it —
    // the stage must NOT convert (silently absorbing arbitrarily
    // late data would mean unbounded state, the knob the horizon
    // replaces). Batch 1 advances the watermark to 12:00 - 10min =
    // 11:50; the 10:00 signup in batch 2 is late beyond the horizon.
    val evs = Seq(
      (1L, "2024-01-01 12:00:00", 13L, "click"),
      (2L, "2024-01-01 10:00:00", 13L, "signup"))
    val batches = Seq(evs.take(1), evs.drop(1))
    val streamed = runMachine(batches, horizon = "10 minutes")
    assert(streamed(13L) == 0,
      s"beyond-horizon prerequisite must be dropped: ${streamed(13L)}")
    // the batch oracle (which has no lateness concept) reaches 2
    // (signup 10:00 → click 12:00) — the divergence IS the
    // documented horizon contract
    assert(batchReached(evs) == 2L)
    // and the same arrival inside a generous horizon fully converts
    val inHorizon = runMachine(batches, horizon = "3 hours")
    assert(inHorizon(13L) == 2,
      s"in-horizon prerequisite must convert: ${inHorizon(13L)}")
  }

  test("funnel: the horizon prune drops only spent candidates, never convergence") {
    // a purchase candidate BELOW the eventual lock chain (10:00) plus
    // the true qualifier (10:40) buffer for two micro-batches before
    // click and signup land last — the prune may spend the former,
    // must keep the latter
    val evs = Seq(
      (1L, "2024-01-01 10:00:00", 11L, "purchase"),
      (2L, "2024-01-01 10:40:00", 11L, "purchase"),
      (3L, "2024-01-01 10:20:00", 11L, "click"),
      (4L, "2024-01-01 10:10:00", 11L, "signup"))
    val batches = evs.map(e => Seq(e)) // one per micro-batch
    val streamed = runMachine(batches)
    // batch oracle: signup 10:10 → click 10:20 → purchase 10:40
    assert(batchReached(evs) == 3L)
    assert(streamed(11L) == 3, s"streamed reached ${streamed(11L)}")
  }
}
