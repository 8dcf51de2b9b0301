package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Analyzers
import graft.operators._
import graft.streaming.EventStream

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (+ the §7 M5 extensions), each with an equivalent
  * ANSI-SQL DuckDB oracle where SQL can express it. Column names are
  * aliased identically on both sides; every query's output VALUES are
  * deterministic (row order is canonicalized by the harness — see the
  * note above `queries`); computed doubles are rounded on both sides;
  * DuckDB integer aggregates are cast to BIGINT to match Spark's
  * LongType.
  */
object SparkEntry {

  /** Flagship: the denormalizing ETL (reference `src/main.py:43-101`)
    * on sf0.001 — one nested document per order. */
  def entry(spark: SparkSession): DataFrame =
    Denorm.docs(spark, "/root/testdata/sf0.001")

  // DuckDB expression fragments shared by several oracles (mirror
  // Analyzers.tokenize / Dedup.normalize / Dedup.shingleSet exactly).
  private val sqlNorm =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private def sqlToks(src: String) =
    s"regexp_extract_all($src, '[a-z0-9](?:[a-z0-9''’]*[a-z0-9])?')"
  private val sqlShingles =
    s"""(CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(toks)-2), i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END)"""
  private val sqlStop = Analyzers.englishStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")
  // Analyzers.customNgram/customShingles token stage: html_strip →
  // standard tokenizer (mixed case) → lowercase → asciifold, as DuckDB
  // (strip_accents ≡ the NFD-mark-strip of expressions.Impl.asciiFold).
  private def sqlFoldedToks(src: String) =
    s"""list_transform(regexp_extract_all(regexp_replace($src, '<[^>]*>', ' ', 'g'),
        '[\\p{L}\\p{N}](?:[\\p{L}\\p{N}''’]*[\\p{L}\\p{N}])?'), t -> strip_accents(lower(t)))"""

  /** Shared by `pc1_percolate` and `st8_stream_percolate` (the
    * streaming percolator is stateless, so its finite-input output is
    * the batch answer). Mirrors [[Percolate.stored]] verbatim — the
    * stored-query table IS part of the operator contract. */
  private lazy val pc1Sql =
    s"""WITH q(query_id, must, must_not, should, min_should) AS (VALUES
          (1::BIGINT, ['spark','join'], ['slow'], []::VARCHAR[], 0),
          (2::BIGINT, ['customer'], []::VARCHAR[], ['order','line','part'], 2),
          (3::BIGINT, []::VARCHAR[], ['vector'], ['stream','window','batch'], 3),
          (4::BIGINT, ['hash','merge','sort'], []::VARCHAR[], []::VARCHAR[], 0),
          (5::BIGINT, ['scan'], ['filter','slow'], ['fast','big'], 1)),
        t AS (SELECT doc_id, list_distinct(${sqlToks("lower(text)")}) AS toks
              FROM documents)
        SELECT doc_id, query_id,
               len(list_filter(should, x -> list_contains(toks, x)))::BIGINT
                 AS n_should
        FROM t, q
        WHERE len(list_filter(must, x -> NOT list_contains(toks, x))) = 0
          AND len(list_filter(must_not, x -> list_contains(toks, x))) = 0
          AND len(list_filter(should, x -> list_contains(toks, x))) >= min_should
        ORDER BY doc_id, query_id"""

  /** The driver's oracle harness hashes result cells with pandas, which
    * cannot hash numpy arrays — every declared query output must be
    * FLAT (scalars only). Array columns are therefore projected through
    * a canonical '|'-join for verification; the array-native operators
    * behind them are unchanged. */
  private def joined(arr: Column): Column = concat_ws("|", arr)

  // t18_analyze's sample text — exercises html_strip, possessives,
  // case folding, accents, stopwords and numerics in one string; the
  // SQL twin escapes the apostrophe
  private val analyzeSample =
    "The Spark-Jobs' <b>Cafés</b> run FASTER than 42 résumés!"
  private val analyzeSampleSql = analyzeSample.replace("'", "''")

  /** Mechanically generated replay of `TextStats.bpeTrain` (the
    * OracleSql.scala pattern: the oracle re-derives every training
    * step, not golden literals): chained CTEs — vocab → adjacent-pair
    * counts → argmax (count desc, lexicographic tie-break) → literal
    * replace on the sentinel-space representation — once per step. */
  private def sqlBpeTrain(steps: Int): String = {
    val head =
      s"""WITH w AS (SELECT unnest(toks) AS w
                     FROM (SELECT ${sqlToks("lower(text)")} AS toks FROM documents)),
          v0 AS (SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS rep,
                        count(*)::BIGINT AS freq
                 FROM w GROUP BY w)"""
    val stages = (0 until steps).map { i =>
      s"""s$i AS (SELECT string_split(trim(rep), ' ') AS syms, freq FROM v$i),
          e$i AS (SELECT unnest(generate_series(1, len(syms) - 1)) AS ix, syms, freq FROM s$i),
          p$i AS (SELECT syms[ix] AS l, syms[ix + 1] AS r, sum(freq)::BIGINT AS c
                  FROM e$i GROUP BY 1, 2),
          b$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
          v${i + 1} AS (SELECT replace(rep, ' ' || b.l || ' ' || b.r || ' ',
                                       ' ' || b.l || b.r || ' ') AS rep, freq
                        FROM v$i, b$i b)"""
    }.mkString(",\n", ",\n", "")
    val finals = (0 until steps).map { i =>
      s"""SELECT ${i + 1}::BIGINT AS step, l AS left_sym, r AS right_sym,
                 l || r AS merged, c AS pair_count FROM b$i"""
    }.mkString("\nUNION ALL\n")
    s"$head$stages\n$finals\nORDER BY step"
  }

  /** DuckDB replay of [[graft.operators.TextStats.bpeTrainBatched]] —
    * the BATCHED trainer is the production path (job count ÷batch for
    * a 32k-merge vocab), so it must be the differentially-tested one,
    * not just spec-locked to batch=1 ≡ sequential. The replay is
    * step-exact: per round, pair counts over the current vocab, the
    * (c desc, l, r) ranking LIMITed to the same 4×want over-fetch,
    * the greedy symbol-disjoint screen as a RECURSIVE CTE walking the
    * ranking one rank at a time (kept iff none of l, r, l||r was
    * claimed this round — state is the claimed-symbol list), then one
    * list_reduce applying the round's replaces in pick order, exactly
    * the foldLeft projection Spark runs. `steps` stages are emitted
    * statically; a stage whose dynamic `want` (steps − emitted so
    * far) is 0 ranks a LIMIT-0 list and is a no-op, so the SQL is
    * correct for ANY fill pattern the screen produces — rounds that
    * fill, partial rounds, all the way to one-pick rounds. */
  private def sqlBpeTrainBatched(steps: Int, batch: Int): String = {
    // every non-recursive CTE is MATERIALIZED: the v-chain is
    // referenced twice per stage (s$i and v$i), so inlining would
    // re-expand v0 2^steps times — at 16 stages that's 65k parquet
    // scans (observed as an fd-exhaustion refusal), where
    // materialization computes each vocab generation once
    val head =
      s"""WITH RECURSIVE w AS (SELECT unnest(toks) AS w
                     FROM (SELECT ${sqlToks("lower(text)")} AS toks FROM documents)),
          v0 AS MATERIALIZED (SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS rep,
                        count(*)::BIGINT AS freq
                 FROM w GROUP BY w)"""
    val stages = (1 to steps).map { i =>
      val prevEm = (1 until i).map(j => s"(SELECT count(*) FROM k$j)")
        .mkString(" + ") match { case "" => "0"; case s => s }
      val keepCond =
        s"""g.npick < (SELECT want FROM w$i)
                         AND NOT (list_contains(g.used, t.l) OR list_contains(g.used, t.r)
                                  OR list_contains(g.used, t.l || t.r))"""
      s"""em$i AS MATERIALIZED (SELECT ($prevEm)::BIGINT AS em),
          w$i AS MATERIALIZED (SELECT greatest(0, least($batch, $steps - em)) AS want FROM em$i),
          s$i AS MATERIALIZED (SELECT string_split(trim(rep), ' ') AS syms, freq FROM v${i - 1}),
          e$i AS MATERIALIZED (SELECT unnest(generate_series(1, len(syms) - 1)) AS ix, syms, freq FROM s$i),
          p$i AS MATERIALIZED (SELECT syms[ix] AS l, syms[ix + 1] AS r, sum(freq)::BIGINT AS c
                  FROM e$i GROUP BY 1, 2),
          t$i AS MATERIALIZED (SELECT l, r, c, row_number() OVER (ORDER BY c DESC, l, r) AS rk
                  FROM p$i ORDER BY c DESC, l, r LIMIT (SELECT 4 * want FROM w$i)),
          g$i(rk, npick, picked, used) AS (
            SELECT 0::BIGINT, 0::BIGINT, CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[])
            UNION ALL
            SELECT t.rk,
                   CASE WHEN $keepCond THEN g.npick + 1 ELSE g.npick END,
                   CASE WHEN $keepCond
                        THEN list_append(g.picked, t.l || chr(1) || t.r || chr(1) || t.c::VARCHAR)
                        ELSE g.picked END,
                   CASE WHEN $keepCond
                        THEN g.used || [t.l, t.r, t.l || t.r] ELSE g.used END
            FROM g$i g JOIN t$i t ON t.rk = g.rk + 1),
          k$i AS MATERIALIZED (SELECT split_part(x, chr(1), 1) AS l, split_part(x, chr(1), 2) AS r,
                         split_part(x, chr(1), 3)::BIGINT AS c, ord::BIGINT AS ord
                  FROM (SELECT unnest(picked) AS x, generate_subscripts(picked, 1) AS ord
                        FROM (SELECT picked FROM g$i ORDER BY rk DESC LIMIT 1))),
          v$i AS MATERIALIZED (SELECT list_reduce(
                    list_prepend(rep,
                      coalesce((SELECT list(' ' || l || ' ' || r || ' ' || chr(1) || ' ' || l || r || ' ' ORDER BY ord) FROM k$i), [])),
                    (acc, x) -> replace(acc, split_part(x, chr(1), 1), split_part(x, chr(1), 2))) AS rep,
                  freq
                  FROM v${i - 1})"""
    }.mkString(",\n", ",\n", "")
    val finals = (1 to steps).map { i =>
      s"""SELECT ((SELECT em FROM em$i) + ord) AS step, $i::BIGINT AS round,
                 l AS left_sym, r AS right_sym, l || r AS merged, c AS pair_count FROM k$i"""
    }.mkString("\nUNION ALL\n")
    s"$head$stages\n$finals\nORDER BY step"
  }

  /** Planted-ground-truth corpus shared by the ANN contract queries
    * (n2/n3/n4): the sf embeddings are structureless random directions
    * (recall-vs-brute gates nothing for ANY sublinear index), so the
    * standard evaluation is planted ground truth — each probe vector
    * gets a ×2-scaled copy under id+10⁶: same direction, so cosine is
    * exactly 1, the same LSH bucket (positive scaling preserves every
    * hyperplane sign) and the same IVF cell. */
  private val annProbeIds = Seq(1L, 101L, 202L)

  /** The plant-id invariant, checked ONCE per corpus dir per JVM
    * (memo — the scan never lands in a timed query after the untimed
    * index build warms it): no ORGANIC row may hold one of the three
    * planted ids (probe id + 10⁶ — a fixed offset 65 oracle-SQL sites
    * encode), or every per-id contract and recall metric silently
    * conflates two vectors under one id. The round-13 review found
    * exactly this on the pre-rev5 ×1000 replica corpus, whose
    * replica-100 ids landed in [10⁶, 10⁶ + 2002]; scaled corpora now
    * keep the invariant by replica-striding vec_id at ≥ 10⁷
    * ([[graft.BenchScale]] rev5). */
  private val plantGuard =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def annPlantedCorpus(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    // all three plant windows: +10⁶ (this corpus), +2·10⁶ (n10's
    // incremental-add twins), +3·10⁶ (st11's streaming twins) — the
    // round-13 review found the guard covering only the first
    val plantIds = for (off <- Seq(1000000L, 2000000L, 3000000L);
                        id <- annProbeIds) yield id + off
    val clashes: Long = plantGuard.computeIfAbsent(d,
      _ => emb.filter(col("vec_id").isin(plantIds: _*)).count())
    require(clashes == 0L,
      s"ANN plant-id collision: corpus $d holds $clashes organic " +
        s"row(s) at the planted ids ${plantIds.mkString(",")} — " +
        "per-id contracts would conflate two vectors; re-stride the " +
        "corpus (BenchScale rev5 floors the replica stride at 10⁷)")
    val planted = emb.filter(col("vec_id").isin(annProbeIds: _*))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
          .as("embedding"))
    emb.unionByName(planted)
  }

  /** The persisted ANN index artifact over the planted corpus
    * (operators.AnnIndex scaladoc): trained + encoded ONCE per corpus
    * version, shared by n3/n4/n7/n8/n9 — the ingest-job discipline the
    * text analyzers already follow. Bench pre-builds it untimed, the
    * way an ES benchmark indexes before it searches. */
  private[graft] def annIndexFor(s: SparkSession, d: String): AnnIndex.Loaded =
    AnnIndex.ensure(annPlantedCorpus(s, d), AnnIndex.corpusKey(d))

  /** The persisted text search index over `documents`
    * (operators.TextIndex scaladoc): the analyzer runs at ingest, the
    * BM25/significant-terms family reads postings + statistics — ES's
    * index-time analysis discipline. Shared by
    * f2/f3/f4/f6/f9/f10/f11/a8/a17/a27/w9. */
  private[graft] def textIndexFor(s: SparkSession, d: String): TextIndex.Loaded =
    TextIndex.ensure(Tables.documents(s, d), TextIndex.corpusKey(d))

  /** The persisted standing dedup indexes (operators.DedupIndex
    * scaladoc) — the state a daily-ingest dedup service screens
    * against, fingerprint-keyed per corpus version like the other two
    * artifacts. Two standing splits exist because d10 (even ids) and
    * d12 (ids % 10 ≠ 0) model different standing corpora. */
  private[graft] def dedupIndexEven(s: SparkSession, d: String): DedupIndex.Loaded =
    DedupIndex.ensure(Tables.documents(s, d).filter(col("doc_id") % 2 === 0),
      "even-" + TextIndex.corpusKey(d))
  private[graft] def dedupIndexMost(s: SparkSession, d: String): DedupIndex.Loaded =
    DedupIndex.ensure(Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0),
      "most-" + TextIndex.corpusKey(d))

  /** The bucketed-layout ingest job behind z3: orders and lineitem
    * written `bucketBy(8, key)` into the session warehouse, memoized
    * per (corpus dir, session catalog) — built once per JVM like the
    * ANN/text index artifacts, and untimed in Bench's indexing phase.
    * `repartition(nb, key)` aligns task hashing with bucket hashing
    * (both pmod(murmur3, nb)): one file per bucket, not tasks×buckets. */
  private val bucketedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private[graft] def bucketedTablesFor(s: SparkSession,
                                       d: String): (String, String) = {
    val nb = 8
    def prep(df: DataFrame, key: String, table: String): String = {
      // a previous JVM leaves the warehouse directory behind while the
      // in-memory catalog forgets the table — saveAsTable then refuses
      // with LOCATION_ALREADY_EXISTS, so clear both sides first
      s.sql(s"DROP TABLE IF EXISTS $table")
      val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir"))
      val loc = java.nio.file.Paths.get(
        if (wh.getScheme == "file") wh.getPath else wh.toString, table)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        // Files.walk holds directory fds until CLOSED (try/finally —
        // the leak class the x26b comment records as an fd-exhaustion
        // refusal in this long-lived JVM)
        val walk = java.nio.file.Files.walk(loc)
        try walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.delete)
        finally walk.close()
      }
      df.repartition(nb, col(key))
        .write.mode("overwrite").bucketBy(nb, key).sortBy(key)
        .saveAsTable(table)
      table
    }
    // table names carry the corpus fingerprint (the AnnIndex/TextIndex
    // version-keying discipline): two corpus dirs in one JVM get
    // DIFFERENT tables instead of clobbering one global name while the
    // memo still vouches for it. The memo is revalidated against the
    // session catalog — a fresh SparkSession in the same JVM has an
    // empty in-memory catalog even though the memo (and the warehouse
    // files) survive, so a stale hit rebuilds instead of throwing
    // TABLE_NOT_FOUND at read time.
    val keyHex = Fingerprint.ofTables(d, "orders", "lineitem").take(12)
    val names = (s"graft_z3_orders_$keyHex", s"graft_z3_lineitem_$keyHex")
    val hit = bucketedMemo.get(d)
    if (hit == names && s.catalog.tableExists(names._1) &&
        s.catalog.tableExists(names._2)) names
    else {
      val built = (prep(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus")),
        "o_orderkey", names._1),
        prep(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_extendedprice")),
          "l_orderkey", names._2))
      bucketedMemo.put(d, built)
      built
    }
  }

  // Physical row order is NOT part of the verification contract: the
  // harness canonicalizes by sorting rows (and columns by name) on both
  // the Spark and the DuckDB side before hashing. Queries keep ORDER BY
  // only where ordering IS the semantics (top-k, keyset pagination,
  // ranked search); the large ETL outputs skip the final global sort —
  // a range exchange + full sort of the whole result that no production
  // write path contains.

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / sinks / maintenance (SURVEY §2.1) ----
    "s10_match_all" -> ((s, d) =>
      Tables.orders(s, d)),
    "s9_count" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))),
    "s11_point_lookup" -> ((s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") === 42L)),
    "s22_mget" -> ((s, d) => {
      // ES _mget: one batched multi-id lookup returning a row PER
      // REQUESTED id with found=false for misses (ES's contract — the
      // response mirrors the request, hits carry the source). The id
      // set pushes as one In filter (row-group pruning at the scan,
      // a single read for the whole batch — never one query per id);
      // the request frame is broadcast, never shuffled.
      import s.implicits._
      val ids = Seq(7L, 42L, 123L, 424242L, 9999999L)
      val hits = Tables.documents(s, d)
        .filter(col("doc_id").isin(ids: _*))
        .select(col("doc_id"), lit(true).as("hit"),
          col("lang"), col("n_chars"))
      broadcast(ids.toDF("doc_id")).join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("hit"), lit(false)).as("found"),
          col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    "s3_keyset_chunk" -> ((s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") > 500L)
        .orderBy(col("o_orderkey")).limit(100)),
    "s8_merge_update" -> ((s, d) => {
      // scripted partial update (docs/protokol.md:596-611) as a merge:
      // counter += delta from an updates table (deltas derived here)
      val deltas = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      Tables.orders(s, d)
        .join(deltas, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"),
          round(col("o_totalprice") + coalesce(col("qty"), lit(0.0)), 2)
            .as("new_total"))
    }),
    "s8b_versioned_update" -> ((s, d) => {
      // optimistic concurrency control on scripted updates
      // (docs/protokol.md:590-629): each stored row carries a
      // _seq_no-style version token; an update presents the version it
      // read, a stale presentation is REJECTED and surfaced, an
      // accepted merge bumps the token. Both the standing versions and
      // the update batch are derived deterministically here so the
      // oracle replays the same state machine. Plain broadcast-able
      // equi-join + branch-free CASE projection — shape identical to s8.
      val cur = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_totalprice"), (col("o_orderkey") % 5 + 1).as("seq_no"))
      // updates for even keys only; 1-in-3 presents the CURRENT token,
      // the rest read a stale snapshot (token - 1)
      val upd = Tables.orders(s, d)
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("u_key"),
          when(col("o_orderkey") % 3 === 0, col("o_orderkey") % 5 + 1)
            .otherwise(col("o_orderkey") % 5).as("expected_seq"))
      val hit = col("expected_seq") === col("seq_no")
      cur.join(upd, col("o_orderkey") === col("u_key"), "left")
        .select(col("o_orderkey"),
          coalesce(hit, lit(false)).as("applied"),
          when(hit, col("seq_no") + 1).otherwise(col("seq_no"))
            .as("seq_no_after"),
          round(when(hit, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")), 2).as("total_after"))
        .orderBy(col("o_orderkey"))
    }),
    "s2_streamed_fetch" -> ((s, d) => {
      // S2 server-side cursor (reference `src/main.py:41,133`): the
      // driver consumes the result through Sink.streamedFetch
      // (toLocalIterator — one partition resident at a time, never the
      // whole frame), folding running totals exactly like the
      // reference's fetch loop. The fold is returned as a 1-row frame:
      // row count plus an exact integer-cents sum, so the driver-side
      // accumulation order can't perturb the hash (no float ordering).
      val proj = Tables.orders(s, d).select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      var cents = 0L
      val n = graft.sources.Sink.streamedFetch(proj)(r => cents += r.getLong(1))
      import s.implicits._
      Seq((n, cents)).toDF("fetched_rows", "total_cents")
    }),
    "s4_create_table" -> ((s, d) => {
      // S4 create-with-schema (`src/main.py:12-35`): register a catalog
      // table over the region parquet, then prove the created table
      // actually serves queries — its row count and its catalog-visible
      // column list — and drop it so the query is idempotent.
      val name = "graft_s4_region"
      graft.sources.Sink.dropIfExists(s, name)
      graft.sources.Sink.createTable(s, name,
        java.nio.file.Paths.get(d, "region.parquet").toString)
      val n = s.table(name).count()
      val cols = s.table(name).schema.fieldNames.sorted.mkString(",")
      graft.sources.Sink.dropIfExists(s, name)
      import s.implicits._
      Seq((n, cols)).toDF("n_rows", "cols")
    }),
    "s5_exists_drop" -> ((s, d) => {
      // S5 existence check + conditional drop (`src/main.py:12-35`):
      // the full DDL state machine — absent → created → dropped →
      // absent → second drop is a no-op — surfaced as one verifiable
      // row of booleans.
      val name = "graft_s5_probe"
      graft.sources.Sink.dropIfExists(s, name)
      val before = s.catalog.tableExists(name)
      graft.sources.Sink.createTable(s, name,
        java.nio.file.Paths.get(d, "region.parquet").toString)
      val created = s.catalog.tableExists(name)
      val dropped = graft.sources.Sink.dropIfExists(s, name)
      val after = s.catalog.tableExists(name)
      val droppedAgain = graft.sources.Sink.dropIfExists(s, name)
      import s.implicits._
      Seq((before, created, dropped, after, droppedAgain)).toDF(
        "exists_before", "exists_created", "dropped", "exists_after",
        "dropped_again")
    }),
    "s6_bulk_roundtrip" -> ((s, d) => {
      // S6 bulk sink with _id-hash shard routing (`src/main.py:137-150`,
      // the 3-primary-shard analog): write customer through
      // Sink.bulkWrite, read the COMMITTED files back, recover each
      // row's shard from its part-file number, require the routing
      // invariant (an id never lands in two shards) executor-side, and
      // reduce to corpus-level readback aggregates the oracle recomputes
      // from the source table.
      val out = Scratch.dir("s6bulk")
      graft.sources.Sink.bulkWrite(s, Tables.customer(s, d), "c_custkey",
        out, shards = 3)
      val back = s.read.parquet(out).withColumn("shard",
        regexp_extract(input_file_name(), "part-(\\d+)-", 1).cast("int"))
      val nViolations = back.groupBy(col("c_custkey"))
        .agg(countDistinct(col("shard")).as("ns"))
        .filter(col("ns") > 1).count()
      require(nViolations == 0,
        s"$nViolations ids routed to more than one shard")
      back.agg(
        countDistinct(col("shard")).as("n_shards"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("c_custkey")).as("n_ids"),
        min(col("c_custkey")).as("min_id"),
        max(col("c_custkey")).as("max_id"))
    }),
    "s7_sink_ack" -> ((s, d) => {
      // S7 bulk-response ack (`src/main.py:147-148`): the in-flight
      // observed row count vs the committed parquet footer total —
      // metadata only, no second data scan (bulkWrite's internal
      // `require` IS the ack; the query surfaces both numbers for the
      // driver to hash-verify). batchSize exercises the bounded-file
      // splitting, so the footer sum spans multiple files per shard.
      val out = Scratch.dir("s7ack")
      val written = graft.sources.Sink.bulkWrite(s, Tables.orders(s, d),
        "o_orderkey", out, shards = 3, batchSize = 2000)
      val committed = graft.sources.Sink.committedRowCount(s, out)
      val nFiles = new java.io.File(out).listFiles()
        .count(_.getName.endsWith(".parquet"))
      require(nFiles >= 3, s"expected >= 3 shard files, got $nFiles")
      import s.implicits._
      Seq((written, committed, written == committed))
        .toDF("written", "committed", "acked")
    }),
    "s12_compact" -> ((s, d) => {
      // Small-file compaction as a VERIFIED maintenance pass: scatter
      // documents into a 24-file mess (the long-running-ingest shape),
      // compact to ⌈rows/5000⌉ near-equal files via Sink.compact's
      // write-to-tmp + atomic-rename, and read the result back. Every
      // output number is deterministic: the mess size is the
      // repartition width, the compacted count is the ceiling division
      // the compactor computes, and the row count must survive the
      // rewrite untouched.
      val out = java.nio.file.Paths.get(Scratch.dir("s12c"), "t").toString
      Tables.documents(s, d).repartition(24)
        .write.mode("overwrite").parquet(out)
      val (before, after) = graft.sources.Sink.compact(s, out, 5000L)
      val rows = s.read.parquet(out).count()
      import s.implicits._
      Seq((before.toLong, after.toLong, rows))
        .toDF("files_before", "files_after", "rows_after")
    }),
    "s13_partition_prune" -> ((s, d) => {
      // Directory-partitioned layout with the pruning PROVED at the
      // driver gate: write events partitioned by event_type
      // (Sink.partitionedWrite — the coarse-key layout a 100 TB ingest
      // keeps), read back one type, and REQUIRE the physical scan to
      // carry the predicate as a PartitionFilter — i.e. the query
      // reads one directory, not the table. The returned aggregates
      // are recomputed by the oracle from the raw table.
      val out = java.nio.file.Paths.get(Scratch.dir("s13p"), "events_by_type").toString
      graft.sources.Sink.partitionedWrite(
        Tables.events(s, d).select(col("event_id"), col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents")),
        "event_type", out)
      val back = s.read.parquet(out)
        .filter(col("event_type") === "purchase")
      val plan = back.queryExecution.executedPlan.toString
      require(plan.contains("PartitionFilters: [isnotnull(event_type"),
        s"partition pruning missing from scan:\n$plan")
      back.agg(count(lit(1)).as("n_purchase"),
        sum(col("cents")).as("purchase_cents"))
    }),
    "s14_alias_swap" -> ((s, d) => {
      // Zero-downtime reindex — the ES `_aliases` atomic-swap
      // lifecycle (Sink.aliasSwap scaladoc) run end-to-end under the
      // gate: v1 of a summary index is written and aliased; the
      // reindex writes v2 WITH A NEW SCHEMA (cents column added — the
      // mapping change that forces a reindex in ES) beside it; one
      // atomic pointer move flips readers to v2. The readback goes
      // THROUGH the alias, so the oracle match proves readers see
      // wholly-v2 after the flip; v1 stays on disk for rollback.
      val base = java.nio.file.Paths.get(Scratch.dir("s14a"), "events_alias").toString
      val events = Tables.events(s, d)
      graft.sources.Sink.aliasWriteVersion(
        events.groupBy(col("event_type")).agg(count(lit(1)).as("n")),
        base, 1)
      graft.sources.Sink.aliasSwap(base, 1)
      val before = graft.sources.Sink.aliasVersion(base)
      graft.sources.Sink.aliasWriteVersion(
        events.groupBy(col("event_type")).agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents")),
        base, 2)
      graft.sources.Sink.aliasSwap(base, 2)
      val after = graft.sources.Sink.aliasVersion(base)
      val v1Retained = java.nio.file.Files.exists(
        java.nio.file.Paths.get(base, "v1"))
      graft.sources.Sink.aliasRead(s, base)
        .withColumn("alias_before", lit(before))
        .withColumn("alias_after", lit(after))
        .withColumn("v1_retained", lit(v1Retained))
        .orderBy(col("event_type"))
    }),
    "z3_bucketed_join" -> ((s, d) => {
      // Bucketed CO-LOCATED join — the layout that removes the
      // fact⋈fact shuffle entirely at 100 TB: both tables are written
      // `bucketBy(8, key)` (Spark's native bucketing), so matching
      // keys land in the same bucket file on both sides and the
      // sort-merge join reads bucket i ⋈ bucket i with NO exchange on
      // either side — proven by a REQUIRE on the executed plan, so
      // the driver gate itself fails if either side ever shuffles.
      // The merge hint pins SMJ — at harness scale Spark would broadcast,
      // which benchmarks nothing about co-location. The write is the
      // maintained-layout ingest job (bucketedTablesFor — memoized per
      // corpus and pre-built untimed by Bench, like the ANN/text
      // indexes); production writes it once and every downstream join
      // rides it.
      val (oTab, lTab) = bucketedTablesFor(s, d)
      val o = s.table(oTab)
      val l = s.table(lTab)
      val j = o.join(l.hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"bucketed join must be exchange-free SMJ:\n$plan")
      j.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("rev_cents"))
        .orderBy(col("o_orderstatus"))
    }),
    "s18_rollover" -> ((s, d) => {
      // ES ILM rollover under the gate (Sink.rollover scaladoc):
      // weekly event batches ingest in time order; the write index
      // rolls at 5000 docs. The oracle replays the greedy
      // segmentation from the weekly counts with a recursive CTE —
      // generation boundaries, per-generation doc counts, and which
      // generation holds the write alias must all agree.
      // one cached pass feeds the week listing plus every batch's
      // count+write (the rollover loop is eager, so the pin is
      // released before returning)
      val ev = Tables.events(s, d).persist()
      try {
        val weeks = ev.select(date_trunc("WEEK", col("ts")).as("wk"))
          .distinct().orderBy(col("wk"))
          .collect().map(_.getTimestamp(0)) // bounded: one row per week
        val batches = weeks.toSeq.map(w =>
          ev.filter(date_trunc("WEEK", col("ts")) === w))
        graft.sources.Sink.rollover(s, Scratch.dir("s18roll"),
            batches, maxDocs = 5000L)
          .orderBy(col("index_name"))
      } finally ev.unpersist(blocking = false)
    }),
    "s19_rollover_gc" -> ((s, d) => {
      // ES ILM's DELETE phase under the gate: the s18 rollover
      // followed by the keep-last-K retention sweep
      // (Sink.gcVersions scaladoc) — expired generations drop WHOLE
      // (never a delete-by-query against a monolith), the live write
      // index and its rollback predecessor survive, and the verified
      // rows are the retained generations READ BACK from disk (their
      // counts must match the oracle's greedy segmentation replay —
      // a sweep that damaged a survivor or left an expired gen would
      // change the row set)
      val ev = Tables.events(s, d).persist()
      try {
        val weeks = ev.select(date_trunc("WEEK", col("ts")).as("wk"))
          .distinct().orderBy(col("wk"))
          .collect().map(_.getTimestamp(0)) // bounded: one row per week
        val batches = weeks.toSeq.map(w =>
          ev.filter(date_trunc("WEEK", col("ts")) === w))
        val base = Scratch.dir("s19roll")
        graft.sources.Sink.rollover(s, base, batches, maxDocs = 5000L)
        graft.sources.Sink.gcVersions(s, base, keepLast = 2)
        val live = graft.sources.Sink.aliasVersion(base)
        // read-back listing through the same Hadoop FS the sweep used
        val basePath = new org.apache.hadoop.fs.Path(base)
        val fs = basePath
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val remaining = fs.listStatus(basePath).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
          .map(_.getPath.getName).sorted
        import s.implicits._
        remaining.map { v =>
          (v, s.read.parquet(s"$base/$v").count(), v == live)
        }.toDF("index_name", "n_docs", "is_write_index")
          .orderBy(col("index_name"))
      } finally ev.unpersist(blocking = false)
    }),
    "s21_snapshot_restore" -> ((s, d) => {
      // ES snapshot/restore (Sink.snapshot/restore scaladoc): bulk
      // write an index, snapshot it into a repository (per-file md5
      // manifest written LAST), restore into a fresh directory with
      // every checksum re-verified as the bytes stream, and prove the
      // restored index answers queries identically — the verified row
      // is the source-table replay, so a dropped file, a truncated
      // copy, or an unverified restore moves a number.
      val src = Scratch.dir("s21src")
      val repo = Scratch.dir("s21repo")
      val dest = Scratch.dir("s21dest")
      graft.sources.Sink.bulkWrite(s, Tables.customer(s, d),
        "c_custkey", src)
      val nSnap = graft.sources.Sink.snapshot(s, src, repo)
      val nRest = graft.sources.Sink.restore(s, repo, dest)
      s.read.parquet(dest)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("c_custkey")).as("n_ids"),
          sum(col("c_custkey")).as("sum_key"))
        .select(col("n_rows"), col("n_ids"), col("sum_key"),
          lit(nSnap == nRest && nSnap > 0).as("files_match"))
    }),
    "s22_snapshot_distributed" -> ((s, d) => {
      // s21's CLUSTER-parallel twin (Sink.snapshotDistributed /
      // restoreDistributed scaladoc): the copy+hash of every file
      // runs as Spark tasks — the shape that scales a 100 TB
      // repository past one JVM's NIC, where the 16-thread driver
      // pool serializes — while the walk and the manifest (written
      // LAST, under the same `_WRITER` claim) stay driver-side.
      // Restore re-verifies every md5 executor-side; the verified row
      // is the source-table replay, so a dropped file, a torn copy,
      // or a skipped checksum moves a number exactly as in s21.
      val src = Scratch.dir("s22src")
      val repo = Scratch.dir("s22repo")
      val dest = Scratch.dir("s22dest")
      graft.sources.Sink.bulkWrite(s, Tables.supplier(s, d),
        "s_suppkey", src)
      val nSnap = graft.sources.Sink.snapshotDistributed(s, src, repo)
      val nRest = graft.sources.Sink.restoreDistributed(s, repo, dest)
      s.read.parquet(dest)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("s_suppkey")).as("n_ids"),
          sum(col("s_suppkey")).as("sum_key"))
        .select(col("n_rows"), col("n_ids"), col("sum_key"),
          lit(nSnap == nRest && nSnap > 0).as("files_match"))
    }),
    "s23_snapshot_auto" -> ((s, d) => {
      // Arm-SELECTED snapshot/restore (Sink.snapshotAuto/restoreAuto,
      // chooseDistributedCopy scaladoc): topology + tree size pick
      // pool vs cluster fan-out — bench_snapshot.json measured the
      // 16-thread pool at 7.98×/7.25× vs the distributed arm's
      // 4.67×/2.73× on one box, so on this single-host runtime the
      // selector must choose the pool (used_pool asserts it); past
      // one NIC the same call routes to the executor fan-out. The
      // verified row is the source-table replay, so a dropped file,
      // a torn copy, or a wrong-arm checksum skip moves a number.
      val src = Scratch.dir("s23src")
      val repo = Scratch.dir("s23repo")
      val dest = Scratch.dir("s23dest")
      graft.sources.Sink.bulkWrite(s, Tables.part(s, d), "p_partkey", src)
      val (nSnap, distS) = graft.sources.Sink.snapshotAuto(s, src, repo)
      val (nRest, distR) = graft.sources.Sink.restoreAuto(s, repo, dest)
      s.read.parquet(dest)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("p_partkey")).as("n_ids"),
          sum(col("p_partkey")).as("sum_key"))
        .select(col("n_rows"), col("n_ids"), col("sum_key"),
          lit(nSnap == nRest && nSnap > 0).as("files_match"),
          lit(!distS && !distR).as("used_pool"))
    }),
    "s21b_artifact_snapshot" -> ((s, d) => {
      // Recursive artifact snapshot/restore: the engine's real state
      // is a gen-N artifact TREE (postings/dict/stats/... tables), not
      // a flat parquet dir — ES snapshots cover a whole index incl.
      // every segment file. Snapshot the LIVE text-index generation,
      // restore it under a fresh artifact root, publish the `_CURRENT`
      // pointer there, resolve it like a fresh JVM would, and serve
      // f4's BM25 search from the restored artifact. The oracle is
      // f4's full corpus replay, so a dropped subdirectory, a torn
      // table, or an unverified copy moves a score.
      val ix = textIndexFor(s, d)
      val repo = Scratch.dir("s21brepo")
      val root = java.nio.file.Paths.get(Scratch.dir("s21broot"))
      val nSnap = graft.sources.Sink.snapshot(s, ix.dir, repo)
      val nRest = graft.sources.Sink.restore(s, repo,
        root.resolve("gen-1").toString)
      require(nSnap == nRest && nSnap > 0,
        s"artifact snapshot/restore file-count mismatch: $nSnap vs $nRest")
      graft.operators.ArtifactGen.publish(root, root.resolve("gen-1"))
      val restored = graft.operators.ArtifactGen.currentDir(root)
        .getOrElse(throw new IllegalStateException(
          "restored generation did not resolve — _DONE missing from snapshot"))
      Search.searchBm25Indexed(s,
        graft.operators.TextIndex.Loaded(restored.toString, "s21b"),
        Seq("spark", "window"), k = 20)
    }),
    "s21c_incremental_snapshot" -> ((s, d) => {
      // ES INCREMENTAL snapshots (Sink.snapshotIncremental scaladoc):
      // snapshot a text index built on 2/3 of the corpus, append the
      // remaining third as a segment, snapshot AGAIN — the second
      // snapshot must copy ONLY the delta files (segment files are
      // immutable; dailies of a 100 TB index copy only new segments) —
      // then restore the second snapshot into a fresh root and serve
      // f4's BM25 from it. The oracle is the full-corpus replay, so
      // the restore proves base + segment + blob reuse compose to the
      // exact full index.
      val docs = Tables.documents(s, d)
      val ixDir = Scratch.dir("s21cix")
      val base = graft.operators.TextIndex.build(
        docs.filter(col("doc_id") % 3 =!= 0), ixDir)
      val repo = Scratch.dir("s21crepo")
      val (t1, c1) = graft.sources.Sink.snapshotIncremental(s, ixDir, repo, "1")
      require(t1 > 0 && c1 == t1, "first snapshot copies everything")
      graft.operators.TextIndex.addSegment(base,
        docs.filter(col("doc_id") % 3 === 0))
      val (t2, c2) = graft.sources.Sink.snapshotIncremental(s, ixDir, repo, "2")
      require(c2 > 0 && c2 < t2,
        s"second snapshot must copy only the segment delta: copied $c2 of $t2")
      val root = java.nio.file.Paths.get(Scratch.dir("s21croot"))
      graft.sources.Sink.restoreSnapshot(s, repo, "2",
        root.resolve("gen-1").toString)
      graft.operators.ArtifactGen.publish(root, root.resolve("gen-1"))
      val restored = graft.operators.ArtifactGen.currentDir(root)
        .getOrElse(throw new IllegalStateException(
          "restored snapshot did not resolve as a complete generation"))
      Search.searchBm25Indexed(s,
        graft.operators.TextIndex.Loaded(restored.toString, "s21c"),
        Seq("spark", "window"), k = 20)
    }),
    "s20_reindex" -> ((s, d) => {
      // ES _reindex (conflicts=proceed, op_type=create): dest is
      // pre-seeded with the doc_id%3==0 slice at ORIGINAL values;
      // reindexing the whole corpus in applies the painless-style
      // script (n_chars += 1000 marks migrated copies) and every
      // seeded id noops — create never overwrites. The verified row
      // is the _reindex response (total/created/noops) PLUS a dest
      // readback aggregate: the sum splits exactly into untouched
      // seed values + transformed new arrivals, so an overwrite, a
      // double-append, or a dropped conflict all move a counter or
      // the checksum (Sink.reindex scaladoc for the anti-join +
      // additive-append shape).
      val out = Scratch.dir("s20reindex")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.sources.Sink.bulkWrite(s,
        docs.filter(col("doc_id") % 3 === 0), "doc_id", out)
      val transformed = docs
        .withColumn("n_chars", col("n_chars") + 1000L)
      val (total, created, noops) =
        graft.sources.Sink.reindex(s, transformed, "doc_id", out)
      s.read.parquet(out)
        .agg(count(lit(1)).as("dest_rows"),
          sum(col("n_chars")).as("sum_chars"))
        .select(lit(total).as("total"), lit(created).as("created"),
          lit(noops).as("noops"), col("dest_rows"), col("sum_chars"))
    }),
    "f19_explain" -> ((s, d) =>
      // ES _explain: the BM25 factor decomposition per matching doc
      // (Search.explainBm25 scaladoc) — the oracle recomputes every
      // factor from the raw corpus, so the explanation itself is
      // differentially verified, not just the final score
      Search.explainBm25(s, textIndexFor(s, d), "spark", k = 10)),
    "f18_msearch" -> ((s, d) =>
      // ES _msearch: three queries, ONE shared postings pass
      // (Search.msearchBm25 scaladoc — a single pushed term-IN read,
      // one broadcast stats row, per-query top-k as a rank-filtered
      // window the planner runs as WindowGroupLimit)
      Search.msearchBm25(s, textIndexFor(s, d),
        Seq(("q_merge", "merge"), ("q_spark", "spark"),
          ("q_window", "window")), k = 5)),
    "f28_sparse_vector" -> ((s, d) =>
      // learned-sparse retrieval (Search.sparseVectorSearch scaladoc):
      // sparse term-weight query vector dotted against index-served
      // integer doc impacts — the ELSER/SPLADE serving shape, one
      // pushed postings read, no floats
      Search.sparseVectorSearch(s, textIndexFor(s, d),
        Seq(("spark", 800000L), ("merge", 500000L), ("vector", 250000L)),
        k = 15)),
    "f27_boosting" -> ((s, d) =>
      // ES boosting query (Search.boosting scaladoc): positive-term
      // BM25 with soft demotion of negative-term matches — both legs
      // pushed postings reads, demoted docs stay ranked (vs must_not)
      Search.boosting(s, textIndexFor(s, d), "spark", "slow", k = 15)),
    "f26_suffix_wildcard" -> ((s, d) =>
      // leading-wildcard (*er) query served Lucene-style from the
      // index (Search.suffixWildcard scaladoc): dictionary scan for
      // the matching terms — O(vocab), never the corpus — broadcast
      // semi-join into the postings, per-doc matched-term frequency
      Search.suffixWildcard(s, textIndexFor(s, d), "er", k = 15)),
    "f21_terms_enum" -> ((s, d) =>
      // ES _terms_enum: lexicographic prefix enumeration of index
      // terms with doc counts, a pure dictionary range read (SARGable
      // startsWith on the term-sorted (term, df) table — no postings,
      // no corpus; Search.termsEnum scaladoc)
      Search.termsEnum(s, textIndexFor(s, d), "s", k = 10)),
    "f22_termvectors" -> ((s, d) =>
      // ES _termvectors (term_statistics=true): one doc's terms with
      // in-doc tf + first position + corpus df — the realtime path: a
      // pushed doc_id point-read re-analyzes the ONE row, the corpus
      // statistics stream once from the persisted term dictionary
      // against a broadcast probe of the doc's term set
      // (Search.termVectors scaladoc; no corpus scan, no shuffle)
      Search.termVectors(s, textIndexFor(s, d),
        Tables.documents(s, d), docId = 42L)),
    "f23_random_score" -> ((s, d) =>
      // ES function_score random_score (seeded + field-keyed):
      // deterministic per-doc uniform score — consistent random
      // sampling whose pagination is stable across re-runs, replicas,
      // and engines. The x11/x12 md5 discipline keyed on (seed, _id)
      // in exact integer micro-units (first 8 md5 hex chars → 32-bit
      // uniform, mod 10^6); the filter is scan-side, the top-k plans
      // as TakeOrderedAndProject (shard-local then global — ES's
      // query-phase shape), nothing shuffles but k rows per task.
      Tables.documents(s, d)
        .filter(col("lang") === "en")
        .select(col("doc_id"),
          (conv(substring(md5(concat_ws(":", lit("rs42"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 1000000L).as("score_e6"))
        .orderBy(col("score_e6").desc, col("doc_id")).limit(20)),
    "f24_rank_feature" -> ((s, d) =>
      // ES rank_feature query, saturation function: score =
      // x/(x+pivot) over a numeric feature field (n_chars, pivot
      // 500), here in exact ×10^6 integer division so the rational
      // saturation curve is engine-exact; scan-side lang filter +
      // TakeOrderedAndProject top-k — a pure projection, no shuffle
      Tables.documents(s, d)
        .filter(col("lang") === "de")
        .select(col("doc_id"),
          expr("(n_chars * 1000000L) div (n_chars + 500L)").as("sat_e6"))
        .orderBy(col("sat_e6").desc, col("doc_id")).limit(15)),
    "f25_pinned" -> ((s, d) => {
      // ES pinned query (searchable promotions): the pinned ids rank
      // first IN THE GIVEN ORDER carrying the above-any-organic
      // constant score (ES implements pinning exactly so — a huge
      // constant _score per pinned hit; 10^9 here, NULL would break
      // the harness's mixed-type row sort), the organic BM25 leg
      // follows with pinned ids deduplicated out —
      // index-served (one pushed term read), and the organic rank
      // window runs AFTER the top-k limit so it sorts k rows, never
      // the corpus.
      import s.implicits._
      val pinnedIds = Seq(5L, 17L, 29L)
      val pinnedDf = pinnedIds.zipWithIndex
        .map { case (id, i) => (id, (i + 1).toLong) }
        .toDF("doc_id", "rank")
        .select(col("rank"), col("doc_id"), lit(true).as("pinned"),
          lit(1.0e9).as("bm25"))
      val organic = Search.bm25Indexed(s, textIndexFor(s, d), "spark")
        .filter(!col("doc_id").isin(pinnedIds: _*))
        .limit(10)
      val w = Window.orderBy(col("bm25").desc, col("doc_id"))
      pinnedDf.unionByName(organic
          .withColumn("rank",
            (row_number().over(w) + pinnedIds.size).cast("long"))
          .select(col("rank"), col("doc_id"), lit(false).as("pinned"),
            col("bm25")))
        .orderBy(col("rank"))
    }),
    "f20_msearch_multi" -> ((s, d) =>
      // the real _msearch shape: each batched query a multi-term OR
      // (searchBm25Indexed semantics), the whole batch one pushed
      // term-IN postings read + a broadcast (term, df) dictionary
      // slice — constant-width rows at ANY batch size, where the
      // when-chain predecessor hit codegen's 64 KB method limit
      // (Search.msearchBm25Multi scaladoc)
      Search.msearchBm25Multi(s, textIndexFor(s, d),
        Seq(("q_ms", Seq("merge", "spark")),
          ("q_wt", Seq("window", "table"))), k = 5)),
    "x36_corpus_diff" -> ((s, d) => {
      // corpus version diff (TextStats.corpusDiff scaladoc) against a
      // deterministically-derived v2: every 13th doc removed, every
      // 7th survivor edited, every 11th cloned under a fresh id — the
      // same construction in the oracle; the OPERATOR diffs by
      // content fingerprint, the construction only plants the data
      val v1 = Tables.documents(s, d)
      val kept = v1.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2-edit"))).otherwise(col("text")))
      val added = v1.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000000L)
        .withColumn("text", concat(col("text"), lit(" new")))
      TextStats.corpusDiff(v1, kept.unionByName(added))
    }),
    "x34_calibration" -> ((s, d) =>
      // reliability-diagram table for the stopword-ratio language
      // signal vs the lang ground truth (TextStats.calibration
      // scaladoc): ≤11 equal-width bins, positive rate in exact bp
      TextStats.calibration(Tables.documents(s, d))),
    "x35_kappa" -> ((s, d) =>
      // Cohen's kappa between the stopword-hit langid heuristic and
      // the lang column (TextStats.kappa scaladoc): one aggregate to
      // the 2×2 confusion matrix, chance-corrected agreement in
      // exact ×10^6 integer micro-units
      TextStats.kappa(Tables.documents(s, d))),
    "x29_model_filter" -> ((s, d) => {
      // model-based quality filtering with FROZEN weights — the
      // fasttext-classifier stage of curation pipelines (vs x2's
      // hand-rule heuristics and x27's threshold rules): a linear
      // score over engineered features. All-integer arithmetic
      // (counts, basis-point ratios via div, abs deviations) so the
      // keep decision replays exactly on any engine — no float
      // weight can flip a borderline doc differently per platform.
      // Row-local: one scan, no shuffle; the model is the SQL
      // expression, frozen weights inlined (at 100 TB this is a
      // codegen'd projection at scan speed).
      val toks = Analyzers.tokenize(lower(col("text")))
      val stops = Analyzers.englishStopwords
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          size(filter(col("t"), x => x.isin(stops: _*)))
            .cast("long").as("n_stop"),
          aggregate(transform(col("t"), x => length(x)), lit(0L),
            (a, x) => a + x).as("sum_wlen"))
        .select(col("doc_id"),
          least(col("n_tokens"), lit(300L)).as("f_len"),
          expr("n_stop * 10000 div greatest(n_tokens, 1L)").as("stop_bp"),
          expr("sum_wlen * 10 div greatest(n_tokens, 1L)").as("wlen_x10"))
        .select(col("doc_id"),
          expr("10 * f_len - abs(stop_bp - 4000) div 2" +
            " - 20 * abs(wlen_x10 - 45)").as("score_bp"))
        .select(col("doc_id"), col("score_bp"),
          (col("score_bp") >= 1500).as("keep"))
        .orderBy(col("doc_id"))
    }),
    "x30_fertility" -> ((s, d) =>
      // Tokenizer fertility per language (TextStats.fertility
      // scaladoc): subword tokens per whitespace word + chars per
      // token, the tokenizer-eval diagnostic that drives per-language
      // vocab sizing and mixture reweighting; one combiner-friendly
      // shuffle to a dictionary-sized report, exact integer ratios
      TextStats.fertility(Tables.documents(s, d))
        .orderBy(col("lang"))),
    "x31_length_buckets" -> ((s, d) =>
      // sequence-length histogram in power-of-2 buckets — the packing
      // diagnostic behind max_len choices (how much padding or
      // truncation each length band costs a loader). The bucket is
      // ⌊log2(tokens)⌋ computed EXACTLY as binary-string length
      // (length(bin(n))−1 — no float log2 wobble at power-of-2
      // boundaries); x3's row-local token count + one
      // combiner-friendly shuffle over ≤ ~20 bucket rows
      Tables.documents(s, d)
        .select(size(regexp_extract_all(col("text"),
          lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"), lit(0)))
          .cast("long").as("n"))
        .select(col("n"),
          when(col("n") === 0L, lit(-1L))
            .otherwise((length(bin(col("n"))) - 1).cast("long"))
            .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"),
          min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
        .orderBy(col("bucket"))),
    "s16_delete_by_query" -> ((s, d) => {
      // The Lucene/ES DELETE lifecycle under the gate
      // (TextIndex.deleteByQuery scaladoc): tombstone-append
      // (O(deleted), postings untouched) → masked reads (liveView —
      // the query-time live-docs mask; df('fast') must already
      // exclude tombstoned docs while postings physically contain
      // them) → purgeDeletes (the merge: postings/doclen rewritten,
      // dictionary + exact-long corpus stats recomputed). A PRIVATE
      // index copy so the shared artifact stays immutable. Note the
      // global-id tombstone design means re-adding a deleted id
      // requires the purge first — addSegment's dup check is against
      // the unmasked doclen by design.
      val docs = Tables.documents(s, d)
      val ix = TextIndex.build(docs, Scratch.dir("s16ix"))
      val nBefore = ix.doclen(s).count()
      val nDel = TextIndex.deleteByQuery(s, ix,
        docs.filter(col("lang") === "de").select(col("doc_id")))
      val maskedDf = TextIndex.liveView(s, ix, ix.postings(s))
        .filter(col("term") === "fast").count()
      TextIndex.purgeDeletes(s, ix)
      val purgedDf = ix.postings(s).filter(col("term") === "fast").count()
      val st = ix.corpus(s)
        .select(col("n").cast("long"), col("sum_len")).head()
      val nTerms = ix.termDf(s).count()
      import s.implicits._
      Seq((nBefore, nDel, st.getLong(0), st.getLong(1), nTerms,
          maskedDf, purgedDf, maskedDf == purgedDf))
        .toDF("n_before", "n_deleted", "n_after", "sum_len_after",
          "n_terms_after", "masked_df_fast", "purged_df_fast",
          "mask_agrees")
    }),
    "n12_vector_delete" -> ((s, d) => {
      // Vector deletes (AnnIndex.deleteVectors scaladoc): tombstone →
      // masked probe → purge across all four index tables. The probe
      // invariant: the nearest live neighbor of vec 1 by the exact
      // BIGINT quantized dot (the h2 vector-leg arithmetic — no float
      // accumulation) is IDENTICAL through the pre-purge mask and
      // after the physical purge, and equals the oracle's replay over
      // the retained vectors.
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val ix = AnnIndex.build(emb, Scratch.dir("n12ix"))
      val nBefore = ix.ivf(s).count()
      val nDel = AnnIndex.deleteVectors(s, ix,
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")))
      val q = emb.select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long")).as("q"))
      val probe = q.filter(col("vec_id") === 1L).select(col("q").as("p"))
      def nn(ids: DataFrame): (Long, Long) = {
        val r = q.join(ids.select(col("vec_id")), Seq("vec_id"))
          .crossJoin(broadcast(probe))
          .select(col("vec_id"),
            aggregate(zip_with(col("q"), col("p"), (a, b) => a * b),
              lit(0L), (acc, x) => acc + x).as("dp"))
          .filter(col("vec_id") =!= 1L)
          .orderBy(col("dp").desc, col("vec_id")).limit(1).head()
        (r.getLong(0), r.getLong(1))
      }
      val (mnn, mdp) = nn(AnnIndex.liveView(s, ix,
        ix.ivf(s).select(col("vec_id"))))
      AnnIndex.purgeDeletes(s, ix)
      val (pnn, pdp) = nn(ix.ivf(s).select(col("vec_id")))
      val nAfter = ix.ivf(s).count()
      val tablesAgree = ix.pqCodes(s).count() == nAfter &&
        ix.sq8(s).count() == nAfter && ix.ivfPqCodes(s).count() == nAfter
      import s.implicits._
      Seq((nBefore, nDel, nAfter, mnn, mdp, pnn, pdp,
          mnn == pnn && mdp == pdp, tablesAgree))
        .toDF("n_before", "n_deleted", "n_after", "masked_nn",
          "masked_dp", "purged_nn", "purged_dp", "mask_agrees",
          "tables_agree")
    }),
    "ti2_phrase_index" -> ((s, d) =>
      // ES match_phrase served from the POSITIONAL index
      // (Search.phraseFromIndex scaladoc): three pushed term-equality
      // posting reads, doc_id equi-joins, row-local adjacency over
      // the stored position arrays — the corpus is never re-tokenized
      // (p10 is the scan-path twin; the oracle replays the token
      // stream positionally, so the match is engine-vs-scan)
      Search.phraseFromIndex(s, textIndexFor(s, d),
        Seq("row", "column", "sort"))),
    "ti3_phrase_prefix" -> ((s, d) =>
      // ES match_phrase_prefix from the positional index: fixed term
      // leg + a SARGABLE term-range read for the trailing prefix
      // (term LIKE 'col%' prunes postings row-groups), positions
      // unioned per doc before the adjacency walk — the completion
      // query autocomplete UIs fire per keystroke, served without a
      // corpus pass
      Search.phrasePrefixFromIndex(s, textIndexFor(s, d),
        Seq("row"), "col")),
    "f17_span_first" -> ((s, d) =>
      // ES span_first(match=fast, end=5): the match must sit in the
      // first 5 token positions — one pushed term read + a row-local
      // first-position check against the sorted positions array
      Search.spanFirstFromIndex(s, textIndexFor(s, d), "fast", end = 5)),
    "s15_generation_swap" -> ((s, d) => {
      // The managed-artifact GENERATION lifecycle (ArtifactGen
      // scaladoc) under the driver gate, the way s14 gates the alias
      // swap: build gen-1 from half the corpus, invalidate it (as a
      // torn append would), rebuild — the rebuild must land in a
      // FRESH gen-2 and publish atomically. The verified rows are the
      // three reader views: the STALE reader still sees gen-1 whole
      // (its doc count is the half-corpus, proving the rebuild never
      // touched its directory), the rebuilt reader sees gen-2 whole,
      // and a fresh resolve (memo evicted, pointer from disk) lands
      // on gen-2 — wholly-old or wholly-new, never mixed.
      val key = "s15-" + TextIndex.corpusKey(d)
      val root = TextIndex.rootFor(key)
      TextIndex.evictMemo(key)
      ArtifactGen.wipe(root)
      // the lifecycle semantics (fresh generations, pointer swap,
      // stale-reader isolation, gc) are corpus-size-independent — the
      // gate runs them on a SLICE so the three builds this replay
      // performs by construction don't dominate the bench; build
      // scaling itself is BenchScale's job
      val docs = Tables.documents(s, d).filter(col("doc_id") < 2000)
      val a = TextIndex.ensure(docs.filter(col("doc_id") % 2 === 0), key)
      TextIndex.invalidate(a)
      val b = TextIndex.ensure(docs, key)
      TextIndex.evictMemo(key)
      val resolved = TextIndex.ensure(docs, key)
      def gen(l: TextIndex.Loaded): Long =
        l.dir.split("gen-").last.toLong
      // counts taken EAGERLY: phase 5's gc sweeps gen-1, so a lazy
      // gen-1 read deferred to collect time would read a deleted dir
      // (lesson 13 — never defer reads across your own mutations)
      val staleCount = a.doclen(s).count()    // gen-1, read AFTER the
                                              // gen-2 rebuild: whole
      val liveCount = b.doclen(s).count()
      val resolvedCount = resolved.doclen(s).count()
      // second rebuild (gen-3), then the keep-last-K janitor: BOTH
      // predecessors were invalidated (that is why they were rebuilt)
      // so neither has rollback value — the sweep reclaims both, and
      // the rollback window only ever retains COMPLETE generations
      // (ArtifactGen.gc scaladoc; the complete-predecessor retention
      // case is ArtifactLifecycleSpec's)
      TextIndex.invalidate(resolved)
      val c = TextIndex.ensure(docs, key)
      val rebuiltCount = c.doclen(s).count()
      val swept = ArtifactGen.gc(root, keepLast = 2)
      TextIndex.evictMemo(key)
      val afterGc = TextIndex.ensure(docs, key)
      val gcOk =
        swept.map(_.getFileName.toString).sorted == Seq("gen-1", "gen-2") &&
        !java.nio.file.Files.exists(root.resolve("gen-1")) &&
        !java.nio.file.Files.exists(root.resolve("gen-2")) &&
        gen(afterGc) == 3L
      val gcCount = if (gcOk) afterGc.doclen(s).count() else -1L
      import s.implicits._
      Seq(
        ("1_stale", gen(a), staleCount),
        ("2_live", gen(b), liveCount),
        ("3_resolved", gen(resolved), resolvedCount),
        ("4_rebuilt", gen(c), rebuiltCount),
        ("5_gc", gen(afterGc), gcCount))
        .toDF("phase", "generation", "n_docs")
        .orderBy(col("phase"))
    }),
    "d15_keep_best_dedup" -> ((s, d) => {
      // near-dup clusters as d8, but KEEP-BEST survivor selection
      // (Dedup.applyClusterDedupBest): the longest member of each
      // cluster survives (tie → smaller id) — the curation-pipeline
      // policy, vs d8's keep-min-id canonical representative
      val docs = Tables.documents(s, d)
      val clusters =
        Dedup.dupClusters(docs, Dedup.jaccardPairs(docs, threshold = 0.5))
      Dedup.applyClusterDedupBest(docs, clusters, col("n_chars"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    "ti1_segment_merge" -> ((s, d) => {
      // Incremental index maintenance (the Lucene segment model) under
      // the driver gate: build the text index from the even half of
      // the corpus, append the odd half as a SEGMENT (parquet append
      // into the postings dir + dictionary-sized merges — O(batch)
      // ingest, never O(corpus); TextIndex.addSegment), then read back
      // corpus invariants the oracle recomputes from the raw documents
      // with the same analyzer: doc count, exact total token count,
      // dictionary size, and the postings count both as dictionary-df
      // mass and as physical posting rows (the two must agree, or the
      // merge double-counted).
      val docs = Tables.documents(s, d)
      val ix = TextIndex.build(docs.filter(col("doc_id") % 2 === 0),
        Scratch.dir("ti1seg"))
      TextIndex.addSegment(ix, docs.filter(col("doc_id") % 2 === 1))
      val nPhysical = ix.postings(s).count()
      ix.corpus(s)
        .select(col("n").cast("long").as("n_docs"), col("sum_len"))
        .crossJoin(ix.termDf(s).agg(count(lit(1)).as("n_terms"),
          sum(col("df")).as("n_postings")))
        .withColumn("postings_agree", lit(nPhysical) === col("n_postings"))
    }),
    "st12_stream_deletes" -> ((s, d) => {
      // Streaming DELETE ingest (IndexStream.runDeleteIngest
      // scaladoc): retention delete requests arrive as a multi-batch
      // stream, each micro-batch tombstones in O(batch), one final
      // purge merge reclaims. Readback: ti1-style corpus invariants
      // over the RETAINED docs (the oracle recomputes them from the
      // filtered corpus), the tombstone total, and multi_batch
      // proving the requests really arrived incrementally.
      val (ix, nBatches, nDeleted) =
        graft.streaming.IndexStream.runDeleteIngest(s, d)
      val nPhysical = ix.postings(s).count()
      ix.corpus(s)
        .select(col("n").cast("long").as("n_docs"), col("sum_len"))
        .crossJoin(ix.termDf(s).agg(count(lit(1)).as("n_terms"),
          sum(col("df")).as("n_postings")))
        .withColumn("n_deleted", lit(nDeleted))
        .withColumn("postings_agree", lit(nPhysical) === col("n_postings"))
        .withColumn("multi_batch", lit(nBatches >= 2))
    }),
    "st13_stream_vector_deletes" -> ((s, d) => {
      // Streaming VECTOR delete ingest (IndexStream
      // .runVectorDeleteIngest scaladoc): the ANN twin of st12 —
      // delete requests arrive as a multi-batch stream, each batch
      // tombstones O(batch) and applies the pressure policy
      // (AnnIndex.maybePurge), terminal merge at close. Readback:
      // live counts across all four encoding tables, the nearest
      // LIVE neighbor of vec 1 by the exact BIGINT quantized dot
      // (n12's invariant, through the streamed lifecycle), and
      // multi_batch proving incremental arrival.
      val (ix, nBatches, nDeleted) =
        graft.streaming.IndexStream.runVectorDeleteIngest(s, d)
      val emb = Tables.embeddings(s, d)
      val nAfter = ix.ivf(s).count()
      val tablesAgree = ix.pqCodes(s).count() == nAfter &&
        ix.sq8(s).count() == nAfter && ix.ivfPqCodes(s).count() == nAfter
      val q = emb.select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long")).as("q"))
      val probe = q.filter(col("vec_id") === 1L).select(col("q").as("p"))
      val r = q.join(ix.ivf(s).select(col("vec_id")), Seq("vec_id"))
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          aggregate(zip_with(col("q"), col("p"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("dp"))
        .filter(col("vec_id") =!= 1L)
        .orderBy(col("dp").desc, col("vec_id")).limit(1).head()
      import s.implicits._
      Seq((emb.count(), nDeleted, nAfter, r.getLong(0), r.getLong(1),
          tablesAgree, nBatches >= 2))
        .toDF("n_before", "n_deleted", "n_after", "live_nn", "live_dp",
          "tables_agree", "multi_batch")
    }),
    "st10_stream_index" -> ((s, d) => {
      // Streaming index ingest (streaming/IndexStream scaladoc): the
      // documents table arrives as a 4-file stream, one micro-batch
      // per file; the first batch builds the index, each later batch
      // commits a Lucene-model segment against the standing artifact.
      // Readback: the ti1 corpus invariants (recomputed by the oracle
      // from the raw documents) — batch boundaries must leave no trace
      // — plus multi_batch proving the run was genuinely incremental.
      val (ix, nBatches) = graft.streaming.IndexStream.runIndexIngest(s, d)
      val nPhysical = ix.postings(s).count()
      ix.corpus(s)
        .select(col("n").cast("long").as("n_docs"), col("sum_len"))
        .crossJoin(ix.termDf(s).agg(count(lit(1)).as("n_terms"),
          sum(col("df")).as("n_postings")))
        .withColumn("postings_agree", lit(nPhysical) === col("n_postings"))
        .withColumn("multi_batch", lit(nBatches >= 2))
    }),
    "a5_ingest_counters" -> ((s, d) => {
      // A5 ingest counters (`src/main.py:128-156`: docs-indexed /
      // errors per bulk loop) riding the SINK ITSELF: observe-metrics
      // on the write pass count rows, purchases, and an exact
      // integer-cents value sum during a real parquet sink write — one
      // pass, no second scan. (a16 is the QC-filter variant of the same
      // surface; this is the ingest-side one.)
      import org.apache.spark.sql.Observation
      val out = Scratch.dir("a5ingest")
      val obs = Observation()
      Tables.events(s, d)
        .observe(obs,
          count(lit(1)).as("rows_in"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchase"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
        .write.mode("overwrite").parquet(out)
      val m = obs.get
      import s.implicits._
      Seq((m("rows_in").asInstanceOf[Long],
        m("n_purchase").asInstanceOf[Long],
        m("value_cents").asInstanceOf[Long]))
        .toDF("rows_in", "n_purchase", "value_cents")
    }),

    // ---- projections / filters (SURVEY §2.2) ----
    "p1_project" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        (col("o_totalprice") * 0.9).as("discounted"))),
    "p5_range_filter" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_acctbal") > 100.0 && col("c_acctbal") < 5000.0)
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))),
    "p6_exists_filter" -> ((s, d) => {
      // field-existence over array-of-structs on the denormalized docs
      // (elastic_queries.json:30-40) — higher-order `exists`. Scale
      // shape: a HOF-`exists` can't push below the aggregation that
      // builds the array, so qualifying parent ids are derived from
      // the RAW child table first (a pushed-down scan+project) and the
      // nested aggregation only ever runs over qualifying orders
      // (Denorm.docsFiltered); the declared HOF filter then runs over
      // the surviving docs. Items only — annotations are unreferenced.
      val keep = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      Denorm.docsFiltered(s, d, keep, withAnnotations = false)
        .filter(exists(col("items"), i => i.getField("returnflag") === "R"))
        .select(col("id")).orderBy(col("id"))
    }),
    "p8_nested_match" -> ((s, d) => {
      // nested match on an analyzed text field of an array element —
      // same pre-filter shape as p6: qualifying ids from the raw
      // child ⋈ broadcast dim, nested agg only over those orders
      val widgets = Tables.part(s, d).filter(col("p_name").contains("widget"))
      val keep = Tables.lineitem(s, d)
        .join(broadcast(widgets), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_orderkey"))
      Denorm.docsFiltered(s, d, keep, withItems = false)
        .filter(exists(col("annotations"),
          a => a.getField("entity").getField("name").contains("widget")))
        .select(col("id")).orderBy(col("id"))
    }),
    "p9_nested_agg" -> ((s, d) =>
      // doc-level aggregation over the nested child array (the ES
      // painless-script-over-nested analog): per-doc revenue via HOF.
      // Only `items` is read, so the annotations collection (three dim
      // joins + a second collect_list) is pruned from the build
      Denorm.docs(s, d, withItems = true, withAnnotations = false)
        .select(col("id"),
          round(aggregate(col("items"), lit(0.0),
            (acc, it) => acc + it.getField("extendedprice")), 2)
            .as("items_total"),
          size(col("items")).cast("long").as("n_items"))),

    // ---- joins (SURVEY §2.3) ----
    "j1_join_dim" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"))
    }),
    "j6_bridge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d); val su = Tables.supplier(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
          col("s_name"))
    }),
    "j15_asof_join" -> ((s, d) => {
      // AS-OF join (operators/AsOf scaladoc) — each event picks up the
      // dimension version in effect at its timestamp from a
      // deterministic 4-version-per-type rate table whose first
      // version starts Jan 5, so early events exercise the
      // no-version-yet null path. Differentially tested against
      // DuckDB's NATIVE `ASOF LEFT JOIN` — engine-vs-engine, not a
      // replay of this implementation.
      val events = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"),
          col("value"))
      val dim = events.select(col("event_type")).distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(3L))).as("k"))
        .select(col("event_type"),
          expr("timestampadd(DAY, cast(k * 7 AS int), " +
            "timestamp'2024-01-05 00:00:00')").as("eff_from"),
          (length(col("event_type")) * 100 + col("k") * 10)
            .cast("long").as("rate_bp"))
      AsOf.asofLeft(events, dim, "event_type", "ts", "eff_from",
          struct(col("rate_bp")))
        .groupBy(col("event_type"), col("asof.rate_bp").as("rate_bp"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
        .orderBy(col("event_type"), col("rate_bp"))
    }),
    "j17_overlap_join" -> ((s, d) => {
      // Interval-OVERLAP join (EventOps.overlapJoin scaladoc): the
      // third temporal-join shape next to as-of (j15) and
      // point-in-range (j16) — both sides are intervals (per-user
      // sessions), paired when they intersect. Hour-bucket banding
      // turns the range predicate into an equi-join; the REQUIRE pins
      // the same scale property as j16: no BroadcastNestedLoopJoin
      // anywhere in the plan.
      val res = EventOps.overlapJoin(Tables.events(s, d))
      require(!res.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "overlap join must plan as a banded equi-join")
      res
    }),
    "j17b_overlap_capped" -> ((s, d) => {
      // j17's maxPerBucket escape hatch, ORACLE-GATED: a storm hour
      // keeps only the DETERMINISTIC earliest-first prefix (cap 5) of
      // its bucket, bounding candidate work at cap² per bucket no
      // matter how hot the hour. The oracle replays the identical
      // prefix (same row_number order: start, user, session), pinning
      // the capped semantics cross-engine — the trade is explicit:
      // pairs whose only shared buckets were truncated are dropped.
      val res = EventOps.overlapJoin(Tables.events(s, d), maxPerBucket = 5)
      require(!res.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "capped overlap join must stay a banded equi-join")
      res
    }),
    "j16_range_join" -> ((s, d) => {
      // RANGE join via interval bucketing (AsOf.rangeJoin scaladoc):
      // events against overlapping 10-day campaign windows (3 per
      // type, starting every 7 days — overlap days match TWO
      // campaigns, proving interval multi-match). The REQUIRE pins
      // the scale property: the plan must contain no
      // BroadcastNestedLoopJoin — the bucketing turned the time-range
      // predicate into a hashable equi-join.
      val events = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"),
          col("value"))
      val camp = events.select(col("event_type")).distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(2L))).as("c"))
        .select(col("event_type").as("camp_type"), col("c"),
          expr("timestampadd(DAY, cast(c * 7 AS int), " +
            "timestamp'2024-01-01 00:00:00')").as("start_ts"),
          expr("timestampadd(DAY, cast(c * 7 + 10 AS int), " +
            "timestamp'2024-01-01 00:00:00')").as("end_ts"))
      val joined = AsOf.rangeJoin(events, "ts", camp,
          "start_ts", "end_ts",
          struct(col("camp_type"), col("c")), binSeconds = 86400L * 7)
        .filter(col("event_type") === col("range.camp_type"))
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"range join must stay an equi-join on the bin:\n$plan")
      joined
        .groupBy(col("event_type"), col("range.c").as("campaign"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
        .orderBy(col("event_type"), col("campaign"))
    }),
    "j10_self_join" -> ((s, d) => {
      val o1 = Tables.orders(s, d).as("o1")
      val o2 = Tables.orders(s, d).as("o2")
      o1.join(o2, col("o1.o_custkey") === col("o2.o_custkey") &&
          col("o1.o_orderkey") < col("o2.o_orderkey"))
        .groupBy(col("o1.o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("custkey"))
    }),
    "j13_semi" -> ((s, d) => {
      // customers with ≥1 urgent order — left_semi (EXISTS)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),
    "j14_anti" -> ((s, d) => {
      // customers with NO urgent order — left_anti (NOT EXISTS)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),
    "j11_parent_scalar" -> ((s, d) => {
      // decorrelated correlated scalar subquery (src/main.py:82-86)
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("c_name").as("parent_author"))
    }),
    "j12_parent_agg" -> ((s, d) => {
      // decorrelated correlated json_agg (src/main.py:87-92) —
      // insertion-order array: the child sequence number leads the sort
      // (stripped afterwards), matching the reference's id-ordered
      // child fetch, not an alphabetical canonicalization; the brand
      // value stays as the tiebreak for repeated sequence numbers
      val li = Tables.lineitem(s, d); val p = Tables.part(s, d)
      val brands = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(transform(
          sort_array(collect_list(struct(
            col("l_linenumber").as("seq"), col("p_brand").as("brand")))),
          s => s.getField("brand")).as("brands"))
      val o = Tables.orders(s, d)
      o.join(brands, o("o_orderkey") === brands("l_orderkey"), "left")
        .select(col("o_orderkey"), joined(col("brands")).as("brands"))
    }),

    // ---- aggregation (SURVEY §2.4) ----
    "a1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    "a3_stats_agg" -> ((s, d) => {
      // Statistical aggregates: exact interpolated percentiles + corr.
      // Percentiles run over integer cents and are reported as ×20
      // fixed-point BIGINTs: every interpolation fraction here is a
      // multiple of 1/20, so the true value ×20 is an integer and both
      // engines round to it exactly — a dollar-rounded double landed on
      // a .005 representation tie and flipped between engines.
      // Percentiles come from Quantiles.exactPercentiles (distributed
      // value-histogram; same type-7 result as the builtin
      // `percentile`, whose per-group value→count buffer is the
      // unbounded-state pattern this plan avoids at 100 TB).
      val li = Tables.lineitem(s, d)
        .withColumn("price_c", round(col("l_extendedprice") * 100, 0))
      val pcts = Quantiles.exactPercentiles(li, "l_returnflag", "price_c",
        Seq("median" -> 0.5, "p95" -> 0.95))
      li.groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("qty_price_corr"),
          round(stddev_pop(col("l_discount")), 6).as("disc_stddev"))
        .join(broadcast(pcts), "l_returnflag")
        .select(col("l_returnflag"),
          round(col("median") * 20, 0).cast("long").as("median_c20"),
          round(col("p95") * 20, 0).cast("long").as("p95_c20"),
          col("qty_price_corr"), col("disc_stddev"))
        .orderBy(col("l_returnflag"))
    }),
    "a2_collect_children" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("linenumber"),
          col("l_partkey").as("partkey"),
          col("l_quantity").as("quantity")))).as("items_arr"))
        .select(col("l_orderkey"),
          joined(transform(col("items_arr"), i => concat_ws(":",
            i.getField("linenumber"), i.getField("partkey"),
            i.getField("quantity").cast("long")))).as("items"))),

    // ---- set operations (SURVEY §2.6 — builtins, exercised) ----
    "u1_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
        .union(o.filter(col("o_totalprice") > 150000.0).select(col("o_orderkey")))
        .distinct().orderBy(col("o_orderkey"))
    }),
    "u2_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
        .intersect(o.filter(col("o_totalprice") > 150000.0)
          .select(col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    }),
    "u3_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
        .except(o.filter(col("o_totalprice") > 150000.0)
          .select(col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    }),

    // ---- sort / limit / top-k (SURVEY §2.5) ----
    "w2_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),
    "w4_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),
    "w5_lag_lead" -> ((s, d) => {
      // per-key lead/lag navigation (the OLAP gap/next-event shape):
      // seconds since the user's previous event and until the next.
      // Tie-break on event_id — event times repeat within a user, and
      // an untied window order is arrival-order-dependent on a cluster
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // gaps in whole seconds via MICROSECOND integer math on both
      // engine sides: a seconds-valued cast truncates in Spark but
      // rounds in DuckDB, so fractional-second timestamps diverge
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          floor((unix_micros(col("ts")) -
              unix_micros(lag(col("ts"), 1).over(w))) / lit(1000000L))
            .cast("long").as("gap_prev_s"),
          floor((unix_micros(lead(col("ts"), 1).over(w)) -
              unix_micros(col("ts"))) / lit(1000000L))
            .cast("long").as("gap_next_s"))
        .orderBy(col("event_id"))
    }),
    "a4_rollup" -> ((s, d) =>
      // hierarchical subtotals (ROLLUP) — the OLAP cube slice the
      // reference's dashboards aggregate by hand; one shuffle, Spark
      // expands grouping sets map-side. Grouping null markers are
      // materialized as 'ALL' so the row identity is hash-stable
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("gid"), col("n"), col("revenue"))
        .orderBy(col("gid"), col("returnflag"), col("linestatus"))),
    "w6_ntile" -> ((s, d) => {
      // decile assignment within each market segment (the analyst
      // "bucket customers by spend" shape); per-segment windows, never
      // a global sort
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(10).over(w).cast("long").as("decile"))
        .orderBy(col("c_custkey"))
    }),
    "a7_cube" -> ((s, d) =>
      // full CUBE over two dims — all four grouping sets in one
      // map-side expansion; same stable-marker discipline as a4
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"))
        .orderBy(col("gid"), col("status"), col("priority"))),
    "a6_approx_percentile" -> ((s, d) => {
      // sketch-median with its accuracy CONTRACT as the verified
      // output (the x5 HLL pattern): the Greenwald–Khanna approximate
      // median is engine-specific and can never hash-match an oracle,
      // but its guarantee — rank error ≤ n/accuracy — is exactly
      // checkable: re-rank the sketch's answer against the raw data
      // and assert the fraction lands within 0.5 ± 2/accuracy. The
      // production path never sorts; the exact re-rank exists only to
      // verify the sketch.
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median"), count(lit(1)).as("n"))
      li.join(broadcast(ap), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_extendedprice") <= col("approx_median"), 1L)
            .otherwise(0L)).as("rank_le"),
          max(col("n")).as("n"))
        .select(col("l_returnflag"), col("n"),
          (abs(col("rank_le").cast("double") / col("n") - 0.5) <=
            2.0 / 1000).as("ok"))
        .orderBy(col("l_returnflag"))
    }),
    "a5_pivot" -> ((s, d) =>
      // wide pivot: one row per day, one count column per event type.
      // The pivot values are DECLARED (not discovered) — at 100 TB the
      // two-pass "collect distinct values first" pivot is a full extra
      // scan and a driver-side value list; a curated schema is both
      // faster and stable as new event types appear
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(col("day"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("view"), lit(0L)).as("n_view"))
        .orderBy(col("day"))),

    // ---- scoring / search (SURVEY §2.7) ----
    "f1_scored_search" -> ((s, d) =>
      // the pushed-down plan: identical scoring to
      // Search.scoredSearch(Denorm.docs(..)) — SearchSpec proves
      // equality — but computed from raw tables, so the nested corpus
      // is never built (let alone twice) just to score it
      Search.scoredSearchRaw(s, d, "NATION_1", 50)),
    "f2_tfidf" -> ((s, d) =>
      Search.tfidfIndexed(s, textIndexFor(s, d), "spark")),
    "f3_bm25" -> ((s, d) =>
      Search.bm25Indexed(s, textIndexFor(s, d), "spark")),
    "f4_search_bm25" -> ((s, d) =>
      Search.searchBm25Indexed(s, textIndexFor(s, d),
        Seq("spark", "window"), k = 20)),
    "h2_hybrid_rrf" -> ((s, d) =>
      // hybrid lexical+vector retrieval fused by integer RRF
      // (Search.hybridRrf): BM25 leg from the persisted text index,
      // exact-integer dot-product leg over the doc-aligned embeddings
      Search.hybridRrf(s, textIndexFor(s, d), Tables.embeddings(s, d),
        Seq("spark", "window"), probeId = 7L)),

    // ---- denorm flagship (SURVEY §7 M1) ----
    "denorm_docs" -> ((s, d) =>
      // the nested document, verification-flattened: scalars + author
      // expanded, child arrays as canonical ':'-field '|'-element
      // strings (money in exact integer cents)
      Denorm.docs(s, d).select(
        col("id"), col("status"), col("priority"), col("total_price"),
        col("created_at"),
        col("author.id").as("author_id"), col("author.name").as("author_name"),
        col("author.segment").as("author_segment"),
        col("author.acctbal").as("author_acctbal"),
        joined(transform(col("items"), i => concat_ws(":",
          i.getField("linenumber"), i.getField("partkey"),
          i.getField("suppkey"), i.getField("quantity").cast("long"),
          round(i.getField("extendedprice") * 100, 0).cast("long"),
          i.getField("returnflag")))).as("items"),
        joined(transform(col("annotations"), a => concat_ws(":",
          a.getField("entity").getField("id"),
          a.getField("entity").getField("name"),
          a.getField("entity").getField("description"),
          a.getField("domain").getField("id"),
          a.getField("domain").getField("name")))).as("annotations"))),
    "denorm_roundtrip" -> ((s, d) => Denorm.roundtrip(s, d)),
    "tweet_denorm" -> ((s, _) =>
      // exact reference schema, golden fixture — flat projection of the
      // nested doc (scalars + '|'-joined children); the oracle carries
      // the golden values as literal VALUES rows
      TweetFixture.docs(s).select(
        col("id"), col("content"), col("language"), col("source"),
        col("retweet_count"), col("reply_count"), col("like_count"),
        col("quote_count"),
        date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss").as("created_utc"),
        col("author.username").as("author_username"),
        col("author.followers_count").as("author_followers"),
        joined(transform(col("context_annotations"), ca => concat_ws(":",
          ca.getField("entity").getField("id"),
          ca.getField("entity").getField("name"),
          ca.getField("domain").getField("id"),
          ca.getField("domain").getField("name")))).as("context_annotations"),
        joined(transform(col("conversation_hashtags"),
          h => h.getField("tag"))).as("hashtags"),
        joined(transform(col("annotations"), a => concat_ws(":",
          a.getField("value"), a.getField("type"),
          round(a.getField("probability").cast("double") * 1000, 0)
            .cast("long")))).as("annotations"),
        joined(transform(col("links"), l => l.getField("url"))).as("links"),
        joined(transform(col("conversation_references"), r => concat_ws(":",
          r.getField("id"), r.getField("type"),
          r.getField("author").getField("username")))).as("references"),
        joined(col("content_tokens")).as("content_tokens"),
        joined(col("author_name_shingles")).as("author_name_shingles"))
        .orderBy(col("id"))),

    // ---- analyzers (SURVEY §2.8) ----
    "t2_tokenize" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          joined(Analyzers.tokenize(lower(col("text")))).as("tokens"))
        .orderBy(col("doc_id"))),
    "t6_stopwords" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          joined(Analyzers.removeStopwords(
            Analyzers.tokenize(lower(col("text"))))).as("tokens"))
        .orderBy(col("doc_id"))),
    "t3_keyword" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          joined(Analyzers.keywordLowercase(col("source"))).as("tokens"))
        .orderBy(col("doc_id"))),
    "t12_ngram_search" -> ((s, d) =>
      // the point of the ngram multi-field (mapping.json:23-44):
      // substring search answered from index-time 1..10-grams. For a
      // pure-alphanumeric needle every occurrence lies inside one
      // token, so the LIKE oracle is exact. The probe generates ONLY
      // needle-length grams — shorter/longer grams cannot equal the
      // needle, so computing the full 1..10 set would be ~10x wasted
      // work per row.
      Tables.documents(s, d)
        .filter(array_contains(
          Analyzers.customNgram(col("text"), 4, 4), "park"))
        .select(col("doc_id")).orderBy(col("doc_id"))),
    "t11_englando" -> ((s, d) =>
      // full pipeline incl. Porter; oracle = OracleSql.porterEnglandoT11,
      // a generated SQL replay of every stemmer rule
      Tables.documents(s, d)
        .select(col("doc_id"), joined(Analyzers.englando(col("text"))).as("tokens"))
        .orderBy(col("doc_id"))),
    "t18_analyze" -> ((s, d) => {
      // ES _analyze endpoint: the token stream a given analyzer
      // produces for a caller-provided sample string — the mapping
      // debugger. One row per registered pipeline, tokens '|'-joined
      // in stream order (positions implicit); the oracle replays all
      // four pipelines (englando via the generated full-Porter SQL
      // over a one-row literal relation). Row-local by definition —
      // the sample never touches a table scan.
      val sample = lit(analyzeSample)
      Seq(
        ("custom_ngram", Analyzers.customNgram(sample)),
        ("custom_shingles", Analyzers.customShingles(sample)),
        ("englando", Analyzers.englando(sample)),
        ("keyword_lowercase", Analyzers.keywordLowercase(sample)))
        .map { case (name, c) =>
          s.range(1).select(lit(name).as("analyzer"),
            size(c).cast("long").as("n_tokens"), joined(c).as("tokens"))
        }
        .reduce(_ unionAll _)
        .orderBy(col("analyzer"))
    }),
    "t9_ngram" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          joined(Analyzers.customNgram(substring(col("text"), 1, 40)))
            .as("grams"))
        .orderBy(col("doc_id"))),
    "t10_shingles" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          joined(Analyzers.customShingles(col("text"))).as("grams"))
        .orderBy(col("doc_id"))),

    // ---- dedup (brief §extensions; SURVEY §7 M5) ----
    "d1_exact_dedup" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d)).orderBy(col("fingerprint"))),
    "d2_minhash_pairs" -> ((s, d) => // LSH is probabilistic: rows-only
      Dedup.minhashPairs(Tables.documents(s, d), threshold = 0.5)),
    "d3_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), maxHamming = 10)),
    "d4_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), threshold = 0.5)),
    "d14_containment" -> ((s, d) =>
      // asymmetric containment |A∩B|/|A| in exact basis points — the
      // partial-copy detector symmetric Jaccard misses
      // (Dedup.containmentPairs scaladoc)
      Dedup.containmentPairs(Tables.documents(s, d))),
    "d20_split_leakage" -> ((s, d) =>
      // train/val split-leakage audit (Dedup.splitLeakage scaladoc):
      // near-dup pairs CROSSING the x8 hash-split boundary — the
      // eval-integrity failure in-split dedup can't see
      Dedup.splitLeakage(Tables.documents(s, d))),
    "d22_leakage_fix" -> ((s, d) =>
      // the remediation the d20 audit calls for (Dedup.splitLeakageFix
      // scaladoc): leaked val docs move to train; before/after split
      // census with the moved count
      Dedup.splitLeakageFix(Tables.documents(s, d))),
    "d21_dedup_report" -> ((s, d) =>
      // dedup audit report (Dedup.dupReport scaladoc): the
      // cluster-size histogram over d7's exact transitive clusters —
      // how many duplicate families of each size, absorbing how many
      // docs
      Dedup.dupReport(Tables.documents(s, d))),
    "d6_dedup_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.applyDedup(docs,
          Dedup.jaccardPairs(docs, threshold = 0.5))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    "d7_dup_clusters" -> ((s, d) => {
      // connected components over the dup-pair graph: transitive
      // closure that pair-wise d6 can't express
      val docs = Tables.documents(s, d)
      Dedup.dupClusters(docs, Dedup.jaccardPairs(docs, threshold = 0.5))
        .orderBy(col("doc_id"))
    }),
    "d8_cluster_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clusters =
        Dedup.dupClusters(docs, Dedup.jaccardPairs(docs, threshold = 0.5))
      Dedup.applyClusterDedup(docs, clusters)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    "d5_cosine_pairs" -> ((s, d) =>
      // exact all-pairs semantics, tiled so the quadratic work shuffle-
      // partitions instead of planning a BroadcastNestedLoopJoin; the
      // near-dup LSH variant is Similarity.cosineDupPairs
      Similarity.cosinePairsBlocked(Tables.embeddings(s, d), 0.4)),

    // ---- similarity search (brief §extensions) ----
    "n1_knn_brute" -> ((s, d) =>
      Similarity.knnBrute(Tables.embeddings(s, d), queryId = 1L, k = 10)),
    "n2_knn_lsh" -> ((s, d) =>
      // ANN neighbor lists are estimate-valued and can't hash-match a
      // SQL oracle; the declared output is the LSH path's SELF-VERIFYING
      // CONTRACT (Similarity.lshContract scaladoc): per-probe invariant
      // booleans — candidates ⊆ probed bucket, scores ≡ exact cosine
      // recomputation, planted ×2-scaled copy retrieved at rank 1,
      // ranks descending — all TRUE by construction, constant-TRUE
      // oracle. Library users get the raw lists from
      // Similarity.knnLsh / knnLshBatch (recall in SimilaritySpec).
      Similarity.lshContract(annPlantedCorpus(s, d), annProbeIds, k = 10)
        .orderBy(col("qid"))),
    "n3_knn_ivf" -> ((s, d) => {
      // same contract shape for the IVF-flat scale path, now probing
      // the PERSISTED index artifact (AnnIndex): the result side reads
      // the cell-partitioned ivf/ table, while the verification side
      // recomputes assignment independently from the raw corpus — so
      // candidates ⊆ probed cells ALSO proves the persisted assignment
      val ix = annIndexFor(s, d)
      Similarity.ivfContractWith(annPlantedCorpus(s, d), ix.cents,
          ix.ivf(s), annProbeIds, k = 10)
        .orderBy(col("qid"))
    }),
    "n3b_knn_ivf_serve" -> ((s, d) => {
      // the SERVING-only IVF probe: n3's contract additionally
      // re-assigns the WHOLE corpus to prove the persisted assignment
      // (an n·nlist verification term that drowns the serving cost in
      // a scale probe); this row reads only the cell-partitioned ivf
      // table + trained centroids and verifies from the RESULT alone —
      // the planted ×2-scaled copy (cos exactly 1) must rank first per
      // probe and k stays bounded. This is the row whose scaling the
      // √n-nlist build is FOR: nprobe·n/nlist candidates per query —
      // served through AnnIndex.search, which keeps the flat scan at
      // oracle cell counts and switches to the compressed ADC + exact
      // rerank arm at routing-active decades (the invariants hold
      // through either arm: rerank scoring is exact, so cos-1.0 still
      // uniquely ranks first).
      val ix = annIndexFor(s, d)
      graft.operators.AnnIndex.search(s, ix, annPlantedCorpus(s, d),
          annProbeIds, k = 10)
        .groupBy(col("qid"))
        .agg(min_by(col("vec_id"), col("rank")).as("top1"),
          count(lit(1)).as("n_rows"))
        .select(col("qid"),
          (col("top1") === col("qid") + 1000000L).as("planted_rank1"),
          (col("n_rows") > 0 && col("n_rows") <= 10).as("k_bounded"))
        .orderBy(col("qid"))
    }),
    "n4_ann_contract" -> ((s, d) => {
      // the ANN quality gate a production pipeline runs: recall on a
      // labeled ground-truth set. This corpus is structureless (mean
      // within-label cos 0.0016 vs cross 0.0003 — random directions),
      // so recall-vs-brute-top-k is pinned to the scan fraction for
      // ANY sublinear index and gates nothing; the standard evaluation
      // is planted ground truth. Each probe vector gets a ×2-scaled
      // copy planted under a fresh id — same direction, so cosine is
      // exactly 1, the same LSH bucket (positive scaling preserves
      // every hyperplane sign) and the same IVF cell — and the
      // contract asserts both indexes retrieve every planted copy
      // (which also catches a broken normalization: ×2 changes every
      // dot product but no cosine). n2/n3 carry the richer per-probe
      // invariant contracts over the same planted corpus.
      val corpus = annPlantedCorpus(s, d)
      // the whole probe set runs through the BATCHED index paths — one
      // distributed pass per method, no per-query driver loop
      def contractRow(method: String, ann: DataFrame): DataFrame =
        ann.filter(col("vec_id") === col("qid") + 1000000L)
          .agg(count(lit(1)).as("n_found"))
          .select(lit(method).as("method"),
            lit(annProbeIds.size.toLong).as("n_probes"), col("n_found"),
            (col("n_found") === annProbeIds.size).as("all_found"))
      val ix = annIndexFor(s, d)
      contractRow("ivf", Similarity.knnIvfBatchAssigned(corpus, ix.ivf(s),
          ix.cents, annProbeIds, k = 5))
        .unionByName(
          contractRow("lsh", Similarity.knnLshBatch(corpus, annProbeIds, k = 5)))
        .orderBy(col("method"))
    }),

    // ---- text analysis (brief §extensions) ----
    "x1_langid" -> ((s, d) => // heuristic: rows-only
      Tables.documents(s, d)
        .select(col("doc_id"), TextStats.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),
    "x2_quality" -> ((s, d) =>
      TextStats.quality(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "x3_token_count" -> ((s, d) =>
      TextStats.tokenCounts(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "x7_pack_chunks" -> ((s, d) =>
      // concat-and-chunk sequence packing via distributed prefix-sum;
      // oracle is the naive single-window running sum
      TextStats.packChunks(Tables.documents(s, d), budget = 2048)
        .orderBy(col("doc_id"))),
    "x8_hash_split" -> ((s, d) =>
      TextStats.hashSplit(Tables.documents(s, d), valPct = 10)
        .orderBy(col("doc_id"))),
    "x10_pii_redact" -> ((s, d) => {
      // PII scrub over a corpus with PLANTED dirty rows: the synthetic
      // documents contain no emails/phones/IPs, so deterministic PII
      // is appended in-plan to a subset (same construction in the
      // oracle) and the redaction pass must scrub exactly those — an
      // identity redaction would fail n_pii, an over-eager one the text
      val dirty = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" reach me at user"), col("doc_id").cast("string"),
            lit("@example.com ok"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit(" call 555-123-4567 now")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit(" host 192.168.1.77 down")).otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), dirty.as("dirty"))
        .select(col("doc_id"),
          TextStats.piiCount(col("dirty")).as("n_pii"),
          TextStats.redactPii(col("dirty")).as("redacted"))
        .orderBy(col("doc_id"))
    }),
    "d11_chunk_dedup" -> ((s, d) =>
      graft.operators.Dedup.chunkDedup(Tables.documents(s, d),
        chunkTokens = 32)
        .orderBy(col("doc_id"), col("chunk_idx"))),
    "d19_substring_dedup" -> ((s, d) =>
      // exact repeated-substring masking (Dedup.substringDedup): every
      // word 8-gram present in >= 2 distinct docs is masked wherever
      // it occurs; cleaned_text is the surviving token sequence
      graft.operators.Dedup.substringDedup(Tables.documents(s, d),
        n = 8, minDocs = 2)),
    "x11_stratified_sample" -> ((s, d) =>
      TextStats.stratifiedSample(Tables.documents(s, d),
        ratesPct = Map("en" -> 90, "de" -> 60, "zh" -> 45,
          "fr" -> 30, "es" -> 10), defaultPct = 100)
        .orderBy(col("doc_id"))),
    "x13_mixture_stats" -> ((s, d) =>
      TextStats.mixtureStats(Tables.documents(s, d))
        .orderBy(col("lang"))),
    "x14_boilerplate" -> ((s, d) =>
      TextStats.boilerplate(Tables.documents(s, d), minDf = 3)
        .orderBy(col("doc_id"))),
    "x15_unigram_score" -> ((s, d) =>
      TextStats.unigramScore(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    "x32_dsir" -> ((s, d) =>
      // DSIR importance weights (TextStats.dsirWeights scaladoc):
      // hashed-unigram likelihood ratio of the lang='en' target slice
      // vs the raw corpus, exact ×10^6 integer micro-units; 256-row
      // feature dictionary broadcast back onto one token pass
      TextStats.dsirWeights(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    "x33_bigram_lm" -> ((s, d) =>
      // Stupid-Backoff bigram LM quality score (TextStats.bigramScore
      // scaladoc): LM trained on the doc_id%10==0 reference slice,
      // every doc scored by its mean bigram likelihood in exact
      // integer micro-units — the CCNet perplexity-filter analog
      TextStats.bigramScore(Tables.documents(s, d))),
    "x12_shuffle_batches" -> ((s, d) =>
      TextStats.shuffleBatches(Tables.documents(s, d), batchSize = 64)
        .orderBy(col("doc_id"))),
    "x16_source_cap" -> ((s, d) =>
      // domain balancing: ≤15 docs per source, hash-ranked selection;
      // plans as WindowGroupLimit (map-side per-group top-k before the
      // shuffle) — plan-locked in PlanSpec
      TextStats.sourceCap(Tables.documents(s, d), cap = 15)
        .orderBy(col("source"), col("rk"))),
    "x17_soft_filter" -> ((s, d) =>
      // importance resampling on the quality ramp [0.4, 0.9]
      TextStats.softFilter(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    "x19_bpe" -> ((s, d) => {
      // real BPE merge application on planted fixtures; the oracle is
      // the output of an independent reference implementation of the
      // published apply algorithm (golden VALUES). Corpus-level
      // losslessness is property-tested in TextStatsSpec.
      import s.implicits._
      val fx = Seq(
        (1L, "The then there!"),
        (2L, "To be or not to be"),
        (3L, "and another thing"),
        (4L, "rat-a-tat 42 thor"),
        (5L, "")).toDF("doc_id", "text")
      TextStats.bpeTokens(fx)
        .select(col("doc_id"), joined(col("tokens")).as("tokens"),
          col("n_bpe"))
        .orderBy(col("doc_id"))
    }),
    "x18_heavy_hitters" -> ((s, d) =>
      // count-min-sketch vocabulary estimates, contract-verified against
      // exact counts for the probe tokens (x5/HLL discipline: one-sided
      // error + eps*N overshoot bound as constant-TRUE columns)
      TextStats.heavyHitters(Tables.documents(s, d),
        probes = Seq("the", "and", "of", "to", "in"))
        .orderBy(col("token"))),
    "x26_bpe_train" -> ((s, d) =>
      // BPE merge LEARNING over the corpus (x19 applies a table; this
      // trains one): K argmax-merge steps over the (word, freq)
      // vocabulary, 1-row collect per step, oracle replays the whole
      // training loop step by step
      TextStats.bpeTrain(s, Tables.documents(s, d), steps = 8)),
    "x26b_bpe_train_batched" -> ((s, d) =>
      // BATCHED merge learning (TextStats.bpeTrainBatched scaladoc) —
      // the production path for 32k-merge vocabs (job count ÷batch):
      // per round, one pair-count ranking, a greedy symbol-disjoint
      // screen over the 4×want over-fetch, one chained-replace
      // projection. The oracle replays rounds + screen + application
      // step-exactly (sqlBpeTrainBatched), so the batched semantics —
      // not just the batch=1 degenerate case — are differentially
      // verified
      TextStats.bpeTrainBatched(s, Tables.documents(s, d),
        steps = 16, batch = 16)),
    "sk1_salted_collect" -> ((s, d) =>
      // two-phase salted collect over a 3-key (maximally hot) grouping:
      // result must equal the direct aggregation — the oracle IS the
      // direct aggregation
      operators.Skew.saltedCollect(
        Tables.lineitem(s, d), "l_returnflag",
        struct(col("l_orderkey").as("ok"), col("l_linenumber").as("ln")),
        saltCol = col("l_orderkey"), salt = 16)
        .select(col("l_returnflag"),
          joined(transform(col("items"), i => concat_ws(":",
            i.getField("ok"), i.getField("ln")))).as("items"))
        .orderBy(col("l_returnflag"))),
    "sk2_salted_sum" -> ((s, d) =>
      operators.Skew.saltedSum(
        Tables.lineitem(s, d), "l_returnflag",
        col("l_quantity"), saltCol = col("l_orderkey"), salt = 16)
        .select(col("l_returnflag"), col("total"), col("n"))
        .orderBy(col("l_returnflag"))),
    "a8_significant_terms" -> ((s, d) =>
      // ES significant_terms (JLH): per-language tokens anomalously
      // frequent vs the corpus background, top-3 per language — the
      // distinct (doc, token) pairs and the background df both read
      // from the TextIndex artifact
      operators.Search.significantTermsIndexed(s, textIndexFor(s, d),
          Tables.documents(s, d)
            .select(col("doc_id").as("id"), col("lang").as("cat")))
        .orderBy(col("cat"), col("rk"))),
    "f5_fuzzy_match" -> ((s, d) => {
      // ES fuzziness: docs holding a token within edit distance 1 of
      // the (typo'd) term; count of close tokens per doc
      val toks = functions.Analyzers.tokenize(lower(col("text")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          operators.Search.fuzzyCount(toks, "custmer", maxEdits = 1)
            .cast("long").as("n_fuzzy"))
        .filter(col("n_fuzzy") > 0)
        .orderBy(col("doc_id"))
    }),
    "x22_text_chunks" -> ((s, d) =>
      // overlapping 64-token windows, 16-token overlap (RAG prep)
      TextStats.textChunks(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("chunk_idx"))),
    "x21_nfkc" -> ((s, d) => {
      // NFKC canonicalization on planted fixtures (ligatures, fullwidth,
      // superscripts, halfwidth kana); goldens from an independent
      // Unicode implementation. Idempotence + ASCII-identity are
      // property-tested over the corpus in TextStatsSpec.
      import s.implicits._
      val fx = Seq(
        (1L, "ﬁne ﬂow"),
        (2L, "Ｈｅｌｌｏ　１２３"),
        (3L, "x² + y³"),
        (4L, "ﾊﾟﾝﾀﾞ"),
        (5L, "plain ascii")).toDF("doc_id", "text")
      fx.select(col("doc_id"),
        graft.functions.expressions.nfkc(col("text")).as("norm"),
        (graft.functions.expressions.nfkc(col("text")) === col("text"))
          .as("unchanged"))
        .orderBy(col("doc_id"))
    }),
    "x20_winsorize" -> ((s, d) => {
      // winsorized (p99-clipped) per-group totals — outlier clipping for
      // mixture/stats reports. Everything stays in the x100-cents BIGINT
      // domain (the a3 fixed-point discipline): the p99 interpolation
      // fraction is a multiple of 1/100 over integer multiples of 100,
      // so round() lands both engines on the same integer and the
      // clipped sums are exact integer arithmetic — no double-sum
      // order dependence reaches the compare.
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          (round(col("l_extendedprice") * 100, 0).cast("long") * 100L)
            .as("pc100"))
      val t = operators.Quantiles
        .exactPercentiles(li, "l_returnflag", "pc100", Seq("p99" -> 0.99))
        .select(col("l_returnflag").as("rf"),
          round(col("p99"), 0).cast("long").as("t_c100"))
      li.join(broadcast(t), col("l_returnflag") === col("rf"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("t_c100")).as("t_c100"),
          sum(least(col("pc100"), col("t_c100"))).as("sum_clipped"),
          sum(when(col("pc100") > col("t_c100"), 1L).otherwise(0L))
            .as("n_clipped"))
        .orderBy(col("l_returnflag"))
    }),
    "z2_rank_bucket" -> ((s, d) => {
      // equi-depth contract for the rank bucketing behind z-order on
      // skewed dims: every bucket within 2x the ideal depth, exact row
      // total preserved (the constant-TRUE + exact-anchor discipline)
      val ev = Tables.events(s, d)
      val vb = operators.Prune.rankBucket(ev, "value", buckets = 16,
        err = 0.001)
      ev.select(vb.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_rows"),
          max(col("n")).as("mx"))
        .select(col("n_buckets"), col("n_rows"),
          (col("mx") * lit(8) <= col("n_rows")).as("depth_balanced"))
    }),
    "z1_zorder" -> ((s, d) => {
      // Morton interleave of two bucketed dims — the multi-dimensional
      // data-skipping layout key (file-skipping proved on real files in
      // PruneSpec; here the bit math itself is oracle-checked)
      val ev = Tables.events(s, d)
      ev.select(col("event_id"),
          (col("user_id") % 256L).as("ua"),
          (floor(col("value") / 2.0).cast("long") % 256L).as("vb"))
        .withColumn("z", operators.Prune.zvalue(col("ua"), col("vb")))
        .orderBy(col("event_id"))
    }),
    "bf1_bloom_prefilter" -> ((s, d) => {
      // runtime-filter contract: the bloom pre-filter (Prune.scala) must
      // never drop a matching fact row (one-sided error) and its false
      // positives stay under 1% of the non-matching rows + 1. n_exact is
      // the DuckDB-checkable anchor; the flags are constant-TRUE.
      import graft.functions.expressions
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      val bloom = dim
        .select(expressions.bloom_agg(xxhash64(col("o_orderkey"))).as("bf"))
        .head().getAs[Array[Byte]](0)
      val keys = dim.select(col("o_orderkey")).distinct()
      val li = Tables.lineitem(s, d).select(col("l_orderkey"))
      li.join(keys, li("l_orderkey") === keys("o_orderkey"), "left_outer")
        .select(col("o_orderkey").isNotNull.as("is_exact"),
          expressions.might_contain(lit(bloom), xxhash64(col("l_orderkey")))
            .as("pass"))
        .agg(
          sum(when(col("is_exact"), 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("is_exact") && !col("pass"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("is_exact") && col("pass"), 1L).otherwise(0L)).as("fp"),
          count(lit(1)).as("n"))
        .select(col("n_exact"),
          (col("fn") === 0L).as("no_false_negatives"),
          (col("fp") * 100L <= col("n") - col("n_exact") + 100L)
            .as("fp_bounded"))
    }),
    "n6_label_centroids" -> ((s, d) =>
      Similarity.labelCentroids(Tables.embeddings(s, d))
        .orderBy(col("label"))),
    "j15_full_outer" -> ((s, d) => {
      // full outer join with BOTH orphan sides live: the dim prunes to
      // one segment, so orders of other segments surface as left-null
      // rows while BUILDING customers without orders surface right-null
      val bc = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      val oc = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
      // orphan sides keep their rows; their null columns flatten to
      // sentinels because the harness compare sorts column values and
      // can't order NULL against strings
      bc.join(oc, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_mktsegment"), lit("NONE")).as("segment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("total_spend"), lit(0.0d)).as("total_spend"))
        .orderBy(col("custkey"))
    }),
    "n7_quantized_rerank" -> ((s, d) => {
      // two-stage retrieval (int8 first pass over the artifact's
      // persisted sq8 codes → exact rerank), verified by the n2/n3
      // contract shape: planted copies, stage-1 superset, exact-score
      // recompute, rank monotonicity — constant-TRUE oracle
      val ix = annIndexFor(s, d)
      Similarity.rerankContractWith(annPlantedCorpus(s, d), ix.sq8(s),
          annProbeIds, k = 10, oversample = 4)
        .orderBy(col("qid"))
    }),
    "n8_pq_adc" -> ((s, d) => {
      // product quantization + ADC retrieval (the FAISS PQ shape) over
      // the artifact's persisted codebooks + pq_codes table, verified
      // by the planted-ground-truth contract: the ×2 copy encodes to
      // bit-identical codes (scaling by 2 is float-exact through dot,
      // norm, and division), so it must surface with the probe's own
      // ADC score — constant-TRUE oracle like n2/n3/n7
      val ix = annIndexFor(s, d)
      Similarity.pqContractWith(annPlantedCorpus(s, d), ix.pqCbs,
          ix.pqCodes(s), annProbeIds, k = 10)
        .orderBy(col("qid"))
    }),
    "n9_ivf_pq" -> ((s, d) => {
      // IVFPQ — inverted file over PQ'd RESIDUALS (the production ANN
      // composition): coarse cells prune the scan to nprobe/nlist,
      // residual codes rank by ADC + exact q·centroid bias, all read
      // from the persisted artifact (ivfpq_codes, cell-partitioned).
      // Planted contract: the ×2 copy lands in the probe's own cell
      // with the probe's exact residual codes and self ADC score
      val ix = annIndexFor(s, d)
      Similarity.ivfPqContractWith(annPlantedCorpus(s, d), ix.cents,
          ix.resCbs, ix.ivfPqCodes(s), annProbeIds, k = 10)
        .orderBy(col("qid"))
    }),
    "n14_ivfpq_rerank_serve" -> ((s, d) => {
      // The COMPRESSED serving arm's contract
      // (Similarity.knnIvfPqRerankBatch — AnnIndex.search's
      // routing-active path, forced here at every cell count so the
      // oracle gates it at sf0.01 too). Two invariants per probe:
      // (a) at the default rerank depth the planted ×2 copy (exact
      // cos 1.0) survives the ADC shortlist and ranks FIRST after
      // exact rerank, k bounded; (b) with the shortlist widened past
      // the candidate count the result must equal the IVF-FLAT
      // serving result ROW FOR ROW — same probed cells (bit-exact
      // host kernel), same exact scores, same tie-breaks — so the
      // compressed arm provably differs from flat only by WHICH
      // candidates the bounded shortlist keeps, never by scoring.
      val ix = annIndexFor(s, d)
      val emb = annPlantedCorpus(s, d)
      val served = Similarity.knnIvfPqRerankBatch(emb, ix.ivf(s),
        ix.ivfPqCodes(s), ix.cents, ix.resCbs, annProbeIds, k = 10)
      val exhaustive = Similarity.knnIvfPqRerankBatch(emb, ix.ivf(s),
        ix.ivfPqCodes(s), ix.cents, ix.resCbs, annProbeIds, k = 10,
        rerank = 1000000)
      val flat = Similarity.knnIvfBatchAssigned(emb, ix.ivf(s),
        ix.cents, annProbeIds, k = 10)
      val cmp = exhaustive
        .select(col("qid"), col("rank"), col("vec_id").as("pv"),
          col("cos_sim").as("ps"))
        .join(flat.select(col("qid"), col("rank"),
          col("vec_id").as("fv"), col("cos_sim").as("fs")),
          Seq("qid", "rank"), "full")
        .groupBy(col("qid"))
        .agg(min(coalesce(col("pv") === col("fv") &&
          col("ps") === col("fs"), lit(false))).as("matches_flat"))
      served.groupBy(col("qid"))
        .agg(min_by(col("vec_id"), col("rank")).as("top1"),
          count(lit(1)).as("n_rows"))
        .join(cmp, Seq("qid"))
        .select(col("qid"),
          (col("top1") === col("qid") + 1000000L).as("planted_rank1"),
          (col("n_rows") > 0 && col("n_rows") <= 10).as("k_bounded"),
          col("matches_flat"))
        .orderBy(col("qid"))
    }),
    "n10_incremental_add" -> ((s, d) => {
      // Incremental vector ingest (the FAISS add() model,
      // AnnIndex.addVectors): a fresh base index is trained on the raw
      // embeddings, then ×2-scaled twins of the probe vectors arrive
      // as a delta batch and are encoded against the FROZEN
      // centroids/codebooks — no retraining — and appended to every
      // index table. The invariant: an IVF probe over the merged index
      // must return each probe's appended twin as its top hit at
      // cosine exactly 1 (same direction ⇒ same cell ⇒ found through
      // the pruned inverted-file path). Built in a private temp dir so
      // the SHARED per-corpus artifact the other n-queries read stays
      // immutable.
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val ix = AnnIndex.build(base,
        Scratch.dir("n10add"))
      val delta = base.filter(col("vec_id").isin(annProbeIds: _*))
        .select((col("vec_id") + 2000000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
            .as("embedding"))
      AnnIndex.addVectors(ix, delta)
      Similarity.knnIvfBatchAssigned(base.unionByName(delta), ix.ivf(s),
          ix.cents, annProbeIds, k = 1)
        .select(col("qid"),
          (col("vec_id") === col("qid") + 2000000L).as("hit_is_twin"),
          (col("cos_sim") === 1.0).as("cos_is_one"))
        .orderBy(col("qid"))
    }),
    "n11_filtered_knn" -> ((s, d) => {
      // Filtered vector search — ES kNN's `filter` / FAISS IDSelector
      // (Similarity.knnIvfBatchFiltered scaladoc: the predicate runs
      // DURING index traversal against the label stored IN the index,
      // never as post-filtering, never joining the raw corpus). Two
      // passes over the planted corpus: filtering on each probe's OWN
      // label must surface its planted twin (same direction and same
      // label ⇒ same cell, cosine exactly 1) at rank 1; filtering on a
      // DIFFERENT label must exclude the twin while every returned row
      // carries the filter's label. The probe→label lookup is a 3-row
      // bounded collect (the annProbeIds discipline); an empty result
      // group vanishes from the groupBy and fails the oracle on row
      // count, not silently.
      import s.implicits._
      val corpus = annPlantedCorpus(s, d)
      val ix = annIndexFor(s, d)
      val probeLabels = Tables.embeddings(s, d)
        .filter(col("vec_id").isin(annProbeIds: _*))
        .select(col("vec_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toSeq.sortBy(_._1)
      def pass(mode: String, expectTwin: Boolean,
               ql: Seq[(Long, Int)]): DataFrame = {
        val wanted = ql.toDF("qid", "want_label")
        val twinOk =
          if (expectTwin) col("twin_rank") === 1 && col("twin_cos") === 1.0
          else col("twin_rank").isNull
        Similarity.knnIvfBatchFiltered(corpus, ix.ivf(s), ix.cents,
            ql, k = 10)
          .join(broadcast(wanted), Seq("qid"))
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n"),
            max(when(col("vec_id") === col("qid") + 1000000L,
              col("rank"))).as("twin_rank"),
            max(when(col("vec_id") === col("qid") + 1000000L,
              col("cos_sim"))).as("twin_cos"),
            min((col("label") === col("want_label")).cast("int"))
              .as("all_match"))
          .select(lit(mode).as("mode"), col("qid"),
            (col("n") >= 1 && col("n") <= 10).as("k_bounded"),
            (col("all_match") === 1).as("labels_match_filter"),
            twinOk.as("twin_ok"))
      }
      pass("match", expectTwin = true, probeLabels)
        .unionByName(pass("mismatch", expectTwin = false,
          probeLabels.map { case (q, l) => (q, (l + 1) % 10) }))
        .orderBy(col("mode"), col("qid"))
    }),
    "n13_hard_negatives" -> ((s, d) => {
      // Hard-negative mining for contrastive training
      // (Similarity.knnIvfBatchHardNegatives scaladoc): per probe, the
      // nearest vectors of a DIFFERENT class via the in-traversal
      // label-exclusion filter over the pruned IVF cells. Contract
      // (n11's discipline): the planted twin — same direction AND same
      // label, the nearest vector in the whole corpus — must be
      // EXCLUDED, every returned negative's label must differ from the
      // probe's own, and the result is k-bounded; an empty probe group
      // vanishes and fails the oracle on row count.
      import s.implicits._
      val corpus = annPlantedCorpus(s, d)
      val ix = annIndexFor(s, d)
      val probeLabels = Tables.embeddings(s, d)
        .filter(col("vec_id").isin(annProbeIds: _*))
        .select(col("vec_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toSeq.sortBy(_._1)
      val own = probeLabels.toDF("qid", "own_label")
      Similarity.knnIvfBatchHardNegatives(corpus, ix.ivf(s), ix.cents,
          probeLabels, k = 10)
        .join(broadcast(own), Seq("qid"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n"),
          max(when(col("vec_id") === col("qid") + 1000000L,
            col("rank"))).as("twin_rank"),
          min((col("label") =!= col("own_label")).cast("int"))
            .as("all_differ"))
        .select(col("qid"),
          (col("n") >= 1 && col("n") <= 10).as("k_bounded"),
          (col("all_differ") === 1).as("labels_differ"),
          col("twin_rank").isNull.as("twin_excluded"))
        .orderBy(col("qid"))
    }),
    "st11_stream_vectors" -> ((s, d) => {
      // Streaming vector ingest (IndexStream.runVectorIngest — the
      // FAISS add() loop as a stream, the ANN twin of st10): the base
      // trains once on the raw embeddings, then ×2-scaled twins of
      // the probes arrive as a 2-batch delta stream, each micro-batch
      // encoded against the FROZEN codebooks and appended. Invariant
      // (the n10 contract): an IVF probe over the merged corpus must
      // surface each probe's streamed twin at rank 1 / cosine exactly
      // 1 through the pruned inverted-file path, plus the multi-batch
      // flag. Fresh ids (+3·10⁶) keep it disjoint from n10's appends;
      // like n10/st10 it deliberately pays its index-build cost
      // in-query (maintenance IS the thing measured).
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val delta = base.filter(col("vec_id").isin(annProbeIds: _*))
        .select((col("vec_id") + 3000000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
            .as("embedding"))
      val (ix, nBatches) =
        graft.streaming.IndexStream.runVectorIngest(s, base, delta)
      Similarity.knnIvfBatchAssigned(base.unionByName(delta), ix.ivf(s),
          ix.cents, annProbeIds, k = 1)
        .select(col("qid"),
          (col("vec_id") === col("qid") + 3000000L).as("hit_is_twin"),
          (col("cos_sim") === 1.0).as("cos_is_one"))
        .withColumn("multi_batch", lit(nBatches >= 2))
        .orderBy(col("qid"))
    }),
    "d12_incremental_minhash" -> ((s, d) => {
      // arriving batch (doc_id % 10 = 0) screened against the standing
      // corpus's MAINTAINED frames — the banded LSH index and shingle
      // verify-side now read from the PERSISTED DedupIndex artifact
      // (production appends to it daily — d17 gates that loop); oracle
      // is the exact-Jaccard batch×standing join (LSH recall 1.0 at
      // this scale — the d2 argument)
      val docs = Tables.documents(s, d)
      DedupIndex.screenNear(s, dedupIndexMost(s, d),
          docs.filter(col("doc_id") % 10 === 0))
        .orderBy(col("doc_id"))
    }),
    "d17_standing_index" -> ((s, d) => {
      // the daily-ingest MAINTENANCE loop on a private index copy
      // (the ti1/s16 discipline — the shared artifact stays
      // immutable): build the standing index, screen the arriving
      // batch, append the survivors (O(batch) — DedupIndex.addBatch),
      // then RE-SCREEN the same batch: every doc must now resolve as
      // known — the idempotence a production dedup service relies on
      // (a re-delivered batch adds nothing twice).
      val docs = Tables.documents(s, d)
      val standing = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val ix = DedupIndex.build(standing, Scratch.dir("d17ix"))
      val before = ix.fingerprints(s).count()
      val bucketsBefore = ix.buckets(s).count()
      val setsBefore = ix.shingleSets(s).count()
      val n1new = DedupIndex.screenExact(s, ix, batch)
        .filter(col("is_new")).count()
      val (_, nFps) = DedupIndex.addBatch(s, ix, batch)
      val after = ix.fingerprints(s).count()
      val n2new = DedupIndex.screenExact(s, ix, batch)
        .filter(col("is_new")).count()
      // INDEPENDENT structural evidence that all three tables moved in
      // lockstep: the appended representatives carry exactly
      // Dedup.Bands bucket rows and one shingle-set row each — counted
      // from the tables themselves, not from addBatch's own
      // bookkeeping (a gate that compares a computation with itself
      // can never fail)
      val lockstep =
        ix.buckets(s).count() ==
          bucketsBefore + Dedup.Bands.toLong * nFps &&
        ix.shingleSets(s).count() == setsBefore + nFps
      import s.implicits._
      Seq((before, batch.count(), n1new, nFps, after,
          n2new == 0L, lockstep, after == before + nFps))
        .toDF("n_index_before", "n_batch", "n_new", "n_fps_added",
          "n_index_after", "rescreen_all_known",
          "tables_in_lockstep", "growth_consistent")
    }),
    "d18_strict_admission" -> ((s, d) => {
      // the STRICT near-dup admission policy under the gate
      // (DedupIndex.addBatch(nearThreshold) scaladoc): exact-new
      // representatives are additionally near-screened against the
      // standing side, and a verified Jaccard ≥ 0.5 is refused
      // admission — the policy that keeps the standing index
      // distinct-content-sized when re-worded duplicates arrive
      // daily. Verified per batch doc: exact_new (its fingerprint was
      // unknown) and admitted (its fingerprint entered the index) —
      // the oracle replays both from raw text, including the rep
      // selection and the near-dup verify. Private index copy, the
      // d17 discipline; the before-fingerprints snapshot is
      // materialized to scratch (lesson 13 — the membership join
      // must not re-list the directory the append writes into).
      // Shares d12's documented assumption: the oracle's exact
      // all-pairs join equals the LSH-banded candidate set because
      // banding recall is 1.0 on this corpus's actual >= 0.5 pairs
      // (deterministic xxhash banding — same verdict every run; a
      // future corpus with a borderline-0.5 pair that misses all 16
      // bands would surface here exactly as it would in d12).
      val docs = Tables.documents(s, d)
      val standing = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val ix = DedupIndex.build(standing, Scratch.dir("d18ix"))
      val scratch = Scratch.dir("d18before")
      ix.fingerprints(s).select(col("fingerprint"))
        .write.mode("overwrite").parquet(s"$scratch/before")
      val beforeFps = s.read.parquet(s"$scratch/before")
      DedupIndex.addBatch(s, ix, batch, nearThreshold = Some(0.5))
      batch.select(col("doc_id"),
          md5(Dedup.normalize(col("text"))).as("fp"))
        .join(beforeFps.select(col("fingerprint").as("fp"),
          lit(true).as("known")), Seq("fp"), "left")
        .join(ix.fingerprints(s).select(col("fingerprint").as("fp"),
          lit(true).as("now")), Seq("fp"), "left")
        .select(col("doc_id"),
          (col("known").isNull && col("fp").isNotNull).as("exact_new"),
          (col("known").isNull && coalesce(col("now"), lit(false)))
            .as("admitted"))
        .orderBy(col("doc_id"))
    }),
    "n5_quantize" -> ((s, d) =>
      // int8 scalar quantization + its reconstruction contract; codes
      // '|'-flatten for the hash compare (repo array convention)
      Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id"),
          joined(transform(col("q"), c => c.cast("string"))).as("q"),
          col("ok"))
        .orderBy(col("vec_id"))),
    "x9_repetition" -> ((s, d) =>
      TextStats.repetition(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    "pipe1_curation" -> ((s, d) => {
      // the full curation pipeline as ONE declarative plan: quality
      // filter → language filter → exact dedup → train split →
      // sequence packing. Quality, language and split are row-local
      // signals, so they ride ONE corpus scan as a fused filter; only
      // dedup (inherently an aggregation) adds a second scan, joined
      // back as a left-semi prune. Packing materializes its two-long
      // projection once (localCheckpoint) — the corpus is read exactly
      // twice end to end, at any scale.
      val docs = Tables.documents(s, d)
      val pruned = docs.filter(
        TextStats.qualityScore(col("text")) >= 0.7 &&
        TextStats.langId(col("text")) === "en" &&
        TextStats.splitBucket(col("doc_id")) < 90)
      val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
      val survivors = pruned.join(keep, Seq("doc_id"), "left_semi")
      TextStats.packChunks(survivors, budget = 2048).orderBy(col("doc_id"))
    }),
    "d10_incremental_dedup" -> ((s, d) => {
      // standing corpus = even ids, arriving batch = odd ids; each new
      // doc resolves to the standing doc it duplicates or marks itself
      // new. The standing fingerprint index is the PERSISTED artifact
      // (operators.DedupIndex) — screening READS it; the per-batch
      // rebuild this query used to pay is gone (the d17 query
      // exercises the maintenance side).
      val docs = Tables.documents(s, d)
      DedupIndex.screenExact(s, dedupIndexEven(s, d),
          docs.filter(col("doc_id") % 2 =!= 0))
        .orderBy(col("doc_id"))
    }),
    "d9_contamination" -> ((s, d) => {
      // eval set = every 20th doc (stand-in benchmark); flag training
      // docs sharing >= 5 distinct shingles with any eval doc
      val docs = Tables.documents(s, d)
      Dedup.contamination(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0), minShared = 5)
        .orderBy(col("doc_id"))
    }),
    "d16_contamination_fraction" -> ((s, d) => {
      // per-EVAL-doc overlap fraction (Dedup.contaminationFraction
      // scaladoc) — the GPT-3-appendix decontamination metric: what
      // fraction of each benchmark doc's grams leak from the training
      // corpus; ≥50% → drop the example
      val docs = Tables.documents(s, d)
      Dedup.contaminationFraction(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0))
    }),
    "x4_fingerprint" -> ((s, d) =>
      TextStats.fingerprints(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "x6_rolling_fingerprint" -> ((s, d) => // custom expression: rows-only
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.expressions.rolling_min_hash(
            graft.operators.Dedup.normalize(col("text")), 32)
            .as("rolling_fp"))
        .orderBy(col("doc_id"))),

    // ---- event-time analytics (SURVEY §2.9 extension) ----
    "e1_tumbling" -> ((s, d) => EventOps.tumbling(Tables.events(s, d))),
    "e2_sessionize" -> ((s, d) => EventOps.sessionize(Tables.events(s, d))),
    "e3_sliding" -> ((s, d) => EventOps.sliding(Tables.events(s, d))),
    "e5_asof_join" -> ((s, d) => EventOps.asofJoin(Tables.events(s, d))),
    "e6_range_join" -> ((s, d) => {
      // intervals: ±45 min around user 1's purchases (arbitrary,
      // overlapping, not grid-aligned); count all events inside each
      val ev = Tables.events(s, d)
      val intervals = ev
        .filter(col("event_type") === "purchase" && col("user_id") === 1)
        .select(col("event_id").as("interval_id"),
          (col("ts") - expr("INTERVAL 45 MINUTES")).as("start_ts"),
          (col("ts") + expr("INTERVAL 45 MINUTES")).as("end_ts"))
      EventOps.rangeJoinCounts(ev, intervals)
    }),
    "e4_session_window" -> ((s, d) =>
      // Spark-native gap sessions (SessionWindow operator) — batch twin
      // of streaming.EventStream.sessionWindows
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("user_id"), col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start"))),
    "e7_funnel" -> ((s, d) =>
      // staged conversion funnel: signup → click (after) → purchase
      // (after that), earliest-completion semantics per stage
      EventOps.funnel(Tables.events(s, d),
        Seq("signup", "click", "purchase"))),
    "e10_eql_sequence" -> ((s, d) =>
      // EQL sequence-with-maxspan (EventOps.eqlSequence scaladoc):
      // signup → click → purchase within 6 h, greedy-latest chains in
      // stages−1 linear window passes; the oracle is the quadratic
      // exists-triple specification
      EventOps.eqlSequence(Tables.events(s, d),
        Seq("signup", "click", "purchase"), maxspanSeconds = 21600L)),
    "e10b_eql_hits" -> ((s, d) =>
      // the EQL sequence's per-match HITS — the matched event chains
      // ES EQL returns (EventOps.eqlHits scaladoc): one row per
      // matched final-stage event with every stage's exact-µs
      // timestamp; the oracle replays the identical greedy-latest
      // scalar windows, so the CHAIN itself is pinned cross-engine,
      // not just its existence
      EventOps.eqlHits(Tables.events(s, d),
        Seq("signup", "click", "purchase"), maxspanSeconds = 21600L)),
    "e9_retention" -> ((s, d) =>
      // cohort retention matrix (EventOps.retention scaladoc): users
      // bucketed by first-seen ISO week, counted in every later week
      // they were active; exact integer week offsets + basis-point
      // retention against the offset-0 cohort size
      EventOps.retention(Tables.events(s, d))),

    // ---- Structured Streaming, run to completion (SURVEY §2.9) ----
    // Real StreamingQuery executions (file source → stateful op →
    // memory sink, Trigger.AvailableNow); the oracle is the batch SQL
    // the stream must converge to on a finite input.
    "st1_stream_tumbling" -> ((s, d) => EventStream.runTumbling(s, d)),
    "st2_stream_dedup" -> ((s, d) => EventStream.runDedupIngest(s, d)),
    "st3_stream_state" -> ((s, d) => EventStream.runUserCounts(s, d)),
    "st4_stream_denorm" -> ((s, d) =>
      graft.streaming.DenormStream.runDenorm(s, d)),
    "st5_stream_join" -> ((s, d) => EventStream.runStreamJoin(s, d)),
    "st6_stream_funnel" -> ((s, d) =>
      // per-user funnel state machine (mapGroupsWithState) run to
      // completion — converged stage counts ≡ the batch e7 funnel
      EventStream.runFunnel(s, d, Seq("signup", "click", "purchase"))),

    // ---- analyst SQL entry (SURVEY §3.3) ----
    "sql2_sql_functions" -> ((s, d) => {
      // the library's custom codegen'd expressions reached BY NAME from
      // SQL (function-registry / SparkSessionExtensions path): Porter-
      // stem every token of every document in one SQL statement
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d).createOrReplaceTempView("documents")
      s.sql(s"""
        SELECT doc_id,
               array_join(transform(
                 regexp_extract_all(lower(text),
                   '${Analyzers.tokenPattern
                       .replace("\\", "\\\\").replace("'", "\\'")}', 0),
                 t -> porter_stem(t)), '|') AS stemmed
        FROM documents ORDER BY doc_id""")
    }),
    "sql1_analyst" -> ((s, d) => {
      // the reference's standalone-SQL path (used_queries/queries.sql):
      // ANSI SQL submitted as a string runs on the same engine/tables
      // as the DSL — same pre-aggregate + left-join + COALESCE shape
      // as the Postgres query, flat projection for the oracle hash
      Seq("orders", "customer", "lineitem", "part", "supplier", "nation")
        .foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
      s.sql("""
        SELECT o.o_orderkey AS id, c.c_custkey AS author_id,
               coalesce(li.n_items, 0) AS n_items,
               coalesce(ann.n_annotations, 0) AS n_annotations
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN (SELECT l_orderkey, count(*) AS n_items
                   FROM lineitem GROUP BY l_orderkey) li
          ON li.l_orderkey = o.o_orderkey
        LEFT JOIN (SELECT l.l_orderkey, count(*) AS n_annotations
                   FROM lineitem l
                   JOIN part p ON l.l_partkey = p.p_partkey
                   JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   JOIN nation n ON s.s_nationkey = n.n_nationkey
                   GROUP BY l.l_orderkey) ann
          ON ann.l_orderkey = o.o_orderkey
        ORDER BY id""")
    }),
    "x5_sketch_distinct" -> ((s, d) =>
      // HLL++ sketch with its accuracy CONTRACT as the verified output:
      // the estimate itself is engine-specific (DuckDB's HLL hashes
      // differently, so the raw value can never hash-match an oracle),
      // but the error bound is checkable — the oracle asserts it holds
      // (TRUE) next to the exact counts. rsd is a standard deviation,
      // not a hard limit, so the asserted bound is 3·rsd: a ~3σ
      // contract that survives dataset regeneration, not just the
      // cardinalities this exact corpus happens to produce. The exact
      // count(distinct) exists only in this verification query; the
      // production sketch path never computes it.
      {
        val rsd = 0.02
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n"))
          .select(col("event_type"), col("exact_users"), col("n"),
            (abs(col("approx_users") - col("exact_users")) <=
              col("exact_users") * (3 * rsd)).as("approx_ok"))
          .orderBy(col("event_type"))
      }),

    // ---- multimodal plumbing (brief §extensions) ----
    "m1_media_meta" -> ((s, d) =>
      Multimodal.mediaMeta(Multimodal.asMedia(Tables.documents(s, d)))),
    "m2_media_features" -> ((s, d) =>
      // two decode paths through one batched extractor: planted BMP
      // fixtures exercise the REAL image parser (hand-computed pixel
      // statistics as oracle literals); the text rows exercise the
      // documented stub (mod-prime code-point fold → DuckDB-replayable).
      // Features verified as exact ×1000003 fixed-point integers.
      // the PNG fixtures ride the REAL compressed path: zlib inflate +
      // per-row unfiltering (every filter type planted), stats checked
      // against hand-computed literals; -3 is the same picture as BMP
      // -1, so equal features across formats is part of the contract
      Multimodal.extractFeatures(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.bmpFixtures(s))
          .unionByName(Multimodal.pngFixtures(s)))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("format"),
          col("width"), col("height"),
          joined(transform(col("features"),
            f => round(f.cast("double") * 1000003, 0).cast("long")))
            .as("features"))
        .orderBy(col("media_id"))),
    "m6_media_phash" -> ((s, d) =>
      // perceptual near-dup over media: planted BMPs include the SAME
      // picture at two resolutions (different bytes, equal aHash) plus
      // its inversion; stub rows exercise the SQL-replayable path.
      // A rescaled copy resolves to its original's group — the case
      // byte-exact md5 dedup (m1) can never catch
      // -10 is the same picture PNG-encoded: a cross-FORMAT duplicate
      // (different codec, different bytes, equal aHash) resolving into
      // the BMP fixtures' perceptual group
      Multimodal.phashDedup(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.phashFixtures(s))
          .unionByName(Multimodal.pngPhashFixtures(s)))
        .orderBy(col("media_id"))),
    "m7_audio_features" -> ((s, d) =>
      // audio modality: real 16-bit PCM WAV parse (planted square wave
      // + stereo ramp + corrupt header) over the same batched decoder
      // shape; text rows take the replayable stub
      Multimodal.audioFeatures(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.wavFixtures(s)))
        .toDF()
        .orderBy(col("media_id"))),
    "m3_media_chunks" -> ((s, d) =>
      Multimodal.mediaChunks(Multimodal.asMedia(Tables.documents(s, d)))
        .select(col("media_id"), col("n_chunks"),
          joined(col("chunk_md5s")).as("chunk_md5s"))
        .orderBy(col("media_id"))),
    "m4_media_resize" -> ((s, d) =>
      // thumbnail/downsample stage over decoded dims (stub dims reach
      // 640x480, so the 224-box scaling math is exercised; the planted
      // BMPs pass through un-scaled) — columnar, no UDF
      Multimodal.resize(
        Multimodal.extractFeatures(s,
          Multimodal.asMedia(Tables.documents(s, d))
            .unionByName(Multimodal.bmpFixtures(s))))
        .orderBy(col("media_id"))),
    "m5_frame_sample" -> ((s, d) =>
      // frame sampling over the chunked payload: keep every 4th chunk
      // digest (stride sampling on the window index — the video
      // keyframe-ish selection done entirely on the binary column)
      Multimodal.mediaChunks(Multimodal.asMedia(Tables.documents(s, d)))
        .select(col("media_id"), col("n_chunks"),
          joined(filter(col("chunk_md5s"), (m, i) => i % 4 === 0))
            .as("sampled_md5s"))
        .orderBy(col("media_id"))),
    "m9_silence_split" -> ((s, d) =>
      // VAD-style silence segmentation (Multimodal.silenceSegments
      // scaladoc): exact integer window RMS over real PCM (planted
      // fixtures incl. the -24 gap wave: voiced/silent/voiced → 2
      // segments), bit-pattern stub for text rows; row-local
      Multimodal.silenceSegments(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.wavFixtures(s)))
        .toDF()
        .orderBy(col("media_id"))),
    "m8_scene_cut" -> ((s, d) =>
      // scene-cut segmentation over the frame stream
      // (Multimodal.sceneCuts scaladoc): per media, a cut wherever
      // consecutive frame features jump past the threshold —
      // replayable stub features standing in for decoder frame means,
      // per-media lag window, explode+agg (never nested lambdas over
      // a computed array)
      Multimodal.sceneCuts(Multimodal.asMedia(Tables.documents(s, d)))),

    // ---- ES aggregation surface: composite / histogram / rare_terms /
    //      pipeline aggs / runtime fields ----
    "a9_composite_agg" -> ((s, d) =>
      // ES composite aggregation: keyset pagination over the GROUP
      // space (after_key = (src12, fr), page size 10). The after-key
      // predicate is applied to the RAW rows before the aggregation —
      // the composite key IS a row-column tuple, so the filter pushes
      // to the parquet scan and the shuffle only ever carries
      // surviving groups; the ordered page is TakeOrderedAndProject
      // above the agg. This is how "page through 10⁹ buckets" stays
      // bounded at 100 TB: each page re-filters, never re-sorts the
      // whole group space.
      Tables.documents(s, d)
        .filter(col("source") > "src12" ||
          (col("source") === "src12" && col("lang") > "fr"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("doc_count"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"), col("lang"))
        .limit(10)),
    "a10_histogram" -> ((s, d) => {
      // ES histogram agg (interval 50, min_doc_count 0): empty buckets
      // inside the observed [min, max] are emitted. The bucket domain
      // comes from a 1-ROW min/max aggregate expanded via sequence()
      // — domain/interval rows, never proportional to the data — and
      // is outer-joined to the counted buckets (one shuffle agg).
      val docs = Tables.documents(s, d)
      val counted = docs
        .groupBy((floor(col("n_chars") / 50) * 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("doc_count"))
      val domain = docs
        .agg((floor(min(col("n_chars")) / 50) * 50).cast("long").as("lo"),
          (floor(max(col("n_chars")) / 50) * 50).cast("long").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(50L))).as("bucket"))
      domain.join(counted, Seq("bucket"), "left")
        .select(col("bucket"),
          coalesce(col("doc_count"), lit(0L)).as("doc_count"))
        .orderBy(col("bucket"))
    }),
    "a11_rare_terms" -> ((s, d) =>
      // ES rare_terms SERVED FROM THE INDEX (Search.rareTermsIndexed
      // scaladoc): the shingle dictionary persists per-shingle df, so
      // the rare tail is one pruned dictionary read + a df ≤
      // max_doc_count filter — zero corpus passes at query time. The
      // scan-path twin (Search.rareTerms: hash-keyed count shuffle +
      // SHUFFLE_HASH term recovery, which tokenized the corpus twice
      // per query) remains for index-less corpora and is
      // equality-locked against this path in TextIndexSpec.
      Search.rareTermsIndexed(s, textIndexFor(s, d), maxDocCount = 2)),
    "a31_terms_shard_error" -> ((s, d) =>
      // ES terms-agg accuracy protocol under distribution
      // (Search.termsShardError scaladoc: per-shard top-k from the
      // persisted postings, coordinator sums only returned counts,
      // doc_count_error_upper_bound from non-returning shards'
      // minima). At shard_size = size the corpus genuinely exercises
      // nonzero bounds; the exhausted-shard smin=0 rule is pinned by
      // EsSurfaceSpec's planted fixture.
      Search.termsShardError(textIndexFor(s, d).postings(s))),
    "a33_frequent_pairs" -> ((s, d) => {
      // ES frequent_item_sets made EXACT at level 2 — market-basket
      // co-occurrence: baskets are orders, items the DISTINCT part
      // brands in each (dim join is broadcast-able; distinct is one
      // shuffle). Pair generation is ROW-LOCAL over each basket's
      // sorted brand array (≤ items² per order, the d4 in-bucket
      // pattern — never a fact self-join), one count shuffle on the
      // pair key, relative support in exact basis points
      // (support·10⁴ div n_baskets). ES mines this with an
      // approximate sampler because its per-shard heap can't hold the
      // lattice; level-2 exact is one aggregation for a relational
      // engine at any scale.
      val b = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("brand"))
      // no pre-distinct: collect_set dedups within each basket during
      // the ONE groupBy shuffle (map-side partial sets) — a separate
      // distinct would double the dominant exchange for no effect
      val baskets = b.groupBy(col("o"))
        .agg(sort_array(collect_set(col("brand"))).as("brands"))
      val nb = baskets.agg(count(lit(1)).as("nb"))
      baskets.select(explode(flatten(transform(col("brands"),
          (x, i) => transform(
            slice(col("brands"), i + 2,
              greatest(size(col("brands")) - i - 1, lit(0))),
            y => struct(x.as("brand_a"), y.as("brand_b")))))).as("p"))
        .groupBy(col("p.brand_a").as("brand_a"),
          col("p.brand_b").as("brand_b"))
        .agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(nb))
        .withColumn("support_bp", expr("support * 10000 div nb"))
        .filter(col("support_bp") >= 100)
        .select(col("brand_a"), col("brand_b"), col("support"),
          col("support_bp"))
        .orderBy(col("support").desc, col("brand_a"), col("brand_b"))
        .limit(20)
    }),
    "a34_categorize" -> ((s, d) =>
      // ES categorize_text as DETERMINISTIC template extraction — the
      // drain-style log-templating core without its training-order-
      // dependent ML merge step: digit runs collapse to a <n>
      // placeholder, whitespace normalizes, and the template IS the
      // category key. Row-local projection + ONE count shuffle on the
      // template; each category reports its doc count and earliest
      // example doc. Where ES's categories depend on which documents
      // trained the tree first, this is a pure function of the corpus.
      Tables.documents(s, d)
        .select(col("doc_id"),
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[0-9]+", "<n>"),
            "\\s+", " ")).as("category"))
        .groupBy(col("category"))
        .agg(count(lit(1)).as("doc_count"),
          min(col("doc_id")).as("example_doc"))
        .orderBy(col("doc_count").desc, col("category"))
        .limit(10)),
    "w14_top_metrics" -> ((s, d) =>
      // ES top_metrics: per bucket, the metric values of the
      // top-sorted document. ONE lexicographic struct-max per group —
      // partial-aggregatable (map-side combine), so no per-group sort
      // or window ever touches the events; ties on ts break by
      // event_id inside the same ordered struct, keeping the answer
      // deterministic rather than shard-arbitrary.
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(max(struct(col("ts"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents")))
          .as("top"))
        .select(col("event_type"), col("top.ts").as("last_ts"),
          col("top.event_id").as("last_event_id"),
          col("top.cents").as("last_cents"))
        .orderBy(col("event_type"))),
    "a32_cumulative_cardinality" -> ((s, d) => {
      // ES cumulative_cardinality (the pipeline agg over per-bucket
      // HLL sketches) made EXACT by reformulation: cumulative distinct
      // users through bucket B ≡ users whose FIRST event bucket ≤ B, so
      // one (user → min bucket) aggregation plus per-bucket counts and
      // a prefix sum over the bounded hour buckets replaces the sketch
      // union entirely — one corpus shuffle on user_id, exact integers
      // end-to-end, and the window runs over bucket rows (the w7
      // argument), never events. (Hour buckets: this synthetic user
      // base is fully active from day one, so a daily curve is a
      // single point; the hourly one has real shape.) ES documents its version as
      // approximate because merging per-bucket HLLs is all its
      // coordinator can afford; the relational engine can afford the
      // exact answer at any scale.
      val firstSeen = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(date_trunc("HOUR", col("ts"))).as("first_hour"))
      val hourly = firstSeen.groupBy(col("first_hour").as("hour"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, 0)
      hourly.select(col("hour"), col("new_users"),
          sum(col("new_users")).over(w).as("cumulative_users"))
        .orderBy(col("hour"))
    }),
    "w7_pipeline_aggs" -> ((s, d) => {
      // ES date_histogram + pipeline aggs (derivative, cumulative_sum,
      // moving avg over 3 buckets). The unpartitioned window runs over
      // the ~30 DAY BUCKETS (the output of the shuffle agg), not the
      // raw events — a single-partition window over bucket-count rows
      // is the correct plan at any event volume.
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("day"))
      daily.select(col("day"), col("n"),
        (col("n") - lag(col("n"), 1).over(w)).as("derivative"),
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .as("cum_n"),
        round(avg(col("n")).over(w.rowsBetween(-2, 0)), 6).as("moving_avg"))
        .orderBy(col("day"))
    }),
    "p11_json_extract" -> ((s, d) =>
      // ES runtime fields / dynamic mapping: extract a typed value out
      // of a JSON payload column at query time (codegen'd path
      // expression, no UDF), filter on it, aggregate per event_type.
      // avg stays in the exact integer domain (sum/count computed
      // separately) so no float-summation order reaches the compare.
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") >= 50)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .select(col("event_type"), col("n"), col("sum_k"),
          round(col("sum_k").cast("double") / col("n"), 6).as("avg_k"))
        .orderBy(col("event_type"))),

    // ---- ES search surface: phrase / more-like-this / suggest /
    //      highlight ----
    "p10_phrase_match" -> ((s, d) => {
      // ES match_phrase (+ slop=1 variant): consecutive-position check
      // over the analyzed token stream, entirely row-local — the token
      // array zipped with its own tail(s), no positional index needed.
      // At scale this is the same one-pass corpus scan as any match;
      // the adjacency test is a codegen'd HOF over each row's tokens.
      val t = Analyzers.tokenize(lower(col("text")))
      // zip_with pads the shorter (shifted) side with nulls, so the
      // pair-predicate array can hold nulls near the tail and
      // array_contains then answers NULL instead of false — coalesce
      // pins the three-valued result down to a boolean
      def follows(at: Int) = coalesce(array_contains(
        zip_with(col("t"),
          slice(col("t"), lit(1 + at), greatest(size(col("t")) - at, lit(0))),
          (a, b) => a === "fast" && b === "table"), true), lit(false))
      Tables.documents(s, d)
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          follows(1).as("phrase"),
          (follows(1) || follows(2)).as("near_slop1"))
        .filter(col("phrase") || col("near_slop1"))
        .orderBy(col("doc_id"))
    }),
    "f6_more_like_this" -> ((s, d) => {
      // ES more_like_this: select the seed document's top
      // max_query_terms=10 terms by tf·idf (stopwords dropped), then
      // retrieve the top 20 other docs by how many selected terms they
      // contain. Shapes at scale: df is ONE distinct-token corpus
      // aggregation; the seed-term set is ≤10 rows and broadcast into
      // the retrieval scan; the rank-by-match-count cut is integer, so
      // the top-k boundary is engine-independent.
      // distinct (doc, token) pairs, per-term df, and the seed doc's
      // term frequencies are all index lookups (TextIndex artifact) —
      // no re-analysis of any document text
      val ix = textIndexFor(s, d)
      val tok = ix.postings(s)
        .select(col("doc_id"), col("term").as("token"))
      val dfs = ix.termDf(s).select(col("term").as("token"), col("df"))
      val seedTf = ix.postings(s).filter(col("doc_id") === 0L)
        .filter(!col("term").isin(Analyzers.englishStopwords: _*))
        .select(col("term").as("token"), col("tf").cast("long").as("tf"))
      // term selection ranks on the integer key (tf desc, df asc) —
      // the tf·idf ORDER ES uses, made engine-portable: a float tf·ln
      // cut could straddle libm rounding between engines at the k-th
      // term; integers cannot
      val wTerm = Window.orderBy(
        col("tf").desc, col("df").asc, col("token")) // ≤ seed-vocab rows
      val terms = seedTf.join(dfs, "token")
        .withColumn("rk", row_number().over(wTerm))
        .filter(col("rk") <= 10)
        .select(col("token"))
      tok.filter(col("doc_id") =!= 0L)
        .join(broadcast(terms), "token")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matched"))
        .orderBy(col("n_matched").desc, col("doc_id"))
        .limit(20)
    }),
    "t13_autocomplete" -> ((s, d) => {
      // ES completion suggester: an edge-ngram (1..5) index over the
      // corpus vocabulary, weighted by document frequency; a prefix
      // query is an exact equi-lookup on the ngram — a point read
      // against the suggest index at any scale, never a LIKE scan of
      // the vocabulary — and suggestions rank by weight desc.
      val vocab = Tables.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(
          Analyzers.tokenize(lower(col("text"))))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("weight"))
      val index = vocab.select(col("token"), col("weight"),
        explode(transform(
          sequence(lit(1), least(length(col("token")), lit(5))),
          i => col("token").substr(lit(1), i))).as("edge"))
      index.filter(col("edge") === "s")
        .select(col("token"), col("weight"))
        .orderBy(col("weight").desc, col("token"))
        .limit(5)
    }),
    "d13_semantic_dedup" -> ((s, d) =>
      // SemDeDup: cluster-scoped embedding near-dup removal — the
      // quadratic pair work is bounded by the cluster, never the
      // corpus (Similarity.semDedup scaladoc)
      Similarity.semDedup(Tables.embeddings(s, d), threshold = 0.35)
        .orderBy(col("vec_id"))),
    "g1_pagerank" -> ((s, d) => {
      // iterative graph algorithm done Spark-shaped: PageRank over the
      // conversation-reference graph (each order "replies to" orders
      // id÷2 and id÷3 — a deterministic citation DAG both engines
      // derive identically). THREE fixed iterations, each ONE
      // join + ONE shuffle agg — the loop unrolls into a bounded plan,
      // no driver-side per-node work (at real scale you'd checkpoint
      // the rank relation between iterations to cut lineage; the
      // shape is unchanged). All arithmetic is 10^12 FIXED-POINT
      // integer (div, not /): damping 0.85 as (15·S + 85·Σ)div 100 —
      // bit-identical across engines, no float summation anywhere.
      val S = 1000000000000L
      val nodes = Tables.orders(s, d).select(col("o_orderkey").as("id"))
      val edges = nodes.select(col("id").as("src"), expr("id div 2").as("dst"))
        .unionByName(
          nodes.select(col("id").as("src"), expr("id div 3").as("dst")))
        .filter(col("dst") >= 1L && col("dst") =!= col("src"))
        .distinct()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outd"))
      val contribSrc = edges.join(deg, "src")
      var ranks = nodes.select(col("id"), lit(S).as("r"))
      for (_ <- 1 to 3) {
        val contrib = contribSrc
          .join(ranks.withColumnRenamed("id", "rid"),
            col("src") === col("rid"))
          .select(col("dst"), expr("r div outd").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("cin"))
        ranks = nodes
          .join(contrib, nodes("id") === contrib("dst"), "left")
          .select(nodes("id"),
            (lit(15L * S) + lit(85L) * coalesce(col("cin"), lit(0L)))
              .as("num"))
          .select(col("id"), expr("num div 100").as("r"))
      }
      ranks.orderBy(col("r").desc, col("id")).limit(20)
    }),
    "x24_temp_mixture" -> ((s, d) => {
      // temperature-scaled source mixing (α = 0.5, the T5/LLaMA data
      // recipe): sampling weight p_s ∝ n_s^α flattens the source
      // distribution; each source gets acceptance rate
      // min(1, B·p_s/n_s) toward a total budget B = half the corpus,
      // then the same content-hash acceptance as x11 picks documents
      // deterministically. One count shuffle builds the 1-row-per-
      // source rate table; the sample pass is a broadcast-joined
      // filter over the corpus scan. Determinism discipline (lesson
      // 12): sqrt is IEEE-exact PER ELEMENT, but a float SUM of the
      // weights would be order-dependent — so each weight quantizes
      // to integer micro-units row-locally (the n6 pattern) and every
      // sum/ratio after that is exact BIGINT arithmetic; the
      // basis-point rates cannot differ across engines or runs.
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("w",
          floor(sqrt(col("n")) * 1000000.0 + 0.5).cast("long"))
      val tot = counts.agg(sum(col("n")).as("n_total"),
        sum(col("w")).as("z"))
      // 128-bit numerator: n_total·w·10⁴ exceeds BIGINT once
      // n_total ≳ 10⁷ with w ≈ √n·10⁶ (the scale this query is for) —
      // Spark would wrap (or throw under ANSI) while DuckDB's BIGINT
      // errors, so both engines compute the ratio in exact 128-bit
      // (decimal(38,0) here, HUGEINT in the oracle) and agree for all
      // n_total < 10¹⁸
      val rates = counts.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          least(lit(10000L),
            expr("""(cast(n_total as decimal(38,0)) * w * 10000)
                    div (2 * cast(z as decimal(38,0)) * n)"""))
            .as("rate_bp"))
      val sampled = Tables.documents(s, d)
        .join(broadcast(rates), "source")
        .filter(
          (conv(substring(md5(concat(lit("mix:"),
            col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
            % 10000L) < col("rate_bp"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
      rates.join(sampled, Seq("source"), "left")
        .select(col("source"), col("n"), col("rate_bp"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy(col("source"))
    }),
    "f9_multi_match" -> ((s, d) => {
      // ES multi_match, most_fields: per-field scores summed — BM25 on
      // the analyzed text field plus a boosted exact match on the
      // keyword field. tf/len/df/(n, avgdl) all come from the
      // TextIndex artifact; the stored docs contribute only the pruned
      // (doc_id, source) columns (the keyword field needs no analysis),
      // so no document text is ever re-tokenized.
      val ix = textIndexFor(s, d)
      val pre = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .join(ix.doclen(s), "doc_id")
        .join(broadcast(ix.postings(s).filter(col("term") === "customer")
          .select(col("doc_id"), col("tf"))), Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("tf"), lit(0)).as("tf"), col("len"))
      val stats = ix.corpus(s).crossJoin(
        ix.termDf(s).filter(col("term") === "customer")
          .agg(coalesce(sum(col("df")), lit(0L)).cast("double").as("df")))
      val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      val tfNorm = (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avgdl")))
      pre.filter(col("tf") > 0 || col("source") === "src3")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          round(when(col("tf") > 0, idf * tfNorm).otherwise(lit(0.0)) +
            when(col("source") === "src3", 3.0).otherwise(0.0), 6)
            .as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),
    "a17_top_hits" -> ((s, d) =>
      // ES top_hits inside a terms agg: per source, the 2 best-scoring
      // hits for the match query, bucket-local rank attached (match
      // set + scores from the TextIndex artifact)
      Search.topHitsIndexed(s, d, textIndexFor(s, d), "spark", k = 2)),
    "w9_collapse" -> ((s, d) =>
      // ES field collapsing: globally ranked hits deduplicated per
      // source (best hit per bucket + inner-hit count), top 10
      Search.collapseIndexed(s, d, textIndexFor(s, d), "spark", k = 10)),
    "f10_rescore" -> ((s, d) =>
      // ES rescore: BM25 primary ranks off the index artifact, the
      // top-50 window fetches text and re-scores by exact-phrase
      // occurrences, final = primary + 2·phrase_n
      Search.rescoreIndexed(s, d, textIndexFor(s, d),
        Seq("table", "scan"), "table scan")),
    "f11_min_should_match" -> ((s, d) =>
      // ES bool should, minimum_should_match=2 of 3 term clauses
      Search.minShouldMatchIndexed(s, textIndexFor(s, d),
        Seq("table", "spark", "merge"), minMatch = 2)),
    "t14_synonyms" -> ((s, d) =>
      // ES synonym token filter (explicit a => b normalization applied
      // inside the analyzer chain) — one transform over the token
      // array, codegen'd, no shuffle
      Tables.documents(s, d)
        .select(col("doc_id"),
          joined(transform(Analyzers.tokenize(lower(col("text"))),
            t => when(t === "fast", "quick").when(t === "big", "large")
              .when(t === "small", "little").otherwise(t)))
            .as("tokens"))
        .orderBy(col("doc_id"))),
    "w10_percent_rank" -> ((s, d) => {
      // percent_rank + cume_dist per return flag over a total order
      // (price, orderkey, linenumber) — tie-free so both engines agree.
      // Two-pass distributed rank (operators.Rank): a window partitioned
      // by the 3-value flag would sort the whole fact table on three
      // tasks; here the only fact-size shuffle is over (flag, value
      // bucket) and the cross-bucket offsets are a tiny prefix sum.
      operators.Rank.percentRank(Tables.lineitem(s, d),
          partCols = Seq("l_returnflag"),
          orderCols = Seq("l_extendedprice", "l_orderkey", "l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(col("pr"), 6).as("pr"),
          round(col("cume"), 6).as("cd"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    }),
    "a18_adjacency_matrix" -> ((s, d) => {
      // ES adjacency_matrix: named term filters A/B/C, doc counts for
      // every single and pairwise intersection — one corpus scan
      // computes the three membership flags, one 1-row aggregate, the
      // matrix unpivoted from that row (no per-cell scans)
      val t = Tables.documents(s, d)
        .select(Analyzers.tokenize(lower(col("text"))).as("toks"))
        .select(array_contains(col("toks"), "table").as("a"),
          array_contains(col("toks"), "spark").as("b"),
          array_contains(col("toks"), "merge").as("c"))
      val row = t.agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("c"), 1L).otherwise(0L)).as("n_c"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n_ab"),
        sum(when(col("a") && col("c"), 1L).otherwise(0L)).as("n_ac"),
        sum(when(col("b") && col("c"), 1L).otherwise(0L)).as("n_bc"))
      row.selectExpr(
        """stack(6, 'A', n_a, 'B', n_b, 'C', n_c,
                    'A&B', n_ab, 'A&C', n_ac, 'B&C', n_bc)
           AS (filter_key, doc_count)""")
        .orderBy(col("filter_key"))
    }),
    "x25_simpson" -> ((s, d) =>
      // token-level Simpson diversity per doc (repetition signal with
      // EXACT integer arithmetic — Σc(c−1)·10⁴ div n(n−1) basis
      // points): explode → two combiner-friendly shuffles, never a
      // per-row HOF over a computed array
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(Analyzers.tokenize(lower(col("text")))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c") * (col("c") - 1)).as("num"),
          sum(col("c")).as("n"))
        .select(col("doc_id"), col("n").as("n_toks"),
          // 128-bit numerator (the x24 discipline): num ≈ n² at full
          // repetition, so num·10⁴ exceeds BIGINT once n ≳ 3·10⁷
          // tokens — Spark would wrap where DuckDB errors
          when(col("n") > 1,
            expr("""(cast(num as decimal(38,0)) * 10000)
                    div (n * (n - 1))"""))
            .otherwise(0L).cast("long").as("simpson_bp"))
        .orderBy(col("doc_id"))),
    "opt1_agg_rewrite" -> ((s, d) => {
      // CollectStrengthReduction on a LIVE session (the extensions
      // path is build-time; experimental.extraOptimizations is the
      // runtime hook): the query is written naively against collected
      // arrays and executes as count/min/max/flag aggregates — no
      // array buffer, no ObjectHashAggregate (plan-locked in
      // StrengthReductionSpec). The rule attaches to a CLONE of the
      // session (same SparkContext, fresh SessionState), so the
      // harness session's optimizer is untouched for every query that
      // runs after this one — the same isolation discipline the bench
      // applies to storage state.
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        Seq(graft.plans.CollectStrengthReduction)
      Tables.lineitem(s2, d)
        .groupBy(col("l_returnflag"))
        .agg(size(collect_list(col("l_quantity"))).cast("long").as("n"),
          array_min(collect_list(col("l_quantity"))).as("mn"),
          array_max(collect_list(col("l_quantity"))).as("mx"),
          array_contains(collect_list(col("l_linestatus")), "F").as("has_f"),
          size(collect_set(col("l_linestatus"))).cast("long").as("n_status"))
        .orderBy(col("l_returnflag"))
    }),
    "a16_observed_metrics" -> ((s, d) => {
      // A5 ingest/QC counters as a first-class VERIFIED result:
      // df.observe rides accumulator-style metrics on the pipeline's
      // own pass (plan-transparent — no second scan, no codegen
      // break), the action drains them, and the harness hash-checks
      // them against SQL recomputation. This is the production
      // shape for pipeline telemetry: rows in, rows kept, and kept
      // quality mass measured ON the curation filter itself.
      import org.apache.spark.sql.Observation
      val obs = Observation()
      val kept = Tables.documents(s, d)
        .withColumn("q",
          operators.TextStats.qualityScore(col("text")))
        .observe(obs,
          count(lit(1)).as("rows_in"),
          sum(when(col("q") >= 0.7, 1L).otherwise(0L)).as("rows_kept"),
          // quality mass in integer micro-units (floor(q·1e6+0.5) is
          // row-local IEEE-exact, the sum is exact BIGINT — lesson
          // 12: no float summation order reaches the compare)
          sum(when(col("q") >= 0.7,
            floor(col("q") * 1000000.0 + 0.5).cast("long")).otherwise(0L))
            .as("kept_quality_u6"))
        .filter(col("q") >= 0.7)
      kept.write.format("noop").mode("overwrite").save() // the action
      val m = obs.get
      s.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(m("rows_in").asInstanceOf[Long],
          m("rows_kept").asInstanceOf[Long],
          m("kept_quality_u6").asInstanceOf[Long])),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rows_in",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("rows_kept",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("kept_quality_u6",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }),
    "a15_weighted_avg" -> ((s, d) =>
      // ES weighted_avg agg: value=extendedprice, weight=quantity.
      // Both the weighted sum and the weight total stay in exact
      // integer domains (price in cents, integral quantities), the
      // ratio is formed once after aggregation — one shuffle, no
      // float summation order anywhere
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("pc"),
          round(col("l_quantity"), 0).cast("long").as("q"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("pc") * col("q")).as("wsum_c"), sum(col("q")).as("wq"))
        .select(col("l_returnflag"), col("wq"),
          round(col("wsum_c").cast("double") / 100.0 / col("wq"), 6)
            .as("weighted_avg_price"))
        .orderBy(col("l_returnflag"))),
    "w8_search_after" -> ((s, d) => {
      // ES search_after: deep pagination over a RANKED result by a
      // composite (rank-key, id) cursor — the constant after-tuple
      // filters before the sort, so every page is a fresh top-k scan
      // (TakeOrderedAndProject), never an OFFSET that materializes
      // and discards the head. Rank key = the f7 decay ordering's
      // day-distance (score is monotone in it, so paging on the
      // integer key ≡ paging on score).
      val dist = abs(datediff(col("o_orderdate"), lit("1998-01-01")))
        .cast("long")
      Tables.orders(s, d)
        .select(col("o_orderkey"), dist.as("dist_days"))
        .filter(col("dist_days") > 30L ||
          (col("dist_days") === 30L && col("o_orderkey") > 0L))
        .orderBy(col("dist_days"), col("o_orderkey"))
        .limit(20)
    }),
    "f7_decay_score" -> ((s, d) => {
      // ES function_score gauss decay on a date field: with decay=0.5
      // the score is 0.5^((dist/scale)^2) — monotone in the integer
      // day-distance, so the top-k cut is engine-independent even
      // though exp/pow differ in ulps between libms (distinct
      // distances can never swap order). Row-local projection +
      // TakeOrderedAndProject; nothing widens the scan.
      val dist = abs(datediff(col("o_orderdate"), lit("1998-01-01")))
      Tables.orders(s, d)
        .select(col("o_orderkey"), dist.cast("long").as("dist_days"),
          round(pow(lit(0.5), pow(dist.cast("double") / 180.0, 2.0)), 6)
            .as("score"))
        .orderBy(col("score").desc, col("o_orderkey"))
        .limit(20)
    }),
    "a13_filters_agg" -> ((s, d) =>
      // ES filters aggregation: three NAMED predicate buckets counted
      // in ONE scan (conditional aggregates), then unpivoted to bucket
      // rows — never three scans, never a groupBy on a synthesized
      // bucket id (rows can match several filters)
      Tables.orders(s, d)
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("finished"),
          sum(when(col("o_totalprice") > 200000.0, 1L).otherwise(0L))
            .as("high_value"),
          sum(when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L))
            .as("urgent"))
        .select(explode(array(
          struct(lit("finished").as("bucket"), col("finished").as("doc_count")),
          struct(lit("high_value").as("bucket"), col("high_value").as("doc_count")),
          struct(lit("urgent").as("bucket"), col("urgent").as("doc_count"))))
          .as("b"))
        .select(col("b.bucket").as("bucket"), col("b.doc_count").as("doc_count"))
        .orderBy(col("bucket"))),
    "a14_percentile_ranks" -> ((s, d) =>
      // ES percentile_ranks: the fraction of values ≤ each requested
      // threshold, per group — exact integer count pairs through one
      // shuffle; the ratio is formed AFTER aggregation so no float
      // summation order exists to diverge
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") <= 1000.0, 1L).otherwise(0L))
            .as("le_1k"),
          sum(when(col("l_extendedprice") <= 5000.0, 1L).otherwise(0L))
            .as("le_5k"),
          sum(when(col("l_extendedprice") <= 20000.0, 1L).otherwise(0L))
            .as("le_20k"))
        .select(col("l_returnflag"), col("n"),
          round(col("le_1k").cast("double") / col("n"), 6).as("rank_1k"),
          round(col("le_5k").cast("double") / col("n"), 6).as("rank_5k"),
          round(col("le_20k").cast("double") / col("n"), 6).as("rank_20k"))
        .orderBy(col("l_returnflag"))),
    "h1_highlight" -> ((s, d) => {
      // ES highlighting: ±30-char fragment around the first
      // case-insensitive occurrence, the match wrapped in <em> tags —
      // a pure codegen'd string projection over the matching docs (the
      // fragmenter runs beside the scan; nothing widens the plan).
      val pos = instr(lower(col("text")), "customer")
      val start = greatest(pos - 30, lit(1))
      Tables.documents(s, d)
        .filter(pos > 0)
        .select(col("doc_id"),
          concat(
            col("text").substr(start, pos - start),
            lit("<em>"), col("text").substr(pos, lit(8)), lit("</em>"),
            col("text").substr(pos + 8, lit(30))).as("fragment"))
        .orderBy(col("doc_id"))
    }),

    // ---- ES agg surface, round 5: multi_terms / range / sampler /
    //      string_stats / boxplot+MAD / bucket_selector ----
    "a19_multi_terms" -> ((s, d) =>
      // ES multi_terms: terms over a COMPOSITE key, top buckets by
      // doc_count — one shuffle on the pair, the top-N cut after the
      // full agg (a total order under the cut keeps it deterministic)
      Tables.documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("doc_count"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("doc_count").desc, col("source"), col("lang"))
        .limit(10)),
    "a20_range_agg" -> ((s, d) => {
      // ES range aggregation: fixed [from, to) buckets over a numeric
      // field, ES-style "*-200" keys. One conditional-projection pass
      // + one tiny shuffle on the bucket id; empty buckets simply
      // don't appear (ES emits them, but the driver compare is
      // row-set-based so the present-bucket contract is the testable
      // one)
      val b = when(col("n_chars") < 200, "*-200")
        .when(col("n_chars") < 400, "200-400")
        .otherwise("400-*")
      Tables.documents(s, d)
        .groupBy(b.as("range_key"))
        .agg(count(lit(1)).as("doc_count"),
          sum(col("n_chars")).as("sum_chars"))
        .select(col("range_key"), col("doc_count"), col("sum_chars"),
          round(col("sum_chars").cast("double") / col("doc_count"), 6)
            .as("avg_chars"))
        .orderBy(col("range_key"))
    }),
    "a21_sampler" -> ((s, d) => {
      // ES diversified_sampler + sub-agg: at most 3 docs PER SOURCE
      // (the diversity field), then terms(lang) over the sample. The
      // "random" order is a Knuth multiplicative hash of doc_id — a
      // deterministic shard-sample both engines can replay exactly,
      // unlike ES's score-order heads. Window per source = one
      // shuffle on the diversity key; the sample is tiny thereafter.
      val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
      val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("doc_count"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),
    "a22_string_stats" -> ((s, d) =>
      // ES string_stats on the text field per lang: count, min/max/avg
      // length. Entropy is deliberately omitted: Σ p·log2(p) is a
      // float-log summation whose order differs per engine (the x24
      // determinism discipline) — the integer-exact statistics carry
      // the contract
      Tables.documents(s, d)
        .select(col("lang"), length(col("text")).cast("long").as("len"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("doc_count"),
          min(col("len")).as("min_len"), max(col("len")).as("max_len"),
          sum(col("len")).as("sum_len"))
        .select(col("lang"), col("doc_count"), col("min_len"),
          col("max_len"),
          round(col("sum_len").cast("double") / col("doc_count"), 6)
            .as("avg_len"))
        .orderBy(col("lang"))),
    "a23_boxplot" -> ((s, d) => {
      // ES boxplot + median_absolute_deviation aggs, EXACT percentiles
      // (Spark `percentile` ≡ DuckDB `quantile_cont`, same linear
      // interpolation). MAD needs the per-group median joined back for
      // a second pass — group count is tiny, so the median frame
      // broadcasts; the corpus shuffles twice on the same key, which
      // is the honest cost of a two-level order statistic at any scale
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("n_chars"))
      val box = docs.groupBy(col("lang"))
        .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"),
          expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D))").as("q"))
      val med = docs.groupBy(col("lang"))
        .agg(expr("percentile(n_chars, 0.5D)").as("med"))
      val mad = docs.join(broadcast(med), "lang")
        .select(col("lang"), abs(col("n_chars") - col("med")).as("dev"))
        .groupBy(col("lang"))
        .agg(expr("percentile(dev, 0.5D)").as("mad"))
      box.join(mad, "lang")
        .select(col("lang"), col("lo"), col("hi"),
          round(col("q").getItem(0), 6).as("q1"),
          round(col("q").getItem(1), 6).as("q2"),
          round(col("q").getItem(2), 6).as("q3"),
          round(col("q").getItem(2) - col("q").getItem(0), 6).as("iqr"),
          round(col("mad"), 6).as("mad"))
        .orderBy(col("lang"))
    }),
    "w11_bucket_selector" -> ((s, d) => {
      // ES bucket_selector + bucket_sort pipeline: keep day buckets
      // whose count exceeds the mean bucket count, then sort by count
      // desc and cut 5. The threshold compare is INTEGER-exact
      // (n·n_buckets > total) — no float mean reaches the cut. STRICTLY
      // above the MEAN (not a 1.1× margin) so the expected survivor
      // set is non-empty at every scale factor: on near-uniform data a
      // relative margin shrinks past the ±1/√n bucket noise as buckets
      // grow, and a gate whose expected output is zero rows can't
      // distinguish a broken filter from a correct one. The totals
      // frame is one row, broadcast over the ~30 buckets.
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.agg(sum(col("n")).as("tot"),
        count(lit(1)).as("nb"))
      daily.crossJoin(broadcast(tot))
        .filter(col("n") * col("nb") > col("tot"))
        .orderBy(col("n").desc, col("day"))
        .limit(5)
        .select(col("day"), col("n"))
    }),

    // ---- ES query surface, round 5: wildcard / terms_set /
    //      span_near ----
    "f12_wildcard" -> ((s, d) =>
      // ES wildcard / prefix / regexp term-level queries — all three
      // evaluated in one scan as codegen'd predicates (LIKE '%..%',
      // LIKE 'co%', RLIKE), the union filter keeping any match. The
      // prefix pattern is the sargable one (range-prunable at scan);
      // the infix/regexp forms are the honest full-scan ES also pays
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"),
          col("p_name").like("%dg%").as("wildcard"),
          col("p_name").startsWith("co").as("prefix"),
          col("p_name").rlike("b(olt|lue)").as("re_match"))
        .filter(col("wildcard") || col("prefix") || col("re_match"))
        .orderBy(col("p_partkey"))),
    "f13_terms_set" -> ((s, d) => {
      // ES terms_set: match when at least `required` of the given
      // terms appear in the analyzed field. Per-term array_contains
      // summed — row-local, codegen'd, no token explode
      val t = Analyzers.tokenize(lower(col("text")))
      val terms = Seq("spark", "data", "fast", "query")
      Tables.documents(s, d)
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          terms.map(w => array_contains(col("t"), w).cast("int"))
            .reduce(_ + _).cast("long").as("n_matched"))
        .filter(col("n_matched") >= 2)
        .orderBy(col("doc_id"))
    }),
    "f14_span_near" -> ((s, d) => {
      // ES span_near (slop=3): 'key' with 'scan' at distance 1..4 —
      // in_order, plus the in_order=false variant (either direction).
      // Same adjacency machinery as p10: the token array zipped with
      // its shifted self per offset, all inside one codegen'd
      // projection; no positional index, one corpus pass
      val t = Analyzers.tokenize(lower(col("text")))
      def near(a: String, b: String, at: Int) = coalesce(array_contains(
        zip_with(col("t"),
          slice(col("t"), lit(1 + at), greatest(size(col("t")) - at, lit(0))),
          (x, y) => x === a && y === b), true), lit(false))
      val ord = (1 to 4).map(near("key", "scan", _)).reduce(_ || _)
      val rev = (1 to 4).map(near("scan", "key", _)).reduce(_ || _)
      Tables.documents(s, d)
        // necessary-condition substring prefilter (the
        // TokenMatchPrefilter discipline, hand-applied): a span hit
        // requires BOTH tokens, and a token is always a substring of
        // the lowered text — docs without both skip tokenization and
        // all eight adjacency zips (memcmp vs regexp+8 array passes)
        .filter(lower(col("text")).contains("key") &&
          lower(col("text")).contains("scan"))
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"), ord.as("in_order"),
          (ord || rev).as("unordered"))
        .filter(col("unordered"))
        .orderBy(col("doc_id"))
    }),

    // ---- training-data pipeline, round 5 ----
    "x27_gopher_rules" -> ((s, d) =>
      // Gopher repetition/shape rules (TextStats.gopherRules):
      // integer-exact basis-point fractions, bounds tuned to split the
      // synthetic corpus
      TextStats.gopherRules(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "x28_ngram_novelty" -> ((s, d) =>
      // cross-corpus 5-gram novelty (TextStats.ngramNovelty): fraction
      // of a doc's distinct shingles first seen in this doc
      TextStats.ngramNovelty(Tables.documents(s, d)).orderBy(col("doc_id"))),

    // ST7: streaming gap sessions converge to the batch e4 answer
    "st7_stream_session" -> ((s, d) =>
      EventStream.runSessionWindows(s, d)),

    // ST9: the HLL++ sketch as a streaming aggregation — windowed
    // approximate distinct users, whose streaming estimate must equal
    // the batch sketch bit-for-bit (EventStream.runApproxUsers)
    "st9_stream_sketch" -> ((s, d) =>
      EventStream.runApproxUsers(s, d)),

    // ST14: cohort retention as a per-user streaming state machine —
    // the converged distinct-week sets fold to the e9 matrix
    // bit-for-bit (EventStream.runRetention; st9's full-outer
    // convergence contract)
    "st14_stream_retention" -> ((s, d) =>
      EventStream.runRetention(s, d)),

    "sm1_scripted_metric" -> ((s, d) => {
      // ES scripted_metric: a custom map/combine/reduce statistic the
      // stock aggs can't express — here an OLS slope of value vs time
      // per event_type, ENTIRELY in fixed-point integer arithmetic
      // (value floored to cents, time recentred to whole seconds, the
      // classic n·Σxy − Σx·Σy over n·Σx² − (Σx)² in decimal(38,0))
      // so both engines agree bit-for-bit — no float summation order
      // anywhere. The recentre min(ts) comes from a window over the
      // SAME key the groupBy shuffles on, so Catalyst reuses the
      // exchange: one shuffle total, partial aggs map-side.
      val w = Window.partitionBy(col("event_type"))
      val e = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("yc"),
          ((unix_micros(col("ts")) -
            min(unix_micros(col("ts"))).over(w)) / 1000000L)
            .cast("long").as("xs"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("xs")).as("sx"), sum(col("yc")).as("sy"),
          sum(col("xs") * col("xs")).as("sxx"),
          sum(col("xs") * col("yc")).as("sxy"))
        .select(col("event_type"), col("n"), col("sy"),
          // the degenerate-variance guard ALSO widens to decimal:
          // n·Σx² ≈ 9e20 at sf0.1 already exceeds Long range
          when(expr("cast(n as decimal(38,0)) * sxx > cast(sx as decimal(38,0)) * sx"),
            expr("""(cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)
                    * 1000000
                    div (cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx)"""))
            .otherwise(0L).cast("long").as("slope_e6"))
        .orderBy(col("event_type"))
    }),
    "w12_serial_diff" -> ((s, d) => {
      // ES serial_diff (lag 7) + moving max/min pipeline aggs over the
      // day histogram — like w7, the window runs over the ~30 bucket
      // rows AFTER the shuffle agg, integer counts only
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("day"))
      daily.select(col("day"), col("n"),
        (col("n") - lag(col("n"), 7).over(w)).as("serial_diff7"),
        max(col("n")).over(w.rowsBetween(-6, 0)).as("moving_max7"),
        min(col("n")).over(w.rowsBetween(-6, 0)).as("moving_min7"))
        .orderBy(col("day"))
    }),
    "e8_retention" -> ((s, d) => {
      // weekly cohort retention: users bucketed by first-event week,
      // distinct actives per (cohort, week offset). The cohort week
      // rides a window-min over user_id, then ONE distinct-agg on
      // (cohort, offset, user) collapses duplicate user-weeks before
      // the count — the standard two-level exact distinct at scale
      val w = Window.partitionBy(col("user_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("WEEK", col("ts")).as("week"),
          date_trunc("WEEK", min(col("ts")).over(w)).as("cohort_week"))
        .select(col("user_id"), col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7)
            .cast("long").as("week_offset"))
        .distinct()
      e.groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    "pc1_percolate" -> ((s, d) =>
      // ES percolator: stored queries matched against each document —
      // broadcast NL join + codegen'd array clauses, zero shuffle
      Percolate.percolate(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("query_id"))),
    "pc2_percolate_indexed" -> ((s, d) => {
      // the same percolator through candidate pre-selection: a
      // necessary-term inverted index over the stored queries prunes
      // the (doc, query) pairs before clause evaluation — identical
      // results (same oracle as pc1), broadcast-hash instead of
      // nested-loop, built for 1000s of stored queries. Must-term
      // choice uses real corpus df from the persisted text index's
      // term dictionary (rarest term = smallest candidate set — the
      // ES term-dictionary discipline), fetched for the query terms
      // only, never the whole vocabulary.
      val df = Percolate.dfForQueries(textIndexFor(s, d).termDf(s),
        Percolate.stored)
      Percolate.percolateIndexed(Tables.documents(s, d), Percolate.stored, df)
        .orderBy(col("doc_id"), col("query_id"))
    }),
    "st8_stream_percolate" -> ((s, d) =>
      // ST8: the percolator on the ingest stream (alerting) — stateless
      // micro-batches, append output ≡ the batch pc1 answer
      graft.streaming.PercolateStream.runPercolate(s, d)),
    "f15_query_string" -> ((s, d) => {
      // Lucene query_string syntax through the QueryString parser:
      // phrase adjacency, nesting, AND/OR/NOT — compiled to pure
      // Column algebra; the filter stays inside whole-stage codegen
      val q = """("hash join" OR (merge AND sort)) AND NOT slow"""
      Tables.documents(s, d)
        .withColumn("toks", Analyzers.tokenize(lower(col("text"))))
        .filter(graft.functions.QueryString.matches(q, col("toks")))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),
    "f16_dis_max" -> ((s, d) => {
      // ES dis_max, tie_breaker 0.3, two term clauses scored by raw tf:
      // score×10 = 10·max + 3·(sum − max) — exact integers end-to-end
      val toks = Analyzers.tokenize(lower(col("text")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(filter(toks, t => t === "join")).as("tf_a"),
          size(filter(toks, t => t === "stream")).as("tf_b"))
        .select(col("doc_id"),
          (greatest(col("tf_a"), col("tf_b")) * 10 +
            (col("tf_a") + col("tf_b") -
              greatest(col("tf_a"), col("tf_b"))) * 3)
            .cast("long").as("score_x10"))
        .filter(col("score_x10") > 0)
        .orderBy(col("score_x10").desc, col("doc_id"))
    }),
    "r1_rank_eval" -> ((s, d) => {
      // ES rank_eval: precision@10 and MRR@10 for three term-retrieval
      // runs, judged by a deterministic labeling rule (relevant ⇔
      // tf ≥ 2) both engines replay. Metrics are exact ×10^6 integers
      // (p = hits·10^5; MRR = 10^6 div first-relevant-rank); the run
      // itself is a total order (tf desc, doc_id) so rank boundaries
      // are engine-portable.
      import s.implicits._
      val queries = Seq(("q1", "spark"), ("q2", "vector"), ("q3", "merge"))
        .toDF("query_id", "term")
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), Analyzers.tokenize(lower(col("text"))).as("toks"))
        .crossJoin(broadcast(queries))
        .select(col("query_id"), col("doc_id"),
          size(filter(col("toks"), t => t === col("term"))).as("tf"))
        .filter(col("tf") > 0)
      tf.withColumn("rk",
          row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(col("tf").desc, col("doc_id"))))
        .groupBy(col("query_id"))
        .agg(
          sum(when(col("rk") <= 10 && col("tf") >= 2, 1L).otherwise(0L))
            .as("rel_in_top10"),
          min(when(col("tf") >= 2 && col("rk") <= 10, col("rk")))
            .as("first_rel"),
          sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("n_rel"))
        .select(col("query_id"),
          (col("rel_in_top10") * 100000L).as("p_at_10_e6"),
          coalesce(expr("cast(1000000 as bigint) div first_rel"), lit(0L))
            .as("mrr_e6"),
          col("n_rel"))
        .orderBy(col("query_id"))
    }),
    "r2_ndcg" -> ((s, d) => {
      // ES rank_eval dcg metric: NDCG@10 for the r1 runs, with the
      // 1/log2(rank+1) discount table FROZEN as integer ×10^6
      // literals (the metric spec — both engines read the SAME
      // table, so no libm log2 ulp can flip a comparison; binary
      // relevance ⇔ tf ≥ 2 as in r1). DCG sums the discount of each
      // relevant held rank; the ideal DCG fills ranks 1..min(n_rel,10)
      // — ndcg reported in exact basis points.
      import s.implicits._
      val wLit = array(Seq(1000000L, 630929L, 500000L, 430676L,
        386852L, 356207L, 333333L, 315464L, 301029L, 289064L)
        .map(lit): _*)
      val queries = Seq(("q1", "spark"), ("q2", "vector"), ("q3", "merge"))
        .toDF("query_id", "term")
      val tf = Tables.documents(s, d)
        .select(col("doc_id"),
          Analyzers.tokenize(lower(col("text"))).as("toks"))
        .crossJoin(broadcast(queries))
        .select(col("query_id"), col("doc_id"),
          size(filter(col("toks"), t => t === col("term"))).as("tf"))
        .filter(col("tf") > 0)
      tf.withColumn("rk",
          row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(col("tf").desc, col("doc_id"))))
        .groupBy(col("query_id"))
        .agg(
          sum(when(col("rk") <= 10 && col("tf") >= 2,
            element_at(wLit, col("rk"))).otherwise(0L)).as("dcg_e6"),
          sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("n_rel"))
        .select(col("query_id"), col("dcg_e6"), col("n_rel"),
          expr("""aggregate(slice(array(1000000L, 630929L, 500000L,
                    430676L, 386852L, 356207L, 333333L, 315464L,
                    301029L, 289064L), 1, int(least(n_rel, 10L))),
                  0L, (a, x) -> a + x)""").as("idcg_e6"))
        .select(col("query_id"), col("dcg_e6"), col("idcg_e6"),
          when(col("idcg_e6") > 0L,
            expr("dcg_e6 * 10000L div idcg_e6")).otherwise(0L)
            .as("ndcg_bp"))
        .orderBy(col("query_id"))
    }),
    "a24_matrix_stats" -> ((s, d) => {
      // ES matrix_stats over (quantity, extendedprice, discount) in
      // cents: ONE shuffle carries the exact integer sums (decimal for
      // the squares — Σp² overflows int64 at sf0.1 already); the
      // per-pair covariance/correlation are then SCALAR double ops on
      // those exact integers — no float summation order anywhere, so
      // round-6 is engine-portable. stack() unpivots the single stats
      // row into the pair matrix without re-aggregating.
      val li = Tables.lineitem(s, d).select(
        round(col("l_quantity") * 100, 0).cast("decimal(20,0)").as("q"),
        round(col("l_extendedprice") * 100, 0).cast("decimal(20,0)").as("p"),
        round(col("l_discount") * 100, 0).cast("decimal(20,0)").as("dd"))
      li.agg(
          count(lit(1)).cast("decimal(20,0)").as("n"),
          sum(col("q")).as("sq"), sum(col("p")).as("sp"),
          sum(col("dd")).as("sd"),
          sum(col("q") * col("q")).as("sqq"),
          sum(col("p") * col("p")).as("spp"),
          sum(col("dd") * col("dd")).as("sdd"),
          sum(col("q") * col("p")).as("sqp"),
          sum(col("q") * col("dd")).as("sqd"),
          sum(col("p") * col("dd")).as("spd"))
        .selectExpr("cast(n as bigint) as n",
          "cast(n * sqq - sq * sq as double) as vq",
          "cast(n * spp - sp * sp as double) as vp",
          "cast(n * sdd - sd * sd as double) as vd",
          "cast(n * sqp - sq * sp as double) as cqp",
          "cast(n * sqd - sq * sd as double) as cqd",
          "cast(n * spd - sp * sd as double) as cpd",
          "cast(sq div n as bigint) as mq_c",
          "cast(sp div n as bigint) as mp_c",
          "cast(sd div n as bigint) as md_c")
        .selectExpr("n",
          """stack(3,
               'quantity_price',    mq_c, mp_c,
                 round(cqp / n / n / 10000, 6),
                 round(cqp / sqrt(vq) / sqrt(vp), 6),
               'quantity_discount', mq_c, md_c,
                 round(cqd / n / n / 10000, 6),
                 round(cqd / sqrt(vq) / sqrt(vd), 6),
               'price_discount',    mp_c, md_c,
                 round(cpd / n / n / 10000, 6),
                 round(cpd / sqrt(vp) / sqrt(vd), 6))
             as (pair, mean_x_c, mean_y_c, cov_d2, corr)""")
        .select(col("pair"), col("n"), col("mean_x_c"), col("mean_y_c"),
          col("cov_d2"), col("corr"))
        .orderBy(col("pair"))
    }),
    "a25_auto_histogram" -> ((s, d) => {
      // ES auto_date_histogram (target ≤ 40 buckets): the interval is
      // picked from the minute/hour/day/week/month ladder off the data
      // span — a 1-row broadcast steers a constant-folded bucket
      // expression; the histogram itself is one shuffle agg
      val ev = Tables.events(s, d)
      val stats = ev.agg(
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("span_us"))
      ev.crossJoin(broadcast(stats))
        .withColumn("iv",
          when(col("span_us") <= 40L * 60 * 1000000L, "minute")
            .when(col("span_us") <= 40L * 3600 * 1000000L, "hour")
            .when(col("span_us") <= 40L * 86400 * 1000000L, "day")
            .when(col("span_us") <= 40L * 604800 * 1000000L, "week")
            .otherwise("month"))
        .groupBy(col("iv"),
          when(col("iv") === "minute", date_trunc("MINUTE", col("ts")))
            .when(col("iv") === "hour", date_trunc("HOUR", col("ts")))
            .when(col("iv") === "day", date_trunc("DAY", col("ts")))
            .when(col("iv") === "week", date_trunc("WEEK", col("ts")))
            .otherwise(date_trunc("MONTH", col("ts"))).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),
    "a26_nested_reverse" -> ((s, d) =>
      // ES nested agg + reverse_nested: per nested-item returnflag, the
      // nested hit count AND the count of distinct PARENT documents —
      // run over the MATERIALIZED nested docs, which since round 7 is
      // the maintained child-aggregate artifact (Denorm.childrenTable).
      // That is ES's own execution model: nested aggs read the nested
      // docs the INDEX stores, they never rebuild them per query — the
      // round-6 version paid the full denorm build here and was flagged
      // as the plan nobody should imitate. The oracle replays it
      // relationally from raw lineitem (equivalent by the denorm
      // construction).
      Denorm.childrenTable(s, d)
        .select(col("order_id").as("id"), explode(col("items")).as("it"))
        .groupBy(col("it.returnflag").as("returnflag"))
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("id")).as("n_docs"))
        .orderBy(col("returnflag"))),
    "a27_significant_text" -> ((s, d) => {
      // ES significant_text: JLH-scored tokens anomalously frequent in
      // the docs matching a query term (vs the whole corpus), per-doc
      // token dedup (the agg's filter_duplicate_text analog), query
      // term itself excluded, top 10. Counts are exact ints; JLH is
      // scalar double math on them, round-6. All counts read from the
      // TextIndex artifact: the foreground doc set is the query term's
      // postings, per-token background df is the term dictionary, and
      // corpus size is the stats row — no text re-analysis.
      val ix = textIndexFor(s, d)
      val fgDocs = ix.postings(s).filter(col("term") === "spark")
        .select(col("doc_id"), lit(true).as("fg"))
      val sizes = ix.corpus(s).select(col("n").cast("long").as("n_all"))
        .crossJoin(ix.termDf(s).filter(col("term") === "spark")
          .agg(coalesce(sum(col("df")), lit(0L)).as("n_fg")))
        .select(col("n_fg"), col("n_all"))
      val counts = ix.postings(s)
        .select(col("doc_id"), col("term").as("token"))
        .filter(col("token") =!= "spark")
        .join(broadcast(fgDocs), Seq("doc_id"), "left")
        .groupBy(col("token"))
        .agg(sum(when(col("fg"), 1L).otherwise(0L)).as("fg_df"),
          count(lit(1)).as("bg_df"))
        .filter(col("fg_df") > 0)
      counts.crossJoin(broadcast(sizes))
        .withColumn("score", round(
          (col("fg_df").cast("double") / col("n_fg") -
            col("bg_df").cast("double") / col("n_all")) *
            (col("fg_df").cast("double") / col("n_fg")) /
            (col("bg_df").cast("double") / col("n_all")), 6))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score").desc, col("token"))))
        .filter(col("rk") <= 10)
        .select(col("token"), col("fg_df"), col("bg_df"), col("score"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    }),
    "a28_ttest" -> ((s, d) =>
      // ES t_test (Welch, unpaired) between click and error values:
      // exact integer sums in cents through ONE conditional agg (no
      // two-branch re-scan), then the t statistic as scalar double ops
      // on those exact integers — identical IEEE sequence both
      // engines, round-6
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .select(when(col("event_type") === "click", 1).otherwise(0).as("g"),
          round(col("value") * 100, 0).cast("long").as("vc"))
        .agg(
          sum(col("g")).cast("long").as("n1"),
          sum(lit(1) - col("g")).cast("long").as("n2"),
          sum(col("vc") * col("g")).as("s1"),
          sum(col("vc") * (lit(1) - col("g"))).as("s2"),
          sum(col("vc") * col("vc") * col("g")).as("ss1"),
          sum(col("vc") * col("vc") * (lit(1) - col("g"))).as("ss2"))
        .selectExpr("n1", "n2",
          """round((cast(s1 as double) / n1 - cast(s2 as double) / n2)
                   / 100, 6) as mean_diff_d""",
          """round((cast(s1 as double) / n1 - cast(s2 as double) / n2)
                   / sqrt((cast(ss1 as double) - cast(s1 as double) * s1 / n1)
                            / (n1 - 1) / n1
                          + (cast(ss2 as double) - cast(s2 as double) * s2 / n2)
                            / (n2 - 1) / n2), 6) as t_stat""")),
    "a29_rate" -> ((s, d) =>
      // ES rate agg: monthly buckets normalized to per-day rates using
      // the bucket's true day count — exact ×10^6 integer division
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("MONTH", col("ts")).as("month"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("month"), col("n"),
          expr("(n * 1000000) div dayofmonth(last_day(month))")
            .as("per_day_e6"))
        .orderBy(col("event_type"), col("month"))),
    "a36_bucket_sort" -> ((s, d) => {
      // ES bucket_sort pipeline agg: re-sort the date-histogram
      // buckets by a metric and paginate (from=2, size=5) — the
      // offset window runs over the ~30 POST-AGG bucket rows (the
      // w13/w7 single-partition-after-agg discipline), never raw
      // events; value sums in exact cents like the a-family
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      daily.withColumn("rk", row_number()
          .over(Window.orderBy(col("cents").desc, col("day"))).cast("long"))
        .filter(col("rk") > 2 && col("rk") <= 7)
        .orderBy(col("rk"))
    }),
    "a39_bucket_script" -> ((s, d) =>
      // ES bucket_script pipeline agg: a per-bucket derived metric
      // across two sibling aggregations — the purchase share of each
      // day's value in exact basis points (one shuffle carries both
      // conditional sums; the ratio is post-agg row-local arithmetic
      // over ~30 bucket rows)
      Tables.events(s, d)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long"))
            .as("total_cents"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100 + 0.5).cast("long")).otherwise(0L))
            .as("purchase_cents"))
        .select(col("day"), col("total_cents"), col("purchase_cents"),
          expr("purchase_cents * 10000L div greatest(total_cents, 1L)")
            .as("share_bp"))
        .orderBy(col("day"))),
    "a38_percentiles_bucket" -> ((s, d) => {
      // ES percentiles_bucket pipeline agg: exact quartiles OF the
      // daily bucket metric (never raw events) — ~30 post-agg rows
      // feed one percentile aggregate in the ×100-cents integer
      // domain; quarter interpolations are dyadic (k, k.25, k.5,
      // k.75 — exactly representable), and DuckDB's quantile_cont
      // interpolates identically (the a35 discipline)
      Tables.events(s, d)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
        .agg(count(lit(1)).as("n_buckets"),
          expr("percentile(cents, 0.25d)").as("p25"),
          expr("percentile(cents, 0.5d)").as("p50"),
          expr("percentile(cents, 0.75d)").as("p75"))
    }),
    "a35_mad" -> ((s, d) => {
      // ES median_absolute_deviation agg (the robust dispersion metric
      // next to a23_boxplot's quartiles): per group, the median of
      // |x − median(x)| — two EXACT distributed medians in the x20
      // ×100-cents BIGINT domain. Spark's `percentile` is the exact
      // (type-7 interpolating) percentile; on cents the interpolated
      // midpoints are k or k+0.5, exactly representable, and DuckDB's
      // median() interpolates identically, so no float divergence can
      // reach the compare. Two group shuffles (med, then mad) with
      // map-side partials; group count is dictionary-sized (5 rows),
      // the per-group sorted-percentile state is bounded by the
      // group's value multiset — the same trade a23/w10 document.
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val med = o.groupBy(col("prio"))
        .agg(expr("percentile(cents, 0.5d)").as("med_cents"),
          count(lit(1)).as("n"))
      o.join(broadcast(med), Seq("prio"))
        .select(col("prio"), col("n"), col("med_cents"),
          abs(col("cents") - col("med_cents")).as("dev"))
        .groupBy(col("prio"), col("n"), col("med_cents"))
        .agg(expr("percentile(dev, 0.5d)").as("mad_cents"))
        .orderBy(col("prio"))
    }),

    "geo1_geohash_grid" -> ((s, d) =>
      // ES geo_bounding_box + geohash_grid (precision 2): REAL geohash
      // bit-interleave in pure integer arithmetic over synthetic
      // microdegree points; box prunes before the one cell shuffle
      Geo.geohashGrid(Tables.customer(s, d), col("c_custkey"))
        .orderBy(col("rk"))),
    "geo2_geo_distance" -> ((s, d) =>
      // ES geo_distance range + nearest-k sort in exact squared-degree
      // integers (trig-free — no libm divergence); TakeOrderedAndProject
      Geo.nearest(Tables.customer(s, d), col("c_custkey"),
        col("c_custkey"))),
    "geo3_centroid" -> ((s, d) => {
      // ES geo_centroid per geohash cell, in the family's exact
      // integer space: per-cell floored mean of the microdegree
      // coordinates (sums ≤ 1.4e11 are exact in the double divide,
      // floor matches DuckDB bit-for-bit — the axisBits argument).
      // One cell shuffle with map-side partial sums, like geo1.
      val pts = Tables.customer(s, d)
        .select(Geo.latUdeg(col("c_custkey")).as("lat"),
          Geo.lonUdeg(col("c_custkey")).as("lon"))
        .filter(col("lat").between(-45000000L, 45000000L) &&
          col("lon").between(-90000000L, 90000000L))
      pts.select(substring(Geo.geohash6(col("lat"), col("lon")), 1, 2)
          .as("cell"), col("lat"), col("lon"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("lat")).as("slat"),
          sum(col("lon")).as("slon"))
        .select(col("cell"), col("n"),
          floor(col("slat") / col("n")).cast("long").as("cen_lat_udeg"),
          floor(col("slon") / col("n")).cast("long").as("cen_lon_udeg"))
        .orderBy(col("n").desc, col("cell")).limit(10)
    }),
    "geo4_geo_bounds" -> ((s, d) => {
      // ES geo_bounds agg per geohash bucket: the tightest lat/lon box
      // enclosing each cell's box-filtered points, in the geo family's
      // exact microdegree-integer space (no trig, no floats — min/max
      // over BIGINT microdegrees cross-engine-exact by construction).
      // One cell shuffle with map-side min/max partials; at 100 TB the
      // partial aggregation reduces each map task to |cells| rows
      // before anything moves.
      val pts = Tables.customer(s, d)
        .select(Geo.latUdeg(col("c_custkey")).as("lat"),
          Geo.lonUdeg(col("c_custkey")).as("lon"))
        .filter(col("lat").between(-45000000L, 45000000L) &&
          col("lon").between(-90000000L, 90000000L))
      pts.select(substring(Geo.geohash6(col("lat"), col("lon")), 1, 2)
          .as("cell"), col("lat"), col("lon"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          max(col("lat")).as("top"), min(col("lat")).as("bottom"),
          min(col("lon")).as("left"), max(col("lon")).as("right"))
        .orderBy(col("n").desc, col("cell")).limit(10)
    }),
    "w13_moving_percentiles" -> ((s, d) => {
      // ES moving_percentiles: trailing-7-bucket median of the daily
      // counts — integer counts, type-7 median as an EXACT ×2 integer
      // (odd window → element, even → midpoint sum); window runs over
      // the ~30 post-agg bucket rows like w7/w12
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("arr", sort_array(collect_list(col("n")).over(w)))
        .select(col("day"), col("n"),
          expr("""cast(CASE WHEN size(arr) % 2 = 1
                       THEN element_at(arr, cast((size(arr) + 1) div 2 as int)) * 2
                       ELSE element_at(arr, cast(size(arr) div 2 as int))
                            + element_at(arr, cast(size(arr) div 2 + 1 as int))
                  END as bigint)""").as("med7_x2"))
        .orderBy(col("day"))
    }),
    "t15_term_suggest" -> ((s, d) => {
      // ES term suggester: correction candidates for misspelled inputs
      // from the corpus vocabulary — edit distance ≤ 2 with the length
      // pre-filter (two integer ops prune most of the vocab before any
      // levenshtein runs), ranked (distance, freq desc, term), top 3.
      // The vocab agg is ONE shuffle; the 4 input terms broadcast to
      // it — never the reverse.
      import s.implicits._
      val inputs = Seq("custmer", "streem", "windoq", "qury", "ke")
        .toDF("input") // "ke" is deliberately ambiguous: key/a/the all
                       // within distance 2 — exercises the rank ties
      Tables.documents(s, d)
        .select(explode(Analyzers.tokenize(lower(col("text")))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .join(broadcast(inputs),
          abs(length(col("term")) - length(col("input"))) <= 2 &&
            levenshtein(col("term"), col("input")) <= 2)
        .withColumn("dist",
          levenshtein(col("term"), col("input")).cast("long"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("input"))
          .orderBy(col("dist"), col("freq").desc, col("term"))))
        .filter(col("rk") <= 3)
        .select(col("input"), col("term"), col("dist"), col("freq"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("input"), col("rk"))
    }),
    "t16_phrase_suggest" -> ((s, d) => {
      // ES phrase suggester: per-position term-suggester candidates for
      // misspelled two-word phrases, whole-phrase candidates scored by
      // the corpus BIGRAM frequency (an exact integer language model —
      // no float log-probs to diverge cross-engine), ranked (bigram
      // freq desc, total edit distance, summed unigram freq desc,
      // words). "sart a" is deliberately ambiguous (sort/part both
      // distance 1) — context picks "sort a", the frequent bigram.
      // Scale shape: vocab + bigram tables are the only corpus
      // shuffles (combiner-friendly counts); candidate generation
      // broadcasts the INPUTS to the vocab, and the tiny pair frame
      // broadcast-joins the bigram counts.
      import s.implicits._
      val inputs = Seq((1L, "custmer", "joun"), (2L, "sart", "a"))
        .toDF("pid", "w1", "w2")
      val toks = Tables.documents(s, d)
        .select(Analyzers.tokenize(lower(col("text"))).as("toks"))
      val vocab = toks.select(explode(col("toks")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
      // size(toks) < 2 (empty/punctuation-only text) would make the
      // slice length negative — a runtime error, where the oracle's
      // generate_series(1, len-1) is simply empty. Filter first.
      val bigrams = toks.filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .groupBy(col("p.w1").as("b1"), col("p.w2").as("b2"))
        .agg(count(lit(1)).as("bg_freq"))
      def cands(w: String, c: String, dN: String, fN: String, rN: String) =
        vocab.join(broadcast(inputs),
            abs(length(col("term")) - length(col(w))) <= 1 &&
              levenshtein(col("term"), col(w)) <= 1)
          .select(col("pid"), col("term").as(c),
            levenshtein(col("term"), col(w)).cast("long").as(dN),
            col("freq").as(fN),
            row_number().over(Window.partitionBy(col("pid"), col(w))
              .orderBy(levenshtein(col("term"), col(w)),
                col("freq").desc, col("term"))).as(rN))
          .filter(col(rN) <= 5).drop(rN)
      val pairs = cands("w1", "c1", "d1", "f1", "rk1")
        .join(cands("w2", "c2", "d2", "f2", "rk2"), "pid")
      pairs
        .join(bigrams, col("c1") === col("b1") && col("c2") === col("b2"),
          "left")
        .withColumn("bg_freq", coalesce(col("bg_freq"), lit(0L)))
        .withColumn("rk", row_number().over(Window.partitionBy(col("pid"))
          .orderBy(col("bg_freq").desc, (col("d1") + col("d2")).asc,
            (col("f1") + col("f2")).desc, col("c1"), col("c2")))
          .cast("long"))
        .filter(col("rk") <= 3)
        .select(col("pid"), col("c1").as("sug1"), col("c2").as("sug2"),
          col("bg_freq"), col("rk"))
        .orderBy(col("pid"), col("rk"))
    }),
    "t17_search_as_you_type" -> ((s, d) =>
      // ES search_as_you_type / match_bool_prefix: "merge ba…" — the
      // full term scores BM25, the still-being-typed last term
      // matches as a constant-score prefix; both legs index-served
      // (one pushed term-equality read + one SARGable term-range
      // read; Search.matchBoolPrefix scaladoc)
      Search.matchBoolPrefix(s, textIndexFor(s, d),
        terms = Seq("merge"), prefix = "ba", k = 10)),
    "opt2_token_prefilter" -> ((s, d) => {
      // TokenMatchPrefilter on a LIVE session (same clone-session
      // isolation as opt1): a naive boolean term query over analyzed
      // text executes with the memcmp substring prefilter conjoined
      // ahead of the tokenizer — including the OR-propagated
      // contains('merge') OR contains('vector') arm (plan-locked in
      // TokenPrefilterSpec). The rewrite is verdict-preserving by
      // construction, so the oracle replays the plain term query.
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        Seq(graft.plans.TokenMatchPrefilter)
      val tk = Analyzers.tokenize(lower(col("text")))
      Tables.documents(s2, d)
        .filter((array_contains(tk, "merge") && array_contains(tk, "sort"))
          || array_contains(tk, "vector"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),
    "a30_grouping_sets" -> ((s, d) => {
      // explicit GROUPING SETS — the generalization that a4's rollup
      // and a7's cube specialize: mixed-granularity totals in ONE
      // expand + shuffle, revenue exact in cents, grouping_id making
      // each stratum hash-stable alongside the 'ALL' markers
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               cast(grouping_id(o_orderstatus, o_orderpriority) as bigint)
                 AS gid,
               count(*) AS n,
               sum(cast(round(o_totalprice * 100, 0) as bigint)) AS cents
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, status, priority""")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s10_match_all" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "s9_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "s11_point_lookup" -> "SELECT * FROM orders WHERE o_orderkey = 42",
    // s22: a row per requested id, found=false for misses
    "s22_mget" ->
      """WITH req(doc_id) AS (VALUES (7),(42),(123),(424242),(9999999)),
          h AS (SELECT doc_id, lang, n_chars FROM documents
                WHERE doc_id IN (7, 42, 123, 424242, 9999999))
          SELECT req.doc_id::BIGINT AS doc_id,
                 h.doc_id IS NOT NULL AS found, h.lang, h.n_chars
          FROM req LEFT JOIN h ON req.doc_id = h.doc_id
          ORDER BY req.doc_id""",
    "s3_keyset_chunk" ->
      "SELECT * FROM orders WHERE o_orderkey > 500 ORDER BY o_orderkey LIMIT 100",
    "s8_merge_update" ->
      """SELECT o.o_orderkey, round(o.o_totalprice + coalesce(d.qty, 0.0), 2) AS new_total
         FROM orders o LEFT JOIN (SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem GROUP BY 1) d
         ON d.l_orderkey = o.o_orderkey ORDER BY o.o_orderkey""",
    "s8b_versioned_update" ->
      """SELECT c.o_orderkey,
                COALESCE(u.expected_seq = c.seq_no, FALSE) AS applied,
                CASE WHEN u.expected_seq = c.seq_no
                     THEN c.seq_no + 1 ELSE c.seq_no END AS seq_no_after,
                round(CASE WHEN u.expected_seq = c.seq_no
                           THEN c.o_totalprice + 10.0
                           ELSE c.o_totalprice END, 2) AS total_after
         FROM (SELECT o_orderkey, o_totalprice,
                      o_orderkey % 5 + 1 AS seq_no FROM orders) c
         LEFT JOIN (SELECT o_orderkey AS u_key,
                           CASE WHEN o_orderkey % 3 = 0
                                THEN o_orderkey % 5 + 1
                                ELSE o_orderkey % 5 END AS expected_seq
                    FROM orders WHERE o_orderkey % 2 = 0) u
         ON c.o_orderkey = u.u_key
         ORDER BY c.o_orderkey""",
    // s14: the readback rides the alias — matching the recomputed v2
    // aggregates proves the flip landed; lifecycle facts as constants
    "s14_alias_swap" ->
      """SELECT event_type, count(*)::BIGINT AS n,
                sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents,
                'v1' AS alias_before, 'v2' AS alias_after,
                TRUE AS v1_retained
         FROM events GROUP BY 1 ORDER BY 1""",
    // z3: the values are a plain join-aggregate; the co-location claim
    // itself is enforced by the in-query REQUIRE on the executed plan
    "z3_bucketed_join" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n_items,
                sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))::BIGINT AS rev_cents
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",
    "s2_streamed_fetch" ->
      """SELECT count(*)::BIGINT AS fetched_rows,
                sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS total_cents
         FROM orders""",
    "s4_create_table" ->
      """SELECT count(*)::BIGINT AS n_rows, 'r_name,r_regionkey' AS cols
         FROM region""",
    "s5_exists_drop" ->
      """SELECT false AS exists_before, true AS exists_created,
                true AS dropped, false AS exists_after,
                false AS dropped_again""",
    "s6_bulk_roundtrip" ->
      """SELECT 3::BIGINT AS n_shards, count(*)::BIGINT AS n_rows,
                count(DISTINCT c_custkey)::BIGINT AS n_ids,
                min(c_custkey) AS min_id, max(c_custkey) AS max_id
         FROM customer""",
    "s7_sink_ack" ->
      """SELECT count(*)::BIGINT AS written, count(*)::BIGINT AS committed,
                true AS acked
         FROM orders""",
    "s12_compact" ->
      """SELECT 24::BIGINT AS files_before,
                ceil(count(*)::DOUBLE / 5000)::BIGINT AS files_after,
                count(*)::BIGINT AS rows_after
         FROM documents""",
    "s13_partition_prune" ->
      """SELECT count(*)::BIGINT AS n_purchase,
                sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS purchase_cents
         FROM events WHERE event_type = 'purchase'""",
    "n10_incremental_add" ->
      // constant-TRUE invariant contract (the n-family pattern): the
      // appended twin is provably the unique exact-cosine top hit
      """SELECT qid::BIGINT AS qid, true AS hit_is_twin, true AS cos_is_one
         FROM (VALUES (1), (101), (202)) t(qid) ORDER BY qid""",
    // st11: the n10 contract through the STREAMED append path
    "st11_stream_vectors" ->
      """SELECT qid::BIGINT AS qid, true AS hit_is_twin, true AS cos_is_one,
                true AS multi_batch
         FROM (VALUES (1), (101), (202)) t(qid) ORDER BY qid""",
    "s18_rollover" ->
      """WITH RECURSIVE w AS (SELECT date_trunc('week', ts) AS wk, count(*)::BIGINT AS n
                              FROM events GROUP BY 1),
          o AS (SELECT wk, n, row_number() OVER (ORDER BY wk)::INT AS rn FROM w),
          seg AS (SELECT 1::INT AS rn, 1::INT AS idx,
                         (SELECT n FROM o WHERE rn = 1) AS acc
                  UNION ALL
                  SELECT o.rn,
                         (CASE WHEN seg.acc >= 5000 THEN seg.idx + 1 ELSE seg.idx END)::INT,
                         (CASE WHEN seg.acc >= 5000 THEN 0 ELSE seg.acc END) + o.n
                  FROM seg JOIN o ON o.rn = seg.rn + 1),
          peridx AS (SELECT seg.idx, sum(o.n)::BIGINT AS n_docs
                     FROM seg JOIN o ON o.rn = seg.rn GROUP BY 1),
          wr AS (SELECT CASE WHEN acc >= 5000 THEN idx + 1 ELSE idx END AS widx
                 FROM seg ORDER BY rn DESC LIMIT 1)
          SELECT 'v' || idx AS index_name, n_docs,
                 idx = (SELECT widx FROM wr) AS is_write_index
          FROM peridx
          UNION ALL
          SELECT 'v' || widx, 0::BIGINT, true FROM wr
          WHERE widx > (SELECT max(idx) FROM peridx)
          ORDER BY index_name""",
    // s19: the s18 greedy segmentation replay, filtered to the
    // keep-last-2 retention window (live write index + rollback
    // predecessor) — what survives the ILM delete-phase sweep
    "s19_rollover_gc" ->
      """WITH RECURSIVE w AS (SELECT date_trunc('week', ts) AS wk, count(*)::BIGINT AS n
                              FROM events GROUP BY 1),
          o AS (SELECT wk, n, row_number() OVER (ORDER BY wk)::INT AS rn FROM w),
          seg AS (SELECT 1::INT AS rn, 1::INT AS idx,
                         (SELECT n FROM o WHERE rn = 1) AS acc
                  UNION ALL
                  SELECT o.rn,
                         (CASE WHEN seg.acc >= 5000 THEN seg.idx + 1 ELSE seg.idx END)::INT,
                         (CASE WHEN seg.acc >= 5000 THEN 0 ELSE seg.acc END) + o.n
                  FROM seg JOIN o ON o.rn = seg.rn + 1),
          peridx AS (SELECT seg.idx, sum(o.n)::BIGINT AS n_docs
                     FROM seg JOIN o ON o.rn = seg.rn GROUP BY 1),
          wr AS (SELECT CASE WHEN acc >= 5000 THEN idx + 1 ELSE idx END AS widx
                 FROM seg ORDER BY rn DESC LIMIT 1),
          allv AS (SELECT idx, 'v' || idx AS index_name, n_docs,
                          idx = (SELECT widx FROM wr) AS is_write_index
                   FROM peridx
                   UNION ALL
                   SELECT widx, 'v' || widx, 0::BIGINT, true FROM wr
                   WHERE widx > (SELECT max(idx) FROM peridx))
          SELECT index_name, n_docs, is_write_index FROM allv
          WHERE idx >= (SELECT widx FROM wr) - 1
          ORDER BY index_name""",
    // s21: the restored index must answer exactly like the source
    // table it was snapshotted from
    "s21_snapshot_restore" ->
      """SELECT count(*)::BIGINT AS n_rows,
                count(DISTINCT c_custkey)::BIGINT AS n_ids,
                sum(c_custkey)::BIGINT AS sum_key,
                true AS files_match
         FROM customer""",
    // s22: the cluster-restored index must answer exactly like the
    // source table — same gate as s21, distributed byte path
    "s22_snapshot_distributed" ->
      """SELECT count(*)::BIGINT AS n_rows,
                count(DISTINCT s_suppkey)::BIGINT AS n_ids,
                sum(s_suppkey)::BIGINT AS sum_key,
                true AS files_match
         FROM supplier""",
    // s23: single-host runtime ⇒ the selector must pick the pool arm
    "s23_snapshot_auto" ->
      """SELECT count(*)::BIGINT AS n_rows,
                count(DISTINCT p_partkey)::BIGINT AS n_ids,
                sum(p_partkey)::BIGINT AS sum_key,
                true AS files_match,
                true AS used_pool
         FROM part""",
    // j17: the e2 sessionize replay with bounds, paired by the direct
    // overlap predicate (the oracle affords the quadratic join)
    "j17_overlap_join" ->
      """WITH g AS (SELECT user_id, ts,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                                THEN 1 ELSE 0 END AS new_s
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
                FROM g),
          sess AS (SELECT user_id, session_idx, min(ts) AS st, max(ts) AS en
                   FROM s GROUP BY 1, 2),
          pr AS (SELECT a.user_id AS u1, a.session_idx AS i1,
                        b.user_id AS u2, b.session_idx AS i2,
                        date_diff('second', greatest(a.st, b.st),
                                  least(a.en, b.en))::BIGINT AS ov_s
                 FROM sess a JOIN sess b
                   ON a.user_id < b.user_id
                  AND a.st <= b.en AND b.st <= a.en)
          SELECT u1, u2, count(*)::BIGINT AS n_overlaps,
                 sum(ov_s)::BIGINT AS overlap_s
          FROM pr GROUP BY 1, 2
          ORDER BY overlap_s DESC, u1, u2 LIMIT 15""",
    // j17b: the capped variant replays the hour-bucket banding
    // EXPLICITLY (j17's oracle can skip it — uncapped banding is
    // lossless — but the cap is defined ON the buckets): per bucket
    // the earliest-first prefix of 5 survives, pairs must share a
    // surviving bucket, DISTINCT collapses multi-bucket co-occupancy
    "j17b_overlap_capped" ->
      """WITH g AS (SELECT user_id, ts,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                                THEN 1 ELSE 0 END AS new_s
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
                FROM g),
          sess AS (SELECT user_id, session_idx, min(ts) AS st, max(ts) AS en
                   FROM s GROUP BY 1, 2),
          bb AS (SELECT user_id, session_idx, st, en,
                        unnest(generate_series(date_trunc('hour', st)::TIMESTAMP,
                                               date_trunc('hour', en)::TIMESTAMP,
                                               INTERVAL 1 HOUR)) AS hb
                 FROM sess),
          cap AS (SELECT * FROM (SELECT *, row_number() OVER
                                   (PARTITION BY hb
                                    ORDER BY st, user_id, session_idx) AS rk
                                 FROM bb) WHERE rk <= 5),
          pr AS (SELECT DISTINCT a.user_id AS u1, a.session_idx AS i1,
                        b.user_id AS u2, b.session_idx AS i2,
                        date_diff('second', greatest(a.st, b.st),
                                  least(a.en, b.en))::BIGINT AS ov_s
                 FROM cap a JOIN cap b
                   ON a.hb = b.hb AND a.user_id < b.user_id
                  AND a.st <= b.en AND b.st <= a.en)
          SELECT u1, u2, count(*)::BIGINT AS n_overlaps,
                 sum(ov_s)::BIGINT AS overlap_s
          FROM pr GROUP BY 1, 2
          ORDER BY overlap_s DESC, u1, u2 LIMIT 15""",
    // s20: the _reindex response replay — seed slice noops at original
    // values, the rest arrives with the +1000 script applied
    "s20_reindex" ->
      """WITH src AS (SELECT doc_id, n_chars FROM documents),
          seed AS (SELECT * FROM src WHERE doc_id % 3 = 0),
          fresh AS (SELECT * FROM src WHERE doc_id % 3 <> 0)
          SELECT (SELECT count(*) FROM src)::BIGINT AS total,
                 (SELECT count(*) FROM fresh)::BIGINT AS created,
                 (SELECT count(*) FROM seed)::BIGINT AS noops,
                 (SELECT count(*) FROM src)::BIGINT AS dest_rows,
                 ((SELECT sum(n_chars) FROM seed)
                  + (SELECT sum(n_chars + 1000) FROM fresh))::BIGINT
                   AS sum_chars""",
    "f19_explain" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(list_filter(toks, x -> x = 'spark'))::INT AS tf,
                       len(toks)::INT AS len FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM p)
          SELECT doc_id, tf, len, df::BIGINT AS df,
                 round(ln((n - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf,
                 round((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6) AS tf_norm,
                 round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                       (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6) AS bm25
          FROM p, s WHERE tf > 0
          ORDER BY bm25 DESC, doc_id LIMIT 10""",
    "f18_msearch" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'merge'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf1,
                       len(list_filter(toks, x -> x = 'window'))::INT AS tf2
                FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
                       sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2
                FROM p),
          u AS (SELECT 'q_merge' AS query_id, doc_id,
                       round(ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                             (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6) AS score
                FROM p, s WHERE tf0 > 0
                UNION ALL
                SELECT 'q_spark', doc_id,
                       round(ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                             (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6)
                FROM p, s WHERE tf1 > 0
                UNION ALL
                SELECT 'q_window', doc_id,
                       round(ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) *
                             (tf2 * 2.2) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6)
                FROM p, s WHERE tf2 > 0),
          r AS (SELECT query_id, doc_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, doc_id)::BIGINT AS rank
                FROM u)
          SELECT query_id, doc_id, score, rank FROM r
          WHERE rank <= 5 ORDER BY query_id, rank""",
    "f21_terms_enum" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
          SELECT term, count(*)::BIGINT AS df FROM p
          WHERE term LIKE 's%' GROUP BY term
          ORDER BY term LIMIT 10""",
    // f28: the sparse dot product replayed from tokens — per-term
    // tf and df recomputed, same integer divisions
    "f28_sparse_vector" ->
      s"""WITH q(term, q_w) AS (VALUES ('spark', 800000), ('merge', 500000),
                                       ('vector', 250000)),
          t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, tok AS term, count(*)::BIGINT AS tf
                FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
                GROUP BY 1, 2),
          dfs AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY 1),
          sc AS (SELECT p.doc_id,
                        (q.q_w * ((p.tf * 1000000) // dfs.df)) AS c
                 FROM p JOIN q USING (term) JOIN dfs ON p.term = dfs.term)
          SELECT doc_id, (sum(c) // 1000000)::BIGINT AS score_e6,
                 count(*)::BIGINT AS n_terms
          FROM sc GROUP BY doc_id
          ORDER BY score_e6 DESC, doc_id LIMIT 15""",
    // f27: the f3 BM25 replay for 'spark' with the 0.5 demotion
    // factor on docs that also contain 'slow'
    "f27_boosting" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(list_filter(toks, x -> x = 'spark'))::INT AS tf,
                       len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'slow')) > 0 AS demoted
                FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM p)
          SELECT doc_id, demoted,
                 round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                       (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)) *
                       (CASE WHEN demoted THEN 0.5 ELSE 1.0 END), 6) AS score
          FROM p, s WHERE tf > 0
          ORDER BY score DESC, doc_id LIMIT 15""",
    // f26: the token replay of the dictionary-served wildcard — per
    // doc, distinct '%er' terms and their summed frequency
    "f26_suffix_wildcard" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
                FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
                WHERE tok LIKE '%er' GROUP BY 1, 2)
          SELECT doc_id, count(*)::BIGINT AS n_terms,
                 sum(tf)::BIGINT AS sum_tf
          FROM p GROUP BY doc_id
          ORDER BY sum_tf DESC, doc_id LIMIT 15""",
    // f22: per-term tf + 0-based first position of doc 42 (DuckDB's
    // parallel unnest zips term with its 1-based subscript), df across
    // the corpus from the distinct-membership replay
    "f22_termvectors" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          d AS (SELECT unnest(toks) AS term,
                       unnest(generate_series(1, len(toks))) AS pos
                FROM t WHERE doc_id = 42),
          g AS (SELECT term, count(*)::BIGINT AS tf,
                       (min(pos) - 1)::BIGINT AS first_pos
                FROM d GROUP BY term),
          df AS (SELECT term, count(*)::BIGINT AS df
                 FROM (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
                 GROUP BY term)
          SELECT g.term, g.tf, g.first_pos, df.df
          FROM g JOIN df USING (term) ORDER BY g.term""",
    // f23: the x11 md5 uniform replayed on (seed, doc_id)
    "f23_random_score" ->
      """SELECT doc_id,
                (('0x' || substr(md5('rs42:' || doc_id::VARCHAR), 1, 8))::BIGINT
                 % 1000000) AS score_e6
         FROM documents WHERE lang = 'en'
         ORDER BY score_e6 DESC, doc_id LIMIT 20""",
    // f24: the integer saturation curve replayed verbatim
    "f24_rank_feature" ->
      """SELECT doc_id,
                (n_chars * 1000000 // (n_chars + 500))::BIGINT AS sat_e6
         FROM documents WHERE lang = 'de'
         ORDER BY sat_e6 DESC, doc_id LIMIT 15""",
    // f25: pinned literals first, then the f3 BM25 replay minus the
    // pinned ids, rank offset by the pinned count
    "f25_pinned" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(list_filter(toks, x -> x = 'spark'))::INT AS tf,
                       len(toks)::INT AS len FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM p),
          org AS (SELECT doc_id,
                         round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                               (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6) AS bm25
                  FROM p, s
                  WHERE tf > 0 AND doc_id NOT IN (5, 17, 29)
                  ORDER BY bm25 DESC, doc_id LIMIT 10),
          orgr AS (SELECT (row_number() OVER (ORDER BY bm25 DESC, doc_id) + 3)::BIGINT AS rank,
                          doc_id, false AS pinned, bm25
                   FROM org)
          SELECT * FROM (
            SELECT 1::BIGINT AS rank, 5::BIGINT AS doc_id, true AS pinned,
                   1000000000.0::DOUBLE AS bm25
            UNION ALL SELECT 2::BIGINT, 17::BIGINT, true, 1000000000.0::DOUBLE
            UNION ALL SELECT 3::BIGINT, 29::BIGINT, true, 1000000000.0::DOUBLE
            UNION ALL SELECT rank, doc_id, pinned, bm25 FROM orgr)
          ORDER BY rank""",
    "f20_msearch_multi" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'merge'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf1,
                       len(list_filter(toks, x -> x = 'window'))::INT AS tf2,
                       len(list_filter(toks, x -> x = 'table'))::INT AS tf3
                FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
                       sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2,
                       sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df3
                FROM p),
          u AS (SELECT 'q_ms' AS query_id, doc_id,
                       round((CASE WHEN tf0 > 0
                                   THEN ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                                        (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                   ELSE 0.0 END) +
                             (CASE WHEN tf1 > 0
                                   THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                                        (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                   ELSE 0.0 END), 6) AS score
                FROM p, s WHERE tf0 > 0 OR tf1 > 0
                UNION ALL
                SELECT 'q_wt', doc_id,
                       round((CASE WHEN tf2 > 0
                                   THEN ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) *
                                        (tf2 * 2.2) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                   ELSE 0.0 END) +
                             (CASE WHEN tf3 > 0
                                   THEN ln((n - df3 + 0.5) / (df3 + 0.5) + 1.0) *
                                        (tf3 * 2.2) / (tf3 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                   ELSE 0.0 END), 6) AS score
                FROM p, s WHERE tf2 > 0 OR tf3 > 0),
          r AS (SELECT query_id, doc_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, doc_id)::BIGINT AS rank
                FROM u)
          SELECT query_id, doc_id, score, rank FROM r
          WHERE rank <= 5 ORDER BY query_id, rank""",
    // x36: the same v2 construction, diffed by md5 fingerprint
    "x36_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, source, text FROM documents),
          kept AS (SELECT doc_id, source,
                          CASE WHEN doc_id % 7 = 0 THEN text || ' v2-edit'
                               ELSE text END AS text
                   FROM v1 WHERE doc_id % 13 <> 0),
          added AS (SELECT doc_id + 1000000000 AS doc_id, source,
                           text || ' new' AS text
                    FROM v1 WHERE doc_id % 11 = 0),
          v2 AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
          j AS (SELECT coalesce(a.source, b.source) AS source,
                       CASE WHEN a.doc_id IS NULL THEN 'added'
                            WHEN b.doc_id IS NULL THEN 'removed'
                            WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                            ELSE 'unchanged' END AS status
                FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
          SELECT source,
                 sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
                 sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT AS n_removed,
                 sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
                 sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
          FROM j GROUP BY source ORDER BY source""",
    // x34: the stopword-ratio calibration table — same integer bp
    // bins on both engines
    "x34_calibration" ->
      s"""WITH p AS (SELECT lang = 'en' AS pos,
                            len(list_filter(${sqlToks(sqlNorm)},
                                t -> list_contains($sqlStop, t)))::BIGINT
                              * 10000 AS hits10k,
                            greatest(len(${sqlToks(sqlNorm)}), 1)::BIGINT AS n
                     FROM documents),
          b AS (SELECT pos, ((hits10k // n) // 1000)::BIGINT AS bin FROM p)
          SELECT bin, count(*)::BIGINT AS n_docs,
                 sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
                 (sum(CASE WHEN pos THEN 1 ELSE 0 END) * 10000
                  // count(*))::BIGINT AS pos_bp
          FROM b GROUP BY bin ORDER BY bin""",
    // x35: the 2×2 confusion matrix + chance-corrected agreement in
    // exact micro-units; labeler A replays x1's marker argmax (ties →
    // lexicographically later language, the pipe1 CASE)
    "x35_kappa" -> {
      val hitExprs = graft.operators.TextStats.langMarkers.toSeq.sortBy(_._1)
        .map { case (lang, words) =>
          val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_filter(toks, x -> list_contains($list, x))) AS h_$lang"
        }.mkString(",\n                 ")
      val m = "greatest(h_de, h_en, h_es, h_fr)"
      s"""WITH t AS (SELECT doc_id, lang, ${sqlToks("lower(text)")} AS toks FROM documents),
          h AS (SELECT doc_id, lang, $hitExprs FROM t),
          p AS (SELECT (CASE WHEN $m = 0 THEN 'und'
                             WHEN h_fr = $m THEN 'fr' WHEN h_es = $m THEN 'es'
                             WHEN h_en = $m THEN 'en' ELSE 'de' END) = 'en' AS a,
                       lang = 'en' AS b
                FROM h),
          c AS (SELECT count(*)::BIGINT AS n,
                       sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS tp,
                       sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS fp,
                       sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS fn,
                       sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS tn
                FROM p),
          r AS (SELECT *, ((tp + tn) * 1000000 // n)::BIGINT AS po_e6,
                       ((tp + fp) * 1000000 // n)::BIGINT AS a1_e6,
                       ((tp + fn) * 1000000 // n)::BIGINT AS b1_e6
                FROM c),
          e AS (SELECT n, tp, fp, fn, tn, po_e6,
                       ((a1_e6 * b1_e6 + (1000000 - a1_e6) * (1000000 - b1_e6))
                        // 1000000)::BIGINT AS pe_e6
                FROM r)
          SELECT n, tp, fp, fn, tn, po_e6, pe_e6,
                 ((po_e6 - pe_e6) * 1000000
                  // greatest(1000000 - pe_e6, 1))::BIGINT AS kappa_e6
          FROM e"""
    },
    "x29_model_filter" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                       len(list_filter(toks, x -> list_contains($sqlStop, x)))::BIGINT AS n_stop,
                       coalesce(list_sum(list_transform(toks, x -> len(x))), 0)::BIGINT AS sum_wlen
                FROM t),
          f AS (SELECT doc_id, least(n_tokens, 300) AS f_len,
                       n_stop * 10000 // greatest(n_tokens, 1) AS stop_bp,
                       sum_wlen * 10 // greatest(n_tokens, 1) AS wlen_x10
                FROM m),
          sc AS (SELECT doc_id,
                        (10 * f_len - (abs(stop_bp - 4000) // 2)
                         - 20 * abs(wlen_x10 - 45))::BIGINT AS score_bp
                 FROM f)
          SELECT doc_id, score_bp, score_bp >= 1500 AS keep
          FROM sc ORDER BY doc_id""",
    "s16_delete_by_query" ->
      s"""WITH t AS (SELECT doc_id, lang, ${sqlToks("lower(text)")} AS toks FROM documents),
          r AS (SELECT * FROM t WHERE lang <> 'de' OR lang IS NULL),
          p AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM r)
          SELECT (SELECT count(*) FROM t)::BIGINT AS n_before,
                 (SELECT count(*) FROM t WHERE lang = 'de')::BIGINT AS n_deleted,
                 (SELECT count(*) FROM r)::BIGINT AS n_after,
                 (SELECT coalesce(sum(len(toks)), 0) FROM r)::BIGINT AS sum_len_after,
                 (SELECT count(DISTINCT term) FROM p)::BIGINT AS n_terms_after,
                 (SELECT count(*) FROM p WHERE term = 'fast')::BIGINT AS masked_df_fast,
                 (SELECT count(*) FROM p WHERE term = 'fast')::BIGINT AS purged_df_fast,
                 true AS mask_agrees""",
    "n12_vector_delete" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
                    FROM embeddings),
          live AS (SELECT * FROM e WHERE vec_id % 7 <> 0),
          pr AS (SELECT q AS pq FROM e WHERE vec_id = 1),
          dp AS (SELECT vec_id,
                        CAST(list_sum(list_transform(range(1, len(q) + 1),
                          i -> q[i] * pq[i])) AS BIGINT) AS dp
                 FROM live, pr WHERE vec_id <> 1),
          nn AS (SELECT vec_id, dp FROM dp ORDER BY dp DESC, vec_id LIMIT 1)
          SELECT (SELECT count(*) FROM e)::BIGINT AS n_before,
                 (SELECT count(*) FROM e WHERE vec_id % 7 = 0)::BIGINT AS n_deleted,
                 (SELECT count(*) FROM live)::BIGINT AS n_after,
                 (SELECT vec_id FROM nn) AS masked_nn,
                 (SELECT dp FROM nn) AS masked_dp,
                 (SELECT vec_id FROM nn) AS purged_nn,
                 (SELECT dp FROM nn) AS purged_dp,
                 true AS mask_agrees, true AS tables_agree""",
    // st13: the n12 replay over the STREAMED delete lifecycle —
    // retained vectors are % 5 <> 0, nearest-live of vec 1 by the
    // same one-rounding-per-element BIGINT dot
    "st13_stream_vector_deletes" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
                    FROM embeddings),
          live AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
          pr AS (SELECT q AS pq FROM e WHERE vec_id = 1),
          dp AS (SELECT vec_id,
                        CAST(list_sum(list_transform(range(1, len(q) + 1),
                          i -> q[i] * pq[i])) AS BIGINT) AS dp
                 FROM live, pr WHERE vec_id <> 1),
          nn AS (SELECT vec_id, dp FROM dp ORDER BY dp DESC, vec_id LIMIT 1)
          SELECT (SELECT count(*) FROM e)::BIGINT AS n_before,
                 (SELECT count(*) FROM e WHERE vec_id % 5 = 0)::BIGINT AS n_deleted,
                 (SELECT count(*) FROM live)::BIGINT AS n_after,
                 (SELECT vec_id FROM nn) AS live_nn,
                 (SELECT dp FROM nn) AS live_dp,
                 true AS tables_agree, true AS multi_batch""",
    // ti2/ti3/f17: positional replay of the token stream — DuckDB
    // walks 1-based token indices where the index stores 0-based
    // positions, so the oracle is an independent positional
    // evaluation, not a reimplementation of the posting walk
    "ti2_phrase_index" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id,
                       len(list_filter(range(1, greatest(len(toks) - 1, 1)),
                           i -> toks[i] = 'row' AND toks[i+1] = 'column'
                                AND toks[i+2] = 'sort'))::BIGINT AS phrase_freq
                FROM t)
          SELECT doc_id, phrase_freq FROM m
          WHERE phrase_freq > 0 ORDER BY doc_id""",
    "ti3_phrase_prefix" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id,
                       len(list_filter(range(1, greatest(len(toks), 1)),
                           i -> toks[i] = 'row'
                                AND starts_with(coalesce(toks[i+1], ''), 'col')))::BIGINT
                         AS phrase_freq
                FROM t)
          SELECT doc_id, phrase_freq FROM m
          WHERE phrase_freq > 0 ORDER BY doc_id""",
    "f17_span_first" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents)
          SELECT doc_id,
                 (list_position(toks, 'fast') - 1)::BIGINT AS first_pos
          FROM t
          WHERE list_position(toks, 'fast') BETWEEN 1 AND 5
          ORDER BY doc_id""",
    "s15_generation_swap" ->
      """SELECT '1_stale' AS phase, 1::BIGINT AS generation,
                (SELECT count(*) FROM documents WHERE doc_id < 2000 AND doc_id % 2 = 0)::BIGINT AS n_docs
         UNION ALL
         SELECT '2_live', 2::BIGINT, count(*)::BIGINT FROM documents WHERE doc_id < 2000
         UNION ALL
         SELECT '3_resolved', 2::BIGINT, count(*)::BIGINT FROM documents WHERE doc_id < 2000
         UNION ALL
         SELECT '4_rebuilt', 3::BIGINT, count(*)::BIGINT FROM documents WHERE doc_id < 2000
         UNION ALL
         SELECT '5_gc', 3::BIGINT, count(*)::BIGINT FROM documents WHERE doc_id < 2000
         ORDER BY phase""",
    // d15: the d8 recursive component closure, but the survivor per
    // component is the longest member (tie → smaller id) instead of
    // the min id
    "d15_keep_best_dedup" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
          pr AS (SELECT id_a, id_b FROM j
                 WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5),
          e AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
          r AS (SELECT u, v FROM e UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
          lab AS (SELECT d.doc_id, any_value(d.n_chars) AS n_chars,
                         least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
                  FROM documents d LEFT JOIN r ON d.doc_id = r.u
                  GROUP BY d.doc_id)
          SELECT doc_id FROM lab
          QUALIFY row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY n_chars DESC, doc_id) = 1
          ORDER BY doc_id""",
    "ti1_segment_merge" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
          SELECT (SELECT count(*) FROM t)::BIGINT AS n_docs,
                 (SELECT coalesce(sum(len(toks)), 0) FROM t)::BIGINT AS sum_len,
                 (SELECT count(DISTINCT term) FROM p)::BIGINT AS n_terms,
                 (SELECT count(*) FROM p)::BIGINT AS n_postings,
                 true AS postings_agree""",
    // st12: ti1's invariants over the RETAINED corpus after the
    // streamed tombstones are purged, + the tombstone total
    "st12_stream_deletes" ->
      s"""WITH r AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
          t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM r),
          p AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
          SELECT (SELECT count(*) FROM t)::BIGINT AS n_docs,
                 (SELECT coalesce(sum(len(toks)), 0) FROM t)::BIGINT AS sum_len,
                 (SELECT count(DISTINCT term) FROM p)::BIGINT AS n_terms,
                 (SELECT count(*) FROM p)::BIGINT AS n_postings,
                 (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)::BIGINT AS n_deleted,
                 true AS postings_agree, true AS multi_batch""",
    // st10: ti1's corpus invariants (the streamed, segment-at-a-time
    // build must converge to the same index) + the multi-batch flag
    "st10_stream_index" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
          SELECT (SELECT count(*) FROM t)::BIGINT AS n_docs,
                 (SELECT coalesce(sum(len(toks)), 0) FROM t)::BIGINT AS sum_len,
                 (SELECT count(DISTINCT term) FROM p)::BIGINT AS n_terms,
                 (SELECT count(*) FROM p)::BIGINT AS n_postings,
                 true AS postings_agree, true AS multi_batch""",
    "a5_ingest_counters" ->
      """SELECT count(*)::BIGINT AS rows_in,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
                  AS n_purchase,
                sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS value_cents
         FROM events""",
    "p1_project" ->
      """SELECT o_orderkey AS id, o_orderstatus AS status, o_totalprice * 0.9 AS discounted
         FROM orders ORDER BY id""",
    "p5_range_filter" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_acctbal > 100.0 AND c_acctbal < 5000.0 ORDER BY c_custkey""",
    "p6_exists_filter" ->
      """SELECT o_orderkey AS id FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
         ORDER BY id""",
    "p8_nested_match" ->
      """SELECT o_orderkey AS id FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                       WHERE l.l_orderkey = o.o_orderkey AND p.p_name LIKE '%widget%')
         ORDER BY id""",
    "j1_join_dim" ->
      """SELECT o_orderkey, c_name, c_mktsegment FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "j6_bridge" ->
      """SELECT l_orderkey, l_linenumber, p_name, s_name
         FROM lineitem JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY l_orderkey, l_linenumber""",
    "j10_self_join" ->
      """SELECT o1.o_custkey AS custkey, count(*) AS n_pairs
         FROM orders o1 JOIN orders o2 ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
         GROUP BY 1 ORDER BY 1""",
    // j16: plain non-equi BETWEEN join as the oracle (DuckDB's IEJoin
    // evaluates it exactly) — results must be independent of the
    // bucketing access path
    "j16_range_join" ->
      """WITH types AS (SELECT DISTINCT event_type FROM events),
          camp AS (SELECT event_type,  c,
                          TIMESTAMP '2024-01-01 00:00:00' + (c*7) * INTERVAL 1 DAY AS s,
                          TIMESTAMP '2024-01-01 00:00:00' + (c*7+10) * INTERVAL 1 DAY AS e
                   FROM types CROSS JOIN generate_series(0,2) AS g(c)),
          j AS (SELECT ev.event_type, camp.c, ev.value
                FROM events ev JOIN camp
                  ON ev.event_type = camp.event_type
                 AND ev.ts >= camp.s AND ev.ts < camp.e)
         SELECT event_type, c AS campaign, count(*)::BIGINT AS n,
                sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
         FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
    // j15: DuckDB's NATIVE ASOF JOIN as the oracle — engine-vs-engine
    "j15_asof_join" ->
      """WITH types AS (SELECT DISTINCT event_type FROM events),
          dim AS (SELECT event_type,
                         TIMESTAMP '2024-01-05 00:00:00' + (k*7) * INTERVAL 1 DAY AS eff_from,
                         (length(event_type)*100 + k*10)::BIGINT AS rate_bp
                  FROM types CROSS JOIN generate_series(0,3) AS g(k)),
          j AS (SELECT e.event_type, e.value, d.rate_bp
                FROM events e ASOF LEFT JOIN dim d
                  ON e.event_type = d.event_type AND e.ts >= d.eff_from)
         SELECT event_type, rate_bp, count(*)::BIGINT AS n,
                sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
         FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
    "j13_semi" ->
      """SELECT c_custkey FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "j14_anti" ->
      """SELECT c_custkey FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "u1_union" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         UNION
         SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
         ORDER BY o_orderkey""",
    "u2_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
         ORDER BY o_orderkey""",
    "u3_except" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
         ORDER BY o_orderkey""",
    "j11_parent_scalar" ->
      """SELECT l.l_orderkey, l.l_linenumber,
                (SELECT c.c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                 WHERE o.o_orderkey = l.l_orderkey) AS parent_author
         FROM lineitem l ORDER BY l.l_orderkey, l.l_linenumber""",
    "j12_parent_agg" ->
      """SELECT o.o_orderkey, coalesce(array_to_string(b.brands, '|'), '') AS brands
         FROM orders o LEFT JOIN (SELECT l_orderkey, list(p_brand ORDER BY l_linenumber, p_brand) AS brands
                                  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1) b
         ON b.l_orderkey = o.o_orderkey ORDER BY o.o_orderkey""",
    "a1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_price,
                round(avg(l_discount), 6) AS avg_disc, count(*) AS cnt
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "a3_stats_agg" ->
      """SELECT l_returnflag,
                CAST(round(quantile_cont(round(l_extendedprice*100, 0), 0.5) * 20, 0) AS BIGINT) AS median_c20,
                CAST(round(quantile_cont(round(l_extendedprice*100, 0), 0.95) * 20, 0) AS BIGINT) AS p95_c20,
                round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
                round(stddev_pop(l_discount), 6) AS disc_stddev
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "a2_collect_children" ->
      """SELECT l_orderkey,
                array_to_string(list(l_linenumber::VARCHAR || ':' || l_partkey || ':' || CAST(l_quantity AS BIGINT)
                                     ORDER BY l_linenumber, l_partkey, l_quantity), '|') AS items
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "w2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "w4_window_rank" ->
      """SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rn
                        FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "w5_lag_lead" ->
      """SELECT event_id, user_id, ts,
                (epoch_us(ts) - epoch_us(lag(ts, 1) OVER w)) // 1000000 AS gap_prev_s,
                (epoch_us(lead(ts, 1) OVER w) - epoch_us(ts)) // 1000000 AS gap_next_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "a6_approx_percentile" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n, TRUE AS ok
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "w6_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
                ntile(10) OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey)::BIGINT AS decile
         FROM customer ORDER BY c_custkey""",
    "a7_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                (2 * grouping(o_orderstatus) + grouping(o_orderpriority))::BIGINT AS gid,
                count(*)::BIGINT AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY gid, status, priority""",
    "a4_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                (2 * grouping(l_returnflag) + grouping(l_linestatus))::BIGINT AS gid,
                count(*)::BIGINT AS n,
                round(sum(l_extendedprice), 2) AS revenue
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, returnflag, linestatus""",
    "a5_pivot" ->
      """SELECT ts::DATE AS day,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
                sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
                sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
                sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
         FROM events GROUP BY 1 ORDER BY day""",
    "f1_scored_search" ->
      """WITH ann AS (SELECT l_orderkey, count(*)::INT AS dl,
                            sum(CASE WHEN n.n_name LIKE '%NATION_1%' THEN 1 ELSE 0 END)::INT AS tf
                     FROM lineitem JOIN part ON l_partkey = p_partkey
                                   JOIN supplier s ON l_suppkey = s.s_suppkey
                                   JOIN nation n ON s.s_nationkey = n.n_nationkey
                     GROUP BY 1),
           d AS (SELECT o.o_orderkey AS id, c.c_custkey AS author_id, c.c_acctbal AS acctbal,
                        coalesce(ann.dl, 0) AS dl, coalesce(ann.tf, 0) AS tf,
                        EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                                AND l.l_returnflag = 'R') AS has_r
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                 LEFT JOIN ann ON ann.l_orderkey = o.o_orderkey),
           s AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
                        sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM d)
         SELECT id, author_id,
                round(CASE WHEN tf > 0
                           THEN 5.0 * ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                                (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                           ELSE 0.0 END, 6) AS score
         FROM d, s
         WHERE acctbal > 100.0 AND author_id > 10 AND has_r
         ORDER BY score DESC, id LIMIT 50""",
    "f2_tfidf" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          s AS (SELECT doc_id, len(list_filter(toks, x -> x = 'spark'))::INT AS tf, len(toks)::INT AS len FROM t),
          c AS (SELECT count(*)::DOUBLE AS n FROM documents),
          f AS (SELECT count(*)::DOUBLE AS df FROM s WHERE tf > 0)
          SELECT doc_id, round(tf::DOUBLE / len * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
          FROM s, c, f WHERE tf > 0 ORDER BY tfidf DESC, doc_id""",
    "f3_bm25" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(list_filter(toks, x -> x = 'spark'))::INT AS tf, len(toks)::INT AS len FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM p)
          SELECT doc_id, round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                               (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6) AS bm25
          FROM p, s WHERE tf > 0 ORDER BY bm25 DESC, doc_id""",
    "t3_keyword" ->
      "SELECT doc_id, lower(source) AS tokens FROM documents ORDER BY doc_id",
    "f4_search_bm25" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'window'))::INT AS tf1 FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1 FROM p)
          SELECT doc_id,
                 round((CASE WHEN tf0 > 0
                             THEN ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                                  (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END) +
                       (CASE WHEN tf1 > 0
                             THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                                  (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END), 6) AS score
          FROM p, s WHERE tf0 > 0 OR tf1 > 0
          ORDER BY score DESC, doc_id LIMIT 20""",
    // s21c: f4's replay again — the incremental chain (base build +
    // appended segment + blob-reusing second snapshot + restore) must
    // serve the exact full-corpus BM25
    "s21c_incremental_snapshot" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'window'))::INT AS tf1 FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1 FROM p)
          SELECT doc_id,
                 round((CASE WHEN tf0 > 0
                             THEN ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                                  (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END) +
                       (CASE WHEN tf1 > 0
                             THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                                  (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END), 6) AS score
          FROM p, s WHERE tf0 > 0 OR tf1 > 0
          ORDER BY score DESC, doc_id LIMIT 20""",
    // s21b: IDENTICAL to f4's replay by design — the snapshot→restore
    // cycle must serve BM25 bit-for-bit like the source-built artifact
    "s21b_artifact_snapshot" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'window'))::INT AS tf1 FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1 FROM p)
          SELECT doc_id,
                 round((CASE WHEN tf0 > 0
                             THEN ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                                  (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END) +
                       (CASE WHEN tf1 > 0
                             THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                                  (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END), 6) AS score
          FROM p, s WHERE tf0 > 0 OR tf1 > 0
          ORDER BY score DESC, doc_id LIMIT 20""",
    // h2: both legs replayed in full — the f4 BM25 CTE ranked, the
    // vector leg as the same one-rounding-per-element BIGINT dot
    // product, fused by exact integer reciprocal-rank contributions
    "h2_hybrid_rrf" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'window'))::INT AS tf1 FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1 FROM p),
          sc AS (SELECT doc_id,
                        round((CASE WHEN tf0 > 0
                                    THEN ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                                         (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                    ELSE 0.0 END) +
                              (CASE WHEN tf1 > 0
                                    THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                                         (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                    ELSE 0.0 END), 6) AS score
                 FROM p, s WHERE tf0 > 0 OR tf1 > 0
                 ORDER BY score DESC, doc_id LIMIT 20),
          tr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS text_rank
                 FROM sc),
          v AS (SELECT vec_id,
                       list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
                FROM embeddings),
          pr AS (SELECT q AS p FROM v WHERE vec_id = 7),
          dots AS (SELECT vec_id,
                          list_sum(list_transform(range(1, len(q) + 1),
                                                  i -> q[i] * p[i]))::BIGINT AS dp
                   FROM v, pr),
          vt AS (SELECT vec_id, dp FROM dots ORDER BY dp DESC, vec_id LIMIT 20),
          vr AS (SELECT vec_id, row_number() OVER (ORDER BY dp DESC, vec_id) AS vec_rank
                 FROM vt),
          f AS (SELECT coalesce(tr.doc_id, vr.vec_id) AS id,
                       tr.text_rank::BIGINT AS text_rank,
                       vr.vec_rank::BIGINT AS vec_rank,
                       (coalesce(1000000000 // (60 + tr.text_rank), 0) +
                        coalesce(1000000000 // (60 + vr.vec_rank), 0))::BIGINT AS rrf
                FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.vec_id)
          SELECT id, text_rank, vec_rank, rrf FROM f
          ORDER BY rrf DESC, id LIMIT 10""",
    "denorm_docs" ->
      """SELECT o.o_orderkey AS id, o.o_orderstatus AS status, o.o_orderpriority AS priority,
                o.o_totalprice AS total_price, o.o_orderdate AS created_at,
                c.c_custkey AS author_id, c.c_name AS author_name,
                c.c_mktsegment AS author_segment, c.c_acctbal AS author_acctbal,
                coalesce(array_to_string(li.items, '|'), '') AS items,
                coalesce(array_to_string(an.annotations, '|'), '') AS annotations
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         LEFT JOIN (SELECT l_orderkey,
                           list(l_linenumber::VARCHAR || ':' || l_partkey || ':' || l_suppkey || ':' ||
                                CAST(l_quantity AS BIGINT) || ':' ||
                                CAST(round(l_extendedprice * 100, 0) AS BIGINT) || ':' || l_returnflag
                                ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
                                         l_extendedprice, l_returnflag) AS items
                    FROM lineitem GROUP BY 1) li ON li.l_orderkey = o.o_orderkey
         LEFT JOIN (SELECT l_orderkey,
                           list(p_partkey::VARCHAR || ':' || p_name || ':' || p_type || ':' ||
                                n_nationkey::BIGINT || ':' || n_name
                                ORDER BY l_linenumber, p_partkey, p_name, p_type,
                                         n_nationkey, n_name) AS annotations
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                                  JOIN supplier ON l_suppkey = s_suppkey
                                  JOIN nation ON s_nationkey = n_nationkey
                    GROUP BY 1) an ON an.l_orderkey = o.o_orderkey
         ORDER BY id""",
    // golden-values oracle: the two fixture documents, hand-checked
    // against the reference's docs/sample_document.json by
    // TweetDenormSpec, transported here as literal rows
    "tweet_denorm" ->
      """SELECT * FROM (VALUES
           (1496727690157588483, 'SPREAD AND SHARE, YOU CAN HELP UKRAINE #Ukraine #Russia https://t.co/rp2IFCKMi3',
            'en', 'Twitter Web App', 6085, 3, 9000, 50, '2022-02-24 20:00:00', 'one_sorrow', 1000,
            '', 'Ukraine|Russia', '', '', '',
            'spread|share|you|can|help|ukrain|ukrain|russia|http|t|co|rp2ifckmi3',
            'one|for|pocskie|onefor|forpocskie'),
           (1497032529894805509, 'RT @one_sorrow: SPREAD AND SHARE, YOU CAN HELP UKRAINE #Ukraine #Russia https://t.co/rp2IFCKMi3',
            'en', 'Twitter for Android', 6085, 0, 0, 0, '2022-02-25 02:15:43', 'michaelkinnie', 9,
            '1484601166080081920:Russo-Ukrainian conflict:123:Ongoing News Story|1484601166080081920:Russo-Ukrainian conflict:123:Ongoing News Story',
            'Ukraine|Russia', 'UKRAINE:Place:954',
            'https://twitter.com/one_sorrow/status/1496727690157588483/photo/1',
            '1496727690157588483:retweeted:one_sorrow',
            'rt|on|sorrow|spread|share|you|can|help|ukrain|ukrain|russia|http|t|co|rp2ifckmi3',
            'ted|wil|alex|tedwil|wilalex')
         ) AS t(id, content, language, source, retweet_count, reply_count, like_count, quote_count,
                created_utc, author_username, author_followers, context_annotations, hashtags,
                annotations, links, "references", content_tokens, author_name_shingles)
         ORDER BY id""",
    "denorm_roundtrip" ->
      """SELECT o_orderkey AS id, o_custkey AS author_id, l_linenumber AS linenumber,
                l_partkey AS partkey, l_quantity AS quantity, l_returnflag AS returnflag
         FROM orders JOIN customer ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey
         ORDER BY id, linenumber""",
    "t2_tokenize" ->
      s"""SELECT doc_id, array_to_string(${sqlToks("lower(text)")}, '|') AS tokens
          FROM documents ORDER BY doc_id""",
    "t6_stopwords" ->
      s"""SELECT doc_id, array_to_string(list_filter(${sqlToks("lower(text)")},
                 t -> NOT list_contains($sqlStop, t)), '|') AS tokens
          FROM documents ORDER BY doc_id""",
    "t9_ngram" ->
      s"""WITH t AS (SELECT doc_id, ${sqlFoldedToks("substring(text, 1, 40)")} AS toks FROM documents)
          SELECT doc_id,
                 array_to_string(flatten(list_transform(toks, t ->
                   flatten(list_transform(generate_series(1, least(10, length(t))), n ->
                     list_transform(generate_series(1, length(t)-n+1), s -> substring(t, s, n)))))), '|') AS grams
          FROM t ORDER BY doc_id""",
    "t10_shingles" ->
      s"""WITH t AS (SELECT doc_id, ${sqlFoldedToks("text")} AS toks FROM documents)
          SELECT doc_id,
                 array_to_string(list_concat(toks,
                   list_transform(generate_series(1, len(toks)-1), i -> toks[i] || toks[i+1])), '|') AS grams
          FROM t ORDER BY doc_id""",
    "t12_ngram_search" ->
      """SELECT doc_id FROM documents WHERE lower(text) LIKE '%park%' ORDER BY doc_id""",
    // generated single-statement replay of the full englando chain
    // incl. every Porter rule (see OracleSql scaladoc)
    "t11_englando" -> OracleSql.porterEnglandoT11,
    // t18: all four pipelines replayed over the one-row literal
    // sample — englando through the generated full-Porter SQL
    "t18_analyze" -> {
      val src = s"(SELECT 0::BIGINT AS doc_id, '$analyzeSampleSql' AS text)"
      s"""WITH smp(text) AS (VALUES ('$analyzeSampleSql')),
          ft AS (SELECT ${sqlFoldedToks("text")} AS toks FROM smp),
          rows AS (
            SELECT 'englando' AS analyzer, tokens
            FROM (${OracleSql.englandoJoined(src)})
            UNION ALL
            SELECT 'custom_ngram',
                   array_to_string(flatten(list_transform(toks, t ->
                     flatten(list_transform(generate_series(1, least(10, length(t))), n ->
                       list_transform(generate_series(1, length(t)-n+1), st -> substring(t, st, n)))))), '|')
            FROM ft
            UNION ALL
            SELECT 'custom_shingles',
                   array_to_string(list_concat(toks,
                     list_transform(generate_series(1, len(toks)-1), i -> toks[i] || toks[i+1])), '|')
            FROM ft
            UNION ALL
            SELECT 'keyword_lowercase', lower(text) FROM smp)
          SELECT analyzer,
                 (CASE WHEN tokens = '' THEN 0
                       ELSE len(string_split(tokens, '|')) END)::BIGINT AS n_tokens,
                 tokens
          FROM rows ORDER BY analyzer"""
    },
    "x5_sketch_distinct" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users,
                count(*) AS n, TRUE AS approx_ok
         FROM events GROUP BY 1 ORDER BY 1""",
    "n4_ann_contract" ->
      """SELECT * FROM (VALUES ('ivf', 3::BIGINT, 3::BIGINT, TRUE),
                               ('lsh', 3::BIGINT, 3::BIGINT, TRUE))
           AS t(method, n_probes, n_found, all_found) ORDER BY method""",
    // n11: per-(mode, probe) filtered-search invariants, TRUE by
    // construction on a correct filtered index probe (constant-TRUE
    // oracle pattern of n2/n4); a probe whose filtered result is
    // empty drops its row and fails on row count
    "n11_filtered_knn" ->
      """SELECT * FROM (VALUES ('match', 1::BIGINT, TRUE, TRUE, TRUE),
                               ('match', 101::BIGINT, TRUE, TRUE, TRUE),
                               ('match', 202::BIGINT, TRUE, TRUE, TRUE),
                               ('mismatch', 1::BIGINT, TRUE, TRUE, TRUE),
                               ('mismatch', 101::BIGINT, TRUE, TRUE, TRUE),
                               ('mismatch', 202::BIGINT, TRUE, TRUE, TRUE))
           AS t(mode, qid, k_bounded, labels_match_filter, twin_ok)
         ORDER BY mode, qid""",
    // n13: the same constant-TRUE contract discipline — the planted
    // same-label twin must be excluded by the flipped in-traversal
    // filter, all negatives carry a different label
    "n13_hard_negatives" ->
      """SELECT * FROM (VALUES (1::BIGINT, TRUE, TRUE, TRUE),
                               (101::BIGINT, TRUE, TRUE, TRUE),
                               (202::BIGINT, TRUE, TRUE, TRUE))
           AS t(qid, k_bounded, labels_differ, twin_excluded)
         ORDER BY qid""",
    // n2/n3: per-probe ANN invariants, TRUE by construction on a
    // correct index (Similarity.annContractRows scaladoc) — the
    // constant-TRUE oracle pattern of x5/n4
    "n2_knn_lsh" ->
      """SELECT * FROM (VALUES (1::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
                               (101::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
                               (202::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE))
           AS t(qid, k_bounded, all_in_probed, scores_exact,
                planted_found, planted_rank1, ranked_desc)
         ORDER BY qid""",
    "n3_knn_ivf" ->
      """SELECT * FROM (VALUES (1::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
                               (101::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
                               (202::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE))
           AS t(qid, k_bounded, all_in_probed, scores_exact,
                planted_found, planted_rank1, ranked_desc)
         ORDER BY qid""",
    // n3b: the serving-only probe — verification needs only the
    // RESULT rows (planted ×2 copy ranks first; k bounded)
    "n3b_knn_ivf_serve" ->
      """SELECT * FROM (VALUES (1::BIGINT, TRUE, TRUE),
                               (101::BIGINT, TRUE, TRUE),
                               (202::BIGINT, TRUE, TRUE))
           AS t(qid, planted_rank1, k_bounded)
         ORDER BY qid""",
    // n14: every invariant constant-TRUE on a correct compressed
    // serving arm (planted cos-1.0 rank-1 at the default shortlist;
    // exhaustive-shortlist result ≡ IVF-flat row-for-row)
    "n14_ivfpq_rerank_serve" ->
      """SELECT * FROM (VALUES (1::BIGINT, TRUE, TRUE, TRUE),
                               (101::BIGINT, TRUE, TRUE, TRUE),
                               (202::BIGINT, TRUE, TRUE, TRUE))
           AS t(qid, planted_rank1, k_bounded, matches_flat)
         ORDER BY qid""",
    "d1_exact_dedup" ->
      s"""SELECT md5($sqlNorm) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_dups
          FROM documents GROUP BY 1 ORDER BY 1""",
    // d2's LSH candidate generation is verified by its exact-Jaccard
    // re-check: at this scale recall is 1.0 (SimilaritySpec/DedupSpec),
    // so the exact-Jaccard SQL is a valid oracle for the MinHash path
    "d2_minhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          -- mirror the impl's stop-shingle cap (maxShingleFreq=1000):
          -- posting buckets past the cap are dropped on BOTH sides, so
          -- the differential check stays exact on corpora where some
          -- shingle exceeds the cap
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2)
          SELECT id_a, id_b, round(inter::DOUBLE / (sa + sb - inter)::DOUBLE, 6) AS jaccard
          FROM j WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5
          ORDER BY id_a, id_b""",
    // full SQL replay of the SimHash pipeline: two mod-prime code-point
    // token hashes → 60 per-bit majority votes → packed signature →
    // 4×15-bit LSH bands → candidate join → Hamming verify
    "d3_simhash_pairs" -> {
      val votes = (0 until 60).map { j =>
        val (h, bit) = if (j < 30) ("h1", j) else ("h2", j - 30)
        s"sum(CASE WHEN (($h >> $bit) & 1) = 1 THEN 1 ELSE -1 END) AS b$j"
      }.mkString(", ")
      val pack = (0 until 60)
        .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      def fold(base: Long) =
        s"list_reduce(list_prepend(0::BIGINT, cps), (a, b) -> (a*$base + b) % 1000000007)"
      s"""WITH t AS (SELECT doc_id, unnest(${sqlToks(sqlNorm)}) AS tok FROM documents),
          cpt AS (SELECT doc_id, list_transform(string_split(tok, ''), c -> unicode(c)::BIGINT) AS cps FROM t),
          h AS (SELECT doc_id, ${fold(1000003L)} AS h1, ${fold(1000033L)} AS h2 FROM cpt),
          v AS (SELECT doc_id, $votes FROM h GROUP BY 1),
          s AS (SELECT doc_id, ($pack)::BIGINT AS sim FROM v),
          bb AS (SELECT doc_id, sim, band, (sim >> (band*15)) & 32767 AS bucket
                 FROM (SELECT doc_id, sim, unnest([0,1,2,3]) AS band FROM s)),
          cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.sim AS sim_a, b.sim AS sim_b
                   FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                                      AND a.doc_id < b.doc_id)
          SELECT id_a, id_b, bit_count(xor(sim_a, sim_b))::INT AS hamming
          FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 10
          ORDER BY id_a, id_b""".stripMargin
    },
    "x6_rolling_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS nt FROM documents),
          cp AS (SELECT doc_id, list_transform(string_split(nt, ''), ch -> unicode(ch)::BIGINT) AS cps FROM t)
          SELECT doc_id,
                 CASE WHEN len(cps) < 32 THEN NULL ELSE
                   list_aggregate(list_transform(generate_series(1, len(cps)-31), i ->
                     list_reduce(cps[i:i+31], (a, b) -> (a*1000003 + b) % 1000000007)), 'min') END AS rolling_fp
          FROM cp ORDER BY doc_id""",
    "d4_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          -- mirror the impl's stop-shingle cap (maxShingleFreq=1000):
          -- posting buckets past the cap are dropped on BOTH sides, so
          -- the differential check stays exact on corpora where some
          -- shingle exceeds the cap
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2)
          SELECT id_a, id_b, round(inter::DOUBLE / (sa + sb - inter)::DOUBLE, 6) AS jaccard
          FROM j WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5
          ORDER BY id_a, id_b""",
    // d22: the d20 replay's leaked-val set applied as a split
    // reassignment, then the census
    "d22_leakage_fix" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
          sp AS (SELECT doc_id,
                        CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90
                             THEN 'train' ELSE 'val' END AS split
                 FROM documents),
          lk AS (SELECT DISTINCT
                        CASE WHEN sa2.split = 'val' THEN j.id_a ELSE j.id_b END AS id
                 FROM j JOIN sp sa2 ON j.id_a = sa2.doc_id
                        JOIN sp sb2 ON j.id_b = sb2.doc_id
                 WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5
                   AND sa2.split <> sb2.split),
          fixed AS (SELECT CASE WHEN lk.id IS NOT NULL THEN 'train'
                                ELSE sp.split END AS split,
                           lk.id IS NOT NULL AS moved
                    FROM sp LEFT JOIN lk ON sp.doc_id = lk.id)
          SELECT split, count(*)::BIGINT AS n_docs,
                 sum(CASE WHEN moved THEN 1 ELSE 0 END)::BIGINT AS n_moved_in
          FROM fixed GROUP BY split ORDER BY split""",
    // d21: the d7 transitive-closure replay folded to the
    // cluster-size histogram
    "d21_dedup_report" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
          pr AS (SELECT id_a, id_b FROM j
                 WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5),
          e AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
          r AS (SELECT u, v FROM e UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
          cl AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
                 FROM documents d LEFT JOIN r ON d.doc_id = r.u
                 GROUP BY d.doc_id),
          sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                 FROM cl GROUP BY 1)
          SELECT cluster_size, count(*)::BIGINT AS n_clusters,
                 sum(cluster_size)::BIGINT AS n_docs
          FROM sz GROUP BY cluster_size ORDER BY cluster_size""",
    // d20: the d4 pair replay with the x8 split labels joined onto
    // both sides, keeping only boundary-crossing pairs
    "d20_split_leakage" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
          sp AS (SELECT doc_id,
                        CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90
                             THEN 'train' ELSE 'val' END AS split
                 FROM documents)
          SELECT id_a, id_b,
                 round(inter::DOUBLE / (sa + sb - inter)::DOUBLE, 6) AS jaccard,
                 sa2.split AS split_a, sb2.split AS split_b
          FROM j JOIN sp sa2 ON j.id_a = sa2.doc_id
                 JOIN sp sb2 ON j.id_b = sb2.doc_id
          WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5
            AND sa2.split <> sb2.split
          ORDER BY id_a, id_b""",
    // d14: the d4 intersection CTE scored in both directions, exact
    // integer basis points per contained side
    "d14_containment" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          -- mirror the impl's stop-shingle cap (maxShingleFreq=1000):
          -- posting buckets past the cap are dropped on BOTH sides, so
          -- the differential check stays exact on corpora where some
          -- shingle exceeds the cap
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::BIGINT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
          u AS (SELECT id_a AS contained, id_b AS container,
                       (inter * 10000 // sa)::BIGINT AS containment_bp FROM j
                UNION ALL
                SELECT id_b, id_a, (inter * 10000 // sb)::BIGINT FROM j)
          SELECT contained, container, containment_bp FROM u
          WHERE containment_bp >= 8000 ORDER BY 1, 2""",
    "d17_standing_index" ->
      s"""WITH st AS (SELECT md5($sqlNorm) AS fp FROM documents WHERE doc_id % 10 <> 0),
          sfp AS (SELECT DISTINCT fp FROM st),
          b AS (SELECT doc_id, md5($sqlNorm) AS fp FROM documents WHERE doc_id % 10 = 0),
          nw AS (SELECT b.doc_id, b.fp FROM b LEFT JOIN sfp ON b.fp = sfp.fp
                 WHERE sfp.fp IS NULL)
          SELECT (SELECT count(*) FROM sfp)::BIGINT AS n_index_before,
                 (SELECT count(*) FROM b)::BIGINT AS n_batch,
                 (SELECT count(*) FROM nw)::BIGINT AS n_new,
                 (SELECT count(DISTINCT fp) FROM nw)::BIGINT AS n_fps_added,
                 ((SELECT count(*) FROM sfp)
                  + (SELECT count(DISTINCT fp) FROM nw))::BIGINT AS n_index_after,
                 true AS rescreen_all_known,
                 true AS tables_in_lockstep,
                 true AS growth_consistent""",
    "d10_incremental_dedup" ->
      s"""WITH idx AS (SELECT md5($sqlNorm) AS fingerprint, min(doc_id) AS keep_id
                       FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
          nb AS (SELECT doc_id, md5($sqlNorm) AS fp FROM documents WHERE doc_id % 2 <> 0)
          SELECT nb.doc_id, idx.keep_id AS dup_of, idx.keep_id IS NULL AS is_new
          FROM nb LEFT JOIN idx ON nb.fp = idx.fingerprint
          ORDER BY nb.doc_id""",
    // d7/d8: same exact-Jaccard pair graph as d4, closed transitively
    // with a recursive CTE — every node's cluster is the min id it can
    // reach (singletons map to themselves via the LEFT JOIN + least)
    "d7_dup_clusters" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          -- mirror the impl's stop-shingle cap (maxShingleFreq=1000):
          -- posting buckets past the cap are dropped on BOTH sides, so
          -- the differential check stays exact on corpora where some
          -- shingle exceeds the cap
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
          pr AS (SELECT id_a, id_b FROM j
                 WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5),
          e AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
          r AS (SELECT u, v FROM e UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u)
          SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
          FROM documents d LEFT JOIN r ON d.doc_id = r.u
          GROUP BY d.doc_id ORDER BY d.doc_id""",
    "d8_cluster_dedup" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          -- mirror the impl's stop-shingle cap (maxShingleFreq=1000):
          -- posting buckets past the cap are dropped on BOTH sides, so
          -- the differential check stays exact on corpora where some
          -- shingle exceeds the cap
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
          pr AS (SELECT id_a, id_b FROM j
                 WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5),
          e AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
          r AS (SELECT u, v FROM e UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u)
          SELECT d.doc_id
          FROM documents d LEFT JOIN r ON d.doc_id = r.u
          GROUP BY d.doc_id
          HAVING least(d.doc_id, coalesce(min(r.v), d.doc_id)) = d.doc_id
          ORDER BY d.doc_id""",
    "d6_dedup_apply" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p0 AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM s),
          -- mirror the impl's stop-shingle cap (maxShingleFreq=1000):
          -- posting buckets past the cap are dropped on BOTH sides, so
          -- the differential check stays exact on corpora where some
          -- shingle exceeds the cap
          p AS (SELECT * FROM p0
                QUALIFY count(*) OVER (PARTITION BY sh1) <= 1000),
          j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, any_value(a.setsize) AS sa,
                       any_value(b.setsize) AS sb, count(*)::INT AS inter
                FROM p a JOIN p b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2)
          SELECT doc_id FROM documents
          WHERE doc_id NOT IN (SELECT id_b FROM j
                               WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5)
          ORDER BY doc_id""",
    "p9_nested_agg" ->
      """SELECT o_orderkey AS id,
                round(coalesce(li.total, 0.0), 2) AS items_total,
                coalesce(li.n, 0)::BIGINT AS n_items
         FROM orders LEFT JOIN (SELECT l_orderkey, sum(l_extendedprice) AS total, count(*) AS n
                                FROM lineitem GROUP BY 1) li ON li.l_orderkey = o_orderkey
         ORDER BY id""",
    "d5_cosine_pairs" ->
      """SELECT id_a, id_b, cos_sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                         sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos_sim
           FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         WHERE cos_sim >= 0.4 ORDER BY id_a, id_b""",
    "x1_langid" -> {
      val hitExprs = graft.operators.TextStats.langMarkers.toSeq.sortBy(_._1)
        .map { case (lang, words) =>
          val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_filter(toks, x -> list_contains($list, x))) AS h_$lang"
        }.mkString(",\n                 ")
      val m = "greatest(h_de, h_en, h_es, h_fr)"
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          h AS (SELECT doc_id,
                 $hitExprs
                FROM t)
          SELECT doc_id, CASE WHEN $m = 0 THEN 'und'
                              WHEN h_fr = $m THEN 'fr'
                              WHEN h_es = $m THEN 'es'
                              WHEN h_en = $m THEN 'en'
                              ELSE 'de' END AS lang_pred
          FROM h ORDER BY doc_id"""
    },
    "m2_media_features" ->
      """WITH cp AS (SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
                            'txt' AS format,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id, n_bytes, format,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp)
         SELECT media_id, n_bytes, format,
                ((h0 % 640) + 1)::INT AS width,
                (((h0 // 640) % 480) + 1)::INT AS height,
                array_to_string(list_transform(generate_series(0, 7),
                                i -> (h0*31 + i*2654435761) % 1000003), '|') AS features
         FROM h
         UNION ALL
         -- planted BMP fixtures (real decode path): hand-computed pixel
         -- stats as exact x1000003 fixed-point. -1 = 2x2 pure red:
         -- means/maxs (B,G,R)=(0,0,1), aspect 2/(2+2)=0.5, bpp 24/32;
         -- -2 = 3x1 all black: zeros, aspect 3/(3+1)=0.75. Sizes:
         -- 54-byte header + 4-byte-padded rows (2x2: 2*8=16 -> 70;
         -- 3x1: 12 -> 66).
         SELECT * FROM (VALUES
           (-1::BIGINT, 70::BIGINT, 'bmp', 2::INT, 2::INT,
            '0|0|1000003|0|0|1000003|500002|750002'),
           (-2::BIGINT, 66::BIGINT, 'bmp', 3::INT, 1::INT,
            '0|0|0|0|0|0|750002|750002'),
           -- planted PNGs (real inflate+unfilter path; stored-deflate
           -- blocks make n_bytes closed-form: 57 + h*(1+3w) + 11).
           -- -3 = 2x2 pure red, the SAME picture as BMP -1 -> same
           -- features; -4 = 3x3 gradient r=10+20x, g=50y, b=25(x+y):
           -- means (B,G,R)=(50,50,30)/255, maxs (100,100,50)/255,
           -- aspect 0.5, 24bpp -> float32 fixed-point literals
           (-4::BIGINT, 98::BIGINT, 'png', 3::INT, 3::INT,
            '196079|196079|117647|392158|392158|196079|500002|750002'),
           (-3::BIGINT, 82::BIGINT, 'png', 2::INT, 2::INT,
            '0|0|1000003|0|0|1000003|500002|750002'))
           AS t(media_id, n_bytes, format, width, height, features)
         ORDER BY media_id""",
    "m6_media_phash" ->
      """WITH cp AS (SELECT doc_id AS media_id,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp),
          c AS (SELECT media_id,
                       list_transform(generate_series(0, 15),
                                      i -> (h0*31 + i*2654435761) % 1000003) AS cells
                FROM h),
          p AS (SELECT media_id,
                       -- ::BIGINT: DuckDB's list sum yields HUGEINT,
                       -- which the harness canonicalizes differently
                       -- from int64 even at equal values
                       list_aggregate(list_transform(generate_series(1, 16),
                         i -> CASE WHEN cells[i] > list_aggregate(cells, 'sum') / 16.0
                                   THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END),
                         'sum')::BIGINT AS phash
                FROM c),
          -- planted fixtures (real aHash path): left-white half at
          -- 4x4 BMP, 8x8 BMP and 8x8 PNG pool to the SAME 0x3333 grid
          -- bits (cross-resolution AND cross-format duplicates); the
          -- inverted picture flips to 0xCCCC
          allrows AS (SELECT * FROM p UNION ALL
                      SELECT * FROM (VALUES (-10::BIGINT, 13107::BIGINT),
                                            (-11::BIGINT, 13107::BIGINT),
                                            (-12::BIGINT, 13107::BIGINT),
                                            (-13::BIGINT, 52428::BIGINT))
                        AS t(media_id, phash)),
          canon AS (SELECT phash, min(media_id) AS canonical_id
                    FROM allrows GROUP BY 1)
          SELECT a.media_id, a.phash, canon.canonical_id,
                 a.media_id <> canon.canonical_id AS is_dup
          FROM allrows a JOIN canon USING (phash)
          ORDER BY a.media_id""",
    "m7_audio_features" ->
      // planted WAV literals: -21 mono square wave ±8000 (RMS = the
      // amplitude exactly, 44+32 bytes); -22 stereo ramp L=1000i,
      // R=3000: sumsq = 140e6+72e6 over 16 samples -> isqrt(13250000)
      // = 3640, peak 7000; -23 truncated RIFF header -> all-zero
      // degrade. Text rows replay the stub from the shared h0 fold.
      """WITH cp AS (SELECT doc_id AS media_id, text,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id, text,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp)
          SELECT media_id,
                 octet_length(encode(text))::BIGINT AS n_bytes,
                 'txt' AS format,
                 (8000 + h0 % 40001)::INT AS sample_rate,
                 (1 + h0 % 2)::INT AS channels,
                 (1 + h0 % 100000)::BIGINT AS n_frames,
                 ((h0*31) % 32768)::INT AS peak,
                 ((h0*37) % 32768)::BIGINT AS rms
          FROM h
          UNION ALL
          SELECT * FROM (VALUES
            (-21::BIGINT, 76::BIGINT, 'wav', 8000::INT, 1::INT,
             16::BIGINT, 8000::INT, 8000::BIGINT),
            (-22::BIGINT, 76::BIGINT, 'wav', 44100::INT, 2::INT,
             8::BIGINT, 7000::INT, 3640::BIGINT),
            (-23::BIGINT, 12::BIGINT, 'wav', 0::INT, 0::INT,
             0::BIGINT, 0::INT, 0::BIGINT),
            -- -24 gap wave (m9's fixture): 48 mono samples, sumsq =
            -- 16·2000² + 16·0 + 16·3000² = 208e6 → isqrt(208e6/48) = 2081
            (-24::BIGINT, 140::BIGINT, 'wav', 8000::INT, 1::INT,
             48::BIGINT, 3000::INT, 2081::BIGINT))
            AS t(media_id, n_bytes, format, sample_rate, channels,
                 n_frames, peak, rms)
          ORDER BY media_id""",
    "m3_media_chunks" ->
      """SELECT doc_id AS media_id,
                ceil(octet_length(encode(text)) / 64.0)::BIGINT AS n_chunks,
                array_to_string(
                  list_transform(generate_series(0, ceil(octet_length(encode(text)) / 64.0)::BIGINT - 1),
                                 i -> md5(substring(text, (i * 64 + 1)::INT, 64))), '|') AS chunk_md5s
         FROM documents ORDER BY media_id""",
    // m9: stub rows replay the 8-bit voiced pattern from the shared
    // h0 fold (runs via one regexp over the padded bin string); the
    // planted PCM fixtures are hand-computed VALUES
    "m9_silence_split" ->
      """WITH cp AS (SELECT doc_id AS media_id,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp),
          bits AS (SELECT media_id, lpad(bin((h0 % 256)::INT), 8, '0') AS bs FROM h)
          SELECT media_id, 8::BIGINT AS n_windows,
                 (len(bs) - len(replace(bs, '1', '')))::BIGINT AS n_voiced,
                 len(regexp_extract_all(bs, '1+'))::BIGINT AS n_segments,
                 coalesce(list_max(list_transform(regexp_extract_all(bs, '0+'),
                                                  x -> len(x))), 0)::BIGINT AS longest_silence
          FROM bits
          UNION ALL
          SELECT * FROM (VALUES
            (-21::BIGINT, 1::BIGINT, 1::BIGINT, 1::BIGINT, 0::BIGINT),
            (-22::BIGINT, 1::BIGINT, 1::BIGINT, 1::BIGINT, 0::BIGINT),
            (-23::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT),
            (-24::BIGINT, 3::BIGINT, 2::BIGINT, 2::BIGINT, 1::BIGINT))
            AS t(media_id, n_windows, n_voiced, n_segments, longest_silence)
          ORDER BY media_id""",
    // m8: the m3 chunk-digest replay folded to 32-bit frame features,
    // consecutive-delta cuts
    "m8_scene_cut" ->
      """WITH c AS (SELECT doc_id AS media_id,
                           list_transform(
                             generate_series(0, ceil(octet_length(encode(text)) / 64.0)::BIGINT - 1),
                             i -> ('0x' || substr(md5(substring(text, (i * 64 + 1)::INT, 64)), 1, 8))::BIGINT) AS f
                    FROM documents),
          s AS (SELECT media_id, len(f)::BIGINT AS n_frames,
                       len(list_filter(generate_series(2, len(f)),
                                       i -> abs(f[i] - f[i - 1]) > 3000000000))::BIGINT AS n_cuts
                FROM c)
          SELECT media_id, n_frames, n_cuts,
                 (CASE WHEN n_frames = 0 THEN 0 ELSE n_cuts + 1 END)::BIGINT AS n_scenes
          FROM s ORDER BY media_id""",
    "m4_media_resize" ->
      """WITH cp AS (SELECT doc_id AS media_id,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp),
          dims AS (SELECT media_id, ((h0 % 640) + 1)::INT AS width,
                          (((h0 // 640) % 480) + 1)::INT AS height FROM h
                   UNION ALL
                   SELECT * FROM (VALUES (-1::BIGINT, 2::INT, 2::INT),
                                         (-2::BIGINT, 3::INT, 1::INT)) v(media_id, width, height)),
          s AS (SELECT *, least(224.0 / width, 224.0 / height, 1.0) AS sc FROM dims)
          SELECT media_id, width, height,
                 greatest(floor(width * sc), 1)::INT AS out_w,
                 greatest(floor(height * sc), 1)::INT AS out_h
          FROM s ORDER BY media_id""",
    "m5_frame_sample" ->
      """SELECT doc_id AS media_id,
                ceil(octet_length(encode(text)) / 64.0)::BIGINT AS n_chunks,
                array_to_string(
                  list_transform(
                    list_filter(generate_series(0, ceil(octet_length(encode(text)) / 64.0)::BIGINT - 1),
                                i -> i % 4 = 0),
                    i -> md5(substring(text, (i * 64 + 1)::INT, 64))), '|') AS sampled_md5s
         FROM documents ORDER BY media_id""",
    "n1_knn_brute" ->
      """SELECT vec_id, label,
                round(list_dot_product(embedding::DOUBLE[], q.qv) /
                      (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                       sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
         FROM embeddings, (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1) q
         WHERE vec_id <> 1 ORDER BY cos_sim DESC, vec_id LIMIT 10""",
    "x2_quality" ->
      s"""WITH t AS (SELECT doc_id, text, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id, len(text)::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
                       CASE WHEN len(toks) > 0
                            THEN list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks)::INT
                            ELSE 0.0 END AS mean_token_len,
                       CASE WHEN len(text) > 0
                            THEN (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE / len(text)::INT
                            ELSE 0.0 END AS punct_ratio,
                       CASE WHEN len(toks) > 0
                            THEN len(list_filter(toks, t -> list_contains($sqlStop, t)))::DOUBLE / len(toks)::INT
                            ELSE 0.0 END AS stop_ratio
                FROM t)
          SELECT doc_id, n_chars, n_tokens, round(mean_token_len, 6) AS mean_token_len,
                 round(punct_ratio, 6) AS punct_ratio, round(stop_ratio, 6) AS stopword_ratio,
                 round(least(n_tokens::DOUBLE / 20.0, 1.0) * 0.4 +
                       (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
                       least(stop_ratio * 4.0, 1.0) * 0.3, 6) AS quality
          FROM m ORDER BY doc_id""",
    "x3_token_count" ->
      """SELECT doc_id,
                CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT AS ws_tokens,
                len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]'))::BIGINT AS bpe_tokens
         FROM documents ORDER BY doc_id""",
    // x30: x3's per-doc counting expressions aggregated per lang,
    // ratios as exact integer division
    "x30_fertility" ->
      """WITH p AS (SELECT lang, n_chars,
                           CASE WHEN len(trim(text)) = 0 THEN 0
                                ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT AS ws,
                           len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]'))::BIGINT AS bpe
                    FROM documents)
          SELECT lang, count(*)::BIGINT AS n_docs,
                 sum(ws)::BIGINT AS ws_tokens, sum(bpe)::BIGINT AS bpe_tokens,
                 (sum(bpe) * 1000000 // greatest(sum(ws), 1))::BIGINT AS fertility_e6,
                 (sum(n_chars) * 1000 // greatest(sum(bpe), 1))::BIGINT AS chars_per_tok_e3
          FROM p GROUP BY lang ORDER BY lang""",
    // x31: ⌊log2⌋ buckets via binary-string length on both engines
    "x31_length_buckets" ->
      """WITH p AS (SELECT len(regexp_extract_all(text,
                             '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]'))::BIGINT AS n
                    FROM documents),
          b AS (SELECT n, CASE WHEN n = 0 THEN -1
                               ELSE length(bin(n)) - 1 END::BIGINT AS bucket
                FROM p)
          SELECT bucket, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS sum_tokens,
                 min(n)::BIGINT AS min_tokens, max(n)::BIGINT AS max_tokens
          FROM b GROUP BY bucket ORDER BY bucket""",
    "pipe1_curation" -> {
      val hitExprs = graft.operators.TextStats.langMarkers.toSeq.sortBy(_._1)
        .map { case (lang, words) =>
          val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_filter(toks, x -> list_contains($list, x))) AS h_$lang"
        }.mkString(",\n                 ")
      val m = "greatest(h_de, h_en, h_es, h_fr)"
      s"""WITH t AS (SELECT doc_id, text, ${sqlToks("lower(text)")} AS toks FROM documents),
          qual AS (SELECT doc_id,
                 round(least(len(toks)::DOUBLE / 20.0, 1.0) * 0.4 +
                       (1.0 - least((CASE WHEN len(text) > 0
                            THEN (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE / len(text)::INT
                            ELSE 0.0 END) * 5.0, 1.0)) * 0.3 +
                       least((CASE WHEN len(toks) > 0
                            THEN len(list_filter(toks, x -> list_contains($sqlStop, x)))::DOUBLE / len(toks)::INT
                            ELSE 0.0 END) * 4.0, 1.0) * 0.3, 6) AS quality
                 FROM t),
          h AS (SELECT doc_id, $hitExprs FROM t),
          lang AS (SELECT doc_id, CASE WHEN $m = 0 THEN 'und'
                          WHEN h_fr = $m THEN 'fr' WHEN h_es = $m THEN 'es'
                          WHEN h_en = $m THEN 'en' ELSE 'de' END AS lang_pred FROM h),
          keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($sqlNorm)),
          sv AS (SELECT d.doc_id,
                  (CASE WHEN len(trim(d.text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END)::BIGINT AS n_tokens
                 FROM documents d
                 WHERE d.doc_id IN (SELECT doc_id FROM qual WHERE quality >= 0.7)
                   AND d.doc_id IN (SELECT doc_id FROM lang WHERE lang_pred = 'en')
                   AND d.doc_id IN (SELECT doc_id FROM keep)
                   AND ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90),
          s AS (SELECT doc_id, n_tokens,
                 (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS start_offset
                FROM sv)
          SELECT doc_id, n_tokens, start_offset, (start_offset // 2048)::BIGINT AS chunk
          FROM s ORDER BY doc_id"""
    },
    "x8_hash_split" ->
      """SELECT doc_id,
                (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100) AS bucket,
                CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90
                     THEN 'train' ELSE 'val' END AS split
         FROM documents ORDER BY doc_id""",
    "x10_pii_redact" -> {
      // the same planted-dirty construction, then RE2 replays of the
      // java.util.regex patterns (kept lookaround-free for parity);
      // DuckDB regexp_replace needs the 'g' flag to scrub every match
      val plant =
        """text ||
           CASE WHEN doc_id % 7 = 0
                THEN ' reach me at user' || doc_id::VARCHAR || '@example.com ok'
                ELSE '' END ||
           CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 now' ELSE '' END ||
           CASE WHEN doc_id % 13 = 0 THEN ' host 192.168.1.77 down' ELSE '' END"""
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      s"""WITH dirty AS (SELECT doc_id, $plant AS dirty FROM documents),
          -- counts fold in REDACTION ORDER (each pattern against the
          -- previous pattern's output), mirroring piiCount: overlapping
          -- PII counts once, exactly as it is scrubbed
          r1 AS (SELECT doc_id, dirty,
                        regexp_replace(dirty, '$email', '<EMAIL>', 'g') AS t1
                 FROM dirty),
          r2 AS (SELECT doc_id, dirty, t1,
                        regexp_replace(t1, '$phone', '<PHONE>', 'g') AS t2
                 FROM r1)
          SELECT doc_id,
                 (len(regexp_extract_all(dirty, '$email')) +
                  len(regexp_extract_all(t1, '$phone')) +
                  len(regexp_extract_all(t2, '$ip')))::BIGINT AS n_pii,
                 regexp_replace(t2, '$ip', '<IP>', 'g') AS redacted
          FROM r2 ORDER BY doc_id"""
    },
    "d11_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                    FROM documents WHERE len(trim(text)) > 0),
          c AS (SELECT doc_id, i::BIGINT AS chunk_idx,
                       md5(array_to_string(toks[i*32+1:i*32+32], ' ')) AS fp
                FROM t, unnest(range((len(toks)-1)//32 + 1)) AS u(i)),
          f AS (SELECT doc_id, chunk_idx, fp,
                       min(ROW(doc_id, chunk_idx)) OVER (PARTITION BY fp) AS first_seen
                FROM c)
          SELECT doc_id, chunk_idx, fp,
                 (ROW(doc_id, chunk_idx) <> first_seen) AS is_dup
          FROM f ORDER BY doc_id, chunk_idx""",
    "d19_substring_dedup" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          g AS (SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS gram
                FROM (SELECT doc_id, toks,
                             unnest(generate_series(1, len(toks)-7)) AS pos
                      FROM t WHERE len(toks) >= 8)),
          rep AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g)
                  GROUP BY gram HAVING count(*) >= 2),
          mp AS (SELECT DISTINCT doc_id, p FROM (
                  SELECT g.doc_id, unnest(generate_series(g.pos, g.pos + 7)) AS p
                  FROM g JOIN rep USING (gram))),
          sp AS (SELECT doc_id, count(*)::BIGINT AS n_masked,
                        sum(CASE WHEN prev IS NULL OR prev <> p - 1
                                 THEN 1 ELSE 0 END)::BIGINT AS n_spans
                 FROM (SELECT doc_id, p,
                              lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
                       FROM mp)
                 GROUP BY doc_id),
          tk AS (SELECT doc_id, pos, toks[pos] AS tok
                 FROM (SELECT doc_id, toks,
                              unnest(generate_series(1, len(toks))) AS pos
                       FROM t)),
          cl AS (SELECT tk.doc_id,
                        string_agg(tk.tok, ' ' ORDER BY tk.pos) AS cleaned
                 FROM tk LEFT JOIN mp ON tk.doc_id = mp.doc_id AND tk.pos = mp.p
                 WHERE mp.p IS NULL GROUP BY tk.doc_id)
          SELECT t.doc_id, len(toks)::BIGINT AS n_tokens,
                 coalesce(sp.n_masked, 0)::BIGINT AS n_masked,
                 coalesce(sp.n_spans, 0)::BIGINT AS n_spans,
                 coalesce(cl.cleaned, '') AS cleaned_text
          FROM t LEFT JOIN sp USING (doc_id) LEFT JOIN cl USING (doc_id)
          ORDER BY doc_id""",
    "x11_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE (('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100)
               < (CASE lang WHEN 'en' THEN 90 WHEN 'de' THEN 60
                            WHEN 'zh' THEN 45 WHEN 'fr' THEN 30
                            WHEN 'es' THEN 10 ELSE 100 END)
         ORDER BY doc_id""",
    "x12_shuffle_batches" ->
      """WITH k AS (SELECT doc_id, md5('42:' || doc_id::VARCHAR) AS skey
                    FROM documents),
          r AS (SELECT doc_id, skey,
                       (row_number() OVER (ORDER BY skey, doc_id) - 1)::BIGINT AS pos
                FROM k)
          SELECT doc_id, skey, pos, pos // 64 AS batch_id
          FROM r ORDER BY doc_id""",
    "n6_label_centroids" ->
      """WITH u AS (SELECT label, i AS pos,
                           floor(embedding[i]::DOUBLE * 1000000 + 0.5)::BIGINT AS u6,
                           vec_id
                    FROM embeddings,
                         unnest(generate_series(1, len(embedding))) AS t(i)),
          p AS (SELECT label, pos, sum(u6)::BIGINT AS s, count(*)::BIGINT AS n
                FROM u GROUP BY 1, 2)
          SELECT label, max(n)::BIGINT AS n_vectors,
                 string_agg(floor(s::DOUBLE / n + 0.5)::BIGINT::VARCHAR,
                            '|' ORDER BY pos) AS centroid_u6
          FROM p GROUP BY label ORDER BY label""",
    "j15_full_outer" ->
      """WITH bc AS (SELECT c_custkey, c_mktsegment FROM customer
                     WHERE c_mktsegment = 'BUILDING'),
          oc AS (SELECT o_custkey, count(*)::BIGINT AS n_orders,
                        round(sum(o_totalprice), 2) AS total_spend
                 FROM orders GROUP BY 1)
          SELECT coalesce(c_custkey, o_custkey) AS custkey,
                 coalesce(c_mktsegment, 'NONE') AS segment,
                 coalesce(n_orders, 0)::BIGINT AS n_orders,
                 coalesce(total_spend, 0.0) AS total_spend
          FROM bc FULL OUTER JOIN oc ON c_custkey = o_custkey
          ORDER BY custkey""",
    "x15_unigram_score" ->
      s"""WITH p AS (SELECT doc_id, unnest(${sqlToks(sqlNorm)}) AS tok
                     FROM documents),
          v AS (SELECT tok, count(*)::BIGINT AS tf FROM p GROUP BY 1)
          SELECT doc_id, count(*)::BIGINT AS n_tokens,
                 sum(tf)::BIGINT AS sum_tf,
                 round(sum(tf) / count(*), 6) AS mean_tf
          FROM p JOIN v USING (tok) GROUP BY 1 ORDER BY 1""",
    // x32: hashed-unigram DSIR likelihood ratios — identical md5
    // bucketing and ×10^6 integer division on both engines
    "x32_dsir" ->
      s"""WITH p AS (SELECT doc_id, lang, unnest(${sqlToks(sqlNorm)}) AS tok
                     FROM documents),
          f AS (SELECT doc_id,
                       ('0x' || substr(md5(tok), 1, 6))::BIGINT % 256 AS f,
                       lang
                FROM p),
          s AS (SELECT f,
                       (sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)::BIGINT AS nt,
                       (count(*) + 1)::BIGINT AS nr
                FROM f GROUP BY 1),
          j AS (SELECT doc_id, (nt * 1000000) // nr AS c
                FROM f JOIN s USING (f))
          SELECT doc_id, count(*)::BIGINT AS n_tokens,
                 (sum(c) // count(*))::BIGINT AS dsir_e6
          FROM j GROUP BY 1 ORDER BY 1""",
    // x33: the Stupid-Backoff bigram LM replay — same reference
    // slice, same integer micro-unit arithmetic
    "x33_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          bg AS (SELECT doc_id, unnest(list_transform(
                          generate_series(1, len(toks) - 1),
                          i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS b
                 FROM t WHERE len(toks) >= 2),
          bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
          c1 AS (SELECT w, count(*)::BIGINT AS c1
                 FROM (SELECT unnest(toks) AS w FROM t WHERE doc_id % 10 = 0)
                 GROUP BY 1),
          c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bgf
                 WHERE doc_id % 10 = 0 GROUP BY 1, 2),
          nr AS (SELECT coalesce(sum(len(toks)), 0)::BIGINT AS n_ref
                 FROM t WHERE doc_id % 10 = 0),
          sc AS (SELECT bgf.doc_id,
                        CASE WHEN c2.c2 IS NOT NULL AND a.c1 IS NOT NULL
                             THEN (c2.c2 * 1000000) // a.c1
                             ELSE (coalesce(b2.c1, 0) * 400000)
                                  // greatest(nr.n_ref, 1) END AS s
                 FROM bgf
                 LEFT JOIN c2 ON bgf.w1 = c2.w1 AND bgf.w2 = c2.w2
                 LEFT JOIN c1 a ON bgf.w1 = a.w
                 LEFT JOIN c1 b2 ON bgf.w2 = b2.w, nr),
          pd AS (SELECT doc_id, count(*)::BIGINT AS nb,
                        sum(s)::BIGINT AS sum_e6
                 FROM sc GROUP BY 1)
          SELECT t.doc_id, coalesce(pd.nb, 0)::BIGINT AS n_bigrams,
                 (CASE WHEN pd.nb IS NULL THEN 0
                       ELSE pd.sum_e6 // pd.nb END)::BIGINT AS lm_e6
          FROM t LEFT JOIN pd USING (doc_id) ORDER BY t.doc_id""",
    "x14_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, $sqlShingles AS sh FROM t),
          p AS (SELECT doc_id, unnest(sh) AS sh1 FROM s),
          d AS (SELECT sh1, count(*)::BIGINT AS df FROM p GROUP BY 1)
          SELECT p.doc_id, count(*)::BIGINT AS n_shingles,
                 sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_common,
                 round(sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) / count(*), 6)
                   AS boilerplate_ratio
          FROM p JOIN d USING (sh1) GROUP BY 1 ORDER BY 1""",
    "x19_bpe" ->
      """SELECT * FROM (VALUES
           (1::BIGINT, 'the|the|n|the|re|!', 6::BIGINT),
           (2::BIGINT, 'to|b|e|or|n|o|t|to|b|e', 10::BIGINT),
           (3::BIGINT, 'and|an|o|the|r|th|in|g', 8::BIGINT),
           (4::BIGINT, 'r|at|-|a|-|t|at|4|2|th|or', 11::BIGINT),
           (5::BIGINT, '', 0::BIGINT))
         AS t(doc_id, tokens, n_bpe) ORDER BY doc_id""",
    "x18_heavy_hitters" ->
      s"""WITH p AS (SELECT unnest(${sqlToks("lower(text)")}) AS token FROM documents)
          SELECT t.token, coalesce(c.n_exact, 0)::BIGINT AS n_exact,
                 TRUE AS never_under, TRUE AS overshoot_bounded
          FROM (VALUES ('the'),('and'),('of'),('to'),('in')) AS t(token)
          LEFT JOIN (SELECT token, count(*)::BIGINT AS n_exact
                     FROM p GROUP BY 1) c USING (token)
          ORDER BY token""",
    "sk1_salted_collect" ->
      """SELECT l_returnflag,
                array_to_string(list(l_orderkey::VARCHAR || ':' || l_linenumber
                                     ORDER BY l_orderkey, l_linenumber), '|') AS items
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "sk2_salted_sum" ->
      """SELECT l_returnflag, sum(l_quantity) AS total, count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "a8_significant_terms" ->
      s"""WITH raw AS (SELECT lang AS cat, doc_id AS id,
                              unnest(${sqlToks("lower(text)")}) AS token
                       FROM documents),
          tok AS (SELECT DISTINCT cat, id, token FROM raw),
          fg AS (SELECT cat, token, count(*)::BIGINT AS fg_df
                 FROM tok GROUP BY 1, 2),
          bg AS (SELECT token, sum(fg_df)::BIGINT AS bg_df FROM fg GROUP BY 1),
          cs AS (SELECT lang AS cat, count(*)::BIGINT AS n_cat
                 FROM documents GROUP BY 1),
          tot AS (SELECT sum(n_cat)::DOUBLE AS n FROM cs),
          sc AS (SELECT fg.cat, fg.token, fg.fg_df, bg.bg_df,
                        round((fg.fg_df::DOUBLE / cs.n_cat - bg.bg_df::DOUBLE / tot.n)
                              * (fg.fg_df::DOUBLE / cs.n_cat)
                              / (bg.bg_df::DOUBLE / tot.n), 6) AS score
                 FROM fg JOIN bg USING (token) JOIN cs USING (cat), tot),
          rk AS (SELECT *, row_number() OVER (PARTITION BY cat
                              ORDER BY score DESC, token)::BIGINT AS rk
                 FROM sc)
          SELECT cat, token, fg_df, bg_df, score, rk
          FROM rk WHERE rk <= 3 ORDER BY cat, rk""",
    "f5_fuzzy_match" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id,
                       len(list_filter(toks, x -> abs(len(x) - 7) <= 1
                           AND levenshtein(x, 'custmer') <= 1))::BIGINT AS n_fuzzy
                FROM t)
          SELECT doc_id, n_fuzzy FROM m WHERE n_fuzzy > 0 ORDER BY doc_id""",
    "x22_text_chunks" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id, toks, len(toks)::BIGINT AS n,
                       greatest(1, (len(toks)::BIGINT - 16 + 47) // 48) AS nc
                FROM t WHERE len(toks) > 0),
          u AS (SELECT doc_id, toks, n,
                       unnest(generate_series(0, nc - 1)) AS ci FROM m)
          SELECT doc_id, ci::BIGINT AS chunk_idx,
                 array_to_string(toks[ci*48+1 : ci*48+64], ' ') AS chunk_text,
                 least(64, n - ci*48)::BIGINT AS n_chunk_tokens
          FROM u ORDER BY doc_id, chunk_idx""",
    "x21_nfkc" ->
      """SELECT * FROM (VALUES
           (1::BIGINT, 'fine flow', FALSE),
           (2::BIGINT, 'Hello 123', FALSE),
           (3::BIGINT, 'x2 + y3', FALSE),
           (4::BIGINT, 'パンダ', FALSE),
           (5::BIGINT, 'plain ascii', TRUE))
         AS t(doc_id, norm, unchanged) ORDER BY doc_id""",
    "x20_winsorize" ->
      """WITH li AS (SELECT l_returnflag,
                            round(l_extendedprice*100, 0)::BIGINT * 100 AS pc100
                     FROM lineitem),
          t AS (SELECT l_returnflag,
                       CAST(round(quantile_cont(pc100, 0.99), 0) AS BIGINT) AS t_c100
                FROM li GROUP BY 1)
          SELECT l.l_returnflag, max(t.t_c100)::BIGINT AS t_c100,
                 sum(least(l.pc100, t.t_c100))::BIGINT AS sum_clipped,
                 sum(CASE WHEN l.pc100 > t.t_c100 THEN 1 ELSE 0 END)::BIGINT AS n_clipped
          FROM li l JOIN t USING (l_returnflag) GROUP BY 1 ORDER BY 1""",
    "z2_rank_bucket" ->
      """SELECT 16::BIGINT AS n_buckets,
                (SELECT count(*) FROM events)::BIGINT AS n_rows,
                TRUE AS depth_balanced""",
    "z1_zorder" ->
      s"""SELECT event_id, (user_id % 256)::BIGINT AS ua,
                 (floor(value / 2.0)::BIGINT % 256)::BIGINT AS vb,
                 ${operators.Prune.zvalueSql("(user_id % 256)",
                   "(floor(value / 2.0)::BIGINT % 256)")} AS z
          FROM events ORDER BY event_id""",
    "bf1_bloom_prefilter" ->
      """SELECT (SELECT count(*) FROM lineitem l
                 WHERE EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey
                                 AND o.o_orderpriority = '1-URGENT'))::BIGINT AS n_exact,
                TRUE AS no_false_negatives, TRUE AS fp_bounded""",
    "x16_source_cap" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5('cap:' || doc_id::VARCHAR), doc_id)::BIGINT AS rk
           FROM documents) WHERE rk <= 15 ORDER BY source, rk""",
    "x17_soft_filter" ->
      s"""WITH t AS (SELECT doc_id, text, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                       CASE WHEN len(text) > 0
                            THEN (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE / len(text)::INT
                            ELSE 0.0 END AS punct_ratio,
                       CASE WHEN len(toks) > 0
                            THEN len(list_filter(toks, t -> list_contains($sqlStop, t)))::DOUBLE / len(toks)::INT
                            ELSE 0.0 END AS stop_ratio
                FROM t),
          q AS (SELECT doc_id,
                       round(least(n_tokens::DOUBLE / 20.0, 1.0) * 0.4 +
                             (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
                             least(stop_ratio * 4.0, 1.0) * 0.3, 6) AS quality
                FROM m)
          SELECT doc_id, quality FROM q
          WHERE (('0x' || substr(md5('soft:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000)
                < floor(least(greatest((quality - 0.4) / (0.9 - 0.4), 0.0), 1.0) * 10000)
          ORDER BY doc_id""",
    "n8_pq_adc" ->
      // constant-TRUE by construction EXCEPT planted_found, which is
      // fixture-dependent in one residual case: k vectors whose
      // quantized codes score STRICTLY above the probe's own encoding
      // would evict the planted copy (ADC ties cannot — the rank
      // window prefers the planted row at equal ADC, and
      // planted_score_is_self is code-equality-implied regardless of
      // retrieval). Verified to hold on this corpus; same caveat
      // discipline as n7's planted_rank1.
      """SELECT * FROM (VALUES
           (1::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
           (101::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
           (202::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE))
         AS t(qid, k_bounded, codes_in_range, planted_codes_match,
              planted_found, planted_score_is_self, ranked_desc)
         ORDER BY qid""",
    "n9_ivf_pq" ->
      // constant-TRUE by construction EXCEPT planted_found (the n8
      // caveat: k STRICTLY-above ADC scores inside the probed cells
      // would evict the planted copy; ties cannot — planted-first
      // tie-break). cell/codes/bias equalities are float-exact: ×2
      // scaling cancels in v/nrm, so the planted row's cell ranking,
      // residual, and codes are bit-identical to the probe's.
      """SELECT * FROM (VALUES
           (1::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
           (101::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
           (202::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE))
         AS t(qid, k_bounded, codes_in_range, cells_probed_only,
              planted_cell_match, planted_codes_match, planted_in_probed,
              planted_found, planted_score_is_self, ranked_desc)
         ORDER BY qid""",
    "n7_quantized_rerank" ->
      """SELECT * FROM (VALUES
           (1::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
           (101::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
           (202::BIGINT, TRUE, TRUE, TRUE, TRUE, TRUE, TRUE))
         AS t(qid, k_bounded, from_stage1, scores_exact,
              planted_found, planted_rank1, ranked_desc)
         ORDER BY qid""",
    "d12_incremental_minhash" ->
      s"""WITH nw AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
          st AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
          nt AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM nw),
          ns AS (SELECT doc_id, $sqlShingles AS sh FROM nt),
          ot AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM st),
          os AS (SELECT doc_id, $sqlShingles AS sh FROM ot),
          np AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM ns),
          op AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM os),
          j AS (SELECT n.doc_id AS nid, o.doc_id AS oid,
                       any_value(n.setsize) AS sa, any_value(o.setsize) AS sb,
                       count(*)::INT AS inter
                FROM np n JOIN op o ON n.sh1 = o.sh1 GROUP BY 1, 2),
          d AS (SELECT nid, min(oid) AS dup_of FROM j
                WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5
                GROUP BY 1)
          SELECT nw.doc_id, d.dup_of, d.dup_of IS NULL AS is_new
          FROM nw LEFT JOIN d ON nw.doc_id = d.nid
          ORDER BY nw.doc_id""",
    // d18: full replay of the strict admission policy — exact-new
    // fingerprints, one representative per fingerprint (min id),
    // near-dup verify of the representatives against the standing
    // side (the d12 CTE), admission = exact-new AND rep not near-dup
    "d18_strict_admission" ->
      s"""WITH nw AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
          st AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
          bf AS (SELECT doc_id, md5($sqlNorm) AS fp FROM nw),
          sf AS (SELECT DISTINCT md5($sqlNorm) AS fp FROM st),
          reps AS (SELECT fp, min(doc_id) AS rep FROM bf
                   WHERE fp IS NOT NULL
                     AND fp NOT IN (SELECT fp FROM sf WHERE fp IS NOT NULL)
                   GROUP BY fp),
          rt AS (SELECT r.rep AS doc_id, ${sqlToks(sqlNorm)} AS toks
                 FROM reps r JOIN nw n ON n.doc_id = r.rep),
          rs AS (SELECT doc_id, $sqlShingles AS sh FROM rt),
          ot AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM st),
          os AS (SELECT doc_id, $sqlShingles AS sh FROM ot),
          rp AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM rs),
          op AS (SELECT doc_id, len(sh)::INT AS setsize, unnest(sh) AS sh1 FROM os),
          j AS (SELECT r.doc_id AS rid, o.doc_id AS oid,
                       any_value(r.setsize) AS sa, any_value(o.setsize) AS sb,
                       count(*)::INT AS inter
                FROM rp r JOIN op o ON r.sh1 = o.sh1 GROUP BY 1, 2),
          nd AS (SELECT DISTINCT rid FROM j
                 WHERE inter::DOUBLE / (sa + sb - inter)::DOUBLE >= 0.5),
          adm AS (SELECT fp FROM reps
                  WHERE rep NOT IN (SELECT rid FROM nd))
          SELECT b.doc_id,
                 coalesce(b.fp IS NOT NULL AND
                   b.fp NOT IN (SELECT fp FROM sf WHERE fp IS NOT NULL),
                   false) AS exact_new,
                 coalesce(b.fp IN (SELECT fp FROM adm), false) AS admitted
          FROM bf b ORDER BY b.doc_id""",
    "n5_quantize" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> x::DOUBLE) AS v
                    FROM embeddings),
          a AS (SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) AS amax
                FROM e),
          c AS (SELECT vec_id, v, amax,
                       CASE WHEN amax > 0
                            THEN list_transform(v, x -> floor(x / (amax / 127.0) + 0.5)::INT)
                            ELSE list_transform(v, x -> 0) END AS q
                FROM a)
          SELECT vec_id, array_to_string(q, '|') AS q,
                 (CASE WHEN amax > 0
                       THEN list_max(list_transform(generate_series(1, len(v)),
                              i -> abs(v[i] - q[i] * (amax / 127.0))))
                       ELSE 0.0 END) <= 1.0000001 * amax / 254.0 AS ok
          FROM c ORDER BY vec_id""",
    "x13_mixture_stats" ->
      """WITH per AS (
           SELECT lang, count(*)::BIGINT AS n_docs,
                  sum(CASE WHEN len(trim(text)) = 0 THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\s+'))
                      END)::BIGINT AS n_tokens
           FROM documents GROUP BY lang)
         SELECT lang, n_docs, n_tokens,
                round(n_tokens / (SELECT sum(n_tokens) FROM per), 6)
                  AS token_share
         FROM per ORDER BY lang""",
    "d9_contamination" ->
      s"""WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0),
          ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
          tt AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM tr),
          ts AS (SELECT doc_id, $sqlShingles AS sh FROM tt),
          et AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM ev),
          es AS (SELECT DISTINCT unnest($sqlShingles) AS sh1
                 FROM et),
          tp AS (SELECT doc_id, unnest(sh) AS sh1 FROM ts),
          sh AS (SELECT tp.doc_id, count(*)::BIGINT AS n_shared
                 FROM tp JOIN es ON tp.sh1 = es.sh1 GROUP BY 1)
          SELECT tr.doc_id, coalesce(sh.n_shared, 0)::BIGINT AS n_shared,
                 coalesce(sh.n_shared, 0) >= 5 AS contaminated
          FROM tr LEFT JOIN sh ON tr.doc_id = sh.doc_id
          ORDER BY tr.doc_id""",
    "d16_contamination_fraction" ->
      s"""WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0),
          ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
          tt AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM tr),
          trg AS (SELECT DISTINCT unnest($sqlShingles) AS g
                  FROM (SELECT doc_id, toks FROM tt)),
          et AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM ev),
          eg AS (SELECT doc_id, unnest(sh) AS g
                 FROM (SELECT doc_id, $sqlShingles AS sh FROM et)),
          m AS (SELECT eg.doc_id, count(*)::BIGINT AS n_grams,
                       sum(CASE WHEN trg.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
                FROM eg LEFT JOIN trg ON eg.g = trg.g GROUP BY 1)
          SELECT doc_id, n_grams, n_hit,
                 (n_hit * 10000 // greatest(n_grams, 1))::BIGINT AS overlap_bp,
                 n_hit * 10000 // greatest(n_grams, 1) >= 5000 AS contaminated
          FROM m ORDER BY doc_id""",
    "x9_repetition" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks(sqlNorm)} AS toks FROM documents),
          m AS (SELECT doc_id,
                 greatest(len(toks) - 2, 0)::BIGINT AS total_3grams,
                 (CASE WHEN len(toks) >= 3
                       THEN len(list_distinct(list_transform(generate_series(1, len(toks)-2), i -> array_to_string(toks[i:i+2], ' '))))
                       ELSE 0 END)::BIGINT AS distinct_3grams
                FROM t)
          SELECT doc_id, total_3grams, distinct_3grams,
                 CASE WHEN total_3grams > 0
                      THEN round(1.0 - distinct_3grams::DOUBLE / total_3grams, 6)
                      ELSE 0.0 END AS dup_ratio
          FROM m ORDER BY doc_id""",
    "x7_pack_chunks" ->
      """WITH c AS (SELECT doc_id,
                 (CASE WHEN len(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::BIGINT AS n_tokens
          FROM documents),
          s AS (SELECT doc_id, n_tokens,
                 (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS start_offset
          FROM c)
          SELECT doc_id, n_tokens, start_offset, (start_offset // 2048)::BIGINT AS chunk
          FROM s ORDER BY doc_id""",
    "x4_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, md5($sqlNorm) AS md5_full, ${sqlToks(sqlNorm)} AS toks FROM documents),
          s AS (SELECT doc_id, md5_full, $sqlShingles AS sh FROM t)
          SELECT doc_id, md5_full,
                 list_aggregate(list_transform(sh, x -> md5(x)), 'min') AS min_shingle_md5
          FROM s ORDER BY doc_id""",
    "e1_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
                round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "e2_sessionize" ->
      """WITH g AS (SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                                THEN 1 ELSE 0 END AS new_s
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
                FROM g)
          SELECT user_id, session_idx, count(*) AS n_events,
                 round(sum(value), 2) AS session_value,
                 date_diff('second', min(ts), max(ts))::BIGINT AS duration_s
          FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "e3_sliding" ->
      """SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end, event_type,
                count(*) AS n, round(sum(value), 2) AS sum_value
         FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                              time_bucket(INTERVAL '30 minutes', ts)]) AS win_start,
                      event_type, value
               FROM events)
         GROUP BY win_start, event_type ORDER BY win_start, event_type""",
    "e5_asof_join" ->
      """WITH p AS (SELECT user_id, ts, max_by(value, event_id) AS p_value
                    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, e.ts, e.event_type,
                round(coalesce(p.p_value, 0.0), 2) AS last_purchase_value
         FROM events e ASOF LEFT JOIN p
           ON e.user_id = p.user_id AND e.ts >= p.ts
         ORDER BY e.event_id""",
    "e6_range_join" ->
      """WITH iv AS (SELECT event_id AS interval_id,
                            ts - INTERVAL 45 MINUTE AS start_ts,
                            ts + INTERVAL 45 MINUTE AS end_ts
                     FROM events WHERE event_type = 'purchase' AND user_id = 1)
         SELECT iv.interval_id, count(*)::BIGINT AS n_in_range,
                round(sum(e.value), 2) AS range_value
         FROM iv JOIN events e ON e.ts BETWEEN iv.start_ts AND iv.end_ts
         GROUP BY 1 ORDER BY 1""",
    "e4_session_window" ->
      """WITH g AS (SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                                THEN 1 ELSE 0 END AS new_s
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM g)
          SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
                 user_id, count(*) AS n_events, round(sum(value), 2) AS session_value
          FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "m1_media_meta" ->
      """SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
                'txt' AS format, md5(text) AS content_md5
         FROM documents ORDER BY media_id""",
    // streaming convergence oracles: the batch answer the finite
    // stream must reach (st2's input is the table delivered twice —
    // the dedup operator must collapse it back to ONE copy, so the
    // single-copy aggregate IS the check)
    "st1_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*)::BIGINT AS n,
                round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "st2_stream_dedup" ->
      """SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",
    // st9: exact counts + the constant-TRUE convergence contract
    // (stream sketch ≡ batch sketch; the estimate itself is
    // engine-specific and never compared)
    "st9_stream_sketch" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(DISTINCT user_id)::BIGINT AS exact_users,
                count(*) AS n, TRUE AS stream_eq_batch
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "st3_stream_state" ->
      """SELECT user_id, count(*)::BIGINT AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "sql2_sql_functions" -> OracleSql.porterTokensSql,
    "sql1_analyst" ->
      """WITH li AS (SELECT l_orderkey, count(*)::BIGINT AS n_items FROM lineitem GROUP BY 1),
          ann AS (SELECT l.l_orderkey, count(*)::BIGINT AS n_annotations
                  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                                  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                                  JOIN nation n ON s.s_nationkey = n.n_nationkey
                  GROUP BY 1)
          SELECT o.o_orderkey AS id, c.c_custkey AS author_id,
                 coalesce(li.n_items, 0)::BIGINT AS n_items,
                 coalesce(ann.n_annotations, 0)::BIGINT AS n_annotations
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          LEFT JOIN li ON li.l_orderkey = o.o_orderkey
          LEFT JOIN ann ON ann.l_orderkey = o.o_orderkey
          ORDER BY id""",
    "st4_stream_denorm" ->
      """WITH li AS (SELECT l_orderkey, count(*)::INT AS n_items FROM lineitem GROUP BY 1),
          ann AS (SELECT l_orderkey, count(*)::INT AS n_annotations
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                                JOIN supplier s ON l_suppkey = s.s_suppkey
                                JOIN nation n ON s.s_nationkey = n.n_nationkey
                  GROUP BY 1)
          SELECT o.o_orderkey AS id, c.c_custkey AS author_id,
                 coalesce(li.n_items, 0)::INT AS n_items,
                 coalesce(ann.n_annotations, 0)::INT AS n_annotations
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          LEFT JOIN li ON li.l_orderkey = o.o_orderkey
          LEFT JOIN ann ON ann.l_orderkey = o.o_orderkey
          ORDER BY id""",
    "st5_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
         ORDER BY purchase_id, click_id""",
    "a9_composite_agg" ->
      """SELECT source, lang, count(*)::BIGINT AS doc_count,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents
         WHERE source > 'src12' OR (source = 'src12' AND lang > 'fr')
         GROUP BY 1, 2 ORDER BY source, lang LIMIT 10""",
    "a10_histogram" ->
      """WITH b AS (SELECT floor(n_chars / 50)::BIGINT * 50 AS bucket,
                           count(*)::BIGINT AS doc_count
                    FROM documents GROUP BY 1),
          ext AS (SELECT floor(min(n_chars) / 50)::BIGINT * 50 AS lo,
                         floor(max(n_chars) / 50)::BIGINT * 50 AS hi
                  FROM documents),
          dom AS (SELECT unnest(generate_series(lo, hi, 50)) AS bucket FROM ext)
          SELECT dom.bucket, coalesce(b.doc_count, 0)::BIGINT AS doc_count
          FROM dom LEFT JOIN b USING (bucket) ORDER BY bucket""",
    "a11_rare_terms" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          sh AS (SELECT doc_id, unnest(list_distinct(toks ||
                   list_transform(generate_series(1, len(toks)-1),
                                  i -> toks[i] || toks[i+1]))) AS term
                 FROM t),
          v AS (SELECT term, count(*)::BIGINT AS doc_count FROM sh GROUP BY 1)
          SELECT term, doc_count FROM v WHERE doc_count <= 2 ORDER BY term""",
    // a31: full replay of the ES shard-merge protocol — per-shard
    // top-10 term counts over Knuth-hash shards, coordinator sum of
    // returned counts, error bound from non-returning shards' minima
    "a31_terms_shard_error" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          u0 AS (SELECT doc_id, unnest(toks) AS term FROM t),
          u AS (SELECT DISTINCT doc_id, term FROM u0),
          sc AS (SELECT (doc_id * 2654435761) % 4294967296 % 4 AS shard,
                        term, count(*)::BIGINT AS c
                 FROM u GROUP BY 1, 2),
          k AS (SELECT shard, term, c,
                       row_number() OVER (PARTITION BY shard
                                          ORDER BY c DESC, term) AS rk
                FROM sc),
          kept AS (SELECT shard, term, c FROM k WHERE rk <= 10),
          sm AS (SELECT shard,
                        CASE WHEN count(*) < 10 THEN 0 ELSE min(c) END AS smin
                 FROM kept GROUP BY 1),
          g AS (SELECT term, sum(c)::BIGINT AS doc_count FROM kept GROUP BY 1),
          top AS (SELECT term, doc_count FROM g
                  ORDER BY doc_count DESC, term LIMIT 10),
          miss AS (SELECT top.term, sm.smin FROM top CROSS JOIN sm
                   WHERE NOT EXISTS (SELECT 1 FROM kept
                                     WHERE kept.term = top.term
                                       AND kept.shard = sm.shard)),
          e AS (SELECT term, sum(smin)::BIGINT AS err FROM miss GROUP BY 1)
          SELECT top.term, top.doc_count,
                 coalesce(e.err, 0)::BIGINT AS doc_count_error_upper_bound
          FROM top LEFT JOIN e ON e.term = top.term
          ORDER BY top.doc_count DESC, top.term""",
    // a33: market-basket level-2 replay (self-join form — the set
    // semantics, not the array mechanics)
    "a33_frequent_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, p_brand AS brand
                    FROM lineitem JOIN part ON l_partkey = p_partkey),
          n AS (SELECT count(DISTINCT o) AS nb FROM b),
          pr AS (SELECT a.brand AS brand_a, bb.brand AS brand_b,
                        count(*)::BIGINT AS support
                 FROM b a JOIN b bb ON a.o = bb.o AND a.brand < bb.brand
                 GROUP BY 1, 2)
         SELECT brand_a, brand_b, support,
                (support * 10000 // nb)::BIGINT AS support_bp
         FROM pr, n WHERE support * 10000 // nb >= 100
         ORDER BY support DESC, brand_a, brand_b LIMIT 20""",
    // a34: identical pure-string templating replayed directly
    "a34_categorize" ->
      """WITH t AS (SELECT doc_id,
                           trim(regexp_replace(
                             regexp_replace(lower(text), '[0-9]+', '<n>', 'g'),
                             '\s+', ' ', 'g')) AS category
                    FROM documents)
         SELECT category, count(*)::BIGINT AS doc_count,
                min(doc_id) AS example_doc
         FROM t GROUP BY 1 ORDER BY doc_count DESC, category LIMIT 10""",
    // w14: the ordered-struct max replayed as a rank-1 window
    "w14_top_metrics" ->
      """WITH r AS (SELECT event_type, ts, event_id,
                           floor(value * 100 + 0.5)::BIGINT AS cents,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY ts DESC, event_id DESC) AS rk
                    FROM events)
         SELECT event_type, ts AS last_ts, event_id AS last_event_id,
                cents AS last_cents
         FROM r WHERE rk = 1 ORDER BY event_type""",
    // a32: the first-seen reformulation replayed directly
    "a32_cumulative_cardinality" ->
      """WITH f AS (SELECT user_id, min(date_trunc('hour', ts))::TIMESTAMP AS hour
                    FROM events GROUP BY 1),
          d AS (SELECT hour, count(*)::BIGINT AS new_users FROM f GROUP BY 1)
         SELECT hour, new_users,
                (sum(new_users) OVER (ORDER BY hour
                   ROWS UNBOUNDED PRECEDING))::BIGINT AS cumulative_users
         FROM d ORDER BY hour""",
    "w7_pipeline_aggs" ->
      """WITH d AS (SELECT date_trunc('day', ts)::TIMESTAMP AS day,
                           count(*)::BIGINT AS n
                    FROM events GROUP BY 1)
         SELECT day, n,
                n - lag(n) OVER (ORDER BY day) AS derivative,
                (sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_n,
                round(avg(n) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg
         FROM d ORDER BY day""",
    "p11_json_extract" ->
      """WITH e AS (SELECT event_type,
                           json_extract_string(props, '$.k')::BIGINT AS k
                    FROM events)
         SELECT event_type, count(*)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
                round(sum(k)::DOUBLE / count(*), 6) AS avg_k
         FROM e WHERE k >= 50 GROUP BY 1 ORDER BY event_type""",
    "p10_phrase_match" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id,
                       ' ' || array_to_string(toks, ' ') || ' '
                         LIKE '% fast table %' AS phrase,
                       len(list_filter(range(1, greatest(len(toks), 1)),
                           i -> toks[i] = 'fast'
                                AND (toks[i+1] = 'table' OR toks[i+2] = 'table')))
                         > 0 AS near_slop1
                FROM t)
          SELECT doc_id, phrase, near_slop1 FROM m
          WHERE phrase OR near_slop1 ORDER BY doc_id""",
    "f6_more_like_this" ->
      s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(${sqlToks("lower(text)")}) AS token
                       FROM documents),
          dfs AS (SELECT token, count(*)::BIGINT AS df FROM tok GROUP BY 1),
          seed AS (SELECT t AS token, count(*)::BIGINT AS tf
                   FROM (SELECT unnest(${sqlToks("lower(text)")}) AS t
                         FROM documents WHERE doc_id = 0)
                   WHERE NOT list_contains($sqlStop, t) GROUP BY 1),
          terms AS (SELECT token FROM (
                      SELECT seed.token,
                             row_number() OVER (ORDER BY seed.tf DESC, dfs.df ASC,
                                                seed.token) AS rk
                      FROM seed JOIN dfs USING (token))
                    WHERE rk <= 10)
          SELECT tok.doc_id, count(*)::BIGINT AS n_matched
          FROM tok JOIN terms USING (token) WHERE tok.doc_id <> 0
          GROUP BY 1 ORDER BY n_matched DESC, doc_id LIMIT 20""",
    "t13_autocomplete" ->
      s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(${sqlToks("lower(text)")}) AS token
                       FROM documents),
          v AS (SELECT token, count(*)::BIGINT AS weight FROM tok GROUP BY 1)
          SELECT token, weight FROM v WHERE token LIKE 's%'
          ORDER BY weight DESC, token LIMIT 5""",
    "d13_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, label,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
                    FROM embeddings WHERE sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0),
          d AS (SELECT a.vec_id AS vec_id, min(b.vec_id) AS dup_of
                FROM embeddings a JOIN embeddings b
                  ON a.label = b.label AND a.vec_id > b.vec_id
                WHERE sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) > 0
                  AND sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) > 0
                  AND round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.35
                GROUP BY 1)
          SELECT e.vec_id, e.label::BIGINT AS cluster,
                 d.dup_of IS NULL AS kept,
                 coalesce(d.dup_of, -1)::BIGINT AS dup_of
          FROM e LEFT JOIN d ON d.vec_id = e.vec_id
          ORDER BY e.vec_id""",
    "g1_pagerank" ->
      """WITH nodes AS (SELECT o_orderkey AS id FROM orders),
          edges AS (
            SELECT id AS src, id // 2 AS dst FROM nodes WHERE id // 2 >= 1 AND id // 2 <> id
            UNION
            SELECT id AS src, id // 3 AS dst FROM nodes WHERE id // 3 >= 1 AND id // 3 <> id),
          deg AS (SELECT src, count(*)::BIGINT AS outd FROM edges GROUP BY 1),
          r0 AS (SELECT id, 1000000000000::BIGINT AS r FROM nodes),
          c1 AS (SELECT e.dst AS id, sum(r0.r // d.outd)::BIGINT AS cin
                 FROM edges e JOIN deg d ON e.src = d.src JOIN r0 ON r0.id = e.src GROUP BY 1),
          r1 AS (SELECT n.id, ((15000000000000 + 85 * coalesce(c1.cin, 0)) // 100)::BIGINT AS r
                 FROM nodes n LEFT JOIN c1 ON c1.id = n.id),
          c2 AS (SELECT e.dst AS id, sum(r1.r // d.outd)::BIGINT AS cin
                 FROM edges e JOIN deg d ON e.src = d.src JOIN r1 ON r1.id = e.src GROUP BY 1),
          r2 AS (SELECT n.id, ((15000000000000 + 85 * coalesce(c2.cin, 0)) // 100)::BIGINT AS r
                 FROM nodes n LEFT JOIN c2 ON c2.id = n.id),
          c3 AS (SELECT e.dst AS id, sum(r2.r // d.outd)::BIGINT AS cin
                 FROM edges e JOIN deg d ON e.src = d.src JOIN r2 ON r2.id = e.src GROUP BY 1),
          r3 AS (SELECT n.id, ((15000000000000 + 85 * coalesce(c3.cin, 0)) // 100)::BIGINT AS r
                 FROM nodes n LEFT JOIN c3 ON c3.id = n.id)
          SELECT id, r FROM r3 ORDER BY r DESC, id LIMIT 20""",
    "x24_temp_mixture" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS n,
                           floor(sqrt(n) * 1000000.0 + 0.5)::BIGINT AS w
                    FROM documents GROUP BY 1),
          t AS (SELECT sum(n)::BIGINT AS n_total, sum(w)::BIGINT AS z FROM c),
          rates AS (SELECT source, n,
            least(10000, (n_total::HUGEINT * w * 10000) // (2 * z::HUGEINT * n))::BIGINT AS rate_bp
            FROM c, t),
          samp AS (SELECT d.source, count(*)::BIGINT AS n_sampled
            FROM documents d JOIN rates r USING (source)
            WHERE (('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000)
                  < r.rate_bp
            GROUP BY 1)
          SELECT rates.source, rates.n, rates.rate_bp,
                 coalesce(samp.n_sampled, 0)::BIGINT AS n_sampled
          FROM rates LEFT JOIN samp USING (source) ORDER BY source""",
    "f9_multi_match" ->
      s"""WITH pre AS (SELECT doc_id, source,
                  len(list_filter(${sqlToks("lower(text)")}, x -> x = 'customer')) AS tf,
                  len(${sqlToks("lower(text)")}) AS len
           FROM documents),
          stats AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                           sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df
                    FROM pre)
          SELECT doc_id,
                 round(CASE WHEN tf > 0
                        THEN ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))
                        ELSE 0.0 END +
                       CASE WHEN source = 'src3' THEN 3.0 ELSE 0.0 END, 6) AS score
          FROM pre, stats WHERE tf > 0 OR source = 'src3'
          ORDER BY score DESC, doc_id LIMIT 20""",
    "opt1_agg_rewrite" ->
      """SELECT l_returnflag, count(l_quantity)::BIGINT AS n,
                min(l_quantity) AS mn, max(l_quantity) AS mx,
                bool_or(l_linestatus = 'F') AS has_f,
                count(DISTINCT l_linestatus)::BIGINT AS n_status
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "a16_observed_metrics" ->
      s"""WITH t AS (SELECT doc_id, text, ${sqlToks("lower(text)")} AS toks FROM documents),
          m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                       CASE WHEN len(text) > 0
                            THEN (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE / len(text)::INT
                            ELSE 0.0 END AS punct_ratio,
                       CASE WHEN len(toks) > 0
                            THEN len(list_filter(toks, t -> list_contains($sqlStop, t)))::DOUBLE / len(toks)::INT
                            ELSE 0.0 END AS stop_ratio
                FROM t),
          q AS (SELECT doc_id,
                       round(least(n_tokens::DOUBLE / 20.0, 1.0) * 0.4 +
                             (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
                             least(stop_ratio * 4.0, 1.0) * 0.3, 6) AS quality
                FROM m)
          SELECT count(*)::BIGINT AS rows_in,
                 sum(CASE WHEN quality >= 0.7 THEN 1 ELSE 0 END)::BIGINT AS rows_kept,
                 sum(CASE WHEN quality >= 0.7
                          THEN floor(quality * 1000000.0 + 0.5)::BIGINT
                          ELSE 0 END)::BIGINT AS kept_quality_u6
          FROM q""",
    "a15_weighted_avg" ->
      """WITH li AS (SELECT l_returnflag,
                            round(l_extendedprice * 100, 0)::BIGINT AS pc,
                            round(l_quantity, 0)::BIGINT AS q
                     FROM lineitem)
         SELECT l_returnflag, sum(q)::BIGINT AS wq,
                round(sum(pc * q)::DOUBLE / 100.0 / sum(q), 6) AS weighted_avg_price
         FROM li GROUP BY 1 ORDER BY l_returnflag""",
    "w8_search_after" ->
      """WITH m AS (SELECT o_orderkey,
                           abs(datediff('day', TIMESTAMP '1998-01-01',
                                        o_orderdate))::BIGINT AS dist_days
                    FROM orders)
         SELECT o_orderkey, dist_days FROM m
         WHERE dist_days > 30 OR (dist_days = 30 AND o_orderkey > 0)
         ORDER BY dist_days, o_orderkey LIMIT 20""",
    "f7_decay_score" ->
      """WITH m AS (SELECT o_orderkey,
                           abs(datediff('day', TIMESTAMP '1998-01-01',
                                        o_orderdate))::BIGINT AS dist_days
                    FROM orders)
         SELECT o_orderkey, dist_days,
                round(pow(0.5, pow(dist_days::DOUBLE / 180.0, 2.0)), 6) AS score
         FROM m ORDER BY score DESC, o_orderkey LIMIT 20""",
    "a13_filters_agg" ->
      """SELECT bucket, doc_count FROM (
           SELECT 'finished' AS bucket, count(*) FILTER (o_orderstatus = 'F')::BIGINT AS doc_count FROM orders
           UNION ALL
           SELECT 'high_value', count(*) FILTER (o_totalprice > 200000.0)::BIGINT FROM orders
           UNION ALL
           SELECT 'urgent', count(*) FILTER (o_orderpriority LIKE '1%')::BIGINT FROM orders)
         ORDER BY bucket""",
    "a14_percentile_ranks" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
                round(count(*) FILTER (l_extendedprice <= 1000.0)::DOUBLE / count(*), 6) AS rank_1k,
                round(count(*) FILTER (l_extendedprice <= 5000.0)::DOUBLE / count(*), 6) AS rank_5k,
                round(count(*) FILTER (l_extendedprice <= 20000.0)::DOUBLE / count(*), 6) AS rank_20k
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "h1_highlight" ->
      """WITH m AS (SELECT doc_id, text,
                           strpos(lower(text), 'customer') AS pos
                    FROM documents),
          f AS (SELECT doc_id, text, pos, greatest(pos - 30, 1) AS s
                FROM m WHERE pos > 0)
          SELECT doc_id,
                 substr(text, s, pos - s) || '<em>' || substr(text, pos, 8)
                   || '</em>' || substr(text, pos + 8, 30) AS fragment
          FROM f ORDER BY doc_id""",
    "e7_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                 JOIN s1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
          s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                 JOIN s2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
          SELECT '1_signup' AS stage, count(*)::BIGINT AS n_users FROM s1
          UNION ALL SELECT '2_click', count(*)::BIGINT FROM s2
          UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM s3
          ORDER BY stage""",
    "st6_stream_funnel" ->
      // the stream must converge to the batch funnel — e7's oracle,
      // verbatim
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                 JOIN s1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
          s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                 JOIN s2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
          SELECT '1_signup' AS stage, count(*)::BIGINT AS n_users FROM s1
          UNION ALL SELECT '2_click', count(*)::BIGINT FROM s2
          UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM s3
          ORDER BY stage""",
    // e10: the quadratic exists-triple SPECIFICATION of the sequence
    // match (the impl's greedy-latest window chain must agree);
    // ordering and the span bound in exact epoch microseconds
    "e10_eql_sequence" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS us,
                           event_type
                    FROM events),
          v AS (SELECT DISTINCT p.user_id, p.event_id
                FROM e s
                JOIN e c ON c.user_id = s.user_id
                        AND c.event_type = 'click' AND c.us > s.us
                JOIN e p ON p.user_id = s.user_id
                        AND p.event_type = 'purchase' AND p.us > c.us
                        AND p.us - s.us <= 21600000000
                WHERE s.event_type = 'signup')
          SELECT 21600::BIGINT AS maxspan_s,
                 count(DISTINCT user_id)::BIGINT AS n_users,
                 count(*)::BIGINT AS n_matches
          FROM v""",
    // e10b: the greedy-latest chain replayed component-by-component —
    // the same scalar last(..ignore nulls) windows over strict
    // microsecond order, so both engines emit identical chains
    "e10b_eql_hits" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts)::BIGINT AS us
                    FROM events
                    WHERE event_type IN ('signup', 'click', 'purchase')),
          c0 AS (SELECT *, CASE WHEN event_type = 'signup' THEN us END AS t0_0
                 FROM e),
          c1 AS (SELECT *,
                   CASE WHEN event_type = 'click' THEN
                     last_value(CASE WHEN event_type = 'signup' THEN t0_0 END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   END AS t1_0 FROM c0),
          c1b AS (SELECT *, CASE WHEN event_type = 'click'
                                  AND t1_0 IS NOT NULL THEN us END AS t1_1
                  FROM c1),
          c2 AS (SELECT *,
                   CASE WHEN event_type = 'purchase' THEN
                     last_value(CASE WHEN event_type = 'click' THEN t1_0 END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   END AS t2_0,
                   CASE WHEN event_type = 'purchase' THEN
                     last_value(CASE WHEN event_type = 'click' THEN t1_1 END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   END AS t2_1
                 FROM c1b),
          c2b AS (SELECT *, CASE WHEN event_type = 'purchase'
                                  AND t2_0 IS NOT NULL THEN us END AS t2_2
                  FROM c2)
          SELECT user_id, t2_0 AS t_signup_us, t2_1 AS t_click_us,
                 t2_2 AS t_purchase_us
          FROM c2b
          WHERE event_type = 'purchase' AND t2_0 IS NOT NULL
            AND us - t2_0 <= 21600000000
          ORDER BY user_id, t_signup_us, t_click_us, t_purchase_us""",
    // e9: cohort retention — both engines truncate to the same ISO
    // Monday, so the day diff is an exact multiple of 7
    "e9_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
                            date_trunc('week', ts)::TIMESTAMP AS wk
                     FROM events),
          fst AS (SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY 1),
          m AS (SELECT cohort_week,
                       (date_diff('day', cohort_week, wk) // 7)::BIGINT
                         AS week_offset,
                       count(*)::BIGINT AS n_users
                FROM wk JOIN fst USING (user_id) GROUP BY 1, 2),
          sz AS (SELECT cohort_week, n_users AS cohort_size FROM m
                 WHERE week_offset = 0)
          SELECT m.cohort_week, m.week_offset, m.n_users, sz.cohort_size,
                 (m.n_users * 10000 // sz.cohort_size)::BIGINT AS retention_bp
          FROM m JOIN sz USING (cohort_week)
          ORDER BY m.cohort_week, m.week_offset""",
    // st14: e9's matrix replay + the constant-TRUE convergence
    // contract (the stream must fold to the batch matrix bit-for-bit)
    "st14_stream_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
                            date_trunc('week', ts)::TIMESTAMP AS wk
                     FROM events),
          fst AS (SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY 1),
          m AS (SELECT cohort_week,
                       (date_diff('day', cohort_week, wk) // 7)::BIGINT
                         AS week_offset,
                       count(*)::BIGINT AS n_users
                FROM wk JOIN fst USING (user_id) GROUP BY 1, 2),
          sz AS (SELECT cohort_week, n_users AS cohort_size FROM m
                 WHERE week_offset = 0)
          SELECT m.cohort_week, m.week_offset, m.n_users, sz.cohort_size,
                 (m.n_users * 10000 // sz.cohort_size)::BIGINT AS retention_bp,
                 TRUE AS stream_eq_batch
          FROM m JOIN sz USING (cohort_week)
          ORDER BY m.cohort_week, m.week_offset""",
    "a17_top_hits" ->
      s"""WITH t AS (SELECT doc_id, source, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, source,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf,
                       len(toks)::INT AS len FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM p),
          sc AS (SELECT doc_id, source,
                        round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                              (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6) AS score
                 FROM p, s WHERE tf > 0),
          r AS (SELECT source, row_number() OVER
                         (PARTITION BY source ORDER BY score DESC, doc_id) AS rk,
                       doc_id, score
                FROM sc)
          SELECT source, rk::BIGINT AS rk, doc_id, score FROM r
          WHERE rk <= 2 ORDER BY source, rk""",
    "w9_collapse" ->
      s"""WITH t AS (SELECT doc_id, source, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, source,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf,
                       len(toks)::INT AS len FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM p),
          sc AS (SELECT doc_id, source,
                        round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                              (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 6) AS score
                 FROM p, s WHERE tf > 0),
          r AS (SELECT source, doc_id, score,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY score DESC, doc_id) AS rk,
                       count(*) OVER (PARTITION BY source) AS n_in_group
                FROM sc)
          SELECT source, doc_id, score, n_in_group::BIGINT AS n_in_group
          FROM r WHERE rk = 1
          ORDER BY score DESC, doc_id LIMIT 10""",
    "f10_rescore" ->
      s"""WITH t AS (SELECT doc_id, lower(text) AS lt, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, lt, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'table'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'scan'))::INT AS tf1 FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1 FROM p),
          pr AS (SELECT doc_id, lt,
                        round((CASE WHEN tf0 > 0
                                    THEN ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                                         (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                    ELSE 0.0 END) +
                              (CASE WHEN tf1 > 0
                                    THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                                         (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                    ELSE 0.0 END), 6) AS primary_score
                 FROM p, s WHERE tf0 > 0 OR tf1 > 0
                 ORDER BY primary_score DESC, doc_id LIMIT 50),
          rs AS (SELECT doc_id, primary_score,
                        (len(string_split(lt, 'table scan')) - 1)::BIGINT AS phrase_n
                 FROM pr)
          SELECT doc_id, primary_score, phrase_n,
                 round(primary_score + 2.0 * phrase_n, 6) AS score
          FROM rs ORDER BY score DESC, doc_id LIMIT 20""",
    "a18_adjacency_matrix" ->
      s"""WITH t AS (SELECT ${sqlToks("lower(text)")} AS toks FROM documents),
          f AS (SELECT list_contains(toks, 'table') AS a,
                       list_contains(toks, 'spark') AS b,
                       list_contains(toks, 'merge') AS c FROM t),
          m AS (SELECT sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
                       sum(CASE WHEN b THEN 1 ELSE 0 END)::BIGINT AS n_b,
                       sum(CASE WHEN c THEN 1 ELSE 0 END)::BIGINT AS n_c,
                       sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n_ab,
                       sum(CASE WHEN a AND c THEN 1 ELSE 0 END)::BIGINT AS n_ac,
                       sum(CASE WHEN b AND c THEN 1 ELSE 0 END)::BIGINT AS n_bc
                FROM f)
          SELECT * FROM (
            SELECT 'A' AS filter_key, n_a AS doc_count FROM m
            UNION ALL SELECT 'B', n_b FROM m
            UNION ALL SELECT 'C', n_c FROM m
            UNION ALL SELECT 'A&B', n_ab FROM m
            UNION ALL SELECT 'A&C', n_ac FROM m
            UNION ALL SELECT 'B&C', n_bc FROM m)
          ORDER BY filter_key""",
    "x26_bpe_train" -> sqlBpeTrain(8),
    "x26b_bpe_train_batched" -> sqlBpeTrainBatched(16, 16),
    "f11_min_should_match" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'table'))::INT AS tf0,
                       len(list_filter(toks, x -> x = 'spark'))::INT AS tf1,
                       len(list_filter(toks, x -> x = 'merge'))::INT AS tf2 FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
                       sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2 FROM p)
          SELECT doc_id,
                 ((CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) +
                  (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) +
                  (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END))::BIGINT AS n_matched,
                 round((CASE WHEN tf0 > 0
                             THEN ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) *
                                  (tf0 * 2.2) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END) +
                       (CASE WHEN tf1 > 0
                             THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                                  (tf1 * 2.2) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END) +
                       (CASE WHEN tf2 > 0
                             THEN ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) *
                                  (tf2 * 2.2) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                             ELSE 0.0 END), 6) AS score
          FROM p, s
          WHERE (CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) +
                (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) +
                (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) >= 2
          ORDER BY score DESC, doc_id LIMIT 20""",
    "t14_synonyms" ->
      s"""SELECT doc_id,
                 array_to_string(list_transform(${sqlToks("lower(text)")},
                   t -> CASE WHEN t = 'fast' THEN 'quick'
                             WHEN t = 'big' THEN 'large'
                             WHEN t = 'small' THEN 'little'
                             ELSE t END), '|') AS tokens
         FROM documents ORDER BY doc_id""",
    "w10_percent_rank" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                round(percent_rank() OVER w, 6) AS pr,
                round(cume_dist() OVER w, 6) AS cd
         FROM lineitem
         WINDOW w AS (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, l_orderkey, l_linenumber""",
    "x25_simpson" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
          c AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM u GROUP BY 1, 2),
          a AS (SELECT doc_id, sum(c * (c - 1))::BIGINT AS num,
                       sum(c)::BIGINT AS n FROM c GROUP BY 1)
          SELECT doc_id, n AS n_toks,
                 (CASE WHEN n > 1 THEN (num::HUGEINT * 10000) // (n * (n - 1))
                       ELSE 0 END)::BIGINT AS simpson_bp
          FROM a ORDER BY doc_id""",
    "a19_multi_terms" ->
      """SELECT source, lang, count(*)::BIGINT AS doc_count,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents GROUP BY 1, 2
         ORDER BY doc_count DESC, source, lang LIMIT 10""",
    "a20_range_agg" ->
      """SELECT range_key, count(*)::BIGINT AS doc_count,
                sum(n_chars)::BIGINT AS sum_chars,
                round(sum(n_chars)::DOUBLE / count(*)::INT, 6) AS avg_chars
         FROM (SELECT CASE WHEN n_chars < 200 THEN '*-200'
                           WHEN n_chars < 400 THEN '200-400'
                           ELSE '400-*' END AS range_key, n_chars
               FROM documents)
         GROUP BY 1 ORDER BY range_key""",
    "a21_sampler" ->
      """WITH r AS (SELECT lang, n_chars,
                           row_number() OVER (PARTITION BY source
                             ORDER BY (doc_id * 2654435761) % 4294967296,
                                      doc_id) AS rn
                    FROM documents)
         SELECT lang, count(*)::BIGINT AS doc_count,
                sum(n_chars)::BIGINT AS sum_chars
         FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY lang""",
    "a22_string_stats" ->
      """SELECT lang, count(*)::BIGINT AS doc_count,
                min(len(text))::BIGINT AS min_len,
                max(len(text))::BIGINT AS max_len,
                round(sum(len(text))::DOUBLE / count(*)::INT, 6) AS avg_len
         FROM documents GROUP BY 1 ORDER BY lang""",
    "a23_boxplot" ->
      """WITH m AS (SELECT lang, median(n_chars) AS med FROM documents
                    GROUP BY 1)
         SELECT d.lang, min(n_chars)::BIGINT AS lo, max(n_chars)::BIGINT AS hi,
                round(quantile_cont(n_chars, 0.25), 6) AS q1,
                round(quantile_cont(n_chars, 0.5), 6) AS q2,
                round(quantile_cont(n_chars, 0.75), 6) AS q3,
                round(quantile_cont(n_chars, 0.75)
                      - quantile_cont(n_chars, 0.25), 6) AS iqr,
                round(quantile_cont(abs(n_chars - med), 0.5), 6) AS mad
         FROM documents d JOIN m ON d.lang = m.lang
         GROUP BY d.lang ORDER BY d.lang""",
    "w11_bucket_selector" ->
      """WITH daily AS (SELECT date_trunc('day', ts)::TIMESTAMP AS day,
                               count(*)::BIGINT AS n
                        FROM events GROUP BY 1),
          t AS (SELECT sum(n)::BIGINT AS tot, count(*)::BIGINT AS nb
                FROM daily)
         SELECT day, n FROM daily, t
         WHERE n * nb > tot
         ORDER BY n DESC, day LIMIT 5""",
    "f12_wildcard" ->
      """SELECT p_partkey, p_name,
                p_name LIKE '%dg%' AS wildcard,
                p_name LIKE 'co%' AS prefix,
                regexp_matches(p_name, 'b(olt|lue)') AS re_match
         FROM part
         WHERE p_name LIKE '%dg%' OR p_name LIKE 'co%'
            OR regexp_matches(p_name, 'b(olt|lue)')
         ORDER BY p_partkey""",
    "f13_terms_set" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks
                     FROM documents)
          SELECT doc_id,
                 (list_contains(toks, 'spark')::INT
                  + list_contains(toks, 'data')::INT
                  + list_contains(toks, 'fast')::INT
                  + list_contains(toks, 'query')::INT)::BIGINT AS n_matched
          FROM t
          WHERE list_contains(toks, 'spark')::INT
                + list_contains(toks, 'data')::INT
                + list_contains(toks, 'fast')::INT
                + list_contains(toks, 'query')::INT >= 2
          ORDER BY doc_id""",
    "f14_span_near" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks
                     FROM documents),
          m AS (SELECT doc_id,
                       len(list_filter(range(1, len(toks) + 1),
                           i -> toks[i] = 'key'
                                AND (toks[i+1] = 'scan' OR toks[i+2] = 'scan'
                                     OR toks[i+3] = 'scan'
                                     OR toks[i+4] = 'scan'))) > 0 AS in_order,
                       len(list_filter(range(1, len(toks) + 1),
                           i -> toks[i] = 'scan'
                                AND (toks[i+1] = 'key' OR toks[i+2] = 'key'
                                     OR toks[i+3] = 'key'
                                     OR toks[i+4] = 'key'))) > 0 AS rev
                FROM t)
          SELECT doc_id, in_order, (in_order OR rev) AS unordered
          FROM m WHERE in_order OR rev ORDER BY doc_id""",
    "x27_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks
                     FROM documents),
          u AS (SELECT doc_id, unnest(toks) AS w FROM t),
          wc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM u GROUP BY 1, 2),
          ws AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
                        max(c)::BIGINT AS top_w,
                        sum(c * len(w))::BIGINT AS sum_len
                 FROM wc GROUP BY 1),
          b0 AS (SELECT doc_id,
                        unnest(list_transform(
                          generate_series(1, greatest(len(toks) - 1, 0)),
                          i -> toks[i] || ' ' || toks[i+1])) AS g
                 FROM t),
          bc AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM b0 GROUP BY 1, 2),
          bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bi,
                        max(c)::BIGINT AS top_bi
                 FROM bc GROUP BY 1)
          SELECT ws.doc_id, n_words,
                 (top_w * 10000 // n_words)::BIGINT AS top_word_bp,
                 (top_bi * 10000 // n_bi)::BIGINT AS top_bigram_bp,
                 (sum_len * 100 // n_words)::BIGINT AS mean_len_x100,
                 (n_words >= 20 AND top_w * 10000 // n_words <= 1500
                  AND sum_len * 100 // n_words BETWEEN 300 AND 480) AS keep
          FROM ws JOIN bs ON ws.doc_id = bs.doc_id
          ORDER BY ws.doc_id""",
    "x28_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks
                     FROM documents),
          g0 AS (SELECT doc_id,
                        unnest(list_transform(
                          generate_series(1, greatest(len(toks) - 4, 0)),
                          i -> array_to_string(toks[i:i+4], ' '))) AS gram
                 FROM t),
          g AS (SELECT DISTINCT doc_id, gram FROM g0),
          f AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY 1)
          SELECT doc_id, count(*)::BIGINT AS n_grams,
                 sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END)::BIGINT AS novel,
                 (sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) * 10000
                  // count(*))::BIGINT AS novelty_bp
          FROM g JOIN f USING (gram)
          GROUP BY doc_id ORDER BY doc_id""",
    "st7_stream_session" ->
      """WITH g AS (SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                                THEN 1 ELSE 0 END AS new_s
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM g)
          SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
                 user_id, count(*) AS n_events, round(sum(value), 2) AS session_value
          FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "sm1_scripted_metric" ->
      """WITH e AS (SELECT event_type,
                           floor(value * 100)::BIGINT AS yc,
                           ((epoch_us(ts)
                             - min(epoch_us(ts)) OVER (PARTITION BY event_type))
                            // 1000000)::BIGINT AS xs
                    FROM events),
          a AS (SELECT event_type, count(*)::BIGINT AS n,
                       sum(xs)::BIGINT AS sx, sum(yc)::BIGINT AS sy,
                       sum(xs * xs)::BIGINT AS sxx,
                       sum(xs * yc)::BIGINT AS sxy
                FROM e GROUP BY 1)
          SELECT event_type, n, sy,
                 (CASE WHEN n::HUGEINT * sxx > sx::HUGEINT * sx
                       THEN (n::HUGEINT * sxy - sx::HUGEINT * sy) * 1000000
                            // (n::HUGEINT * sxx - sx::HUGEINT * sx)
                       ELSE 0 END)::BIGINT AS slope_e6
          FROM a ORDER BY event_type""",
    "w12_serial_diff" ->
      """WITH daily AS (SELECT date_trunc('day', ts)::TIMESTAMP AS day,
                               count(*)::BIGINT AS n
                        FROM events GROUP BY 1)
         SELECT day, n,
                n - lag(n, 7) OVER (ORDER BY day) AS serial_diff7,
                max(n) OVER (ORDER BY day
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS moving_max7,
                min(n) OVER (ORDER BY day
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS moving_min7
         FROM daily ORDER BY day""",
    "e8_retention" ->
      """WITH e AS (SELECT DISTINCT user_id,
                           date_trunc('week',
                             min(ts) OVER (PARTITION BY user_id))::TIMESTAMP
                             AS cohort_week,
                           (date_diff('day',
                              date_trunc('week',
                                min(ts) OVER (PARTITION BY user_id)),
                              date_trunc('week', ts)) // 7)::BIGINT
                             AS week_offset
                    FROM events)
         SELECT cohort_week, week_offset, count(*)::BIGINT AS n_users
         FROM e GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    "pc1_percolate" -> pc1Sql,
    "pc2_percolate_indexed" -> pc1Sql,
    // streaming percolate is stateless → finite-input append output ≡
    // the batch percolator; oracle shared verbatim
    "st8_stream_percolate" -> pc1Sql,
    "f15_query_string" ->
      // ("hash join" OR (merge AND sort)) AND NOT slow
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents)
          SELECT doc_id FROM t
          WHERE ((strpos(' ' || array_to_string(toks, ' ') || ' ', ' hash join ') > 0
                  OR (list_contains(toks, 'merge') AND list_contains(toks, 'sort')))
                 AND NOT list_contains(toks, 'slow'))
          ORDER BY doc_id""",
    "f16_dis_max" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          s AS (SELECT doc_id,
                       len(list_filter(toks, x -> x = 'join'))::BIGINT AS tf_a,
                       len(list_filter(toks, x -> x = 'stream'))::BIGINT AS tf_b
                FROM t)
          SELECT doc_id,
                 (greatest(tf_a, tf_b) * 10
                  + (tf_a + tf_b - greatest(tf_a, tf_b)) * 3)::BIGINT AS score_x10
          FROM s WHERE greatest(tf_a, tf_b) > 0
          ORDER BY score_x10 DESC, doc_id""",
    "r1_rank_eval" ->
      s"""WITH q(query_id, term) AS (VALUES ('q1','spark'),('q2','vector'),('q3','merge')),
          t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          tf AS (SELECT query_id, doc_id,
                        len(list_filter(toks, x -> x = term))::BIGINT AS tf
                 FROM t, q),
          f AS (SELECT * FROM tf WHERE tf > 0),
          r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                             ORDER BY tf DESC, doc_id)::BIGINT AS rk FROM f),
          m AS (SELECT query_id,
                       sum(CASE WHEN rk <= 10 AND tf >= 2 THEN 1 ELSE 0 END)::BIGINT
                         AS rel_in_top10,
                       min(CASE WHEN tf >= 2 AND rk <= 10 THEN rk END) AS first_rel,
                       sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rel
                FROM r GROUP BY 1)
          SELECT query_id, (rel_in_top10 * 100000)::BIGINT AS p_at_10_e6,
                 coalesce(1000000 // first_rel, 0)::BIGINT AS mrr_e6, n_rel
          FROM m ORDER BY query_id""",
    // r2: NDCG@10 with the frozen ×10^6 discount-literal table (the
    // metric spec both engines share — no libm log2 in either plan)
    "r2_ndcg" ->
      s"""WITH q(query_id, term) AS (VALUES ('q1','spark'),('q2','vector'),('q3','merge')),
          w(rk, disc) AS (VALUES (1,1000000),(2,630929),(3,500000),(4,430676),
                                 (5,386852),(6,356207),(7,333333),(8,315464),
                                 (9,301029),(10,289064)),
          t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          tf AS (SELECT query_id, doc_id,
                        len(list_filter(toks, x -> x = term))::BIGINT AS tf
                 FROM t, q),
          f AS (SELECT * FROM tf WHERE tf > 0),
          r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                             ORDER BY tf DESC, doc_id)::BIGINT AS rk FROM f),
          m AS (SELECT r.query_id,
                       sum(CASE WHEN r.rk <= 10 AND r.tf >= 2
                                THEN w.disc ELSE 0 END)::BIGINT AS dcg_e6,
                       sum(CASE WHEN r.tf >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rel
                FROM r LEFT JOIN w ON r.rk = w.rk GROUP BY 1),
          i AS (SELECT m.query_id, m.dcg_e6, m.n_rel,
                       coalesce((SELECT sum(disc) FROM w
                                 WHERE rk <= least(m.n_rel, 10)), 0)::BIGINT
                         AS idcg_e6
                FROM m)
          SELECT query_id, dcg_e6, idcg_e6,
                 CASE WHEN idcg_e6 > 0
                      THEN (dcg_e6 * 10000 // idcg_e6) ELSE 0 END::BIGINT
                   AS ndcg_bp
          FROM i ORDER BY query_id""",
    "a24_matrix_stats" ->
      """WITH c AS (SELECT round(l_quantity * 100)::HUGEINT AS q,
                           round(l_extendedprice * 100)::HUGEINT AS p,
                           round(l_discount * 100)::HUGEINT AS dd
                    FROM lineitem),
          s AS (SELECT count(*)::HUGEINT AS n,
                       sum(q) AS sq, sum(p) AS sp, sum(dd) AS sd,
                       sum(q * q) AS sqq, sum(p * p) AS spp, sum(dd * dd) AS sdd,
                       sum(q * p) AS sqp, sum(q * dd) AS sqd, sum(p * dd) AS spd
                FROM c),
          v AS (SELECT n::BIGINT AS n,
                       (n * sqq - sq * sq)::DOUBLE AS vq,
                       (n * spp - sp * sp)::DOUBLE AS vp,
                       (n * sdd - sd * sd)::DOUBLE AS vd,
                       (n * sqp - sq * sp)::DOUBLE AS cqp,
                       (n * sqd - sq * sd)::DOUBLE AS cqd,
                       (n * spd - sp * sd)::DOUBLE AS cpd,
                       (sq // n)::BIGINT AS mq_c,
                       (sp // n)::BIGINT AS mp_c,
                       (sd // n)::BIGINT AS md_c
                FROM s)
          SELECT pair, n, mean_x_c, mean_y_c, cov_d2, corr FROM (
            SELECT 'quantity_price' AS pair, n, mq_c AS mean_x_c, mp_c AS mean_y_c,
                   round(cqp / n / n / 10000, 6) AS cov_d2,
                   round(cqp / sqrt(vq) / sqrt(vp), 6) AS corr FROM v
            UNION ALL
            SELECT 'quantity_discount', n, mq_c, md_c,
                   round(cqd / n / n / 10000, 6),
                   round(cqd / sqrt(vq) / sqrt(vd), 6) FROM v
            UNION ALL
            SELECT 'price_discount', n, mp_c, md_c,
                   round(cpd / n / n / 10000, 6),
                   round(cpd / sqrt(vp) / sqrt(vd), 6) FROM v)
          ORDER BY pair""",
    "a25_auto_histogram" ->
      """WITH st AS (SELECT epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
                     FROM events),
          b AS (SELECT ts,
                       CASE WHEN span_us <= 40::BIGINT * 60 * 1000000 THEN 'minute'
                            WHEN span_us <= 40::BIGINT * 3600 * 1000000 THEN 'hour'
                            WHEN span_us <= 40::BIGINT * 86400 * 1000000 THEN 'day'
                            WHEN span_us <= 40::BIGINT * 604800 * 1000000 THEN 'week'
                            ELSE 'month' END AS iv
                FROM events, st)
          SELECT iv,
                 CASE iv WHEN 'minute' THEN date_trunc('minute', ts)::TIMESTAMP
                         WHEN 'hour' THEN date_trunc('hour', ts)::TIMESTAMP
                         WHEN 'day' THEN date_trunc('day', ts)::TIMESTAMP
                         WHEN 'week' THEN date_trunc('week', ts)::TIMESTAMP
                         ELSE date_trunc('month', ts)::TIMESTAMP END AS bucket,
                 count(*)::BIGINT AS n
          FROM b GROUP BY 1, 2 ORDER BY bucket""",
    "a26_nested_reverse" ->
      // relational replay of the nested/reverse_nested pair: every
      // nested item is a lineitem row, every parent doc an order
      """SELECT l_returnflag AS returnflag, count(*)::BIGINT AS n_items,
                count(DISTINCT l_orderkey)::BIGINT AS n_docs
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "a27_significant_text" ->
      s"""WITH t AS (SELECT doc_id, list_distinct(${sqlToks("lower(text)")}) AS toks
                     FROM documents),
          b AS (SELECT doc_id, toks, list_contains(toks, 'spark') AS fg FROM t),
          sz AS (SELECT sum(CASE WHEN fg THEN 1 ELSE 0 END)::BIGINT AS n_fg,
                        count(*)::BIGINT AS n_all
                 FROM b),
          cnt AS (SELECT token,
                         sum(CASE WHEN fg THEN 1 ELSE 0 END)::BIGINT AS fg_df,
                         count(*)::BIGINT AS bg_df
                  FROM (SELECT fg, unnest(toks) AS token FROM b)
                  WHERE token <> 'spark' GROUP BY 1
                  HAVING sum(CASE WHEN fg THEN 1 ELSE 0 END) > 0),
          sc AS (SELECT token, fg_df, bg_df,
                        round((fg_df::DOUBLE / n_fg - bg_df::DOUBLE / n_all)
                              * (fg_df::DOUBLE / n_fg)
                              / (bg_df::DOUBLE / n_all), 6) AS score
                 FROM cnt, sz),
          rk AS (SELECT *, row_number() OVER (ORDER BY score DESC, token)::BIGINT
                             AS rk FROM sc)
          SELECT token, fg_df, bg_df, score, rk FROM rk
          WHERE rk <= 10 ORDER BY rk""",
    "a28_ttest" ->
      """WITH c AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
                           round(value * 100)::BIGINT AS vc
                    FROM events WHERE event_type IN ('click', 'error')),
          s AS (SELECT sum(g)::BIGINT AS n1, sum(1 - g)::BIGINT AS n2,
                       sum(vc * g)::BIGINT AS s1, sum(vc * (1 - g))::BIGINT AS s2,
                       sum(vc * vc * g)::BIGINT AS ss1,
                       sum(vc * vc * (1 - g))::BIGINT AS ss2
                FROM c)
          SELECT n1, n2,
                 round((s1::DOUBLE / n1 - s2::DOUBLE / n2) / 100, 6) AS mean_diff_d,
                 round((s1::DOUBLE / n1 - s2::DOUBLE / n2)
                       / sqrt((ss1::DOUBLE - s1::DOUBLE * s1 / n1) / (n1 - 1) / n1
                              + (ss2::DOUBLE - s2::DOUBLE * s2 / n2) / (n2 - 1) / n2),
                       6) AS t_stat
          FROM s""",
    "a29_rate" ->
      """WITH m AS (SELECT event_type, date_trunc('month', ts)::TIMESTAMP AS month,
                          count(*)::BIGINT AS n
                   FROM events GROUP BY 1, 2)
         SELECT event_type, month, n,
                (n * 1000000
                 // date_part('day', last_day(month::DATE)))::BIGINT AS per_day_e6
         FROM m ORDER BY event_type, month""",
    // a36: the daily histogram re-sorted by the cents metric with
    // from/size pagination
    "a36_bucket_sort" ->
      """WITH daily AS (SELECT date_trunc('day', ts)::TIMESTAMP AS day,
                               count(*)::BIGINT AS n,
                               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
                        FROM events GROUP BY 1),
          r AS (SELECT *, row_number() OVER (ORDER BY cents DESC, day)::BIGINT AS rk
                FROM daily)
          SELECT day, n, cents, rk FROM r
          WHERE rk > 2 AND rk <= 7 ORDER BY rk""",
    // a35: exact per-group median + median-absolute-deviation in the
    // ×100-cents integer domain; DuckDB median() interpolates even
    // counts exactly like Spark's percentile (both type-7)
    // a39: both conditional sums in one pass, the bp share post-agg
    "a39_bucket_script" ->
      """WITH daily AS (SELECT date_trunc('day', ts)::TIMESTAMP AS day,
                               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS total_cents,
                               sum(CASE WHEN event_type = 'purchase'
                                        THEN floor(value * 100 + 0.5)::BIGINT
                                        ELSE 0 END)::BIGINT AS purchase_cents
                        FROM events GROUP BY 1)
          SELECT day, total_cents, purchase_cents,
                 (purchase_cents * 10000 // greatest(total_cents, 1))::BIGINT AS share_bp
          FROM daily ORDER BY day""",
    // a38: exact quartiles of the daily-cents buckets; quantile_cont
    // interpolates type-7 like Spark percentile, quarters are dyadic
    "a38_percentiles_bucket" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
                               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
                        FROM events GROUP BY 1)
          SELECT count(*)::BIGINT AS n_buckets,
                 quantile_cont(cents, 0.25) AS p25,
                 quantile_cont(cents, 0.5) AS p50,
                 quantile_cont(cents, 0.75) AS p75
          FROM daily""",
    "a35_mad" ->
      """WITH o AS (SELECT o_orderpriority AS prio,
                           floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
                    FROM orders),
          m AS (SELECT prio, median(cents) AS med_cents,
                       count(*)::BIGINT AS n
                FROM o GROUP BY 1)
          SELECT o.prio, m.n, m.med_cents,
                 median(abs(o.cents - m.med_cents)) AS mad_cents
          FROM o JOIN m USING (prio)
          GROUP BY o.prio, m.n, m.med_cents
          ORDER BY o.prio""",
    "geo1_geohash_grid" ->
      s"""WITH p AS (SELECT ((c_custkey * 2654435761) % 180000000) - 90000000 AS lat,
                            ((c_custkey * 2654435761 * 31 + 7) % 360000000) - 180000000 AS lon
                     FROM customer),
          f AS (SELECT * FROM p WHERE lat BETWEEN -45000000 AND 45000000
                                  AND lon BETWEEN -90000000 AND 90000000),
          g AS (SELECT substring((${Geo.geohash6Sql("lat", "lon")}), 1, 2) AS cell
                FROM f),
          c AS (SELECT cell, count(*)::BIGINT AS n FROM g GROUP BY 1),
          r AS (SELECT *, row_number() OVER (ORDER BY n DESC, cell)::BIGINT AS rk
                FROM c)
          SELECT cell, n, rk FROM r WHERE rk <= 10 ORDER BY rk""",
    // geo3: same synthetic points + geohash replay, floored integer
    // centroid per cell
    "geo3_centroid" ->
      s"""WITH p AS (SELECT ((c_custkey * 2654435761) % 180000000) - 90000000 AS lat,
                            ((c_custkey * 2654435761 * 31 + 7) % 360000000) - 180000000 AS lon
                     FROM customer),
          f AS (SELECT * FROM p WHERE lat BETWEEN -45000000 AND 45000000
                                  AND lon BETWEEN -90000000 AND 90000000),
          g AS (SELECT substring((${Geo.geohash6Sql("lat", "lon")}), 1, 2) AS cell,
                       lat, lon
                FROM f),
          c AS (SELECT cell, count(*)::BIGINT AS n,
                       floor(sum(lat) / count(*))::BIGINT AS cen_lat_udeg,
                       floor(sum(lon) / count(*))::BIGINT AS cen_lon_udeg
                FROM g GROUP BY 1)
          SELECT cell, n, cen_lat_udeg, cen_lon_udeg FROM c
          ORDER BY n DESC, cell LIMIT 10""",
    // geo4: same synthetic points + geohash replay, per-cell
    // enclosing box (integer min/max)
    "geo4_geo_bounds" ->
      s"""WITH p AS (SELECT ((c_custkey * 2654435761) % 180000000) - 90000000 AS lat,
                            ((c_custkey * 2654435761 * 31 + 7) % 360000000) - 180000000 AS lon
                     FROM customer),
          f AS (SELECT * FROM p WHERE lat BETWEEN -45000000 AND 45000000
                                  AND lon BETWEEN -90000000 AND 90000000),
          g AS (SELECT substring((${Geo.geohash6Sql("lat", "lon")}), 1, 2) AS cell,
                       lat, lon
                FROM f),
          c AS (SELECT cell, count(*)::BIGINT AS n,
                       max(lat)::BIGINT AS top, min(lat)::BIGINT AS bottom,
                       min(lon)::BIGINT AS "left", max(lon)::BIGINT AS "right"
                FROM g GROUP BY 1)
          SELECT cell, n, top, bottom, "left", "right" FROM c
          ORDER BY n DESC, cell LIMIT 10""",
    "geo2_geo_distance" ->
      """WITH p AS (SELECT c_custkey AS id,
                           ((c_custkey * 2654435761) % 180000000) - 90000000 AS lat,
                           ((c_custkey * 2654435761 * 31 + 7) % 360000000) - 180000000 AS lon
                    FROM customer),
          d AS (SELECT id, lat::BIGINT AS lat, lon::BIGINT AS lon,
                       (lat * lat + lon * lon)::BIGINT AS d2
                FROM p)
          SELECT id, lat, lon, d2 FROM d
          WHERE d2 <= 20000000::BIGINT * 20000000
          ORDER BY d2, id LIMIT 20""",
    "w13_moving_percentiles" ->
      """WITH daily AS (SELECT date_trunc('day', ts)::TIMESTAMP AS day,
                               count(*)::BIGINT AS n
                        FROM events GROUP BY 1),
          w AS (SELECT day, n,
                       list_sort(list(n) OVER (ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
                FROM daily)
          SELECT day, n,
                 (CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2] * 2
                       ELSE arr[len(arr) // 2] + arr[len(arr) // 2 + 1]
                  END)::BIGINT AS med7_x2
          FROM w ORDER BY day""",
    "t15_term_suggest" ->
      s"""WITH v AS (SELECT token AS term, count(*)::BIGINT AS freq
                     FROM (SELECT unnest(toks) AS token
                           FROM (SELECT ${sqlToks("lower(text)")} AS toks
                                 FROM documents))
                     GROUP BY 1),
          q(input) AS (VALUES ('custmer'),('streem'),('windoq'),('qury'),('ke')),
          c AS (SELECT input, term, levenshtein(term, input)::BIGINT AS dist,
                       freq
                FROM v, q
                WHERE abs(len(term) - len(input)) <= 2
                  AND levenshtein(term, input) <= 2),
          r AS (SELECT *, row_number() OVER (PARTITION BY input
                             ORDER BY dist, freq DESC, term)::BIGINT AS rk
                FROM c)
          SELECT input, term, dist, freq, rk FROM r
          WHERE rk <= 3 ORDER BY input, rk""",
    "t16_phrase_suggest" ->
      s"""WITH t AS (SELECT ${sqlToks("lower(text)")} AS toks FROM documents),
          v AS (SELECT token AS term, count(*)::BIGINT AS freq
                FROM (SELECT unnest(toks) AS token FROM t) GROUP BY 1),
          bg AS (SELECT p.w1 AS b1, p.w2 AS b2, count(*)::BIGINT AS bg_freq
                 FROM (SELECT unnest(list_transform(
                          generate_series(1, len(toks) - 1),
                          i -> struct_pack(w1 := toks[i], w2 := toks[i+1])))
                          AS p FROM t)
                 GROUP BY 1, 2),
          q(pid, w1, w2) AS (VALUES (1::BIGINT, 'custmer', 'joun'),
                                    (2::BIGINT, 'sart', 'a')),
          c1 AS (SELECT * FROM (
                   SELECT pid, term AS c1,
                          levenshtein(term, w1)::BIGINT AS d1, freq AS f1,
                          row_number() OVER (PARTITION BY pid, w1
                            ORDER BY levenshtein(term, w1), freq DESC, term)
                            AS rk1
                   FROM v, q
                   WHERE abs(len(term) - len(w1)) <= 1
                     AND levenshtein(term, w1) <= 1) WHERE rk1 <= 5),
          c2 AS (SELECT * FROM (
                   SELECT pid, term AS c2,
                          levenshtein(term, w2)::BIGINT AS d2, freq AS f2,
                          row_number() OVER (PARTITION BY pid, w2
                            ORDER BY levenshtein(term, w2), freq DESC, term)
                            AS rk2
                   FROM v, q
                   WHERE abs(len(term) - len(w2)) <= 1
                     AND levenshtein(term, w2) <= 1) WHERE rk2 <= 5),
          p AS (SELECT c1.pid, c1.c1, c2.c2, c1.d1 + c2.d2 AS dist,
                       c1.f1 + c2.f2 AS fsum
                FROM c1 JOIN c2 ON c1.pid = c2.pid),
          scored AS (SELECT p.pid, p.c1, p.c2,
                            coalesce(bg.bg_freq, 0)::BIGINT AS bg_freq,
                            p.dist, p.fsum
                     FROM p LEFT JOIN bg ON p.c1 = bg.b1 AND p.c2 = bg.b2),
          r AS (SELECT pid, c1, c2, bg_freq,
                       row_number() OVER (PARTITION BY pid
                         ORDER BY bg_freq DESC, dist, fsum DESC, c1, c2)
                         ::BIGINT AS rk
                FROM scored)
          SELECT pid, c1 AS sug1, c2 AS sug2, bg_freq, rk FROM r
          WHERE rk <= 3 ORDER BY pid, rk""",
    // t17: full-term BM25 (f3's replay) + constant-score 1.0 for any
    // 'ba'-prefixed token, should semantics (either leg matches)
    "t17_search_as_you_type" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT doc_id, len(toks)::INT AS len,
                       len(list_filter(toks, x -> x = 'merge'))::INT AS tf,
                       len(list_filter(toks, x -> x LIKE 'ba%'))::INT AS npre
                FROM t),
          s AS (SELECT count(*)::DOUBLE AS n, avg(len) AS avgdl,
                       sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM p),
          u AS (SELECT doc_id,
                       round((CASE WHEN tf > 0
                                   THEN ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                                        (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl))
                                   ELSE 0.0 END)
                             + (CASE WHEN npre > 0 THEN 1.0 ELSE 0.0 END), 6) AS score
                FROM p, s WHERE tf > 0 OR npre > 0)
          SELECT doc_id, score FROM u
          ORDER BY score DESC, doc_id LIMIT 10""",
    "opt2_token_prefilter" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents)
          SELECT doc_id FROM t
          WHERE (list_contains(toks, 'merge') AND list_contains(toks, 'sort'))
             OR list_contains(toks, 'vector')
          ORDER BY doc_id""",
    "a30_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS gid,
                count(*)::BIGINT AS n,
                sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                 (o_orderstatus), ())
         ORDER BY gid, status, priority"""
  )
}
