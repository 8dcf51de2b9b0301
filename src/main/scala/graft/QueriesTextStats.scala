package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Analyzers
import graft.operators._
import graft.streaming.EventStream

/** SparkEntry's TextStats family —
  * LLM-pipeline text statistics: langid, quality, packing, BPE, mixtures (brief extensions).
  *
  * Split out of the single 7.7k-line registry (round-14): each family
  * module contributes its slice of the SAME SparkEntry.queries /
  * oracleSql maps — pure motion, no semantics; key-disjointness is
  * spec-asserted so ++ can never silently overwrite an entry. */
private[graft] object QueriesTextStats {
  import SparkEntry.{queries => _, oracleSql => _, entry => _, _}

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "x26c_bpe_exhausted" -> ((s, d) => {
      // the SUPPLY-EXHAUSTED case (bpeTrainBatched scaladoc, round-14
      // verdict task 6): a two-word fixture whose pair supply runs dry
      // after 2 of the 8 requested merges — the result must end with
      // the terminal supply_exhausted marker row (step 3, round 2),
      // and the oracle replays both the merges AND the marker, so a
      // 32k-merge caller provably learns the ceiling from the output
      // table rather than from wall-clock
      import s.implicits._
      val fx = Seq((1L, "ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
      TextStats.bpeTrainBatched(s, fx, steps = 8, batch = 4)
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
    "x9_repetition" -> ((s, d) =>
      TextStats.repetition(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    "x4_fingerprint" -> ((s, d) =>
      TextStats.fingerprints(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "x6_rolling_fingerprint" -> ((s, d) => // custom expression: rows-only
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.expressions.rolling_min_hash(
            graft.operators.Dedup.normalize(col("text")), 32)
            .as("rolling_fp"))
        .orderBy(col("doc_id"))),
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
  )

  lazy val oracleSql: Map[String, String] = Map(
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
    "x5_sketch_distinct" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users,
                count(*) AS n, TRUE AS approx_ok
         FROM events GROUP BY 1 ORDER BY 1""",
    "x6_rolling_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS nt FROM documents),
          cp AS (SELECT doc_id, list_transform(string_split(nt, ''), ch -> unicode(ch)::BIGINT) AS cps FROM t)
          SELECT doc_id,
                 CASE WHEN len(cps) < 32 THEN NULL ELSE
                   list_aggregate(list_transform(generate_series(1, len(cps)-31), i ->
                     list_reduce(cps[i:i+31], (a, b) -> (a*1000003 + b) % 1000000007)), 'min') END AS rolling_fp
          FROM cp ORDER BY doc_id""",
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
    "x26_bpe_train" -> sqlBpeTrain(8),
    "x26b_bpe_train_batched" -> sqlBpeTrainBatched(16, 16),
    "x26c_bpe_exhausted" -> sqlBpeTrainBatched(8, 4,
      source = "(VALUES (1, 'ab ab cd'), (2, 'ab cd cd')) fx(doc_id, text)"),
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
  )
}
