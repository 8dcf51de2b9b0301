package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Analyzers
import graft.operators._
import graft.streaming.EventStream

/** SparkEntry's Analyze family —
  * analyzer chains + the persisted text index family (§2.8).
  *
  * Split out of the single 7.7k-line registry (round-14): each family
  * module contributes its slice of the SAME SparkEntry.queries /
  * oracleSql maps — pure motion, no semantics; key-disjointness is
  * spec-asserted so ++ can never silently overwrite an entry. */
private[graft] object QueriesAnalyze {
  import SparkEntry.{queries => _, oracleSql => _, entry => _, _}

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
  )

  lazy val oracleSql: Map[String, String] = Map(
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
    "ti1_segment_merge" ->
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS toks FROM documents),
          p AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
          SELECT (SELECT count(*) FROM t)::BIGINT AS n_docs,
                 (SELECT coalesce(sum(len(toks)), 0) FROM t)::BIGINT AS sum_len,
                 (SELECT count(DISTINCT term) FROM p)::BIGINT AS n_terms,
                 (SELECT count(*) FROM p)::BIGINT AS n_postings,
                 true AS postings_agree""",
    "t3_keyword" ->
      "SELECT doc_id, lower(source) AS tokens FROM documents ORDER BY doc_id",
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
    "t13_autocomplete" ->
      s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(${sqlToks("lower(text)")}) AS token
                       FROM documents),
          v AS (SELECT token, count(*)::BIGINT AS weight FROM tok GROUP BY 1)
          SELECT token, weight FROM v WHERE token LIKE 's%'
          ORDER BY weight DESC, token LIMIT 5""",
    "t14_synonyms" ->
      s"""SELECT doc_id,
                 array_to_string(list_transform(${sqlToks("lower(text)")},
                   t -> CASE WHEN t = 'fast' THEN 'quick'
                             WHEN t = 'big' THEN 'large'
                             WHEN t = 'small' THEN 'little'
                             ELSE t END), '|') AS tokens
         FROM documents ORDER BY doc_id""",
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
  )
}
