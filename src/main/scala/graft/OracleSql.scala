package graft

import graft.functions.Analyzers

/** DuckDB-SQL generators for oracle queries whose Spark side runs
  * custom Catalyst expressions with no SQL builtin equivalent —
  * currently the Porter stemmer inside the `englando` analyzer chain
  * (query `t11_englando`).
  *
  * The generated oracle is ONE plain SELECT statement (~24 KB): every
  * helper predicate of the stemmer (measure m, *v*, *d, *o) is inlined
  * as an expression over the candidate stem rather than defined as a
  * macro, so the statement runs under any harness that can execute a
  * single query. Each of Porter's steps is a per-token CTE, so the
  * expansion stays linear (each step references the previous step's
  * COLUMN, not its text).
  *
  * Mirrors [[graft.functions.PorterStemmer]] rule for rule; validated
  * against an independent reimplementation over every token of the
  * sf0.01 documents corpus (zero mismatches) before being wired in.
  */
private[graft] object OracleSql {

  /** CV-form of a word: vowels → 'a', consonants → 'b', with Porter's
    * contextual y (y is a vowel iff preceded by a consonant — mirrors
    * PorterStemmer.isVowel). Three regex passes: canonicalize true
    * vowels, vowel-ize y-after-consonant (global scan resolves runs of
    * y left-to-right exactly like the recursive definition), then
    * everything else is a consonant. */
  private def form(x: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($x, '[aeiou]', 'a', 'g'), " +
      s"'([^a])y', '\\1a', 'g'), '[^a]', 'b', 'g')"

  /** Porter's measure m = number of VC sequences = count of 'ab' in the
    * CV-form ('ab' cannot self-overlap, so replace-and-diff counts). */
  private def m(x: String): String = {
    val f = form(x)
    s"((length($f) - length(replace($f, 'ab', ''))) // 2)"
  }

  /** *v* — the stem contains a vowel. */
  private def hasV(x: String): String = s"contains(${form(x)}, 'a')"

  /** *d — PorterStemmer.endsDoubleConsonant: last two chars equal AND
    * the LAST one is a consonant in context. Only the final position's
    * consonant-ness is tested (mirroring the Scala ground truth): for a
    * stem like "skyy" the first y is a vowel (after consonant k) but
    * the second is not, and endsDoubleConsonant is TRUE — requiring the
    * form to end "bb" would wrongly say false there. */
  private def dbl(x: String): String =
    s"(length($x) >= 2 AND right(${form(x)}, 1) = 'b'" +
      s" AND right($x, 1) = substr($x, length($x)-1, 1))"

  /** *o — ends cvc where the final c is not w, x or y. */
  private def cvc(x: String): String =
    s"(length($x) >= 3 AND right(${form(x)}, 3) = 'bab'" +
      s" AND strpos('wxy', right($x, 1)) = 0)"

  private def drop(x: String, n: Int): String = s"left($x, length($x)-$n)"

  /** firstOf semantics: the first suffix that MATCHES consumes the step
    * (the replacement applies only if m(stem) > mMin, but a failed
    * condition still stops the scan). */
  private def ruleChain(x: String, rules: Seq[(String, String)], mMin: Int): String = {
    val whens = rules.map { case (suf, repl) =>
      val stem = drop(x, suf.length)
      val r = if (repl.isEmpty) stem else s"$stem || '$repl'"
      s"WHEN ends_with($x, '$suf') THEN " +
        s"(CASE WHEN ${m(stem)} > $mMin THEN $r ELSE $x END)"
    }
    whens.mkString("CASE ", " ", s" ELSE $x END")
  }

  private def step1a(x: String): String =
    s"CASE WHEN ends_with($x, 'sses') THEN ${drop(x, 4)} || 'ss' " +
      s"WHEN ends_with($x, 'ies') THEN ${drop(x, 3)} || 'i' " +
      s"WHEN ends_with($x, 'ss') THEN $x " +
      s"WHEN ends_with($x, 's') THEN ${drop(x, 1)} " +
      s"ELSE $x END"

  /** Step 1b part 1. The ed/ing rules must signal "fired" to part 2; a
    * trailing '!' marks that (tokens are alnum/apostrophe, so '!' can
    * never occur in a real token). */
  private def step1bPre(x: String): String =
    s"CASE WHEN ends_with($x, 'eed') THEN " +
      s"(CASE WHEN ${m(drop(x, 3))} > 0 THEN ${drop(x, 3)} || 'ee' ELSE $x END) " +
      s"WHEN ends_with($x, 'ed') THEN " +
      s"(CASE WHEN ${hasV(drop(x, 2))} THEN ${drop(x, 2)} || '!' ELSE $x END) " +
      s"WHEN ends_with($x, 'ing') THEN " +
      s"(CASE WHEN ${hasV(drop(x, 3))} THEN ${drop(x, 3)} || '!' ELSE $x END) " +
      s"ELSE $x END"

  /** Step 1b part 2 (cleanup after a fired ed/ing strip); x is the
    * stem with the marker already removed. */
  private def step1bFix(x: String): String =
    s"CASE WHEN ends_with($x, 'at') OR ends_with($x, 'bl')" +
      s" OR ends_with($x, 'iz') THEN $x || 'e' " +
      s"WHEN ${dbl(x)} AND strpos('lsz', right($x, 1)) = 0 THEN ${drop(x, 1)} " +
      s"WHEN ${m(x)} = 1 AND ${cvc(x)} THEN $x || 'e' " +
      s"ELSE $x END"

  private def step1c(x: String): String =
    s"CASE WHEN ends_with($x, 'y') AND ${hasV(drop(x, 1))} " +
      s"THEN ${drop(x, 1)} || 'i' ELSE $x END"

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  /** Step 4's rule list, split around the "ion" rule whose condition
    * additionally requires the stem to end in s or t. */
  private val step4Before = Seq("ement", "ance", "ence", "able", "ible",
    "ment", "ant", "ent")
  private val step4After = Seq("ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic", "ou")

  private def step4(x: String): String = {
    def del(suf: String): String = {
      val stem = drop(x, suf.length)
      s"WHEN ends_with($x, '$suf') THEN " +
        s"(CASE WHEN ${m(stem)} > 1 THEN $stem ELSE $x END)"
    }
    val ionStem = drop(x, 3)
    val ion = s"WHEN ends_with($x, 'ion') THEN " +
      s"(CASE WHEN ${m(ionStem)} > 1 AND length($ionStem) > 0" +
      s" AND strpos('st', right($ionStem, 1)) > 0 THEN $ionStem ELSE $x END)"
    (step4Before.map(del) ++ Seq(ion) ++ step4After.map(del))
      .mkString("CASE ", " ", s" ELSE $x END")
  }

  private def step5a(x: String): String = {
    val s = drop(x, 1)
    s"CASE WHEN ends_with($x, 'e') AND (${m(s)} > 1 OR " +
      s"(${m(s)} = 1 AND NOT ${cvc(s)})) THEN $s ELSE $x END"
  }

  private def step5b(x: String): String =
    s"CASE WHEN ${m(x)} > 1 AND ${dbl(x)} AND right($x, 1) = 'l' " +
      s"THEN ${drop(x, 1)} ELSE $x END"

  /** The per-token stepped CTE chain: w0(doc_id, pos, w) in, stemmed
    * (doc_id, pos, tok) out. Words of length ≤ 2 bypass all steps
    * (PorterStemmer.stem's guard). */
  private def porterSteps: String =
    s"""  s1 AS (SELECT doc_id, pos, w AS w0, ${step1a("w")} AS w1 FROM w0),
       |  s2 AS (SELECT doc_id, pos, w0, ${step1bPre("w1")} AS w2 FROM s1),
       |  s3 AS (SELECT doc_id, pos, w0, CASE WHEN ends_with(w2, '!') THEN
       |           ${step1bFix("left(w2, length(w2)-1)")} ELSE w2 END AS w3 FROM s2),
       |  s4 AS (SELECT doc_id, pos, w0, ${step1c("w3")} AS w4 FROM s3),
       |  s5 AS (SELECT doc_id, pos, w0, ${ruleChain("w4", step2Rules, 0)} AS w5 FROM s4),
       |  s6 AS (SELECT doc_id, pos, w0, ${ruleChain("w5", step3Rules, 0)} AS w6 FROM s5),
       |  s7 AS (SELECT doc_id, pos, w0, ${step4("w6")} AS w7 FROM s6),
       |  s8 AS (SELECT doc_id, pos, w0, ${step5a("w7")} AS w8 FROM s7),
       |  s9 AS (SELECT doc_id, pos, w0, ${step5b("w8")} AS w9 FROM s8),
       |  stemmed AS (SELECT doc_id, pos,
       |                CASE WHEN length(w0) <= 2 THEN w0 ELSE w9 END AS tok FROM s9)""".stripMargin

  /** The reference's `standard` tokenizer pattern, derived from the
    * single source of truth (SQL literal form: apostrophe doubled). */
  private val tokenPatternSql =
    Analyzers.tokenPattern.replace("'", "''")

  private val stopListSql = Analyzers.englishStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** SQL replay of `porter_stem` over every token of lower(text) — the
    * sql2_sql_functions oracle (SQL-callable custom-expression demo; no
    * stop/possessive stages, so this isolates the Porter rules). Token
    * pattern derives from the same single source of truth as the Spark
    * side ([[Analyzers.tokenPattern]] via `tokenPatternSql`). */
  def porterTokensSql: String =
    s"""WITH dd AS (SELECT doc_id,
       |       regexp_extract_all(lower(text), '$tokenPatternSql') AS toks
       |     FROM documents),
       |  e AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks FROM dd),
       |  w0 AS (SELECT doc_id, pos, toks[pos] AS w FROM e),
       |$porterSteps,
       |  agg AS (SELECT doc_id, array_to_string(list(tok ORDER BY pos), '|') AS stemmed
       |          FROM stemmed GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.stemmed, '') AS stemmed
       |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Full SQL replay of the `englando` analyzer over `documents`:
    * html_strip → standard tokenize → possessive stem → lowercase →
    * english_stop → Porter — exactly `Analyzers.englando` /
    * `expressions.EnglishChain`. Output matches t11_englando's
    * (doc_id, tokens) '|'-joined projection; token order is preserved
    * via the pre-filter ordinal. */
  def porterEnglandoT11: String = englandoJoined("documents")

  /** The same full-pipeline replay over ANY (doc_id, text) relation
    * (a parenthesized SELECT works) — t18_analyze runs it over a
    * one-row literal sample. */
  def englandoJoined(from: String): String =
    s"""WITH dd AS (SELECT doc_id,
       |       regexp_extract_all(regexp_replace(text, '<[^>]*>', ' ', 'g'),
       |                          '$tokenPatternSql') AS toks FROM $from),
       |  e AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks FROM dd),
       |  filt AS (SELECT doc_id, pos,
       |             lower(regexp_replace(toks[pos], '(?i)[''’]s$$', '')) AS w
       |           FROM e),
       |  w0 AS (SELECT doc_id, pos, w FROM filt WHERE NOT list_contains($stopListSql, w)),
       |$porterSteps,
       |  agg AS (SELECT doc_id, array_to_string(list(tok ORDER BY pos), '|') AS tokens
       |          FROM stemmed GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.tokens, '') AS tokens
       |FROM $from d LEFT JOIN agg a ON a.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
