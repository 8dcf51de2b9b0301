package graft

import org.apache.spark.sql.functions._
import graft.operators.TextStats

/** TextStats.gopherRules / TextStats.ngramNovelty on hand-computable
  * fixtures (the x27/x28 queries' engine side). */
class GopherNoveltySpec extends SparkSpec {
  import spark.implicits._

  test("gopherRules: exact basis points on a hand-computed doc") {
    // "aa aa aa bb" — n_words=4, top word aa=3 → 7500 bp; bigrams
    // [aa aa, aa aa, aa bb] → top 2/3 = 6666 bp; mean len 2.00
    val df = Seq((1L, "aa aa aa bb")).toDF("doc_id", "text")
    val r = TextStats.gopherRules(df).collect().head
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Long]("top_word_bp") == 7500L)
    assert(r.getAs[Long]("top_bigram_bp") == 6666L)
    assert(r.getAs[Long]("mean_len_x100") == 200L)
    assert(!r.getAs[Boolean]("keep")) // n_words < 20
  }

  test("gopherRules: single-token doc has no bigram and drops out") {
    val df = Seq((1L, "solo"), (2L, "two tokens here")).toDF("doc_id", "text")
    val ids = TextStats.gopherRules(df).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.sameElements(Array(2L)))
  }

  test("gopherRules: keep verdict honors the configured bounds") {
    // 25 distinct 4-char words: top word 1/25 = 400 bp, mean len 400
    val text = (1 to 25).map(i => f"w$i%03d").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextStats.gopherRules(df).collect().head
    assert(r.getAs[Long]("n_words") == 25L)
    assert(r.getAs[Long]("top_word_bp") == 400L)
    assert(r.getAs[Boolean]("keep"))
    val strict = TextStats.gopherRules(df, minWords = 30).collect().head
    assert(!strict.getAs[Boolean]("keep"))
  }

  test("ngramNovelty: duplicated doc is 0 novel, first doc fully novel") {
    val base = "a b c d e f g h" // 4 distinct 5-grams
    val df = Seq((1L, base), (2L, base), (3L, "p q r s t u"))
      .toDF("doc_id", "text")
    val m = TextStats.ngramNovelty(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("novel"),
          r.getAs[Long]("novelty_bp"))).toMap
    assert(m(1L) == ((4L, 4L, 10000L)))
    assert(m(2L) == ((4L, 0L, 0L)))   // every gram first seen in doc 1
    assert(m(3L) == ((2L, 2L, 10000L)))
  }

  test("ngramNovelty: repeated shingle inside one doc counts once") {
    // "x y x y x y x" distinct 5-grams: "x y x y x", "y x y x y"
    val df = Seq((7L, "x y x y x y x")).toDF("doc_id", "text")
    val r = TextStats.ngramNovelty(df).collect().head
    assert(r.getAs[Long]("n_grams") == 2L)
    assert(r.getAs[Long]("novelty_bp") == 10000L)
  }

  test("ngramNovelty: short docs (< n tokens) drop out") {
    val df = Seq((1L, "a b c"), (2L, "a b c d e")).toDF("doc_id", "text")
    val ids = TextStats.ngramNovelty(df).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.sameElements(Array(2L)))
  }
}
