package graft

import org.apache.spark.sql.functions._

import graft.functions.QueryString
import graft.functions.QueryString._
import graft.operators.Percolate

/** The query_string mini-language: parser shape (precedence,
  * associativity, phrases, query-time analysis) and compiled Column
  * semantics, plus the percolator built on the same clause algebra. */
class QueryStringSpec extends SparkSpec {

  // --- parser ---

  test("AND binds tighter than OR; left-associative") {
    assert(parse("a AND b OR c") ==
      Or(And(Term("a"), Term("b")), Term("c")))
    assert(parse("a OR b OR c") ==
      Or(Or(Term("a"), Term("b")), Term("c")))
  }

  test("adjacent terms use the implicit default operator (OR)") {
    assert(parse("a b") == Or(Term("a"), Term("b")))
  }

  test("NOT binds tighter than AND; -/! are NOT") {
    assert(parse("NOT a AND b") == And(Not(Term("a")), Term("b")))
    assert(parse("-a AND !b") == And(Not(Term("a")), Not(Term("b"))))
  }

  test("parentheses override precedence; '+' is a no-op must marker") {
    assert(parse("a AND (b OR c)") ==
      And(Term("a"), Or(Term("b"), Term("c"))))
    assert(parse("+a AND +b") == And(Term("a"), Term("b")))
  }

  test("phrases and query-time analysis") {
    assert(parse("\"hash join\"") == Phrase(Seq("hash", "join")))
    assert(parse("\"Spark\"") == Term("spark")) // 1-token phrase folds
    // a word the analyzer splits becomes a phrase, like Lucene
    // (an interior hyphen stays inside the word at lex time, then
    // query-time analysis splits it)
    assert(parse("covid-19") == Phrase(Seq("covid", "19")))
    assert(parse("Upper") == Term("upper"))
  }

  test("malformed input throws") {
    intercept[IllegalArgumentException](parse("(a AND b"))
    intercept[IllegalArgumentException](parse("\"...\""))
  }

  test("round-trip: rendering any AST with explicit syntax re-parses to it") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo")
    def node(depth: Int): Gen[Node] =
      if (depth == 0) Gen.oneOf(
        word.map(Term(_)),
        Gen.listOfN(2, word).map(ws => Phrase(ws)))
      else Gen.frequency(
        3 -> Gen.lzy(node(0)),
        2 -> Gen.lzy(for { l <- node(depth - 1); r <- node(depth - 1) } yield And(l, r)),
        2 -> Gen.lzy(for { l <- node(depth - 1); r <- node(depth - 1) } yield Or(l, r)),
        1 -> Gen.lzy(node(depth - 1).map(Not(_))))
    def render(n: Node): String = n match {
      case Term(t)    => t
      case Phrase(ts) => ts.mkString("\"", " ", "\"")
      case Not(x)     => s"NOT (${render(x)})"
      case And(l, r)  => s"(${render(l)} AND ${render(r)})"
      case Or(l, r)   => s"(${render(l)} OR ${render(r)})"
    }
    // a 2-word phrase of equal words parses back identically; distinct
    // draws can also collide — the property is parse(render(ast)) == ast
    val cases = (0 until 300).flatMap(i =>
      node(3).apply(Gen.Parameters.default, Seed(i.toLong)))
    cases.foreach { ast =>
      assert(parse(render(ast)) == ast, render(ast))
    }
  }

  test("truncated and empty inputs throw IllegalArgumentException") {
    intercept[IllegalArgumentException](parse(""))
    intercept[IllegalArgumentException](parse("a AND"))
    intercept[IllegalArgumentException](parse("NOT"))
  }

  // --- compiled semantics ---

  test("compiled predicate: phrase adjacency, NOT, nesting") {
    import spark.implicits._
    val df = Seq(
      (1L, "fast hash join beats sort"),
      (2L, "join the hash crowd"),     // both words, not adjacent
      (3L, "merge sort only"),
      (4L, "merge sort but slow")).toDF("id", "text")
      .withColumn("toks",
        graft.functions.Analyzers.tokenize(lower(col("text"))))
    def ids(q: String): Seq[Long] =
      df.filter(QueryString.matches(q, col("toks")))
        .select("id").as[Long].collect().toSeq.sorted
    assert(ids("\"hash join\"") == Seq(1L))
    assert(ids("hash AND join") == Seq(1L, 2L))
    assert(ids("(\"hash join\" OR (merge AND sort)) AND NOT slow") ==
      Seq(1L, 3L))
    assert(ids("crowd beats") == Seq(1L, 2L)) // implicit OR
  }

  // --- percolator ---

  test("percolate: must / must_not / minimum_should_match clauses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join fast"),            // q1 (must spark+join, no slow)
      (2L, "spark join slow"),            // q1 blocked by must_not
      (3L, "customer order line detail"), // q2 (2 of 3 should)
      (4L, "customer only"),              // q2 blocked: 0 should hits
      (5L, "hash merge sort scan fast")   // q4; q5 (scan + fast, no filter)
    ).toDF("doc_id", "text")
    val hits = Percolate.percolate(docs)
      .select("doc_id", "query_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 1L), (3L, 2L), (5L, 4L), (5L, 5L)))
  }

  test("percolate n_should counts distinct satisfied should clauses") {
    import spark.implicits._
    val docs = Seq((9L, "customer order order line line line")).toDF("doc_id", "text")
    val row = Percolate.percolate(docs).collect().head
    assert(row.getAs[Long]("query_id") == 2L)
    assert(row.getAs[Long]("n_should") == 2L) // order+line, each once
  }
}
