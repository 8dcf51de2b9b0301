package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lucene-style `query_string` mini-language compiled to a Catalyst
  * predicate over an analyzed token array — the reference's search tier
  * exposes this syntax verbatim through ES's `query_string` query
  * (Elasticsearch DSL the reference queries in
  * `src/used_queries/elastic_queries.json` are the structured form of).
  *
  * Grammar (classic Lucene boolean syntax, `default_operator=OR`):
  *
  * {{{
  *   or      := and ( ("OR" | implicit) and )*
  *   and     := not ( "AND" not )*
  *   not     := ("NOT" | "-" | "!") not | primary
  *   primary := "(" or ")" | '"' words '"' | word
  * }}}
  *
  * Terms are analyzed with the SAME tokenizer as the corpus
  * ([[Analyzers.tokenPattern]], lowercased) so query terms and index
  * tokens can never disagree on normalization; a query word that
  * analyzes to several tokens (e.g. `covid-19`) becomes a phrase, like
  * Lucene's query-time analysis does. Phrases compile to adjacency over
  * the space-joined token stream (exact, order-preserving) rather than
  * a positions index — at 100 TB this stays a codegen'd per-row
  * `Contains` with zero shuffle, and Catalyst pushes the enclosing
  * filter to the scan.
  *
  * The compiled predicate is pure `Column` algebra (`array_contains`,
  * `Contains`, boolean ops) — whole-stage-codegen friendly, no UDF.
  */
object QueryString {

  sealed trait Node
  final case class Term(t: String) extends Node
  final case class Phrase(ts: Seq[String]) extends Node
  final case class Not(n: Node) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  private final case class PhraseTok(s: String) extends Tok
  private final case class WordTok(s: String) extends Tok

  private val termRe = Analyzers.tokenPattern.r

  /** Query-time analysis: the corpus tokenizer + lowercase. */
  private def analyze(s: String): Seq[String] =
    termRe.findAllIn(s.toLowerCase(Locale.ROOT)).toSeq

  private def lex(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '-' => out += NotTok; i += 1
        case '!' => out += NotTok; i += 1
        case '+' => i += 1 // Lucene '+' (must): redundant under explicit AND
        case '"' =>
          val j = q.indexOf('"', i + 1)
          val end = if (j < 0) q.length else j
          out += PhraseTok(q.substring(i + 1, end))
          i = end + 1
        case _ =>
          var j = i
          // stop on ANY whitespace (isWhitespace, the same predicate
          // the top-level skip uses) — a literal stop-set missing \r
          // made CRLF input lex "AND\r" as a TERM, silently turning
          // `cat AND dog` into `cat OR "and" OR dog` (round-13 review)
          while (j < q.length && !q.charAt(j).isWhitespace &&
            !"()\"".contains(q.charAt(j))) j += 1
          q.substring(i, j) match {
            case "AND" | "&&" => out += AndTok
            case "OR" | "||"  => out += OrTok
            case "NOT"        => out += NotTok
            case w            => out += WordTok(w)
          }
          i = j
      }
    }
    out.toList
  }

  private def mkTerm(raw: String): Node = analyze(raw) match {
    case Seq()  => throw new IllegalArgumentException(
      s"query term '$raw' analyzes to nothing")
    case Seq(t) => Term(t)
    case many   => Phrase(many) // multi-token word → query-time phrase
  }

  private final class P(var ts: List[Tok]) {
    private def peek: Option[Tok] = ts.headOption
    private def advance(): Tok = ts match {
      case h :: t => ts = t; h
      case Nil => throw new IllegalArgumentException("unexpected end of query")
    }

    def parseOr(): Node = {
      var l = parseAnd()
      var done = false
      while (!done) peek match {
        case Some(OrTok) => advance(); l = Or(l, parseAnd())
        case Some(LParen) | Some(NotTok) |
             Some(PhraseTok(_)) | Some(WordTok(_)) =>
          l = Or(l, parseAnd()) // implicit default operator = OR
        case _ => done = true
      }
      l
    }

    private def parseAnd(): Node = {
      var l = parseNot()
      while (peek.contains(AndTok)) { advance(); l = And(l, parseNot()) }
      l
    }

    private def parseNot(): Node = peek match {
      case Some(NotTok) => advance(); Not(parseNot())
      case _            => parsePrimary()
    }

    private def parsePrimary(): Node = advance() match {
      case LParen =>
        val n = parseOr()
        if (peek.contains(RParen)) advance()
        else throw new IllegalArgumentException("unbalanced '('")
        n
      case PhraseTok(s) => analyze(s) match {
        case Seq()  => throw new IllegalArgumentException("empty phrase")
        case Seq(t) => Term(t)
        case many   => Phrase(many)
      }
      case WordTok(w) => mkTerm(w)
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }
  }

  def parse(q: String): Node = {
    val p = new P(lex(q))
    val n = p.parseOr()
    if (p.ts.nonEmpty)
      throw new IllegalArgumentException(s"trailing tokens: ${p.ts}")
    n
  }

  /** Compile an AST against an (already analyzed) token-array column. */
  def compile(n: Node, toks: Column): Column = n match {
    case Term(t)    => array_contains(toks, lit(t))
    case Phrase(ts) =>
      // adjacency over the sentinel-delimited token stream: exact
      // token-sequence containment, no partial-word false positives
      concat(lit(" "), array_join(toks, " "), lit(" "))
        .contains(lit(ts.mkString(" ", " ", " ")))
    case Not(x)     => !compile(x, toks)
    case And(l, r)  => compile(l, toks) && compile(r, toks)
    case Or(l, r)   => compile(l, toks) || compile(r, toks)
  }

  /** One-shot: parse `q` and evaluate it over `toks`. */
  def matches(q: String, toks: Column): Column = compile(parse(q), toks)
}
