package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{And, Contains, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Filter

import graft.functions.Analyzers
import graft.plans.TokenMatchPrefilter

/** [[TokenMatchPrefilter]]: term queries over analyzed text gain a
  * substring prefilter that short-circuits tokenization; necessary
  * conditions propagate through AND/OR; the rewrite is sound (equal
  * results on the real session) and a fixed point of itself. */
class TokenPrefilterSpec extends SparkSpec {

  private lazy val ext: SparkSession = {
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(spark)
    SparkSession.setActiveSession(spark)
    s
  }

  private def filterConjuncts(df: DataFrame): Seq[Expression] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    df.queryExecution.optimizedPlan.collect {
      case Filter(cond, _) => split(cond)
    }.flatten
  }

  private def toks = Analyzers.tokenize(lower(col("text")))

  test("a term filter gains a leading Contains prefilter") {
    val df = Tables.documents(ext, sf)
      .filter(array_contains(toks, "merge"))
      .select(col("doc_id"))
    val cs = filterConjuncts(df)
    assert(cs.exists(_.isInstanceOf[Contains]), cs.mkString("; "))
    // the cheap conjunct runs BEFORE the tokenizing one (isnotnull
    // inferred by constraint propagation may sit ahead of both)
    val iContains = cs.indexWhere(_.isInstanceOf[Contains])
    val iTokenize = cs.indexWhere(_.toString.contains("array_contains"))
    assert(iContains >= 0 && iTokenize > iContains, cs.mkString("; "))
  }

  test("necessary conditions propagate through AND and OR") {
    val df = Tables.documents(ext, sf)
      .filter((array_contains(toks, "merge") && array_contains(toks, "sort"))
        || array_contains(toks, "vector"))
      .select(col("doc_id"))
    val cs = filterConjuncts(df)
    // contains(merge) OR contains(vector) joined as one top conjunct
    assert(cs.exists {
      case org.apache.spark.sql.catalyst.expressions.Or(
        _: Contains, _: Contains) => true
      case _ => false
    }, cs.mkString("; "))
  }

  test("a naked OR arm never donates a global conjunct") {
    val df = Tables.documents(ext, sf)
      .filter(array_contains(toks, "merge") || (col("n_chars") > 10))
      .select(col("doc_id"))
    // n_chars > 10 gives no necessary condition, so the OR yields none:
    // no bare Contains conjunct may appear (it would wrongly exclude
    // rows matching only the n_chars arm)
    assert(!filterConjuncts(df).exists(_.isInstanceOf[Contains]))
  }

  test("rewritten filters return exactly the un-extended results") {
    def q(s: SparkSession): Set[Long] = {
      import s.implicits._
      Tables.documents(s, sf)
        .filter((array_contains(Analyzers.tokenize(lower(col("text"))), "merge")
          && array_contains(Analyzers.tokenize(lower(col("text"))), "sort"))
          || array_contains(Analyzers.tokenize(lower(col("text"))), "vector"))
        .select(col("doc_id")).as[Long].collect().toSet
    }
    val expected = q(spark) // shared session: rule not installed
    assert(filterConjuncts(Tables.documents(spark, sf)
      .filter(array_contains(toks, "merge"))).forall(!_.isInstanceOf[Contains]))
    assert(q(ext) == expected && expected.nonEmpty)
  }

  test("the rule is a fixed point of itself") {
    val once = TokenMatchPrefilter(
      Tables.documents(spark, sf)
        .filter(array_contains(toks, "merge"))
        .select(col("doc_id")).queryExecution.analyzed)
    val twice = TokenMatchPrefilter(once)
    assert(once == twice)
  }
}
