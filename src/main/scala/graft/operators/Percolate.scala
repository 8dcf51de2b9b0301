package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Analyzers

/** ES percolator — search turned inside-out: the QUERIES are stored and
  * each incoming document is matched against all of them (ES `percolate`
  * query over a `.percolator` field; the reference's alerting-style use
  * of its index in `src/used_queries/` is the forward form of the same
  * bool clauses). Each stored query is a bool of `must` / `must_not` /
  * `should` term clauses with `minimum_should_match`.
  *
  * Spark shape: the stored-query table is small by construction (humans
  * author queries; documents arrive at corpus scale), so it rides a
  * BROADCAST nested-loop join against the token-arrayed documents, and
  * clause evaluation is codegen'd array algebra per (doc, query) pair —
  * no shuffle at any corpus size; the document side streams through
  * scan → project → broadcast-join → filter in one codegen stage. At
  * 100 TB with thousands of stored queries the refinement is the same
  * one ES uses (pre-select candidate queries via a term index on the
  * query's must-terms); the evaluation contract below is unchanged.
  */
object Percolate {

  /** Stored-query fixture: (query_id, must, must_not, should,
    * minimum_should_match) over the corpus vocabulary. */
  val stored: Seq[(Long, Seq[String], Seq[String], Seq[String], Int)] = Seq(
    (1L, Seq("spark", "join"), Seq("slow"), Seq.empty, 0),
    (2L, Seq("customer"), Seq.empty, Seq("order", "line", "part"), 2),
    (3L, Seq.empty, Seq("vector"), Seq("stream", "window", "batch"), 3),
    (4L, Seq("hash", "merge", "sort"), Seq.empty, Seq.empty, 0),
    (5L, Seq("scan"), Seq("filter", "slow"), Seq("fast", "big"), 1))

  def storedQueries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stored.toDF("query_id", "must", "must_not", "should", "min_should")
  }

  /** Match every document against every stored query; emit one row per
    * (doc, query) hit with the satisfied should-clause count. */
  def percolate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col("doc_id"),
      array_distinct(Analyzers.tokenize(lower(col("text")))).as("toks"))
    toks.crossJoin(broadcast(storedQueries(spark)))
      .withColumn("n_should",
        size(filter(col("should"), t => array_contains(col("toks"), t))))
      .filter(
        forall(col("must"), t => array_contains(col("toks"), t)) &&
          !exists(col("must_not"), t => array_contains(col("toks"), t)) &&
          col("n_should") >= col("min_should"))
      .select(col("doc_id"), col("query_id"),
        col("n_should").cast("long").as("n_should"))
  }
}
