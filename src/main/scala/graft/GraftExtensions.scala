package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions

/** The deployment-shape registration hook: wiring
  * `spark.sql.extensions=graft.GraftExtensions` makes every session in
  * the cluster see the library's codegen'd expressions by SQL name —
  * no driver code, no per-session register() call, works from
  * spark-sql / JDBC / notebooks alike. `injectFunction` lands the
  * builders in the session's function registry at build time; the
  * in-session [[graft.functions.GraftFunctions.register]] path remains
  * for attaching to an already-running session (same builders). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach(ext.injectFunction)
    // operator-optimization injection point: runs inside the main
    // fixed-point batch, so ColumnPruning gets to delete a collect
    // whose only consumer the rule just rewrote away
    ext.injectOptimizerRule(_ => graft.plans.CollectStrengthReduction)
    ext.injectOptimizerRule(_ => graft.plans.TokenMatchPrefilter)
  }
}

object GraftExtensions {
  private def unary(name: String, cls: Class[_],
                    build: Expression => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes exactly 1 argument")
        build(args.head)
      })

  private[graft] val injections = Seq(
    unary("porter_stem", classOf[expressions.PorterStem],
      expressions.PorterStem),
    unary("ascii_fold", classOf[expressions.AsciiFold],
      expressions.AsciiFold),
    unary("nfkc", classOf[expressions.Nfkc], expressions.Nfkc),
    // the runtime-filter expressions (SPARK-32268), SQL-callable so the
    // analyst entry can write the scalar-subquery bloom pre-filter:
    //   WHERE might_contain((SELECT bloom_filter_agg(xxhash64(k)) FROM dim
    //                        WHERE ...), xxhash64(fact_k))
    unary("bloom_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
      c => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(c).toAggregateExpression()),
    (FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "might_contain takes exactly 2 arguments")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args.head, args(1))
      }))
}
