package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-callable registration of the library's custom codegen'd
  * Catalyst expressions, so the analyst SQL entry point (SURVEY §3.3)
  * reaches them by name — `SELECT porter_stem(tok) ...` — with the
  * same whole-stage-codegen path the DSL gets. In a deployment these
  * registrations live in a `SparkSessionExtensions.injectFunction`
  * hook wired via `spark.sql.extensions`; registering on the live
  * session keeps the single-session driver harness simple and is
  * idempotent (re-registration replaces). */
object GraftFunctions {

  private def unary(name: String, cls: Class[_],
                    build: Expression => Expression) =
    (name,
      new ExpressionInfo(cls.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes exactly 1 argument")
        build(args.head)
      })

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(
      unary("porter_stem", classOf[expressions.PorterStem],
        expressions.PorterStem),
      unary("ascii_fold", classOf[expressions.AsciiFold],
        expressions.AsciiFold)
    ).foreach { case (name, info, builder) =>
      reg.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
