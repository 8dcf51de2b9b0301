package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-callable registration of the library's custom codegen'd
  * Catalyst expressions, so the analyst SQL entry point (SURVEY §3.3)
  * reaches them by name — `SELECT porter_stem(tok) ...` — with the
  * same whole-stage-codegen path the DSL gets. One builder list,
  * two attachment shapes: cluster deployments wire
  * `spark.sql.extensions=graft.GraftExtensions`
  * ([[graft.GraftExtensions]], same injections); this entry point
  * attaches to an already-running session and is idempotent
  * (re-registration replaces). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.injections.foreach {
      case (ident, info, builder) =>
        reg.registerFunction(ident, info, builder)
    }
  }
}
