package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-scope bridge into `SparkSessionExtensions.registerFunctions`
  * (`private[sql]`): lets the suite drive the exact registration step
  * `SparkSession.Builder.getOrCreate` runs for `spark.sql.extensions`,
  * without needing a fresh SparkContext (the config is static and a
  * second context per JVM is impossible in tests). */
object GraftExtensionProbe {
  def registerInto(ext: SparkSessionExtensions,
                   registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
