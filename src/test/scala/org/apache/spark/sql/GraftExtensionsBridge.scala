package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test bridge: `SparkSessionExtensions.registerFunctions` is
  * private[sql]; real deployments pass the class via the static conf
  * `spark.sql.extensions` at SparkContext creation, which a shared-JVM
  * test suite cannot do. This applies the injected functions to a
  * registry so the spec can observe them.
  */
object GraftExtensionsBridge {
  def applyTo(ext: SparkSessionExtensions, registry: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(registry)
}
