package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.expressions.GraftFunctions

/** Spark extensions injector: enables
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * so graft's native expressions are available in every session (SQL and
  * DataFrame `expr`) without programmatic registration — the idiomatic
  * deployment path on a shared cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
