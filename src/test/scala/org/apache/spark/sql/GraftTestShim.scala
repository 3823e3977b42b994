package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-scope bridge: drive the same `private[sql]` hook that
  * `spark.sql.extensions` session construction uses, so ExtensionsSpec
  * can exercise the injection path against the shared test session.
  */
object GraftTestShim {
  def registerFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): Unit =
    ext.registerFunctions(reg)
}
