package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge to the `private[sql]` build/register hooks of
  * `SparkSessionExtensions` — the spec drives exactly what
  * SparkSession construction does with a configured extensions class,
  * without needing a fresh SparkContext (one per test JVM).
  */
object ExtTestBridge {
  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession) =
    ext.buildPlannerStrategies(spark)
  def registerFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): Unit =
    ext.registerFunctions(reg)
}
