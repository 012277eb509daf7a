package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the session's private[sql] FunctionRegistry — lets the graft
  * expressions be called from `spark.sql(...)` without a cluster-level
  * `spark.sql.extensions` config (the config path is
  * graft.functions.GraftExtensions; this is the runtime/in-session path).
  */
object FunctionRegistryBridge {
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
