package org.apache.spark.sql.graftio

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to `sessionState.functionRegistry` (`private[sql]`): lets graft
  * register its native expressions as SQL functions on an ALREADY-built
  * session. The front door for new sessions is
  * `spark.sql.extensions=graft.sql.GraftExtensions`; this exists for
  * sessions the caller didn't build (notebooks, the driver's harness).
  */
object FunctionRegistryBridge {

  /** Apply an extensions object's injected functions to a clone of the
    * builtin registry and list the resulting names — lets a test assert
    * the `spark.sql.extensions` injection wiring without building a new
    * session (getOrCreate in a shared-JVM suite returns the existing
    * one, silently skipping injection). */
  def materializedNames(
      ext: org.apache.spark.sql.SparkSessionExtensions): Set[String] = {
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.clone()
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName).toSet
  }
  def register(
      spark: SparkSession,
      fns: Seq[(FunctionIdentifier, ExpressionInfo,
        Seq[Expression] => Expression)]): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fns.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
