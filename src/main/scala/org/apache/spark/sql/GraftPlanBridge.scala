package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan (Dataset.ofRows is private[sql]; extensions conventionally
  * reach it from inside the package). Nothing else crosses this boundary.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Batch `transformWithState` needs the StateStoreCoordinator RPC
    * endpoint that streaming queries normally bootstrap; register it
    * explicitly for batch-only sessions (idempotent — an existing
    * endpoint just wins).
    */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    try {
      org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
        .forDriver(org.apache.spark.SparkEnv.get,
          spark.sessionState.conf)
    } catch { case _: IllegalArgumentException => () }
}
