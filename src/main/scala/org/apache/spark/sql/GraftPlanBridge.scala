package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into Spark's private[sql] surface, needed to expose a
  * custom LogicalPlan as a user-facing DataFrame and to inject a planner
  * strategy at runtime (graft.plans.AsOfJoinPlan). Kept to exactly these
  * two calls — everything else in the engine goes through public API.
  */
object GraftPlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Idempotently add a planner strategy to an existing session. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[CSparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
