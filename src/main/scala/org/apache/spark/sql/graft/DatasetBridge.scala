package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge to the `private[sql]` Dataset.ofRows — the constructor a library
  * needs to hand Catalyst a custom LogicalPlan and get a DataFrame back. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** The ANALYZED logical plan of a DataFrame — what a rule needs to
    * splice a library-built frame into a plan it is rewriting. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed
}
