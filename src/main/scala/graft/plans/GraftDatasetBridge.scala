package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]`; graft needs it once — to rebuild a
  * DataFrame around its custom logical operator node
  * (`graft.plans.SegmentConversations`). This accessor lives in the `sql`
  * package for exactly that call and nothing else. */
object GraftDatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
