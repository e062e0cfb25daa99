package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge from a hand-built LogicalPlan to the public DataFrame API.
  *
  * Spark 4 keeps `Dataset.ofRows` behind `private[sql]`; a library
  * shipping its own logical operators (planned by an injected strategy)
  * needs exactly this one call, reached via an `org.apache.spark.sql`
  * subpackage — the same pattern as [[ColumnShim]].
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
