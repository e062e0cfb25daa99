package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType}

/** A DECLARED-constant window partition key: evaluates to 1 for every row
  * but reports `foldable = false`, so `EliminateWindowPartitions` (Spark 4)
  * cannot strip it from a window's partition spec and `WindowExec` never
  * logs its accidental-global-window warning.
  *
  * Several operators here deliberately run a window over a provably
  * dimension-sized relation (micro-cell rollups ≤ microBins rows, top-k
  * survivors, per-day/strata rollups). Those windows are single-partition
  * BY DESIGN — the relation is bounded before the window, the corpus never
  * reaches it. Partitioning by this key keeps the plan shape identical (one
  * hash partition) while making the intent explicit instead of tripping the
  * lint that exists to catch *unbounded* global windows.
  */
case class DimPartitionKey() extends LeafExpression {
  override def foldable: Boolean = false
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "dim_partition_key"
  override def eval(input: InternalRow): Any = 1
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = code"""int ${ev.value} = 1;""",
            isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
}

object DimKey {
  /** The partition key for deliberate single-partition windows over
    * dimension-sized relations.
    */
  def one: Column = ColumnShim.column(DimPartitionKey())
}
