package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expressions over SORTED int arrays: two-pointer merge
  * scans for the PPJoin hot path (`operators/Dedup.ppjMatches`).
  *
  * `array_intersect` hashes one side per CALL and a higher-order `filter`
  * allocates lambda frames per row — measured ~2 µs/pair, which at the
  * 18 M probed pairs of a low-entropy vocabulary (TPC-H p_name) owns the
  * whole query (q488: 45 s). The candidate join's arrays are already
  * sorted (global frequency rank order), so both "overlap size" and
  * "first shared element" are single merge scans over primitive ints —
  * no allocation, no hashing, inside whole-stage codegen via static
  * helpers, ~50 ns/pair.
  *
  * Inputs must be sorted ascending and null-free (they are built from
  * `array_sort(collect_list(row_number()))` — ranks are unique ints).
  * Spec-asserted equal to `size(array_intersect(...))` / first-common on
  * random inputs (`PpJoinSpec`).
  */
object SortedIntOps {

  /** |a ∩ b| for sorted int arrays — two-pointer merge. */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** First element present in both sorted arrays; Int.MinValue when
    * disjoint (callers in the candidate join always have ≥1 common
    * element — the join key itself).
    */
  def firstCommon(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) return x
      else if (x < y) i += 1
      else j += 1
    }
    Int.MinValue
  }
}

case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntOps.intersectSize(a.asInstanceOf[ArrayData],
                               b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntOps.intersectSize($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(SortedIntersectSize(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}

case class SortedFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_first_common"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntOps.firstCommon(a.asInstanceOf[ArrayData],
                             b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntOps.firstCommon($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedFirstCommon {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(SortedFirstCommon(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}

/** SQL registration descriptors for the sorted-merge expressions
  * (`sorted_intersect_size`, `sorted_first_common`) — wired into
  * [[GraftExtensions]] so SQL users get the same codegen natives the
  * DataFrame API uses in the PPJoin hot path.
  */
object SortedIntOpsSql {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val intersectDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_size"),
    new ExpressionInfo(classOf[SortedIntersectSize].getName,
                       "sorted_intersect_size"),
    (children: Seq[Expression]) =>
      SortedIntersectSize(children(0), children(1)))

  val firstCommonDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_first_common"),
    new ExpressionInfo(classOf[SortedFirstCommon].getName,
                       "sorted_first_common"),
    (children: Seq[Expression]) =>
      SortedFirstCommon(children(0), children(1)))
}
