package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst twin of `Linkage.withJaroWinklerPpm`'s packed-bitmask
  * SQL fold (r15 optimization): the EXACT-INTEGER Jaro–Winkler used by
  * the ER tier — greedy first-unmatched window matching, half-
  * transposition count over the k-th matched characters, and the pinned
  * truncating arithmetic
  *
  *   jaro_ppm = (m²·l2 + m²·l1 + (m − t_raw DIV 2)·l1·l2)·10⁶
  *              DIV (3·l1·l2·m)
  *   jw_ppm   = jaro_ppm + ℓ·(10⁶ − jaro_ppm) DIV 10   (ℓ = common
  *              prefix ≤ 4)
  *
  * — all operation-for-operation identical to the interpreted
  * higher-order-function expression it replaces (pinned bit-identical in
  * JaroWinklerPpmSpec across the full blocked-pair fixture, including
  * transpositions, 1-char and 20-char inputs). The HOF fold walked its
  * expression tree per CHARACTER per row in interpreted mode — measured
  * ~26 ms/row on q714's candidate pairs — where this stays inside
  * whole-stage codegen via a static helper like Spark's `levenshtein`.
  *
  * Caller contract (unchanged): inputs 1..20 chars — the packed-bitmask
  * domain the SQL fold asserted; `withJaroWinklerPpm` keeps its
  * assert_true guard in front of this expression.
  *
  * Output struct: (m, transpositions, jaro_ppm, jw_ppm), all BIGINT.
  */
case class JaroWinklerPpm(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = JaroWinklerPpm.outType
  override def prettyName: String = "jaro_winkler_ppm"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerPpm.eval(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerPpm.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerPpm {

  private[graft] val outType: StructType = StructType(Seq(
    StructField("m", LongType, nullable = false),
    StructField("transpositions", LongType, nullable = false),
    StructField("jaro_ppm", LongType, nullable = false),
    StructField("jw_ppm", LongType, nullable = false)))

  /** Static codegen target. Mirrors the SQL fold exactly: 1-based SQL
    * window [max(1, i−w), min(l2, i+w)] is the 0-based [i−w, i+w] here;
    * the greedy takes the FIRST unmatched in-window position (the
    * fold's element_at(filter(...), 1)); t_raw compares the k-th matched
    * character of each side in ascending position order.
    */
  def eval(a: UTF8String, b: UTF8String): InternalRow = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - w)
      val hi = math.min(l2 - 1, i + w)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    var tRaw = 0L
    var j2 = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j2)) j2 += 1
        if (s1.charAt(i) != s2.charAt(j2)) tRaw += 1
        j2 += 1
      }
      i += 1
    }
    val mm = m.toLong
    val jaroPpm =
      if (m == 0) 0L
      else (mm * mm * l2 + mm * mm * l1 + (mm - tRaw / 2) * l1 * l2) *
        1000000L / (3L * l1 * l2 * mm)
    var pl = 0
    val cap = math.min(4, math.min(l1, l2))
    while (pl < cap && s1.charAt(pl) == s2.charAt(pl)) pl += 1
    val jwPpm =
      if (m == 0) 0L else jaroPpm + pl * (1000000L - jaroPpm) / 10L
    new GenericInternalRow(Array[Any](mm, tRaw / 2, jaroPpm, jwPpm))
  }

  def apply(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinklerPpm(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
