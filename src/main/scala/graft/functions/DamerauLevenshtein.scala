package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: UNRESTRICTED Damerau-Levenshtein distance
  * (Lowrance-Wagner) — edit distance whose operations are insert, delete,
  * substitute, and transpose-adjacent, where a transposed block may be
  * edited again later. This is strictly stronger than the common
  * "optimal string alignment" restriction: dl("ca","abc") = 2
  * (transpose then insert through the transposed pair) where OSA gives 3.
  * The unrestricted form is a true metric (triangle inequality holds),
  * which matters when the comparator feeds metric-space blocking.
  *
  * Exactness: pure integer DP — bit-identical across engines by
  * construction (the oracle's `damerau_levenshtein` implements the same
  * unrestricted definition; validated over the full blocked-pair corpus
  * in q535 plus fixed vectors in the spec). Stays inside whole-stage
  * codegen via a static helper call, like Spark's own `levenshtein`
  * (reference scope: the change-detection string surface of
  * `macros/scd_plan.sql`, generalized to fuzzy key matching).
  *
  * Scale note: O(len²) time, O(len²) ints memory per call (the
  * transposition recurrence reaches back to arbitrary earlier rows, so
  * the full matrix is kept — unlike plain Levenshtein's two rows). Bound
  * the PAIR SET first (blocking/prefix/length filters); the comparator is
  * the verify step, never the candidate generator.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.dl(l.asInstanceOf[UTF8String],
                          r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DamerauLevenshtein.dl($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Static codegen target. Lowrance-Wagner DP over code units (the
    * corpus here is ASCII where units = code points).
    */
  def dl(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.toString
    val s2 = b.toString
    val la = s1.length
    val lb = s2.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2): row/col 0 hold the INF sentinel wall the
    // transposition case falls back to when a char was never seen.
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    // last row index (1-based) where each char occurred in s1
    val da = new java.util.HashMap[Char, Integer]()
    i = 1
    while (i <= la) {
      var db = 0 // last column j (1-based) in THIS row where chars matched
      j = 1
      while (j <= lb) {
        val kBox = da.get(s2.charAt(j - 1))
        val k = if (kBox == null) 0 else kBox.intValue()
        val l = db
        val cost =
          if (s1.charAt(i - 1) == s2.charAt(j - 1)) { db = j; 0 } else 1
        var m = d(i)(j) + cost // substitute / match
        val ins = d(i + 1)(j) + 1
        if (ins < m) m = ins
        val del = d(i)(j + 1) + 1
        if (del < m) m = del
        val tr = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (tr < m) m = tr
        d(i + 1)(j + 1) = m
        j += 1
      }
      da.put(s1.charAt(i - 1), Integer.valueOf(i))
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  def apply(a: Column, b: Column): Column =
    ColumnShim.column(DamerauLevenshtein(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("damerau_levenshtein"),
    new ExpressionInfo(classOf[DamerauLevenshtein].getName,
                       "damerau_levenshtein"),
    (children: Seq[Expression]) => DamerauLevenshtein(children(0), children(1)))
}
