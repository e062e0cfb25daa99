package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: double-precision dot product of two
  * `array<float>` columns.
  *
  * Semantically identical to the built-in composition
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D, (s, v) -> s + v)`
  * — each float is promoted to double, products are accumulated sequentially
  * left-to-right, so results are bit-for-bit reproducible in any engine doing
  * the same fold (the DuckDB oracle does). The difference is execution: the
  * HOF composition allocates an intermediate array and walks interpreter
  * nodes per element, while this generates (`doGenCode`) a tight primitive
  * loop inside whole-stage codegen — the hot path of every pairwise cosine
  * in `Dedup`/`Similarity`, where it runs once per candidate PAIR.
  *
  * Nulls: a null array yields null (standard binary-expression semantics);
  * elements are assumed non-null (embedding vectors).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(
      FloatVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
    (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))
}

/** Registers graft's native functions for SQL use — either through
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session build,
  * or imperatively via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => NativeSurrogateKeyRule)
  }
}

object GraftExtensions {
  private[graft] val descriptors = Seq(
    FloatVecDot.functionDescriptor,
    SimHashBits.functionDescriptor,
    SignLshBucket.functionDescriptor,
    Md5ConcatWs.functionDescriptor,
    NfcNormalize.functionDescriptor,
    SortedIntOpsSql.intersectDescriptor,
    SortedIntOpsSql.firstCommonDescriptor,
    JaroWinkler.functionDescriptor,
    DamerauLevenshtein.functionDescriptor)

  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    // imperative counterpart of injectOptimizerRule (idempotent)
    if (!spark.experimental.extraOptimizations.contains(NativeSurrogateKeyRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeSurrogateKeyRule
  }
}
