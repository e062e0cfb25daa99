package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, ConcatWs, Expression, Literal, Md5}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the surrogate-key hash shape
  * `md5(concat_ws('-', <string exprs...>))` — what dbt_utils
  * `generate_surrogate_key` compiles to, and what SQL users of this engine
  * naturally write — into the native [[Md5ConcatWs]] codegen expression
  * (thread-local digest, no intermediate concatenated string, no
  * commons-codec provider lookup per row).
  *
  * Purely a physical-efficiency rewrite: [[Md5ConcatWs]] is spec-asserted
  * byte-identical to the built-in composition, null-skipping included. The
  * Scala operator APIs call the native expression directly; this rule gives
  * the SQL path the same treatment automatically.
  */
object NativeSurrogateKeyRule extends Rule[LogicalPlan] {

  private def dashSeparated(e: Expression): Option[Seq[Expression]] = e match {
    case ConcatWs(Literal(sep: UTF8String, StringType) +: parts)
        if sep != null && sep.toString == "-" && parts.nonEmpty &&
          parts.forall(_.dataType == StringType) =>
      Some(parts)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // analyzer wraps the string arg in an implicit cast to binary
      case m @ Md5(c: Cast) if c.dataType == BinaryType =>
        dashSeparated(c.child).map(Md5ConcatWs(_)).getOrElse(m)
      case m @ Md5(inner) =>
        dashSeparated(inner).map(Md5ConcatWs(_)).getOrElse(m)
    }
}
