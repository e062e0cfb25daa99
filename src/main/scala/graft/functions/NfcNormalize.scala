package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (UAX #15 canonical
  * composition) of a string column.
  *
  * Spark ships no normalization function, yet corpus dedup depends on it:
  * "café" composed and "café" decomposed are different byte strings, so
  * exact-hash dedup, fingerprints, and group-bys silently treat them as
  * distinct documents. Normalizing at ingest collapses them.
  *
  * Stays inside whole-stage codegen (the generated code calls the static
  * [[NfcNormalize.nfc]] helper). The helper takes the
  * `Normalizer.isNormalized` fast path first: real corpora are
  * overwhelmingly already NFC, and the check is a table-driven scan with
  * no allocation, so the common case costs no copy. `java.text.Normalizer`
  * implements the same UAX #15 algorithm as DuckDB's utf8proc
  * `nfc_normalize`, which is what the oracle compares against.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static codegen target: NFC-normalize, skipping allocation when the
    * input is already normalized.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(text: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(text)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => NfcNormalize(children.head))
}
