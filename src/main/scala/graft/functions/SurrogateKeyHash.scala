package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing: thread-local digests (Spark's built-in `md5` goes
  * through commons-codec's `DigestUtils`, which does a
  * `MessageDigest.getInstance` provider lookup per row) and allocation-free
  * hex encoding.
  */
object Md5Util {
  val digests: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".getBytes

  /** Lowercase hex of a 16-byte digest, as UTF8String bytes. */
  def hexBytes(digest: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(digest(i) & 0xf)
      i += 1
    }
    out
  }

  /** md5 of the '-'-joined UTF8 inputs (null inputs skipped with their
    * separator, matching `concat_ws`), hex-encoded. Exposed for both the
    * interpreted eval and the generated code.
    */
  def md5ConcatWs(inputs: Array[UTF8String]): UTF8String = {
    val md = digests.get()
    md.reset()
    var first = true
    var i = 0
    while (i < inputs.length) {
      val s = inputs(i)
      if (s != null) {
        if (!first) md.update('-'.toByte)
        first = false
        md.update(s.getBytes)
      }
      i += 1
    }
    UTF8String.fromBytes(hexBytes(md.digest()))
  }
}

/** Native Catalyst expression: `md5(concat_ws('-', c1, ..., cn))` in one
  * generated call with a reused thread-local digest.
  *
  * This is the dbt_utils `generate_surrogate_key` hash shape
  * (`/root/reference/macros/.../get_incremental_scd2_sql.sql:84-87` after the
  * package's `coalesce(cast(c as varchar), '')` wrapping, which callers apply
  * to the children) — computed 2-3 times per row by every SCD pipeline.
  * Byte-identical to the built-in composition: UTF-8 concatenation with '-'
  * separators (nulls skipped, concat_ws-style), md5, lowercase hex.
  */
case class Md5ConcatWs(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = children.map(_ => StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "md5_concat_ws"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[UTF8String](children.length)
    var i = 0
    while (i < children.length) {
      arr(i) = children(i).eval(input).asInstanceOf[UTF8String]
      i += 1
    }
    Md5Util.md5ConcatWs(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("inputs")
    val setBlocks = evals.zipWithIndex.map { case (e, i) =>
      code"""
        |${e.code}
        |$arr[${i.toString}] = ${e.isNull} ? null : ${e.value};"""
    }.reduce(_ + _)
    val result =
      code"""
        |UTF8String[] $arr = new UTF8String[${children.length.toString}];
        |$setBlocks
        |UTF8String ${ev.value} = graft.functions.Md5Util.md5ConcatWs($arr);"""
    ev.copy(code = result, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object Md5ConcatWs {
  def apply(cols: Seq[Column]): Column =
    ColumnShim.column(Md5ConcatWs(cols.map(ColumnShim.expression)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_concat_ws"),
    new ExpressionInfo(classOf[Md5ConcatWs].getName, "md5_concat_ws"),
    (children: Seq[Expression]) => Md5ConcatWs(children))
}
