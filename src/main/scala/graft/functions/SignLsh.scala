package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The deterministic md5-derived hyperplane family shared by the LSH
  * operators and their DuckDB oracles.
  *
  * Component (p, d) = `((first 8 hex chars of md5("p-d") as uint32)
  * % 2000001) / 1e6 - 1.0` — uniform-ish in [-1, 1], reproducible in any
  * engine with md5. The components depend only on (plane, dimension), never
  * on data, so they are computed ONCE here and reused for every row; the
  * previous formulation re-derived `planes * dim` md5 hashes per ROW inside
  * an interpreted higher-order function.
  */
object SignLsh {

  /** plane tables keyed by plane count; each value has width >= any dim
    * requested so far (grown on demand, rows only ever read it).
    */
  private val tables = new ConcurrentHashMap[Int, Array[Array[Double]]]()

  def component(p: Int, d: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p-$d".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2000001L) / 1000000.0 - 1.0
  }

  /** Plane table with at least `dim` components per plane. Hot path is a
    * single map read; growth is rare (first row of a wider vector).
    */
  def table(planes: Int, dim: Int): Array[Array[Double]] = {
    val cur = tables.get(planes)
    if (cur != null && cur(0).length >= dim) return cur
    tables.synchronized {
      val again = tables.get(planes)
      if (again != null && again(0).length >= dim) return again
      val width = math.max(dim, if (again == null) 64 else again(0).length * 2)
      val next = Array.tabulate(planes, width)((p, d) => component(p, d))
      tables.put(planes, next)
      next
    }
  }
}

/** Native Catalyst expression: sign-LSH bucket key of an `array<float>`
  * vector against `planes` deterministic hyperplanes, as a string like
  * "10110100".
  *
  * Bit-for-bit identical to the built-in composition
  * `concat_ws("", (0 until planes).map(p => when(aggregate(zip_with(vec,
  * sequence(0, size(vec)-1), (x, i) => double(x) * component(p, i)), 0d,
  * _+_) >= 0, "1").otherwise("0")))` — same sequential left-to-right fold in
  * double precision — but one generated loop over a precomputed plane table
  * instead of `planes * dim` md5 derivations per row.
  */
case class SignLshBucket(child: Expression, planes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StringType
  override def prettyName: String = "sign_lsh_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val tbl = SignLsh.table(planes, n)
    val buf = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      val plane = tbl(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += vec.getFloat(i).toDouble * plane(i)
        i += 1
      }
      buf(p) = if (acc >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val n = ctx.freshName("n")
      val tbl = ctx.freshName("tbl")
      val buf = ctx.freshName("buf")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $vec.numElements();
         |double[][] $tbl = graft.functions.SignLsh.table($planes, $n);
         |byte[] $buf = new byte[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $vec.getFloat($i) * $tbl[$p][$i];
         |  }
         |  $buf[$p] = $acc >= 0 ? (byte) '1' : (byte) '0';
         |}
         |${ev.value} = UTF8String.fromBytes($buf);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshBucket {
  def apply(vec: Column, planes: Int): Column =
    ColumnShim.column(SignLshBucket(ColumnShim.expression(vec), planes))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sign_lsh_bucket"),
    new ExpressionInfo(classOf[SignLshBucket].getName, "sign_lsh_bucket"),
    (children: Seq[Expression]) => children(1) match {
      case Literal(v: Int, _) => SignLshBucket(children(0), v)
      case other => throw new IllegalArgumentException(
        s"sign_lsh_bucket: planes must be an integer literal, got $other")
    })
}
