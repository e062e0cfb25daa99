package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: all `m*k` product-quantization distances of an
  * `array<float>` vector against the fixed integer codebook, in one pass.
  *
  * Output `array<long>` is row-major by (subspace, code):
  * `out[s*k + kk] = Σ_j (floor(vec[s*subDim + j] * 1000) - cents[s][kk][j])²`
  * — exactly the quantized-milli-space formula of the HOF composition in
  * `Similarity.pqPerSubSpec` (`transform`/`slice`/`zip_with`/`aggregate`),
  * which walks interpreted lambda nodes and allocates per-subspace arrays.
  * This is the per-vector hot path when coding a 100 TB embedding table, so
  * it generates (`doGenCode`) a primitive double loop inside whole-stage
  * codegen: one float load + floor per dimension, k multiply-accumulates
  * into a stack `long[]`.
  *
  * Vectors shorter than `m*subDim` contribute only their present dimensions
  * (missing dims add 0); embedding tables are fixed-width, so this matters
  * only for malformed rows. Null array yields null.
  */
case class PqAllDists(child: Expression,
                      m: Int,
                      k: Int,
                      subDim: Int,
                      cents: IndexedSeq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.length == m * k * subDim,
          s"codebook size ${cents.length} != m*k*subDim ${m * k * subDim}")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pq_all_dists"

  private lazy val centsArr: Array[Long] = cents.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](m * k)
    val n = math.min(v.numElements(), m * subDim)
    var j = 0
    while (j < n) {
      val q = math.floor(v.getFloat(j).toDouble * 1000.0).toLong
      val s = j / subDim
      val jj = j % subDim
      var kk = 0
      while (kk < k) {
        val d = q - centsArr((s * k + kk) * subDim + jj)
        out(s * k + kk) += d * d
        kk += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("pqCents", centsArr, "long[]")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val kk = ctx.freshName("kk")
      val q = ctx.freshName("q")
      val s = ctx.freshName("s")
      val jj = ctx.freshName("jj")
      val d = ctx.freshName("d")
      s"""
         |long[] $acc = new long[${m * k}];
         |int $n = java.lang.Math.min($v.numElements(), ${m * subDim});
         |for (int $j = 0; $j < $n; $j++) {
         |  long $q = (long) java.lang.Math.floor((double) $v.getFloat($j) * 1000.0);
         |  int $s = $j / $subDim;
         |  int $jj = $j % $subDim;
         |  for (int $kk = 0; $kk < $k; $kk++) {
         |    long $d = $q - $cRef[($s * $k + $kk) * $subDim + $jj];
         |    $acc[$s * $k + $kk] += $d * $d;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAllDists {
  /** Column-API entry point; derives the md5 codebook for (dim, m, k). */
  def apply(vec: Column, dim: Int, m: Int, k: Int): Column = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val cents: IndexedSeq[Long] =
      for {
        s <- 0 until m
        kk <- 0 until k
        j <- 0 until subDim
      } yield graft.operators.Similarity.pqCentroid(s, kk, j)
    ColumnShim.column(
      PqAllDists(ColumnShim.expression(vec), m, k, subDim, cents))
  }
}
