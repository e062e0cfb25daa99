package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: all MinHash LSH band keys of a shingle set in ONE pass.
  *
  * Contract (identical strings to the built-in composition in
  * `Dedup.minhashLshPairs`):
  *   - minhash component `i` = lexicographic min over shingles of
  *     `md5Hex(i + "-" + shingle)`,
  *   - band key `b` = `md5Hex(m(b*rows) + "|" + ... + m(b*rows+rows-1))`,
  *   - empty shingle set: band key = `md5Hex("")` (matching `concat_ws`'s
  *     null-skipping on the all-null minhash columns).
  *
  * The HOF composition walks the shingle array `bands*rows` times building an
  * intermediate md5 array per component; this computes all `bands*rows`
  * minima in a single traversal. md5 cost itself is identical — the win is
  * array-walk and allocation count. `CodegenFallback`: md5 dominates, codegen
  * of the loop shell is not worth the complexity.
  */
case class MinHashBands(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "minhash_bands"

  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5Hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val k = bands * rows
    val mins = new Array[String](k)
    var j = 0
    while (j < n) {
      val s = xs.getUTF8String(j).toString
      var i = 0
      while (i < k) {
        val h = md5Hex(i + "-" + s)
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
      j += 1
    }
    val keys = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val joined =
        if (n == 0) ""
        else {
          val sb = new java.lang.StringBuilder(rows * 33)
          var r = 0
          while (r < rows) {
            if (r > 0) sb.append('|')
            sb.append(mins(b * rows + r))
            r += 1
          }
          sb.toString
        }
      keys(b) = UTF8String.fromString(md5Hex(joined))
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {
  def apply(shingles: Column, bands: Int, rows: Int): Column =
    ColumnShim.column(MinHashBands(ColumnShim.expression(shingles), bands, rows))
}
