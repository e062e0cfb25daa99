package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter semi-join pruning — the manual form of Spark's own
  * runtime row-group filtering (`InjectRuntimeFilter`, spark.sql.optimizer.
  * runtime.bloomFilter.*), for plans where the optimizer can't prove the
  * rewrite (the build side behind a custom operator, a reused filter across
  * statements, a non-equi residual).
  *
  * Build: one aggregate over the (already filtered) build side produces a
  * KB–MB-scale bloom of `xxhash64(key)`. The filter — never the data — is
  * collected and folded into the probe predicate as a LITERAL, exactly how
  * Spark's injected runtime filter ships it (scalar-subquery result). Probe:
  * a shuffle-free `might_contain` scan filter that reaches the parquet
  * reader, so at 100 TB the fact table drops non-joining rows BEFORE the
  * join exchange instead of shuffling them. Bloom false positives survive
  * the prune; the verify join downstream removes them — the pruned join is
  * result-identical to the plain join (the oracle IS the plain join).
  */
object BloomPrune {

  private def xxh(c: Column): XxHash64 =
    XxHash64(Seq(ColumnShim.expression(c)), 42L)

  /** The serialized bloom filter of `dim`'s `keyCol` values. */
  def buildFilter(dim: DataFrame, keyCol: String,
                  expectedItems: Long = 1000000L): Array[Byte] = {
    val agg = ColumnShim.column(
      new BloomFilterAggregate(xxh(col(keyCol)), expectedItems)
        .toAggregateExpression())
    dim.select(agg).head.getAs[Array[Byte]](0)
  }

  /** `fact` restricted to rows whose `keyCol` MIGHT join `dim` — no false
    * negatives; false positives at the filter's configured fpp. An empty
    * build side yields a null filter, which prunes everything (correct for
    * the semi join).
    */
  def pruned(fact: DataFrame, dim: DataFrame,
             factKey: String, dimKey: String,
             expectedItems: Long = 1000000L): DataFrame = {
    val bytes = buildFilter(dim, dimKey, expectedItems)
    if (bytes == null) fact.limit(0)
    else fact.filter(ColumnShim.column(
      BloomFilterMightContain(Literal(bytes, BinaryType), xxh(col(factKey)))))
  }
}
