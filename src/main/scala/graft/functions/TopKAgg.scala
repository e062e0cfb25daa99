package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` UDAF — the extension tier between
  * a scalar `Expression` and a whole `SparkPlan`.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`? The
  * window shuffles EVERY row of the corpus to its group's partition and
  * sorts it, just to throw all but k away. An `Aggregator` participates in
  * partial aggregation: each map task reduces its rows into a ≤k-element
  * buffer per group BEFORE the exchange, so the shuffle moves at most
  * k·partitions rows per group and no sort ever sees the full corpus —
  * the same reason TakeOrderedAndProject beats global sort-limit, applied
  * per group. At 100 TB with hot groups this is the difference between a
  * skewed terabyte shuffle partition and kilobytes.
  *
  * Buffer = list of (value, id) sorted (value desc, id asc), truncated at
  * k; `merge` is a linear merge of two sorted buffers. Ordering ties break
  * on id, so results are deterministic for any partitioning (spec-checked
  * against the window formulation).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private val ord: Ordering[(Long, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(b: Seq[(Long, Long)],
                      a: (Long, Long)): Seq[(Long, Long)] =
    if (b.size >= k && ord.gteq(a, b.last)) b
    else ((a +: b).sorted(ord)).take(k)

  override def merge(x: Seq[(Long, Long)],
                     y: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var (i, j) = (0, 0)
    while (out.size < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && ord.lteq(x(i), y(j)))) {
        out += x(i); i += 1
      } else { out += y(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {

  /** `topK(k)(value, id)` → `array<struct<_1: value, _2: id>>` sorted
    * (value desc, id asc), length ≤ k.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAgg(k),
                 Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    (v, id) => f(v, id)
  }
}
