package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{SortedFirstCommon, SortedIntersectSize}

/** PPJoin prefix-filter family: the native sorted-merge expressions must
  * be bit-identical to their built-in equivalents, and the filtered
  * candidate join must keep recall exactly 1.0 — every pair a brute-force
  * all-pairs Jaccard finds at τ must come back, with identical overlap /
  * union sizes (the length, positional, and first-shared-dedup filters
  * may only drop pairs that CANNOT reach τ).
  */
class PpJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("SortedIntersectSize / SortedFirstCommon match built-ins on random sorted arrays") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(300) { i =>
      def arr() = Seq.fill(rnd.nextInt(8))(rnd.nextInt(20)).distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
              SortedIntersectSize(col("a"), col("b")).as("nat_size"),
              SortedFirstCommon(col("a"), col("b")).as("nat_first"),
              size(array_intersect(col("a"), col("b"))).as("ref_size"),
              expr("coalesce(array_min(array_intersect(a, b)), -2147483648)")
                .as("ref_first"))
    // sorted inputs: first common in scan order == min of the intersection
    assert(df.filter(col("nat_size") =!= col("ref_size") ||
                     col("nat_first") =!= col("ref_first")).count() === 0L)
  }

  test("prefixJaccardPairs == brute-force all-pairs Jaccard (recall 1.0, exact values)") {
    val docs = Seq(
      1L -> "green red blue",
      2L -> "red green blue",          // J(1,2)=1
      3L -> "green red yellow",        // J(1,3)=1/2
      4L -> "cyan magenta",            // disjoint from 1-3
      5L -> "cyan magenta black",      // J(4,5)=2/3
      6L -> "red",                     // subset, J(1,6)=1/3 < 1/2
      7L -> "green red blue white",    // J(1,7)=3/4
      8L -> "  red   green   blue  ",  // whitespace noise, J(1,8)=1
      9L -> "solo",
      10L -> "red blue"                // J(1,10)=2/3
    ).toDF("doc_id", "body")
    val got = Dedup.prefixJaccardPairs(docs, "doc_id", "body", 1, 2)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // brute force over token sets
    val sets = Seq(1L -> Set("green", "red", "blue"),
      2L -> Set("red", "green", "blue"), 3L -> Set("green", "red", "yellow"),
      4L -> Set("cyan", "magenta"), 5L -> Set("cyan", "magenta", "black"),
      6L -> Set("red"), 7L -> Set("green", "red", "blue", "white"),
      8L -> Set("red", "green", "blue"), 9L -> Set("solo"),
      10L -> Set("red", "blue"))
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      ov = (sa & sb).size.toLong; un = (sa | sb).size.toLong
      if ov * 2 >= un
    } yield (ia, ib, ov, un)).sortBy(p => (p._1, p._2))
    assert(got === want)
  }

  test("prefixCandidates is a superset of the τ-similar pairs and structurally distinct") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = Seq.tabulate(60) { i =>
      (i.toLong,
       Seq.fill(2 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
         .mkString(" "))
    }.toDF("doc_id", "body")
    val cands = Dedup.prefixCandidates(docs, "doc_id", "body", 2, 3)
      .as[(Long, Long)].collect().toSeq
    assert(cands.size === cands.distinct.size, "duplicate candidate pairs")
    val verified = Dedup.prefixJaccardPairs(docs, "doc_id", "body", 2, 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified.subsetOf(cands.toSet), "candidate set lost a true pair")
  }
}
