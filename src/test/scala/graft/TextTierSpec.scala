package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Hand-computed cases for the round-7 text-tier operators (the driver
  * oracle checks them at corpus scale; these pin the algebra on inputs
  * small enough to verify by hand).
  */
class TextTierSpec extends SparkTestBase {

  import spark.implicits._

  test("bpeLearn: recount changes the round-2 argmax; greedy run semantics") {
    // "a a a b" x3 and "a b" x2: round-1 pairs: (a,a)x6 (greedy: 'a a a'
    // gives ONE aa + leftover a), (a,b)x5 — wait, greedy counting is on
    // ADJACENT pairs pre-merge: a-a 2 per doc1 (positions 1-2, 2-3), so
    // (a,a)=6, (a,b)=3+2=5 -> merge (a,a) -> docs become "aa a b" x3,
    // "a b" x2: round 2 pairs: (aa,a)=3, (a,b)=5... argmax (a,b).
    val docs = (Seq.fill(3)("a a a b") ++ Seq.fill(2)("a b")).toDF("text")
    val got = TextAnalysis.bpeLearn(docs, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
                           r.getLong(3))).toList
    assert(got === List((1, "a", "a", 6L), (2, "a", "b", 5L)))
  }

  test("chi2Terms: perfectly discriminative token gets the max statistic") {
    val docs = ((1 to 10).map(i => (i.toLong, "hit common", 1L)) ++
                (11 to 20).map(i => (i.toLong, "miss common", 0L)))
      .toDF("id", "text", "y")
    val got = TextAnalysis.chi2Terms(docs, "id", "text", "y",
                                     minDf = 1L, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    // hit: n11=10 n10=0, chi2 = N = 20 -> 20e6 ppm exactly
    assert(got("hit") === ((10L, 0L, 20000000L)))
    assert(got("miss")._3 === 20000000L)
    // 'common' is in every doc: a zero margin makes chi2 undefined and
    // the operator excludes it by design
    assert(!got.contains("common"))
  }

  test("collocations: inseparable pair tops the lift ranking") {
    val docs = (Seq.fill(6)("x y filler") ++
                Seq.fill(6)("p filler q filler")).toDF("text")
    val top = TextAnalysis.collocations(docs.withColumn("id",
        monotonically_increasing_id()), "id", "text", minCount = 5L, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    assert(top.head._1 === "x" && top.head._2 === "y")
    // c_xy=6, c_x=c_y=6, Tu=42, Tb=30:
    // ((6*42 DIV 6)*42 DIV 6)*1e6 DIV 30 = 294e6/30 = 9800000
    assert(top.head._3 === 9800000L)
  }

  test("rakeKeyphrases: stopwords delimit and never score") {
    val docs = Seq("deep learning is the best deep model")
      .toDF("text").withColumn("id", lit(1L))
    val got = TextAnalysis.rakeKeyphrases(docs, "id", "text", "en", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toList
    // phrases: "deep learning" (len2), "best deep model" (len3)
    // deg: deep=2+3=5/freq2, learning=2/1, best=3/1, model=3/1
    // scores: dl = 5e6/2 + 2e6 = 4500000; bdm = 3e6 + 2500000 + 3e6
    assert(got.map(_._1).toSet === Set("deep learning", "best deep model"))
    val m = got.map(t => t._1 -> t._3).toMap
    assert(m("deep learning") === 4500000L)
    assert(m("best deep model") === 8500000L)
  }

  test("bigramLmKn: discounted mass + continuation backoff on a chain") {
    // corpus: "s a" x4, "s b" x4 -> heads: s c1=8 n1_head=2;
    // conts: a 1 type, b 1 type; T=2 types
    // cont_ppm(a) = 1*1e6 DIV 2 = 500000
    // p(a|s): disc = (4*4-3)*1e6 DIV 32 = 406250;
    // backoff = 3*2*500000 DIV 32 = 93750 -> 500000 exactly
    val docs = (Seq.fill(4)("s a") ++ Seq.fill(4)("s b")).toDF("text")
      .withColumn("id", monotonically_increasing_id())
    val got = TextAnalysis.bigramLmKn(docs, "id", "text", k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(7)))
    got.foreach { case (w1, w2, p) => assert(p === 500000L, s"$w1 $w2") }
  }
}
