package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Multi-pattern substring search: one Aho-Corasick automaton pass per
  * document instead of one scan (or one regex) per pattern.
  *
  * The pipeline op this serves is blocklist / phrase-dictionary matching
  * over a training corpus (reference scope: the change-detection string
  * surface, `macros/scd_plan.sql`'s hash-change predicates, generalized to
  * content matching). At 100 TB the naive plan is |patterns| LIKE scans —
  * each a full corpus pass; the automaton makes it ONE pass whose cost is
  * independent of dictionary size: the dictionary (KB..MB) is built into
  * goto/fail/output tables on the driver, broadcast, and each executor
  * streams its documents through it. Matches are counted at every
  * position, overlapping included (all end positions), the standard
  * Aho-Corasick semantics.
  *
  * The automaton is plain serializable arrays (per-node sorted char/next
  * pairs), so the BUILT structure broadcasts — executors do not rebuild
  * per task, which matters once the dictionary is millions of patterns.
  */
object MultiPattern {

  /** Trie + BFS failure links + merged output sets, built eagerly.
    *
    * Patterns must be distinct and non-empty: a duplicate would count the
    * same occurrences once per copy (and [[matchCounts]]' per-pattern
    * rollup, keyed on the string, would sum the copies into one doubled
    * row), and an empty pattern has no principled Aho-Corasick semantics
    * (the root's output would fire once per CHARACTER, not the length+1
    * standard positions). Both are dictionary bugs — fail fast at build.
    */
  final class Automaton(val patterns: Array[String]) extends Serializable {
    require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
    require(patterns.distinct.length == patterns.length,
            "patterns must be distinct: " +
              patterns.groupBy(identity).collect {
                case (p, c) if c.length > 1 => p
              }.mkString(", "))
    // growable trie: per-node char→child map (built driver-side, small)
    private val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    private val endings = mutable.ArrayBuffer(List.empty[Int])

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = children(s).getOrElse(ch, {
          children += mutable.TreeMap.empty[Char, Int]
          endings += Nil
          val n = children.size - 1
          children(s)(ch) = n
          n
        })
      }
      endings(s) ::= pi
    }

    val fail: Array[Int] = Array.fill(children.size)(0)
    // out(v) = endings(v) ++ out(fail(v)), precomputed so the scan never
    // walks fail chains per character
    val out: Array[List[Int]] = Array.fill(children.size)(Nil: List[Int])
    locally {
      val q = mutable.Queue.empty[Int]
      children(0).values.foreach { c => fail(c) = 0; q += c }
      out(0) = endings(0)
      while (q.nonEmpty) {
        val v = q.dequeue()
        out(v) = endings(v) ++ out(fail(v))
        children(v).foreach { case (ch, c) =>
          var f = fail(v)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(c) = if (children(f).contains(ch) && children(f)(ch) != c)
            children(f)(ch) else 0
          q += c
        }
      }
    }

    // flattened transitions for the scan: per-node sorted (char, next)
    private val keys: Array[Array[Char]] =
      children.map(_.keysIterator.toArray).toArray
    private val nexts: Array[Array[Int]] =
      children.map(_.valuesIterator.toArray).toArray

    private def step(state: Int, ch: Char): Int = {
      var s = state
      while (true) {
        val i = java.util.Arrays.binarySearch(keys(s), ch)
        if (i >= 0) return nexts(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0
    }

    /** Per-pattern occurrence counts (all end positions) in one pass. */
    def countMatches(text: String): Array[Long] = {
      val counts = Array.fill(patterns.length)(0L)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        var o = out(s)
        while (o.nonEmpty) { counts(o.head) += 1L; o = o.tail }
        i += 1
      }
      counts
    }
  }

  /** Per-pattern corpus totals: (pat, n_docs, n_matches), one row per
    * pattern including zero-match ones. One shuffle (the per-pattern
    * rollup of the per-partition partial counts).
    */
  def matchCounts(spark: SparkSession, docs: DataFrame, textCol: String,
                  patterns: Seq[String]): DataFrame = {
    import spark.implicits._
    val auto = new Automaton(patterns.toArray)
    val bc = spark.sparkContext.broadcast(auto)
    // partial aggregation inside the partition: (patIdx → docs, matches)
    // so the shuffle carries |patterns| rows per partition, not per doc
    val partials = docs.select(col(textCol).cast("string")).as[String]
      .mapPartitions { it =>
        val a = bc.value
        val nd = Array.fill(a.patterns.length)(0L)
        val nm = Array.fill(a.patterns.length)(0L)
        it.foreach { text =>
          val c = a.countMatches(if (text == null) "" else text)
          var i = 0
          while (i < c.length) {
            if (c(i) > 0L) { nd(i) += 1L; nm(i) += c(i) }
            i += 1
          }
        }
        Iterator.range(0, a.patterns.length)
          .map(i => (a.patterns(i), nd(i), nm(i)))
      }.toDF("pat", "nd", "nm")
    partials.groupBy(col("pat"))
      .agg(sum(col("nd")).as("n_docs"), sum(col("nm")).as("n_matches"))
  }
}
