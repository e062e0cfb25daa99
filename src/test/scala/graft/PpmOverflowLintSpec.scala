package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source lint for the int64 ppm-overflow CLASS (round-12 verdict task 5):
  * integer-exact ppm arithmetic multiplies by 10⁶, and the recurring
  * hazard is the SQUARED-TERM form — `x * x ... * 1000000` (Gini
  * impurities, HHI shares, regression normal equations, permutation
  * entropy, curriculum token sums) — where the product silently exceeds
  * int64 once the aggregate `x` passes ~3·10⁶ and the truncating DIV
  * yields garbage with no error in either engine.
  *
  * Every existing site was audited by hand and carries its envelope in a
  * nearby comment (q733's ~3·10⁶-doc bound, q764's rows-per-group bound,
  * q782's kilodollar rescale, katz's α·Σ term, the q6257/q846 HHI
  * share-sum bounds, the r8 regression-slope day-count bounds). This lint
  * pins the audited site COUNT per file: a new squared-ppm site anywhere
  * in the library source fails it until the author (a) derives and
  * comments the site's int64 envelope — or restructures divide-first —
  * and (b) registers the new count here. The registry bump is the review
  * prompt; it cannot land silently unbounded.
  *
  * Scope: library + query surface (`src/main/scala/graft`), excluding
  * `tools/` (scratch stress probes, not shipped). Both the Spark
  * expression and its DuckDB oracle SQL line count — the envelope
  * protects the shared arithmetic, and `//` inside the SQL strings is
  * DuckDB integer division, not a comment.
  */
class PpmOverflowLintSpec extends AnyFunSuite {

  /** Squared term adjacent to a ppm multiply, either order. */
  private val SquaredPpm =
    """([A-Za-z_]+) \* \1.*1000000|1000000.*([A-Za-z_]+) \* \2""".r

  /** Audited squared-ppm sites per file (see scaladoc for the protocol).
    * Envelope notes from the round-13 audit: R16 ×9 = q764/q771/q782/q786
    * Gini-family prefix windows (rows-per-group ≲ 3·10⁶, commented at
    * q764) + HHI share-sums (shares sum to 10⁶ ⇒ Σ share² ≤ 10¹²);
    * R8 ×8 = regression normal equations over day-count series (n_days ≤
    * ~2.5k ⇒ n·Σx² ≪ int64) + permutation entropy (n = per-key order
    * statistics); R10 ×4 = split-Gini (same family as q764); R14/R15
    * ×3 = q733 curriculum token sums (~3·10⁶-doc bound, commented) and
    * q756 est/actual Σc² (envelope commented at the site); R11 ×1 =
    * co-occurrence cosine² (n ≤ min(di,dj), commented); SparkEntry ×8 =
    * HHI (q_total ≲ 3·10⁹ kilounits), hourly regression (n_hours ≤ 8.8k),
    * Gini complements n²−Σc² (n per group), permutation-entropy mirrors.
    */
  private val Registry: Map[String, Int] = Map(
    "R10Queries.scala" -> 4,
    "R11Queries.scala" -> 1,
    "R14Queries.scala" -> 1,
    "R15Queries.scala" -> 2,
    "R16Queries.scala" -> 9,
    // q808's Holm step-down clones q768's audited Chebyshev-bound site
    // (Spark + oracle SQL) with the envelope commented at the site —
    // the lint's first live catch (round 13)
    "R17Queries.scala" -> 2,
    "R8Queries.scala" -> 8,
    "SparkEntry.scala" -> 8
  )

  private def sourceFiles(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    kids.filter(f => f.isFile && f.getName.endsWith(".scala")) ++
      kids.filter(f => f.isDirectory && f.getName != "tools")
        .flatMap(sourceFiles)
  }

  test("every squared-term ppm multiply is a registered, envelope-audited site") {
    val root = new java.io.File("src/main/scala/graft")
    assume(root.isDirectory, "run from the repo root")
    val counts: Map[String, Int] = sourceFiles(root).map { f =>
      val lines = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").split("\n")
      val n = lines.count(l =>
        !l.trim.startsWith("//") && SquaredPpm.findFirstIn(l).isDefined)
      f.getName -> n
    }.filter(_._2 > 0).toMap
    val drift = (counts.keySet ++ Registry.keySet).toSeq.sorted.flatMap { k =>
      val (got, reg) = (counts.getOrElse(k, 0), Registry.getOrElse(k, 0))
      if (got == reg) None
      else Some(s"$k: found $got squared-ppm sites, registry says $reg")
    }
    assert(drift.isEmpty,
      "squared-term ppm sites changed — derive/comment the int64 envelope " +
        "at each new site (or restructure divide-first), then update the " +
        "registry:\n" + drift.mkString("\n"))
  }
}
