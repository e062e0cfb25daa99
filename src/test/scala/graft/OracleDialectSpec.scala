package graft

/** Executable oracle-dialect constraints — the cross-engine folklore that
  * cost gate debugging time, pinned so a future oracle author cannot
  * silently reintroduce it (round-9 verdict ask).
  */
class OracleDialectSpec extends SparkTestBase {

  // Scalar-accumulator folds that were validated against an independent
  // simulation and have held across rounds of the hash gate. ONLY scalar
  // accumulators may ever be added here — a multi-field struct accumulator
  // is the miscompiling shape regardless of validation at one data point.
  private val ValidatedScalarListReduce = Set(
    "q324_ema_forecast",
    // round-10: single-VARCHAR state (prev-code ‖ digits), python-validated
    // against the classic Soundex table
    "q697_soundex_blocking",
    // round-10: single-BIGINT state (mask1·2²⁰ + mask2 packed — the packing
    // exists precisely to keep the accumulator scalar), python-validated
    // against the classic Jaro-Winkler vectors (MARTHA/MARHTA 961110 ppm)
    "q711_jaro_winkler",
    // round-11: the SAME validated packed-BIGINT JW fold (jwFoldSql is
    // shared verbatim with q711), applied through the dual-verifier gate
    "q714_dual_verifier_linkage")

  test("list_reduce in oracles is restricted to validated SCALAR folds (DuckDB miscompiles struct lambdas)") {
    // PERF.md, round-9: a list_reduce fold over a multi-field struct
    // lambda (the hilbert x/y/d state) produced WRONG values in the
    // oracle engine — caught only because q650's token bucket had an
    // independent simulation (115 vs the true 144). Single-value
    // accumulators compile correctly; multi-field state must use a
    // per-key RECURSIVE CTE fold instead (`st(key, i, ...) ... JOIN rk
    // ON i = s.i + 1`, the q650/q664 pattern), validated once against
    // an independent simulation. Adding a list_reduce oracle therefore
    // requires BOTH a scalar accumulator and a conscious entry in the
    // whitelist above.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql)
        if sql.toLowerCase.contains("list_reduce") &&
           !ValidatedScalarListReduce.contains(name) => name
    }
    assert(offenders.isEmpty,
      s"oracles using list_reduce outside the validated-scalar whitelist " +
        s"(struct lambdas miscompile; use a per-key RECURSIVE CTE fold): " +
        s"${offenders.toSeq.sorted}")
  }

  test("no oracle names a CTE 'both' (reserved in the oracle engine's TRIM syntax)") {
    val cteNamedBoth = "(?i)\\bboth\\s+as\\s*\\(".r
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if cteNamedBoth.findFirstIn(sql).isDefined => name
    }
    assert(offenders.isEmpty,
      s"oracles with a CTE named 'both': ${offenders.toSeq.sorted}")
  }
}
