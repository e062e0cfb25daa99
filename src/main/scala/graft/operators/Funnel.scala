package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how many users reach each stage IN ORDER (a
  * later-stage event counts only at-or-after the user's earliest qualifying
  * previous stage).
  *
  * Per stage i, `_st_i` = min timestamp of a stage-i event at-or-after
  * `_st_{i-1}` — chained whole-partition window minima over the SAME
  * partition spec, so Catalyst stacks the Window nodes on one exchange; the
  * per-user reduction and the final one-row rollup reuse that distribution.
  * Timestamps are selected, never computed — engine-exact.
  */
object Funnel {

  /** One row: n_users plus n_<stage> user counts for each funnel stage. */
  def stages(df: DataFrame,
             userCol: String,
             tsCol: String,
             typeCol: String,
             stageTypes: Seq[String]): DataFrame = {
    require(stageTypes.nonEmpty, "need at least one funnel stage")
    val w = Window.partitionBy(col(userCol))
    val staged = stageTypes.zipWithIndex.foldLeft(df) { case (d, (st, i)) =>
      val inOrder =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(tsCol) >= col(s"_st_${i - 1}")
      d.withColumn(s"_st_$i", min(when(inOrder, col(tsCol))).over(w))
    }
    val reachedAggs: Seq[Column] = stageTypes.indices.map(i =>
      max(col(s"_st_$i").isNotNull).as(s"_h$i"))
    val perUser = staged.groupBy(col(userCol))
      .agg(reachedAggs.head, reachedAggs.tail: _*)
    val counts: Seq[Column] = count(lit(1)).as("n_users") +:
      stageTypes.zipWithIndex.map { case (st, i) =>
        sum(col(s"_h$i").cast("long")).as(s"n_$st")
      }
    perUser.agg(counts.head, counts.tail: _*)
  }

  /** Last-touch attribution: for every conversion event, the nearest
    * PRECEDING non-conversion event type is its channel; returns conversions
    * per channel ("direct" when nothing precedes). One exchange + sort on
    * (user, ts, id) — the running last-non-null rides a ROWS frame ending at
    * the previous row, and the id tiebreak makes same-instant ordering (and
    * therefore attribution) deterministic.
    */
  def lastTouchAttribution(df: DataFrame,
                           userCol: String,
                           tsCol: String,
                           idCol: String,
                           typeCol: String,
                           conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(
        "channel",
        coalesce(last(when(col(typeCol) =!= conversionType, col(typeCol)),
                      ignoreNulls = true).over(w),
                 lit("direct")))
      .filter(col(typeCol) === conversionType)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Position-based (U-shaped 40/20/40) multi-touch attribution: each
    * conversion's credit of 1,000,000 ppm splits 40% to the first touch,
    * 40% to the last, and 20% across the middles — integer-exactly, with
    * the `200000 DIV m` base and the remainder going to the EARLIEST
    * middles (largest-remainder rule, deterministic in any engine). One
    * touch takes all; two touches split 50/50; no touches credit
    * `direct`. Touches bind to their NEXT conversion (path = touches
    * since the previous conversion), so Σcredit = 1M · conversions holds
    * as an invariant the oracle can assert.
    *
    * Same single per-user exchange as [[lastTouchAttribution]]: the
    * conversion-group id and the position indexes all ride (user) and
    * (user, group) windows.
    */
  def positionAttribution(df: DataFrame,
                          userCol: String,
                          tsCol: String,
                          idCol: String,
                          typeCol: String,
                          conversionType: String): DataFrame = {
    val isConv = (col(typeCol) === conversionType).cast("long")
    val wU = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val grouped = df
      .withColumn("_g", coalesce(sum(isConv).over(
        wU.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wG = Window.partitionBy(col(userCol), col("_g"))
      .orderBy(col(tsCol), col(idCol))
    val touches = grouped.filter(col(typeCol) =!= conversionType)
      .withColumn("_rn", row_number().over(wG))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col(userCol), col("_g"))))
    // keep only touch groups that actually end in a conversion (touches
    // after a user's last conversion earn nothing)
    val convGroups = grouped.filter(col(typeCol) === conversionType)
      .select(col(userCol), col("_g")).distinct()
    val credited = touches
      .join(convGroups, Seq(userCol, "_g"), "left_semi")
      .withColumn("_m", col("_n") - 2)
      .withColumn("credit_ppm",
        when(col("_n") === 1, lit(1000000L))
          .when(col("_n") === 2, lit(500000L))
          .when(col("_rn") === 1 || col("_rn") === col("_n"), lit(400000L))
          .otherwise(expr("200000L DIV _m") +
                       when(col("_rn") - 1 <= expr("200000L % _m"), 1L)
                         .otherwise(0L)))
    val direct = grouped.filter(col(typeCol) === conversionType)
      .join(touches.select(col(userCol), col("_g")).distinct(),
            Seq(userCol, "_g"), "left_anti")
      .select(lit("direct").as("channel"), lit(1000000L).as("credit_ppm"))
    credited
      .select(col(typeCol).as("channel"), col("credit_ppm"))
      .unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
           sum(col("credit_ppm")).as("credit_ppm"))
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * `cohortType` event, counted as active in each later week they produced
    * ANY event. Week buckets are Monday-aligned `date_trunc` (identical
    * across engines); offsets are integer day-diffs DIV 7 — no float math.
    *
    * Two aggregates (cohort assignment; distinct user-weeks) joined on the
    * user key, then a vocabulary-sized (cohort, offset) count — the cohort
    * side is user-cardinality, broadcastable in most corpora, and the
    * distinct-activity aggregate is the only full-data shuffle.
    */
  /** Time-to-convert: one summary row for the `fromType → toType` funnel
    * edge — users entering, users converting (first `toType` at/after their
    * first `fromType`), and EXACT p50/p90 seconds-to-convert via the X44
    * rank selection. All integer seconds.
    *
    * The quantile pass sorts the CONVERTED-USER relation in one global
    * window — user-count-sized, fine to ~10^8; per-cohort grouping (the
    * [[cohortRetention]] keys) is the documented shard path beyond that.
    */
  def timeToConvert(df: DataFrame,
                    userCol: String,
                    tsCol: String,
                    typeCol: String,
                    fromType: String,
                    toType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val staged = df
      .withColumn("_t0", min(when(col(typeCol) === fromType, col(tsCol))).over(w))
      .withColumn("_t1",
                  min(when(col(typeCol) === toType && col(tsCol) >= col("_t0"),
                           col(tsCol))).over(w))
    val perUser = staged.groupBy(col(userCol))
      .agg(max(col("_t0")).as("_t0"), max(col("_t1")).as("_t1"))
      .filter(col("_t0").isNotNull)
    val conv = perUser.filter(col("_t1").isNotNull)
      .withColumn("delta_sec",
                  expr("(unix_micros(_t1) - unix_micros(_t0)) DIV 1000000"))
    val counts = perUser.agg(
      count(lit(1)).as("n_from"),
      sum(when(col("_t1").isNotNull, 1L).otherwise(0L)).as("n_converted"))
    val qs = Profile.discreteQuantiles(
        // DimKey.one, not lit(1): a foldable constant gets stripped from
        // the quantile window's partition spec by EliminateWindowPartitions
        conv.withColumn("_g", graft.functions.DimKey.one),
        "_g", "delta_sec", Seq(50, 90))
      .groupBy("_g").pivot("q", Seq(50, 90)).agg(first(col("q_value")))
      .withColumnRenamed("50", "p50_sec")
      .withColumnRenamed("90", "p90_sec")
      .drop("_g")
    // LEFT join on TRUE: when no user converts the quantile relation is
    // EMPTY, and a plain cross join would drop the summary row — the
    // zero-conversion funnel must still report (n_from, n_converted=0,
    // null p50/p90).
    counts.join(qs, lit(true), "left")
  }

  def cohortRetention(df: DataFrame,
                      userCol: String,
                      tsCol: String,
                      typeCol: String,
                      cohortType: String): DataFrame = {
    val cohorts = df.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(date_trunc("week", col(tsCol))).as("cohort_week"))
    val activity = df
      .select(col(userCol), date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    activity.join(cohorts, Seq(userCol))
      // filter BEFORE the division: on negative diffs Spark's DIV truncates
      // toward zero while SQL's // floors — non-negative inputs agree
      .filter(col("week") >= col("cohort_week"))
      .withColumn("week_offset", expr("datediff(week, cohort_week) DIV 7"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Event-transition (first-order Markov) counts: how often `prev_type`
    * is immediately followed by `event_type` within a user's timeline.
    * Deterministic under same-instant events via the (ts, id) tiebreak —
    * the ordering contract every window in the engine uses. One exchange on
    * the user key for the lag, then a vocabulary-squared-sized count.
    */
  /** Top-k behavioral motifs: the most frequent length-`n` consecutive
    * event-type sequences across all keys — the n-gram generalization of
    * [[transitions]] (bigrams) that surfaces multi-step habits ("view >
    * view > purchase"). One (key)-exchange window builds each row's
    * forward n-gram via `lead` (no self-joins, no explode of sequences);
    * the count is combine-enabled and the top-k plans as TakeOrdered —
    * at 100 TB: one shuffle on the key, one on the (vocabulary-sized)
    * motif space.
    */
  def motifs(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
             typeCol: String, n: Int, topK: Int): DataFrame = {
    require(n >= 2, "motif length >= 2")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val stepNames = (0 until n).map(i => s"_s$i")
    val withSteps = (0 until n).foldLeft(df) {
      case (acc, 0) => acc.withColumn("_s0", col(typeCol))
      case (acc, i) => acc.withColumn(s"_s$i", lead(col(typeCol), i).over(w))
    }
    val steps = stepNames.map(col)
    withSteps
      .filter(steps.map(_.isNotNull).reduce(_ && _))
      .groupBy(concat_ws(">", steps: _*).as("motif"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("motif").asc)
      .limit(topK)
  }

  def transitions(df: DataFrame,
                  userCol: String,
                  tsCol: String,
                  idCol: String,
                  typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol))
      .agg(count(lit(1)).as("n"))
  }

  /** Path analysis: each user's first `maxLen` event types as one ordered
    * `a>b>c` string, counted across users — the navigation-pattern rollup.
    * `collect_list` order is partition-dependent, so the struct array is
    * sorted on (ts, id) AFTER collection — the engine's deterministic
    * same-instant order. One exchange on the user key; the path count runs
    * over the user-cardinality relation.
    */
  def paths(df: DataFrame,
            userCol: String,
            tsCol: String,
            idCol: String,
            typeCol: String,
            maxLen: Int = 8): DataFrame =
    df.groupBy(col(userCol))
      .agg(array_join(
        transform(
          slice(array_sort(collect_list(struct(col(tsCol).as("t"),
                                               col(idCol).as("i"),
                                               col(typeCol).as("y")))),
                1, maxLen),
          x => x.getField("y")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))

  /** Process-conformance report: how far each user's event trace strays
    * from the corpus's MODAL trace, as a distance histogram. Trace = the
    * ordered first-`maxLen` event types joined by '>' (same construction
    * as [[paths]]); the modal trace is the deterministic argmax of the
    * path rollup (count desc, trace asc via struct-min — an AGGREGATE,
    * never a global window); deviation is character-level `levenshtein`
    * against the broadcast modal — one narrow pass over user-grain rows.
    * The process-mining primitive ("which journeys deviate, and by how
    * much") with an engine-exact answer.
    *
    * Output: (modal_trace, dist, n_users).
    */
  def conformance(df: DataFrame,
                  userCol: String,
                  tsCol: String,
                  idCol: String,
                  typeCol: String,
                  maxLen: Int = 6): DataFrame = {
    val traces = df.groupBy(col(userCol))
      .agg(array_join(
        transform(
          slice(array_sort(collect_list(struct(col(tsCol).as("t"),
                                               col(idCol).as("i"),
                                               col(typeCol).as("y")))),
                1, maxLen),
          x => x.getField("y")), ">").as("trace"))
    val modal = traces.groupBy(col("trace"))
      .agg(count(lit(1)).as("_n"))
      .agg(min(struct((-col("_n")).as("_neg"), col("trace").as("_t")))
             .getField("_t").as("modal_trace"))
    traces.crossJoin(broadcast(modal))
      .select(col("modal_trace"),
              levenshtein(col("trace"), col("modal_trace")).as("dist"))
      .groupBy(col("modal_trace"), col("dist"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Bounded-horizon Markov absorption: for each event-type state, the
    * probability (integer ppm) of reaching `absorb` within `horizon`
    * transitions under the empirical per-user transition matrix — the
    * Markov-chain attribution number ("how close is each state to
    * conversion") without the matrix inversion the unbounded version
    * needs. One corpus pass builds the transition counts (lead window per
    * user); everything after is state-count-sized vector algebra, `p` and
    * `a` joined and combined per step with pinned `DIV 1e6` rescaling so
    * any engine reproduces the ppm exactly. The absorbing state is pinned
    * to 1e6 each step; states with no outgoing edges absorb nothing.
    */
  def markovAbsorption(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String,
                       absorb: String, horizon: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val nx = events
      .withColumn("_b", lead(col(typeCol), 1).over(w))
      .filter(col("_b").isNotNull)
      .select(col(typeCol).as("_a"), col("_b"))
    val c = nx.groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_n"))
    val tot = c.groupBy(col("_a")).agg(sum(col("_n")).as("_t"))
    val ck = new graft.operators.Seal.Tracker
    val p = ck.track(c.join(tot, Seq("_a"))
      .select(col("_a"), col("_b"), expr("_n * 1000000L DIV _t").as("_p"))
      .localCheckpoint(false))
    val states = ck.track(p.select(col("_a").as("state"))
      .union(p.select(col("_b").as("state"))).distinct()
      .localCheckpoint(false))
    var av = states.withColumn("absorb_ppm",
      when(col("state") === absorb, lit(1000000L)).otherwise(lit(0L)))
    for (_ <- 1 to horizon) {
      val contrib = p
        .join(av.withColumnRenamed("state", "_b"), Seq("_b"))
        .groupBy(col("_a").as("state"))
        .agg(expr("sum(_p * absorb_ppm) DIV 1000000L").as("_c"))
      av = ck.track(states.join(contrib, Seq("state"), "left")
        .select(col("state"),
                when(col("state") === absorb, lit(1000000L))
                  .otherwise(coalesce(col("_c"), lit(0L))).as("absorb_ppm"))
        .localCheckpoint(false))
    }
    ck.seal(av)
  }
}
