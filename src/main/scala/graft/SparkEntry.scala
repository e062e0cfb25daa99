package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Scd01, Scd2, Scd2Join}
import graft.sources.{IncrementalSource, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator from SURVEY.md §2 exercised over the
  * driver testdata; `oracleSql` carries the equivalent DuckDB SQL. Incremental
  * SCD queries exploit the package's core design guarantee — incremental run
  * == full refresh over the concatenated batches (`README.md:178`,
  * `scd_plan.sql:172-175`) — so their oracles are the (much simpler)
  * full-refresh SQL.
  */
object SparkEntry {

  /** SCD2 config used by the event-stream queries: key = user_id,
    * event time = ts; event_id never participates in change detection.
    */
  private val evCfg = ScdConfig(
    uniqueKey = Seq("user_id"),
    updatedAtCol = "ts",
    changeExclude = Seq("event_id"))

  /** Change detection restricted to event_type — exercises
    * change_columns.include resolution plus heavy redundant-version collapse.
    */
  private val evTypeCfg = evCfg.copy(changeInclude = Some(Seq("event_type")))

  // Incremental splits are deterministic row-hash halves (event_id parity /
  // thirds), NOT time prefixes: the delta batch then interleaves with the
  // target's history, exercising out-of-order re-slotting, re-expiry, and
  // redundant-version collapse at every scale factor.

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** events with a soft-delete column derived from the payload: an 'error'
    * event logically deletes the user until a later non-error event
    * resurrects it. Exercises D/I change types and born-deleted keys.
    */
  private def evDeletes(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).withColumn(
      "deleted_at",
      when(col("event_type") === "error", col("ts")))

  // ---------------------------------------------------------------------
  // Flagship: SCD2 history over lineitem (pure-parquet path, no ns quirks).
  // ---------------------------------------------------------------------
  def entry(spark: SparkSession): DataFrame =
    Scd2.initialLoad(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      ScdConfig(uniqueKey = Seq("l_orderkey", "l_linenumber"),
                updatedAtCol = "l_shipdate"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- SCD2 (SURVEY §2: S1-S4, P1-P7, J1-J4, D1/D4, W1-W7, U1) ---------
    "q01_scd2_initial" -> ((s, dir) => Scd2.initialLoad(ev(s, dir), evCfg)),
    "q02_scd2_checkcols" -> ((s, dir) => Scd2.initialLoad(ev(s, dir), evTypeCfg)),
    "q03_scd2_deletes" -> ((s, dir) =>
      Scd2.initialLoad(evDeletes(s, dir),
                       evCfg.copy(deletedAtCol = Some("deleted_at")))),
    "q04_scd2_incremental" -> ((s, dir) => {
      val all = ev(s, dir)
      val target = Scd2.initialLoad(all.filter(col("event_id") % 2 === 0), evCfg)
      Scd2.incremental(target, all.filter(col("event_id") % 2 === 1), evCfg)
    }),
    "q05_scd2_backfill" -> ((s, dir) => {
      // Out-of-order arrival: a third of the rows land AFTER the rest were
      // loaded; collapse must delete versions made redundant so the result
      // still equals a full refresh.
      val all = ev(s, dir)
      val outer = all.filter(col("event_id") % 3 =!= 1)
      val middle = all.filter(col("event_id") % 3 === 1)
      Scd2.incremental(Scd2.initialLoad(outer, evTypeCfg), middle, evTypeCfg)
    }),
    "q06_scd2_incremental_deletes" -> ((s, dir) => {
      val all = evDeletes(s, dir)
      val cfg = evCfg.copy(deletedAtCol = Some("deleted_at"))
      val target = Scd2.initialLoad(all.filter(col("event_id") % 2 === 0), cfg)
      Scd2.incremental(target, all.filter(col("event_id") % 2 === 1), cfg)
    }),
    // --- SCD1 / SCD0 (D2/D3, J5) -----------------------------------------
    "q07_scd1_initial" -> ((s, dir) =>
      Scd01.initialLoad(ev(s, dir), evCfg.copy(scdType = 1))),
    "q08_scd1_incremental" -> ((s, dir) => {
      val all = ev(s, dir)
      val cfg = evCfg.copy(scdType = 1)
      val target = Scd01.initialLoad(all.filter(col("event_id") % 2 === 0), cfg)
      Scd01.incremental(target, all.filter(col("event_id") % 2 === 1), cfg)
    }),
    "q09_scd0_initial" -> ((s, dir) =>
      Scd01.initialLoad(ev(s, dir), evCfg.copy(scdType = 0))),
    "q10_scd0_incremental" -> ((s, dir) => {
      val all = ev(s, dir)
      val cfg = evCfg.copy(scdType = 0)
      val target = Scd01.initialLoad(all.filter(col("event_id") % 2 === 0), cfg)
      Scd01.incremental(target, all.filter(col("event_id") % 2 === 1), cfg)
    }),
    // --- Temporal as-of join (J6, U2, P4, W3-W5) --------------------------
    "q11_scd2_join" -> ((s, dir) => {
      val dimType = Scd2
        .initialLoad(ev(s, dir), evTypeCfg)
        .select("user_id", "event_type", "_is_current", "_valid_from", "_valid_to")
      val dimValue = Scd2
        .initialLoad(ev(s, dir), evCfg.copy(changeInclude = Some(Seq("value"))))
        .select("user_id", "value", "_is_current", "_valid_from", "_valid_to")
      Scd2Join(Seq("a" -> dimType, "b" -> dimValue), Seq("user_id"))
    }),
    // --- Incremental source scan (S5, A1) ---------------------------------
    "q12_incremental_source" -> ((s, dir) => {
      // Watermark split at 60% of the event-time span (integer microsecond
      // arithmetic so DuckDB computes the identical cutoff).
      val all = ev(s, dir)
      val row = all
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .head()
      val (lo, hi) = (row.getLong(0), row.getLong(1))
      val wm = lo + (hi - lo) * 3 / 5
      val target = all
        .filter(unix_micros(col("ts")) <= wm)
        .withColumn("_loaded_at", col("ts"))
      IncrementalSource.scan(all, Some(target), loadedAtCol = "ts")
    })
  )

  // Shared DuckDB fragments. `ts` is TIMESTAMP_NS in DuckDB; CAST floors to
  // microseconds exactly like the Spark-side `timestamp_micros(ts div 1000)`.
  private val SrcCte =
    "src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"
  private val SrcDelCte =
    "src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props, " +
      "CASE WHEN event_type = 'error' THEN CAST(ts AS TIMESTAMP) END AS deleted_at FROM events)"

  /** Full-refresh SCD2 over `src`, DuckDB-side. Mirrors
    * get_initial_load_scd2_sql.sql with the same md5 surrogate hashing so the
    * kept-row set matches exactly.
    */
  private def scd2FullSql(checkCols: Seq[String],
                          deletes: Boolean,
                          from: String = "src"): String = {
    val hash = "md5(concat_ws('-', " +
      checkCols.map(c => s"coalesce(CAST($c AS VARCHAR), '')").mkString(", ") + "))"
    val delCol = if (deletes) ", deleted_at" else ""
    val validFrom =
      if (deletes)
        """CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          | THEN coalesce(deleted_at, ts) ELSE ts END""".stripMargin
      else "ts"
    val changeType =
      if (deletes)
        """CASE WHEN deleted_at IS NOT NULL THEN 'D'
          | WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts) = 1 THEN 'I'
          | WHEN lag(deleted_at) OVER (PARTITION BY user_id ORDER BY ts) IS NOT NULL THEN 'I'
          | ELSE 'U' END""".stripMargin
      else
        "CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts) = 1 THEN 'I' ELSE 'U' END"
    s"""hashed AS (
       |  SELECT *, $hash AS _h FROM $from
       |), dedup AS (
       |  SELECT * FROM hashed
       |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY _h) = 1
       |), changes_only AS (
       |  SELECT * FROM (
       |    SELECT *, lag(_h) OVER (PARTITION BY user_id ORDER BY ts) AS _ph FROM dedup
       |  ) WHERE _ph IS NULL OR _h <> _ph
       |)
       |SELECT event_id, ts, user_id, event_type, value, props$delCol,
       |  (row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1) AS _is_current,
       |  $validFrom AS _valid_from,
       |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
       |           TIMESTAMP '2999-12-31 23:59:59') AS _valid_to,
       |  $changeType AS _change_type
       |FROM changes_only""".stripMargin
  }

  private val AllCheck = Seq("event_type", "value", "props")

  /** Two-phase SCD2 simulation, DuckDB-side: initial load over `targetWhere`
    * rows, then an incremental run with the `deltaWhere` rows.
    *
    * NOT simply a full refresh over everything: the initial load already
    * discarded rows whose content matched their (then-)predecessor, and a
    * discarded version can never be resurrected by a later batch — the
    * reference behaves identically (only persisted history + the new batch
    * feed the merge). So the oracle is: changes-only filter over the target
    * half, union the delta, conditional-change-event run collapse (earliest
    * updated_at wins; no loaded_at here), audit columns over the canonical
    * timeline.
    */
  private def scd2TwoPhaseSql(checkCols: Seq[String],
                              deletes: Boolean,
                              targetWhere: String,
                              deltaWhere: String): String = {
    val hash = "md5(concat_ws('-', " +
      checkCols.map(c => s"coalesce(CAST($c AS VARCHAR), '')").mkString(", ") + "))"
    val delCol = if (deletes) ", deleted_at" else ""
    val validFrom =
      if (deletes)
        """CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          | THEN coalesce(deleted_at, ts) ELSE ts END""".stripMargin
      else "ts"
    val changeType =
      if (deletes)
        """CASE WHEN deleted_at IS NOT NULL THEN 'D'
          | WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts) = 1 THEN 'I'
          | WHEN lag(deleted_at) OVER (PARTITION BY user_id ORDER BY ts) IS NOT NULL THEN 'I'
          | ELSE 'U' END""".stripMargin
      else
        "CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts) = 1 THEN 'I' ELSE 'U' END"
    s"""h0 AS (SELECT *, $hash AS _h FROM src WHERE $targetWhere),
       |kept0 AS (
       |  SELECT * EXCLUDE (_ph) FROM (
       |    SELECT *, lag(_h) OVER (PARTITION BY user_id ORDER BY ts) AS _ph FROM h0
       |  ) WHERE _ph IS NULL OR _h <> _ph
       |),
       |d1 AS (SELECT *, $hash AS _h FROM src WHERE $deltaWhere),
       |u AS (SELECT * FROM kept0 UNION ALL SELECT * FROM d1),
       |chg AS (
       |  SELECT *, CASE WHEN lag(_h) OVER w IS NULL THEN 0
       |                 WHEN _h <> lag(_h) OVER w THEN 1 ELSE 0 END AS _c
       |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |),
       |runs AS (
       |  SELECT *, sum(_c) OVER (PARTITION BY user_id ORDER BY ts
       |                          ROWS UNBOUNDED PRECEDING) AS _run
       |  FROM chg
       |),
       |collapsed AS (
       |  SELECT * FROM runs
       |  QUALIFY row_number() OVER (PARTITION BY user_id, _run ORDER BY ts) = 1
       |)
       |SELECT event_id, ts, user_id, event_type, value, props$delCol,
       |  (row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1) AS _is_current,
       |  $validFrom AS _valid_from,
       |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
       |           TIMESTAMP '2999-12-31 23:59:59') AS _valid_to,
       |  $changeType AS _change_type
       |FROM collapsed""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q01_scd2_initial" ->
      s"WITH $SrcCte, ${scd2FullSql(AllCheck, deletes = false)}",
    "q02_scd2_checkcols" ->
      s"WITH $SrcCte, ${scd2FullSql(Seq("event_type"), deletes = false)}",
    "q03_scd2_deletes" ->
      s"WITH $SrcDelCte, ${scd2FullSql(AllCheck, deletes = true)}",
    "q04_scd2_incremental" ->
      s"WITH $SrcCte, ${scd2TwoPhaseSql(AllCheck, deletes = false, "event_id % 2 = 0", "event_id % 2 = 1")}",
    "q05_scd2_backfill" ->
      s"WITH $SrcCte, ${scd2TwoPhaseSql(Seq("event_type"), deletes = false, "event_id % 3 <> 1", "event_id % 3 = 1")}",
    "q06_scd2_incremental_deletes" ->
      s"WITH $SrcDelCte, ${scd2TwoPhaseSql(AllCheck, deletes = true, "event_id % 2 = 0", "event_id % 2 = 1")}",
    "q07_scd1_initial" ->
      s"""WITH $SrcCte
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  true AS _is_current, ts AS _valid_from,
         |  TIMESTAMP '2999-12-31 23:59:59' AS _valid_to, 'I' AS _change_type
         |FROM src QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1""".stripMargin,
    "q08_scd1_incremental" ->
      s"""WITH $SrcCte,
         |t AS (SELECT * FROM src WHERE event_id % 2 = 0
         |      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1),
         |d AS (SELECT * FROM src WHERE event_id % 2 = 1
         |      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1)
         |SELECT
         |  coalesce(t.user_id, d.user_id) AS user_id,
         |  CASE WHEN d.user_id IS NOT NULL THEN d.event_id ELSE t.event_id END AS event_id,
         |  CASE WHEN d.user_id IS NOT NULL THEN d.ts ELSE t.ts END AS ts,
         |  CASE WHEN d.user_id IS NOT NULL THEN d.event_type ELSE t.event_type END AS event_type,
         |  CASE WHEN d.user_id IS NOT NULL THEN d.value ELSE t.value END AS value,
         |  CASE WHEN d.user_id IS NOT NULL THEN d.props ELSE t.props END AS props,
         |  true AS _is_current,
         |  CASE WHEN t.user_id IS NOT NULL THEN t.ts ELSE d.ts END AS _valid_from,
         |  TIMESTAMP '2999-12-31 23:59:59' AS _valid_to, 'I' AS _change_type
         |FROM t FULL JOIN d ON t.user_id = d.user_id""".stripMargin,
    "q09_scd0_initial" ->
      s"""WITH $SrcCte
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  true AS _is_current, ts AS _valid_from,
         |  TIMESTAMP '2999-12-31 23:59:59' AS _valid_to, 'I' AS _change_type
         |FROM src QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts ASC) = 1""".stripMargin,
    // scd0 target-wins: keys already in the target keep their original row
    "q10_scd0_incremental" ->
      s"""WITH $SrcCte,
         |t AS (SELECT * FROM src WHERE event_id % 2 = 0
         |      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts ASC) = 1),
         |d AS (SELECT * FROM src WHERE event_id % 2 = 1
         |      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts ASC) = 1)
         |SELECT
         |  coalesce(t.user_id, d.user_id) AS user_id,
         |  CASE WHEN t.user_id IS NOT NULL THEN t.event_id ELSE d.event_id END AS event_id,
         |  CASE WHEN t.user_id IS NOT NULL THEN t.ts ELSE d.ts END AS ts,
         |  CASE WHEN t.user_id IS NOT NULL THEN t.event_type ELSE d.event_type END AS event_type,
         |  CASE WHEN t.user_id IS NOT NULL THEN t.value ELSE d.value END AS value,
         |  CASE WHEN t.user_id IS NOT NULL THEN t.props ELSE d.props END AS props,
         |  true AS _is_current,
         |  CASE WHEN t.user_id IS NOT NULL THEN t.ts ELSE d.ts END AS _valid_from,
         |  TIMESTAMP '2999-12-31 23:59:59' AS _valid_to, 'I' AS _change_type
         |FROM t FULL JOIN d ON t.user_id = d.user_id""".stripMargin,
    "q11_scd2_join" ->
      s"""WITH $SrcCte,
         |dim_a AS (
         |  WITH ${scd2JoinDimSql("event_type")}
         |),
         |dim_b AS (
         |  WITH ${scd2JoinDimSql("value")}
         |),
         |pts AS (
         |  SELECT user_id, _valid_from AS _updated_at FROM dim_a
         |  UNION
         |  SELECT user_id, _valid_from AS _updated_at FROM dim_b
         |),
         |spine AS (
         |  SELECT user_id,
         |    (row_number() OVER (PARTITION BY user_id ORDER BY _updated_at DESC) = 1) AS _is_current,
         |    _updated_at AS _valid_from,
         |    coalesce(lead(_updated_at) OVER (PARTITION BY user_id ORDER BY _updated_at),
         |             TIMESTAMP '2999-12-31 23:59:59') AS _valid_to
         |  FROM pts
         |)
         |SELECT spine.user_id, a.event_type AS a_event_type, b.value AS b_value,
         |       spine._is_current, spine._valid_from, spine._valid_to
         |FROM spine
         |LEFT JOIN dim_a a ON spine.user_id = a.user_id
         |  AND spine._valid_from >= a._valid_from AND spine._valid_to <= a._valid_to
         |LEFT JOIN dim_b b ON spine.user_id = b.user_id
         |  AND spine._valid_from >= b._valid_from AND spine._valid_to <= b._valid_to
         |WHERE spine._valid_from < spine._valid_to""".stripMargin,
    "q12_incremental_source" ->
      s"""WITH $SrcCte,
         |b AS (SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM src),
         |cut AS (SELECT make_timestamp(lo + (hi - lo) * 3 // 5) AS wm FROM b)
         |SELECT * FROM src
         |WHERE (SELECT coalesce(max(ts), TIMESTAMP '1900-01-01 00:00:00')
         |       FROM src WHERE ts <= (SELECT wm FROM cut)) < ts""".stripMargin
  )

  /** One scd2_join input dimension, DuckDB-side: full-refresh SCD2 with change
    * detection on a single column, projected to (key, payload, audit).
    */
  private def scd2JoinDimSql(checkCol: String): String =
    scd2FullSql(Seq(checkCol), deletes = false)
      .replace(
        "SELECT event_id, ts, user_id, event_type, value, props,",
        s"SELECT user_id, $checkCol,")
}
