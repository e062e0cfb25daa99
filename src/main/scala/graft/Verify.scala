package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, only @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Write micros, not nanos: the driver reads our parquet with pandas,
      // where timestamp[ns] overflows at year 2262 — the SCD high-watermark
      // 2999-12-31 sentinel silently wraps to 1830 and fails the hash gate.
      // datetime64[us] matches DuckDB's fetchdf dtype exactly.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // The driver reads our parquet with pandas and the oracle via DuckDB
    // fetchdf, then compares astype(str). Instant timestamps come back
    // tz-aware (+00:00 suffix) and DATE comes back date-only — both
    // stringify differently from DuckDB's naive datetime64[us]. Casting to
    // TIMESTAMP_NTZ (session tz = UTC, so values are unchanged) makes the
    // pandas dtype on both sides identical, so the strings must match.
    def normalize(df: DataFrame): DataFrame =
      df.select(df.schema.fields.map { f =>
        f.dataType match {
          case TimestampType | DateType =>
            col(f.name).cast(TimestampNTZType).as(f.name)
          case _ => col(f.name)
        }
      }.toSeq: _*)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    var failed = List.empty[String]
    selected.foreach { case (name, fn) =>
      try normalize(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Release accumulated localCheckpoint RDDs (see Bench.scala).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // Round-5 lesson: a testdata encoding change made EVERY events query
    // fail analysis, the per-query catch swallowed it, and the round's
    // correctness silently shrank from 197 to 105 entries. Make partial
    // dumps impossible to miss with a loud summary on stdout (the
    // driver's captured stream). Exit code stays 0 — the dump that DID
    // complete is still valid input for the oracle compare.
    println(s"[verify] dumped ${selected.size - failed.size}/" +
      s"${selected.size} queries" +
      (if (failed.nonEmpty) s"; FAILED: ${failed.sorted.mkString(",")}"
       else ""))
    if (failed.nonEmpty) System.err.println(
      s"[verify] ${failed.size} queries FAILED — correctness dump is partial")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
