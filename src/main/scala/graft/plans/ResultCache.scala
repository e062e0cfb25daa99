package graft.plans

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Fingerprint-keyed query result cache: a result set is stored under the
  * md5 of its CANONICALIZED optimized logical plan, so any later query
  * with the same semantics — however its DataFrame was built, whatever
  * exprIds it carries — reads the materialized parquet instead of
  * recomputing. The warehouse result-cache primitive (Snowflake's query
  * result reuse) on plain files; correctness rests on Catalyst's plan
  * canonicalization, which normalizes attribute ids and child order for
  * commutative nodes.
  *
  * Scope: the cache key covers the full plan including source paths, so a
  * REWRITTEN source (same path, new data) must be invalidated by the
  * writer dropping the cache dir — same contract as any path-keyed cache.
  */
object ResultCache {

  def fingerprint(df: DataFrame): String = {
    val canonical = df.queryExecution.optimizedPlan.canonicalized.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Run `df` through the cache at `cacheDir`: on miss, materialize to
    * `<cacheDir>/<fingerprint>`; on hit, skip computation entirely.
    * Returns the result (always read back from the cache files, so hit
    * and miss return byte-identical relations) and whether it was a hit.
    */
  def through(df: DataFrame, cacheDir: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val path = s"$cacheDir/${fingerprint(df)}"
    val fs = FileSystem.get(new URI(cacheDir),
                            spark.sparkContext.hadoopConfiguration)
    val hit = fs.exists(new Path(s"$path/_SUCCESS"))
    if (!hit) df.write.mode("overwrite").parquet(path)
    (spark.read.parquet(path), hit)
  }
}
