package graft.plans

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Fingerprint-keyed query result cache: a result set is stored under the
  * md5 of its CANONICALIZED optimized logical plan PLUS a content token
  * over the plan's input files, so any later query with the same semantics
  * — however its DataFrame was built, whatever exprIds it carries — reads
  * the materialized parquet instead of recomputing. The warehouse
  * result-cache primitive (Snowflake's query result reuse) on plain files;
  * correctness rests on Catalyst's plan canonicalization (which normalizes
  * attribute ids and child order for commutative nodes) and on the content
  * token (file names + lengths + modification times): a source REWRITTEN
  * IN PLACE changes its files' mtimes/sizes, so the stale entry simply
  * stops being addressed — no writer-side invalidation protocol needed.
  */
object ResultCache {

  def fingerprint(df: DataFrame): String = {
    val canonical = df.queryExecution.optimizedPlan.canonicalized.toString
    // Content token: the plan's leaf input files with length + mtime.
    // Bounded: file paths are sorted and capped so a million-file table
    // costs 1000 stats, with the total count + total length covering the
    // rest (a rewrite that changes NO file count, NO capped-file stat and
    // NO total byte length is not distinguishable — acceptable for a
    // cache whose alternative was ignoring content entirely).
    val files = df.inputFiles.sorted
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val stats = files.take(1000).map { p =>
      try {
        val path = new Path(p)
        val st = path.getFileSystem(conf).getFileStatus(path)
        s"$p:${st.getLen}:${st.getModificationTime}"
      } catch { case _: java.io.IOException => p }
    }
    val token =
      s"n=${files.length}\n${stats.mkString("\n")}"
    java.security.MessageDigest.getInstance("MD5")
      .digest((canonical + "\n" + token).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Run `df` through the cache at `cacheDir`: on miss, materialize to
    * `<cacheDir>/<fingerprint>`; on hit, skip computation entirely.
    * Returns the result (always read back from the cache files, so hit
    * and miss return byte-identical relations) and whether it was a hit.
    *
    * Publication is write-temp-then-rename: concurrent first computations
    * of the same fingerprint each write their own temp dir and the rename
    * decides the winner — the loser deletes its copy and reads the
    * winner's (both computed the same relation, so either copy is
    * correct); readers can never observe a half-written entry because the
    * final path appears atomically.
    */
  def through(df: DataFrame, cacheDir: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val path = s"$cacheDir/${fingerprint(df)}"
    val fs = FileSystem.get(new URI(cacheDir),
                            spark.sparkContext.hadoopConfiguration)
    val hit = fs.exists(new Path(s"$path/_SUCCESS"))
    if (!hit) {
      val tmp = s"$path.tmp-${java.util.UUID.randomUUID().toString}"
      df.write.mode("overwrite").parquet(tmp)
      if (fs.exists(new Path(path)) || !fs.rename(new Path(tmp), new Path(path)))
        fs.delete(new Path(tmp), true) // lost the publish race: use winner's
    }
    (spark.read.parquet(path), hit)
  }
}
