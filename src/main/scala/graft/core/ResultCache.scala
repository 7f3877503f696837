package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-keyed QUERY RESULT CACHE — the Snowflake/Databricks result
  * cache recipe for a polling read workload (the reference UI re-runs
  * identical dashboard/log queries every 2 s,
  * `apps/web/src/components/RunMonitor.tsx:48`; recomputing a 100 TB
  * aggregate for every poll is the wrong plan when nothing changed).
  *
  * Key = the query's CANONICALIZED logical-plan hash (expression ids
  * normalized, so textually different but semantically identical
  * DataFrames share an entry) × the current version of every enlisted
  * [[TxTable]]. Any commit to any enlisted table changes the key, so
  * a stale entry is never SERVED — it is simply orphaned and swept by
  * [[prune]]. Results land as parquet via stage-and-atomic-rename;
  * a concurrent filler that loses the rename race just reads the
  * winner's entry.
  *
  * Correct use requires `tables` to cover every mutable source the
  * plan reads (the cache cannot see through arbitrary sources); reads
  * of non-enlisted, immutable inputs (e.g. the static testdata
  * parquet) are fine because their bytes never change.
  */
final class ResultCache(spark: SparkSession, cacheDir: String) {

  private def fs =
    new Path(cacheDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def keyOf(df: DataFrame, tables: Seq[TxTable]): String = {
    // structural plan identity: canonicalized tree TEXT (expression
    // ids normalized — plan object hashCodes are identity-based in
    // the file-relation leaves and would never repeat) + the output
    // schema + every scanned root path (the canonical text elides
    // file locations, and two same-shaped reads of different sources
    // must not collide)
    val plan = df.queryExecution.analyzed
    // maxFields = MaxValue: the default treeString elides expression
    // lists past spark.sql.debug.maxToStringFields (25) — a display
    // convenience that would let two queries differing only in a
    // late aggregate share a key
    val canonical = plan.canonicalized
      .treeString(verbose = true, addSuffix = false,
        maxFields = Int.MaxValue, printOperatorId = false)
    val srcs = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString).sorted.mkString(",")
          case other => other.toString
        }
    }.sorted.mkString(";")
    val versions = tables.sortBy(_.dir)
      .map(t => s"${t.dir}@${t.currentVersion}").mkString("|")
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$canonical\n${df.schema.json}\n$srcs\n$versions"
        .getBytes("UTF-8"))
    h.map("%02x".format(_)).mkString
  }

  /** Serve `df` through the cache: a hit reads the stored parquet
    * (zero recompute), a miss computes once, publishes atomically,
    * and reads back. Returns (result, wasHit). */
  def cachedWithStatus(df: DataFrame, tables: Seq[TxTable]): (DataFrame, Boolean) = {
    val f = fs
    val entry = new Path(cacheDir, s"r-${keyOf(df, tables)}")
    if (f.exists(new Path(entry, "_SUCCESS")))
      (spark.read.schema(df.schema).parquet(entry.toString), true)
    else {
      val tmp = new Path(cacheDir,
        s".fill-${java.util.UUID.randomUUID().toString.take(8)}")
      df.write.mode("overwrite").parquet(tmp.toString)
      if (!f.rename(tmp, entry)) {
        // lost the fill race (or entry appeared meanwhile): discard
        // ours, serve the winner's
        f.delete(tmp, true)
        require(f.exists(new Path(entry, "_SUCCESS")),
          s"result-cache entry $entry vanished during fill")
      }
      (spark.read.schema(df.schema).parquet(entry.toString), false)
    }
  }

  def cached(df: DataFrame, tables: Seq[TxTable]): DataFrame =
    cachedWithStatus(df, tables)._1

  /** Sweep entries older than `maxAgeMs` (orphaned keys from old
    * versions; age-based like [[TxTable.vacuum]], so a reader that
    * just resolved an entry has `maxAgeMs` to finish with it). */
  def prune(maxAgeMs: Long): Int = {
    val f = fs
    val dir = new Path(cacheDir)
    if (!f.exists(dir)) return 0
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val old = f.listStatus(dir).toSeq.filter { st =>
      st.getPath.getName.startsWith("r-") &&
        st.getModificationTime < cutoff
    }
    old.foreach(st => f.delete(st.getPath, true))
    old.size
  }
}
