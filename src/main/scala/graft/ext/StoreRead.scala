package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memoized parquet reads for the persisted index/sketch stores (the
  * `Tables.load` discipline applied to `ext/`): a probe query calls
  * `spark.read.parquet(storeDir)` on every invocation, and every call
  * re-lists the directory and re-reads footer schemas — pure planning
  * overhead on an immutable artifact. The memo reuses the analyzed
  * plan (and its file index); execution still scans the parquet on
  * every action — nothing about results is cached.
  *
  * Staleness guard: the key carries the directory's child listing
  * (name, mtime, length). Parquet writers never modify files in
  * place — a rewrite or a new batch creates/deletes children, which
  * moves a child's (or the dir's own) mtime — so a changed store can
  * never be served a stale file index. Keyed by session so a stopped
  * session's plans are never reused.
  */
object StoreRead {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Seq[(String, Long, Long)]), DataFrame]

  private def fingerprint(dir: String): Seq[(String, Long, Long)] = {
    val f = new java.io.File(dir)
    val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
    ((f.getPath, f.lastModified(), f.length()) +:
      kids.map(k => (k.getName, k.lastModified(), k.length())))
      .sortBy(_._1)
  }

  def parquet(spark: SparkSession, dir: String): DataFrame =
    memo.computeIfAbsent((spark, dir, fingerprint(dir)),
      _ => spark.read.parquet(dir))
}
