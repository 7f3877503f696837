package graft.ext

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** CDC-driven table replication: keep a follower TxTable converged to
  * a leader by applying the leader's per-commit change feed — the
  * cross-region mirror / downstream-materialization primitive.
  *
  * Each sync reads only the rows the leader rewrote since the last
  * sync (manifest diff — untouched buckets cost nothing), applies
  * upserts (insert + update_postimage) and key-deletes, and records
  * the applied leader version ATOMICALLY in the follower's manifest
  * metadata (same mechanism as [[IncrementalView]]): a crash between
  * apply and watermark is impossible by construction, and re-applying
  * a net diff is idempotent anyway (upserts by key, deletes by key).
  *
  * If the follower's watermark has aged out of the leader's vacuum
  * horizon, sync falls back to a full one-commit `replace` snapshot.
  * The follower may use different bucketing/clustering than the
  * leader — replication is row-level, not file-level.
  */
object Replication {

  private val WatermarkKey = "repl_src_version"

  /** Leader version the follower has applied (−1 = never synced). */
  def appliedVersion(follower: TxTable): Long =
    follower.latestMeta(WatermarkKey).map(_.toLong).getOrElse(-1L)

  /** Converge `follower` to `leader`'s current version. Returns the
    * number of leader commits applied (0 = already current). */
  def sync(leader: TxTable, follower: TxTable): Int = {
    require(follower.keys == leader.keys,
      "replication requires identical key columns")
    val from = appliedVersion(follower)
    val to = leader.currentVersion
    if (to <= from) return 0
    follower.createIfAbsent()
    val diff =
      try Some(leader.changes(math.max(from, -1L), to))
      catch { case _: Exception => None } // horizon vacuumed away
    diff match {
      case None =>
        follower.replace(leader.read, Map(WatermarkKey -> to.toString))
      case Some(ch) =>
        val cached = ch.localCheckpoint() // one pass over the delta
        try {
          val upserts = cached
            .filter(col("_change_type").isin("insert", "update_postimage"))
            .drop("_change_type")
          val deletes = cached.filter(col("_change_type") === "delete")
            .select(leader.keys.map(col): _*)
          // ONE atomic commit applies both sides and the watermark —
          // fully distributed (no key list touches the driver)
          follower.applyChanges(upserts, deletes,
            Map(WatermarkKey -> to.toString))
        } finally cached.unpersist()
    }
    leader.versions.count(v => v > from && v <= to)
  }
}
