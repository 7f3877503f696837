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

  /** Watermark as a guarded-commit snapshot sees it — the form a
    * precondition must use (pinned at the claimed base; the floating
    * [[appliedVersion]] would re-open the replay window). */
  private def watermarkOf(snap: TxTable.Snapshot): Long =
    snap.meta(WatermarkKey).map(_.toLong).getOrElse(-1L)

  /** Converge `follower` to `leader`'s current version. Returns the
    * number of leader commits applied (0 = already current, or a
    * concurrent sync won the race and applied it first). */
  def sync(leader: TxTable, follower: TxTable): Int = {
    require(follower.keys == leader.keys,
      "replication requires identical key columns")
    require(follower.logicalKeys == leader.logicalKeys,
      "replication requires identical DECLARED key names - apply the " +
        "same RENAME COLUMN on both sides first")
    val from = appliedVersion(follower)
    val to = leader.currentVersion
    if (to <= from) return 0
    follower.createIfAbsent()
    // horizon verified up front; the narrow catch covers only the
    // check-then-read race with a concurrent leader vacuum (the
    // localCheckpoint executes the delta read NOW, inside the try, so
    // a just-vacuumed data file takes the snapshot fallback instead of
    // crashing later). Any OTHER failure must surface — a transient
    // error silently escalating into a full-snapshot rewrite of a
    // 100 TB follower is the costliest possible response to a hiccup.
    val horizonOk = from < 0 || leader.versions.contains(from)
    val diff =
      if (!horizonOk) None
      else
        try Some(leader.changes(math.max(from, -1L), to).localCheckpoint())
        catch { case _: java.io.FileNotFoundException => None }
    // both commit paths are GUARDED on the watermark still being
    // `from` (checked against each attempt's claimed-base snapshot,
    // so the version claim serializes check with publish): concurrent
    // syncs serialize — the loser abandons its stale diff instead of
    // re-applying it on top of the winner's newer state (which would
    // resurrect deleted keys and regress updated ones).
    val applied = diff match {
      case None =>
        // snapshot pinned AT the recorded watermark: a floating
        // `leader.read` could include commits past `to`, leaving the
        // follower AHEAD of its own watermark (the next sync would
        // then re-apply changes it already holds)
        follower.replaceIf(leader.readVersion(to),
          Map(WatermarkKey -> to.toString))(watermarkOf(_) == from)
      case Some(cached) =>
        try {
          val upserts = cached
            .filter(col("_change_type").isin("insert", "update_postimage"))
            .drop("_change_type")
          val deletes = cached.filter(col("_change_type") === "delete")
            .select(leader.logicalKeys.map(col): _*)
          // ONE atomic commit applies both sides and the watermark —
          // fully distributed (no key list touches the driver)
          follower.applyChangesIf(upserts, deletes,
            Map(WatermarkKey -> to.toString))(watermarkOf(_) == from)
        } finally cached.unpersist()
    }
    if (applied) leader.versions.count(v => v > from && v <= to) else 0
  }
}
