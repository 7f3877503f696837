package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.core.TxTable

/** Version offset: a committed TxTable version IS the stream position
  * — replayable, totally ordered, exactly-once by construction. */
final case class GraftOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** STREAMING TAIL of a transactional table
  * (`spark.readStream.format("graft").load(dir)`): each micro-batch
  * serves the rows of the data files ADDED by the commit range
  * (startOffset, endOffset] — the Structured Streaming ingest pattern
  * over a table whose appends are transactional, so a batch is exactly
  * the rows some commit(s) published, never a torn file listing.
  *
  *  - Offsets are COMMITTED VERSIONS: restart-safe (the checkpoint
  *    replays from a version, and manifests pin exactly which files
  *    that means), no directory-mtime heuristics.
  *  - `startingVersion` option: begin at an older version (its
  *    SUCCESSOR's adds are the first batch); default = the version
  *    current when the stream starts (new commits only — the tail).
  *  - HONESTY GUARD: this source serves APPEND tails. A commit range
  *    that REMOVED any file (delete, upsert rewrite, compaction
  *    re-layout) cannot be expressed as add-rows without either
  *    dropping retractions or double-serving compacted rows — the
  *    stream FAILS with the remedy (`TxTable.changeFeed`, the
  *    row-level CDC API) instead of silently emitting wrong rows.
  *    Deletion-vector sidecars added to EXISTING files in the range
  *    are refused for the same reason; DV'd files newly added in the
  *    range serve their live rows correctly (the reader masks them).
  *
  * Scale shape: offset resolution and file-diffing are driver-side
  * manifest metadata (zero data I/O); each batch fans out one
  * [[GraftInputPartition]] per added file through the same reader as
  * the batch provider.
  */
final class GraftMicroBatchStream(tx: TxTable, required: StructType,
    startingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long] = None,
    /** version `required`'s names were RESOLVED at — the physical
      * rebinding must use this pin, not the floating head: a column
      * renamed again mid-stream would otherwise make the resolved
      * name unmappable (neither current-declared nor physical). */
    schemaVersion: Option[Long] = None) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  maxVersionsPerTrigger.foreach(n => require(n >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $n"))

  private val t0Version: Long = startingVersion.getOrElse(tx.currentVersion)

  /** `Trigger.AvailableNow` contract: pin "available" at prepare time
    * so the run drains exactly the commits that existed when it
    * started, then stops — commits landing mid-run wait for the next
    * run (they are not silently included OR lost: the checkpointed
    * offset hands them to the next start). */
  private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(tx.currentVersion)

  override def initialOffset(): Offset = GraftOffset(t0Version)
  override def latestOffset(): Offset = GraftOffset(tx.currentVersion)

  /** Admission control: a restart far behind the head drains the
    * backlog `maxVersionsPerTrigger` COMMITS per micro-batch instead
    * of planning one giant batch over thousands of commits — bounded
    * task count and executor memory per trigger at any backlog size.
    * Steps over RETAINED versions (vacuumed gaps collapse into their
    * successor, same as `planInputPartitions`), composes with
    * `Trigger.AvailableNow` (chunked drain up to the pinned end). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftOffset].version
    val cap = availableNowEnd.getOrElse(tx.currentVersion)
    val end = maxVersionsPerTrigger match {
      case Some(n) =>
        val avail = tx.versions.filter(v => v > s && v <= cap)
        // clamp, don't truncate: n > Int.MaxValue means "no cap this
        // trigger", while a raw n.toInt would wrap NEGATIVE and
        // take(negative) = empty → the stream silently stalls forever
        val cnt = math.min(n, Int.MaxValue.toLong).toInt
        if (avail.isEmpty) s else avail.take(cnt).last
      case None => cap
    }
    GraftOffset(end max s)
  }
  override def reportLatestOffset(): Offset = GraftOffset(tx.currentVersion)
  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Steps COMMIT BY COMMIT so table maintenance doesn't kill the
    * stream: a commit tagged `layout_only` (compaction / Z-order /
    * DV materialization — the live row set is unchanged) is SKIPPED
    * (its re-added files are rewrites of rows already served, its
    * removals are tolerated); any other commit that removes files or
    * grows deletion vectors on existing files still fails with the
    * CDC remedy. Versions vacuumed out of (start, end] collapse into
    * their successor's diff — then a compaction's churn is no longer
    * attributable and the honest failure fires. */
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].version
    val e = end.asInstanceOf[GraftOffset].version
    if (e <= s) return Array.empty
    val out = Seq.newBuilder[InputPartition]
    var prev = fileMap(s)
    tx.versions.filter(v => v > s && v <= e).foreach { v =>
      val cur = fileMap(v)
      if (tx.commitMeta(v).get("layout_only").contains("true")) {
        // rewrite of already-served rows: serve nothing
      } else {
        val removed = prev.keySet -- cur.keySet
        require(removed.isEmpty,
          s"commit $v of ${tx.dir} removed ${removed.size} file(s) " +
            "(delete/upsert) - an append-tail stream cannot express " +
            "that; consume row-level changes via TxTable.changeFeed " +
            "instead")
        // compare sidecar PATH SETS, not counts: a commit that swapped
        // a served file's sidecars for a consolidated one of equal
        // count but more tombstoned rows must trip this too — any
        // change to an already-served file's DV set is a retraction
        val dvGrew = prev.collect {
          case (p, dvs) if cur.get(p).exists(_.toSet != dvs.toSet) => p
        }
        require(dvGrew.isEmpty,
          s"commit $v of ${tx.dir} added deletion vectors to " +
            s"${dvGrew.size} existing file(s) - retractions cannot ride " +
            "an append-tail stream; consume TxTable.changeFeed instead")
        (cur.keySet -- prev.keySet).toSeq.sorted.foreach(p =>
          out += GraftInputPartition(p, cur(p).toArray))
      }
      prev = cur
    }
    out.result().toArray
  }

  private def fileMap(v: Long): Map[String, Seq[String]] =
    if (v < 0) Map.empty
    else tx.providerSnapshot(v, None)._2.toMap

  override def createReaderFactory(): PartitionReaderFactory =
    // bind files by physical column name (stable across renames) —
    // one mapping covers every served version since physical names
    // never change, resolved at the version `required` was named at
    new GraftReaderFactory(tx.physicalizeFor(
      schemaVersion.getOrElse(tx.currentVersion), required))
}
