package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** CDC-FED INCREMENTAL SCD2 — the type-2 history of `scd2_build`
  * (queries/Relational7.scala) maintained as a [[TxTable]] refreshed
  * from the event source's change feed, under the [[IncrementalView]]
  * discipline:
  *
  *  - a refresh diffs the source's manifests since the applied
  *    watermark (`TxTable.changes` — untouched buckets cost zero I/O),
  *    reduces the delta to its TOUCHED KEYS, and recomputes the
  *    run-length history for those keys only, reading their events
  *    through `scanWhere` (zone-map/manifest pruning — never a
  *    full-history scan; [[RefreshStats]] reports the pruning so tests
  *    assert it). Whole-key recompute subsumes the tail case: an
  *    out-of-order or deleted event can merge or split runs anywhere
  *    in the key's history, and per-key histories are bounded (runs
  *    per key), so "recompute the touched keys" is both correct and
  *    delta-sized.
  *  - the new history rows UPSERT and the stale (key, ver) rows DELETE
  *    in ONE guarded commit (`applyChangesIf`) carrying the new
  *    watermark in its metadata — refresh-then-crash can never
  *    double-apply, and a concurrent/replayed refresh whose watermark
  *    no longer matches the claimed base abandons instead of
  *    re-applying (the [[IncrementalView]] CAS contract).
  *  - the FIRST refresh (no watermark) is a full build via `replaceIf`.
  *    NO DRIVER-SIDE KEY LIST AT ANY SCALE: the incremental path keeps
  *    the touched keys as a DataFrame and restricts source + history by
  *    LEFT SEMI join (broadcast when the delta is small, shuffle hash
  *    otherwise); file skipping comes from the delta keys' aggregated
  *    min/max (a 2-value control-plane row), never an In(...) literal
  *    list — a backfill touching millions of keys costs a join, not a
  *    million-literal plan.
  *
  * Differential contract (Scd2ViewSpec, the CdcSpec replay pattern):
  * after any interleaving of insert/update/delete batches, the
  * incrementally-maintained table must equal `buildHistory` over the
  * full source — and the `scd2_incr_build` oracle row pins the
  * batched build against the same DuckDB SQL as the one-shot
  * `scd2_build`.
  */
final class Scd2View(
    spark: SparkSession,
    val source: TxTable,
    val dir: String,
    val keyCol: String,
    val tsCol: String,
    val seqCol: String,
    val statusCol: String,
    numBuckets: Int = 16) {

  private val srcSchema = source.currentSchema
  Seq(keyCol, tsCol, seqCol, statusCol).foreach { c =>
    require(srcSchema.fieldNames.contains(c), s"unknown source column $c")
  }

  /** History schema: (key, ver) → status + [effective_from,
    * effective_to) + is_current. */
  val schema: StructType = StructType(Seq(
    srcSchema(keyCol).copy(nullable = false),
    StructField("ver", LongType, nullable = false),
    srcSchema(statusCol),
    StructField("effective_from", srcSchema(tsCol).dataType),
    StructField("effective_to", srcSchema(tsCol).dataType),
    StructField("is_current", BooleanType)))

  val table = new TxTable(spark, dir, schema, Seq(keyCol, "ver"), numBuckets)

  private val WatermarkKey = "scd2_src_version"

  /** Source version the history last applied (−1 = never refreshed). */
  def appliedVersion: Long =
    table.latestMeta(WatermarkKey).map(_.toLong).getOrElse(-1L)

  private def watermarkOf(snap: TxTable.Snapshot): Long =
    snap.meta(WatermarkKey).map(_.toLong).getOrElse(-1L)

  /** The run-length SCD2 collapse over an event slice — the SAME
    * single-exchange shape as `scd2_build` (both windows and the
    * (key, ver) aggregate reuse one hash partitioning on the key).
    * Change detection is null-safe (a transition to/from a NULL
    * status is a version boundary). */
  def buildHistory(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, seqCol)
    val prev = lag(statusCol, 1).over(w)
    val runs = events
      .withColumn("_is_change",
        when(!(prev <=> col(statusCol)), 1L).otherwise(0L))
      .withColumn("ver", sum("_is_change").over(w))
      .groupBy(col(keyCol), col("ver"))
      .agg(min(statusCol).as(statusCol), min(tsCol).as("effective_from"))
    val wv = Window.partitionBy(keyCol).orderBy("ver")
    runs
      .withColumn("effective_to", lead("effective_from", 1).over(wv))
      .withColumn("is_current", col("effective_to").isNull)
      .select(col(keyCol), col("ver"), col(statusCol),
        col("effective_from"), col("effective_to"), col("is_current"))
  }

  /** What a refresh did: how many keys the delta touched, and the
    * source-file pruning the touched-key re-read achieved (the
    * "no full-history scan" evidence — `srcFilesRead` counts files
    * whose zone maps admit a touched key, `srcFilesTotal` the
    * manifest's live files). A full build reports read = total. */
  final case class RefreshStats(
      applied: Boolean, touchedKeys: Long,
      srcFilesRead: Int, srcFilesTotal: Int,
      /** analyzed plan of the incremental touched-key scan ("" on the
        * full-build / no-op paths) — lets tests assert the access path
        * (semi-join visible, no In literal list) from the stats. */
      touchedPlan: String = "")

  /** Advance the history to the source's current version. Idempotent:
    * an already-current view is a no-op; a concurrent refresh that
    * loses the CAS reports applied = false (its delta was computed
    * against a superseded watermark — rerun). */
  def refresh(): RefreshStats = {
    val srcV = source.currentVersion
    val wm = appliedVersion
    if (srcV < 0 || srcV == wm) return RefreshStats(true, 0L, 0, 0)
    if (wm < 0L) {
      // first build: full history in one replace commit — never a
      // driver-side key list
      val total = source.skipReport(lit(true)).total
      val ok = table.replaceIf(buildHistory(source.read),
        Map(WatermarkKey -> srcV.toString))(s => watermarkOf(s) == wm)
      return RefreshStats(ok, -1L, total, total)
    }
    val delta = source.changes(wm, srcV)
    // touched keys STAY a DataFrame — a backfill or wide UPDATE can
    // touch millions of keys, and a driver-side list would both
    // materialize them all in driver memory and compile a
    // million-literal In(...) predicate (plan-size blowup). The only
    // driver-side values are the key EXTREMA (one 2-value aggregate,
    // control plane), which drive zone-map file pruning; exactness
    // comes from the semi-join below, never from the range.
    val keys = delta.select(col(keyCol)).distinct().localCheckpoint(true)
    val nTouched = keys.count()
    if (nTouched == 0L) {
      // layout-only commits (compaction, clone): advance the watermark
      // with an empty merge so the next refresh diffs from srcV
      val ok = table.applyChangesIf(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(schema.take(2))),
        Map(WatermarkKey -> srcV.toString))(s => watermarkOf(s) == wm)
      return RefreshStats(ok, 0L, 0, source.skipReport(lit(true)).total)
    }
    // file skipping from the AGGREGATED key extrema, not a literal
    // list: zone maps prune any file whose key range misses
    // [minK, maxK] (write-time key locality — the regime CDC serves);
    // null-keyed rows are outside between(), so keep them scannable
    val ext = keys.agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"))
      .head
    val rangePred =
      if (ext.isNullAt(0)) col(keyCol).isNull
      else col(keyCol).between(lit(ext.get(0)), lit(ext.get(1))) ||
        col(keyCol).isNull
    val skip = source.skipReport(rangePred)
    // exact touched-key restriction via LEFT SEMI against the delta's
    // distinct keys — broadcast when the delta is small (the count is
    // already paid above), shuffle hash otherwise; never an In literal
    val keyedKeys =
      if (nTouched <= 1000000L) broadcast(keys) else keys
    val touchedScan = source.scanWhere(rangePred)
      .join(keyedKeys, Seq(keyCol), "left_semi")
    val newHist = buildHistory(touchedScan)
      .localCheckpoint(true) // delta-sized; pins vs the upsert below
    val stale = table.scanWhere(rangePred)
      .join(keyedKeys, Seq(keyCol), "left_semi")
      .select(col(keyCol), col("ver"))
      .join(newHist.select(col(keyCol), col("ver")),
        Seq(keyCol, "ver"), "left_anti")
    val ok = table.applyChangesIf(newHist, stale,
      Map(WatermarkKey -> srcV.toString))(s => watermarkOf(s) == wm)
    RefreshStats(ok, nTouched, skip.scanned, skip.total,
      touchedScan.queryExecution.analyzed.toString)
  }

  /** The current history. */
  def read: DataFrame = table.read
}
