package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Incrementally-maintained grouped aggregate over a [[TxTable]] — a
  * materialized view refreshed from the table's CDC feed instead of
  * recomputed (the "incremental view maintenance" recipe for
  * distributive aggregates: COUNT and SUM deltas; AVG derives).
  *
  * Scale shape: a refresh reads ONLY the source rows the commits since
  * the last refresh rewrote (`TxTable.changes` diffs manifests
  * driver-side), reduces them to per-group deltas (one small shuffle
  * proportional to the CHANGE volume, never the table), semi-joins the
  * current view down to the affected groups with a broadcast of the
  * delta keys (no view-wide shuffle), and upserts — which itself
  * rewrites only the affected view buckets. A 1-row source change
  * refreshes a 100 TB table's view by reading one bucket and writing
  * one bucket.
  *
  * Crash safety: the applied-source-version watermark is committed IN
  * the view's manifest (`meta` rides the atomic rename — see
  * [[TxTable.commitMeta]]), so refresh-then-crash can never
  * double-apply a delta: either the commit landed (data + watermark
  * together) or neither did. If the watermark version has been
  * vacuumed out of the source's retention horizon, refresh falls back
  * to a full recompute in one `replace` commit.
  *
  * Caveats (standard for IVM): float sums drift under long ± chains —
  * prefer integral/decimal value columns; groups whose count reaches
  * zero stay as tombstone rows filtered by [[read]] (swept by
  * [[compactTombstones]]).
  */
final class IncrementalView(
    spark: SparkSession,
    val source: TxTable,
    val dir: String,
    val groupCols: Seq[String],
    val sumCols: Seq[String],
    numBuckets: Int = 16) {

  require(groupCols.nonEmpty, "IncrementalView requires group columns")
  require(!groupCols.exists(c => c == "cnt" || c.startsWith("sum_")),
    "group columns may not collide with the view's cnt/sum_* outputs")
  private val srcSchema = source.currentSchema
  sumCols.foreach { c =>
    require(srcSchema.fieldNames.contains(c), s"unknown sum column $c")
  }

  private def sumFieldType(c: String): DataType = srcSchema(c).dataType match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => LongType
    case d: DecimalType => DecimalType(math.min(38, d.precision + 10), d.scale)
    case _ => DoubleType
  }

  val schema: StructType = StructType(
    groupCols.map(c => srcSchema(c).copy(nullable = true)) ++
      Seq(StructField("cnt", LongType)) ++
      sumCols.map(c => StructField(s"sum_$c", sumFieldType(c))))

  val table = new TxTable(spark, dir, schema, groupCols, numBuckets)

  private val WatermarkKey = "ivm_src_version"

  /** Source version the view last applied (−1 = never refreshed). */
  def appliedVersion: Long =
    table.latestMeta(WatermarkKey).map(_.toLong).getOrElse(-1L)

  /** The view's current contents (tombstones of emptied groups
    * filtered out). */
  def read: DataFrame = table.read.filter(col("cnt") > 0)

  private def aggs(weight: org.apache.spark.sql.Column) =
    sum(weight).as("cnt") +:
      sumCols.map(c => sum(col(c).cast(sumFieldType(c)) * weight).as(s"sum_$c"))

  /** Catch the view up to the source's current version. Returns the
    * number of source commits applied (0 = already current). */
  def refresh(): Int = {
    val from = appliedVersion
    val to = source.currentVersion
    if (to <= from) return 0
    table.createIfAbsent()
    val feed =
      try Some(source.changes(math.max(from, -1L), to))
      catch { case _: Exception => None } // watermark vacuumed away
    feed match {
      case None =>
        // horizon lost: one-commit full recompute (replace is atomic,
        // so readers see either the old view or the complete new one)
        val full = aggs(lit(1L))
        table.replace(
          source.read.groupBy(groupCols.map(col): _*).agg(full.head, full.tail: _*),
          Map(WatermarkKey -> to.toString))
      case Some(ch) =>
        val weight = when(
          col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L) // delete / update_preimage subtract
        val wAggs = aggs(weight)
        val delta = ch.groupBy(groupCols.map(col): _*)
          .agg(wAggs.head, wAggs.tail: _*)
        // affected groups only: broadcast the (small) delta keys; the
        // view is never shuffled wholesale
        val affected = table.read.join(
          broadcast(delta.select(groupCols.map(col): _*)), groupCols, "left_semi")
        val dAlias = delta.columns.map(c =>
          col(c).as(if (groupCols.contains(c)) c else s"_d_$c"))
        val merged = delta.select(dAlias: _*)
          .join(affected, groupCols, "left_outer")
          .select((groupCols.map(col) :+
            (coalesce(col("cnt"), lit(0L)) + col("_d_cnt")).as("cnt")) ++
            sumCols.map(c =>
              (coalesce(col(s"sum_$c"), lit(0).cast(sumFieldType(c))) +
                col(s"_d_sum_$c")).as(s"sum_$c")): _*)
        table.upsert(merged, Map(WatermarkKey -> to.toString))
    }
    versionsApplied(from, to)
  }

  private def versionsApplied(from: Long, to: Long): Int =
    source.versions.count(v => v > from && v <= to)

  /** Sweep tombstones (cnt = 0 groups) — safe anytime, refresh-safe. */
  def compactTombstones(): Unit = table.deleteWhere(col("cnt") === 0L)
}
