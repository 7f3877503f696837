package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Persisted MERGEABLE histogram store — the quantile/CDF twin of
  * [[DistinctSketch]]: each ingest batch appends one (value, n)
  * histogram per tracked column, and merging batches is summing
  * counts (associative, lossless) — so a quantile/percentile ask
  * folds the stored histograms at cost ∝ batches × histogram domain,
  * never the corpus. EXACT for bounded-cardinality columns (status
  * codes, integer quantities, star ratings, pre-bucketized measures —
  * the telemetry norm at 100 TB); continuous columns bucketize first
  * (caller picks the grid; the error is the bucket width — the
  * classic fixed-bin recipe).
  *
  * Reference analog: the reference's dashboard percentile asks rescan
  * the corpus per request; this store answers them from ∝-batches
  * rows, and the same merged histogram serves CDF / histogram-chart /
  * mode asks for free.
  */
object HistogramSketch {

  /** Aggregate + append one (value, n) histogram per tracked column
    * for this batch. One narrow pass over the batch; NULLs are
    * excluded (SQL quantile semantics ignore them). Batches land in
    * per-batch partition directories with OVERWRITE — counts MERGE by
    * summing, so an append-on-replay (idempotent ScanJob re-run,
    * crash replay) would silently double every count it touched;
    * rewriting the same bytes is a no-op instead. */
  def addBatch(batch: DataFrame, cols: Seq[String], dir: String,
      batchId: Long): Unit =
    addBatchKeyed(batch, cols, dir, batchId.toString)

  /** String-keyed [[addBatch]] — for ingest callers whose natural
    * batch identity is a run id: the sanitized id string IS the
    * partition value, so two distinct runs can never share (and
    * overwrite) a batch directory the way a 32-bit hash of the id
    * could. */
  def addBatchKeyed(batch: DataFrame, cols: Seq[String], dir: String,
      batchKey: String): Unit = {
    require(cols.nonEmpty, "track at least one column")
    val key = StoreKeys.sanitize(batchKey)
    val perCol = cols.map(c =>
      batch.filter(col(c).isNotNull)
        .groupBy(col(c).cast(DoubleType).as("value"))
        .agg(count(lit(1)).as("n"))
        .withColumn("column", lit(c)))
    perCol.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/hist/batch_id=$key")
  }

  /** GROUPED variant — one (group, value, n) histogram row set per
    * batch: the per-group quantile/CDF primitive ("p95 doc length per
    * language"), the exact symmetry of `DistinctSketch
    * .addBatchGrouped`. Cost ∝ batches × groups × domain; group
    * cardinality must be dashboard-shaped (bounded), which is what
    * "per Y" means. */
  def addBatchGrouped(batch: DataFrame, groupCols: Seq[String],
      cols: Seq[String], dir: String, batchId: Long): Unit = {
    require(groupCols.nonEmpty, "group by at least one column")
    require(cols.nonEmpty, "track at least one column")
    val perCol = cols.map(c =>
      batch.filter(col(c).isNotNull)
        .groupBy(groupCols.map(col) :+
          col(c).cast(DoubleType).as("value"): _*)
        .agg(count(lit(1)).as("n"))
        .withColumn("column", lit(c)))
    perCol.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/hist/batch_id=$batchId")
  }

  /** The merged histogram for `column` — (value, n) with counts summed
    * across every appended batch. */
  def histogram(spark: SparkSession, dir: String, column: String): DataFrame =
    StoreRead.parquet(spark, s"$dir/hist")
      .filter(col("column") === column)
      .groupBy("value").agg(sum("n").as("n"))

  /** Per-group discrete quantiles from a GROUPED store — same rank
    * rule as [[quantiles]], windows partitioned per group (each
    * partition is one group's merged histogram: bounded by the domain
    * by contract, never corpus rows). Output: (groupCols..., q,
    * value). */
  def quantilesGrouped(spark: SparkSession, dir: String,
      groupCols: Seq[String], column: String,
      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val h = StoreRead.parquet(spark, s"$dir/hist")
      .filter(col("column") === column)
      .groupBy(groupCols.map(col) :+ col("value"): _*)
      .agg(sum("n").as("n"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = h
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(wAll))
    qs.toDF("q")
      .crossJoin(broadcast(cum))
      .filter(col("cum") >= greatest(lit(1L),
        ceil(col("q") * col("total")).cast(LongType)))
      .groupBy(groupCols.map(col) :+ col("q"): _*)
      .agg(min("value").as("value"))
      .orderBy(groupCols.map(col) :+ col("q"): _*)
  }

  /** Discrete quantiles (SQL `quantile_disc` semantics, verified
    * against DuckDB: the smallest value whose cumulative count reaches
    * `max(1, ceil(q·N))`). The cumulative window runs over the MERGED
    * HISTOGRAM only — its cardinality is the histogram domain by
    * contract (bounded), never corpus rows, so the single-partition
    * window is a few rows. Callers comparing engines should pick
    * binary-exact q (0.25, 0.5, 0.75…): `ceil` of an inexact q·N
    * product can differ between engines at integer boundaries. */
  def quantiles(spark: SparkSession, dir: String, column: String,
      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val h = histogram(spark, dir, column)
    val w = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    qs.toDF("q")
      .crossJoin(broadcast(cum))
      .filter(col("cum") >= greatest(lit(1L),
        ceil(col("q") * col("total")).cast(LongType)))
      .groupBy("q").agg(min("value").as("value"))
      .orderBy("q")
  }
}
