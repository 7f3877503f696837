package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE distinct-count sketches (Spark's native
  * Datasketches HLL aggregates) — the ingest-path answer to "how many
  * distinct users/URLs/keys so far?" at 100 TB: COUNT(DISTINCT) over
  * the corpus rescans everything on every ask, while an HLL union is
  * associative and lossless at a fixed lgConfigK, so each ingest
  * batch persists ONE tiny sketch row per tracked column and any
  * later estimate folds the stored sketches — cost proportional to
  * the number of batches, never the corpus.
  *
  * Contract (proven in DistinctSketchSpec): the union of per-batch
  * sketches estimates within the SAME standard HLL error envelope of
  * the true cardinality as a single whole-corpus sketch
  * (~1.04/√2^lgK relative; the two are NOT bit-identical — batch
  * sketches take different sparse→dense promotion paths than one
  * big sketch, so their union can differ by a fraction of the
  * envelope), small cardinalities are exact (sparse mode), and the
  * store is deterministic: re-running the same batches reproduces
  * the same estimates.
  */
object DistinctSketch {

  /** Aggregate + append one sketch row per tracked column for this
    * batch. One narrow pass over the batch; the stored row is a few
    * KB regardless of batch size. */
  def addBatch(batch: DataFrame, cols: Seq[String], dir: String,
      batchId: Long, lgConfigK: Int = 12): Unit = {
    require(cols.nonEmpty, "track at least one column")
    val aggs = cols.map(c =>
      hll_sketch_agg(col(c).cast("string"), lit(lgConfigK)).as(s"sk_$c"))
    batch.agg(aggs.head, aggs.tail: _*)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$dir/sketches")
  }

  /** Distinct-count estimate for `column` over every batch persisted
    * so far — reads (and unions) one small sketch per batch. */
  def estimate(spark: SparkSession, dir: String, column: String): Long =
    spark.read.parquet(s"$dir/sketches")
      .agg(hll_sketch_estimate(hll_union_agg(col(s"sk_$column")))
        .as("estimate"))
      .head.getLong(0)

  /** Estimates for every tracked column at once (one fold over the
    * sketch table). */
  def estimateAll(spark: SparkSession, dir: String): Map[String, Long] = {
    val df = spark.read.parquet(s"$dir/sketches")
    val skCols = df.columns.filter(_.startsWith("sk_")).toSeq
    val aggs = skCols.map(c =>
      hll_sketch_estimate(hll_union_agg(col(c))).as(c.stripPrefix("sk_")))
    val row = df.agg(aggs.head, aggs.tail: _*).head
    skCols.zipWithIndex.map { case (c, i) =>
      c.stripPrefix("sk_") -> row.getLong(i)
    }.toMap
  }
}
