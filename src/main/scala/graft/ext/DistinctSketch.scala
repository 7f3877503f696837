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
    * KB regardless of batch size. The tracked-column set is part of
    * the store's contract: a batch tracking a DIFFERENT set is
    * rejected up front — silently appending it would leave parquet
    * files with disjoint sk_* columns, and a later schema-picked read
    * would drop whole batches from the union (undercounted
    * estimates). */
  def addBatch(batch: DataFrame, cols: Seq[String], dir: String,
      batchId: Long, lgConfigK: Int = 12): Unit = {
    validateShape(batch.sparkSession, dir, cols, groupCols = Nil)
    val aggs = cols.map(c =>
      hll_sketch_agg(col(c).cast("string"), lit(lgConfigK)).as(s"sk_$c"))
    batch.agg(aggs.head, aggs.tail: _*)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$dir/sketches")
  }

  /** GROUPED variant — one sketch row per (group, batch): the
    * "distinct Xs per Y so far" dashboard primitive (distinct users
    * per day, distinct URLs per domain). Same mergeability contract
    * as [[addBatch]]; group columns become part of the store's
    * schema, estimates union per group. Cost ∝ batches × groups —
    * group cardinality must be dashboard-shaped (bounded), which is
    * what "per Y" means. */
  def addBatchGrouped(batch: DataFrame, groupCols: Seq[String],
      cols: Seq[String], dir: String, batchId: Long,
      lgConfigK: Int = 12): Unit = {
    require(groupCols.nonEmpty, "group by at least one column")
    validateShape(batch.sparkSession, dir, cols, groupCols)
    val aggs = cols.map(c =>
      hll_sketch_agg(col(c).cast("string"), lit(lgConfigK)).as(s"sk_$c"))
    batch.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$dir/sketches")
  }

  /** Per-group distinct-count estimates for `column` — one fold over
    * the store; groups a batch never saw simply contribute nothing.
    * Output: (groupCols..., n_distinct). */
  def estimateGrouped(spark: SparkSession, dir: String,
      groupCols: Seq[String], column: String): DataFrame =
    readSketches(spark, dir)
      .groupBy(groupCols.map(col): _*)
      .agg(coalesce(
        hll_sketch_estimate(hll_union_agg(col(s"sk_$column"))), lit(0L))
        .as("n_distinct"))

  /** Shape gate for both writers: the tracked set AND the group set
    * are the store's contract. Tracked-only validation let addBatch
    * and addBatchGrouped (or two grouped writers with different group
    * columns) silently fork one store's parquet schema — the exact
    * failure the check exists to reject; estimateGrouped over such a
    * fork emits spurious NULL-group rows. Reserved names (sk_*,
    * batch_id) are rejected up front so a group or tracked column can
    * never collide with the store's own columns. */
  private def validateShape(spark: SparkSession, dir: String,
      cols: Seq[String], groupCols: Seq[String]): Unit = {
    require(cols.nonEmpty, "track at least one column")
    (cols ++ groupCols).foreach { c =>
      require(!c.startsWith("sk_") && c != "batch_id",
        s"'$c' collides with the store's reserved columns (sk_*, batch_id)")
    }
    storedShape(spark, dir).foreach { case (storedSk, storedGroups) =>
      val incoming = cols.map(c => s"sk_$c").toSet
      require(incoming == storedSk,
        s"tracked columns ${cols.sorted.mkString(",")} do not match the " +
          s"store's ${storedSk.map(_.stripPrefix("sk_")).toSeq.sorted.mkString(",")}")
      require(groupCols.toSet == storedGroups,
        s"group columns [${groupCols.sorted.mkString(",")}] do not match " +
          s"the store's [${storedGroups.toSeq.sorted.mkString(",")}]")
    }
  }

  /** (sk_* columns, group columns) of an existing store; None when the
    * store has no files yet. */
  private def storedShape(spark: SparkSession, dir: String)
      : Option[(Set[String], Set[String])] =
    try {
      val cs = readSketches(spark, dir).columns
      Some((cs.filter(_.startsWith("sk_")).toSet,
        cs.filterNot(c => c.startsWith("sk_") || c == "batch_id").toSet))
    } catch { case e: Exception
        if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") =>
      None
    }

  /** mergeSchema guards against a store written before the
    * tracked-set validation existed (files with disjoint sk_*
    * columns): every column then surfaces (nulls where a file lacks
    * it) instead of parquet silently electing one file's schema. */
  private def readSketches(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", true).parquet(s"$dir/sketches")

  /** Distinct-count estimate for `column` over every batch persisted
    * so far — reads (and unions) one small sketch per batch. An
    * all-null sketch column (no batch tracked it, or only empty
    * batches) estimates 0 rather than NPE-ing on the null fold. */
  def estimate(spark: SparkSession, dir: String, column: String): Long = {
    val row = readSketches(spark, dir)
      .agg(hll_sketch_estimate(hll_union_agg(col(s"sk_$column")))
        .as("estimate"))
      .head
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Estimates for every tracked column at once (one fold over the
    * sketch table). */
  def estimateAll(spark: SparkSession, dir: String): Map[String, Long] = {
    val df = readSketches(spark, dir)
    val skCols = df.columns.filter(_.startsWith("sk_")).toSeq
    val aggs = skCols.map(c =>
      hll_sketch_estimate(hll_union_agg(col(c))).as(c.stripPrefix("sk_")))
    val row = df.agg(aggs.head, aggs.tail: _*).head
    skCols.zipWithIndex.map { case (c, i) =>
      c.stripPrefix("sk_") -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
  }
}
