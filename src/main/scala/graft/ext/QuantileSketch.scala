package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE quantile summaries — the ingest-path answer to
  * "what is the p50/p90 so far?" at 100 TB, completing the sketch
  * store family ([[DistinctSketch]] = distincts, [[HistogramSketch]] =
  * binned distributions, [[FreqSketch]] = frequent items, this =
  * value-exact rank quantiles). Each ingest batch persists a weighted
  * value summary (≤ `capacity` (v, w) rows); any later quantile ask
  * folds the stored summaries — cost ∝ batches × capacity, never the
  * corpus (the mergeable-summaries recipe, Agarwal et al., cited in
  * PAPERS.md).
  *
  * Regimes, same discipline as the sibling stores: while a batch's
  * DISTINCT value count fits `capacity` the summary is the exact
  * weighted value census (budget 0 — quantile asks are
  * oracle-checkable); an over-capacity batch is COMPACTED to the
  * equi-weight rank grid t_j = ⌈j·W/k⌉ (j = 1..k): the summary keeps
  * the true value at each grid rank with weight t_j − t_{j−1}, so any
  * reported quantile is a REAL data value whose true rank differs
  * from the requested rank by ≤ ⌈W/k⌉ — the budget the meta row
  * records. Folding summaries adds budgets; [[exactness]] reports the
  * total, and exact-regime probes `require` it zero.
  *
  * Compaction is fully distributed — the cumulative rank needed for
  * the grid never builds a single-partition window over batch data:
  * distinct values range-partition by value, each partition cum-sums
  * locally (a window keyed by the partition id), per-partition totals
  * (ONE row per partition — control plane, the [[IvfIndex]] centroid
  * class) become broadcast prefix offsets, and each row then knows
  * its global cumulative rank. Grid assignment is closed-form from
  * that rank — a row covers grid points j ∈ (⌊(cum−w)·k/W⌋,
  * ⌊cum·k/W⌋] (integer arithmetic throughout) — one `sequence`
  * explode whose total fan-out is exactly k, never a range join and
  * never a per-group sort on the driver.
  */
object QuantileSketch {

  /** Aggregate + append this batch's summary under an integer batch
    * id. Batches land in per-batch partition directories with
    * OVERWRITE, so replaying a batch id is idempotent rather than
    * double-counting (the [[FreqSketch.addBatch]] contract). */
  def addBatch(batch: DataFrame, valueCol: String, dir: String,
      batchId: Long, capacity: Int = 4096): Unit =
    addBatchKeyed(batch, valueCol, dir, batchId.toString, capacity)

  /** String-keyed [[addBatch]] — the sanitized run id IS the batch
    * partition value (see [[StoreKeys.sanitize]]). */
  def addBatchKeyed(batch: DataFrame, valueCol: String, dir: String,
      batchKey: String, capacity: Int = 4096): Unit = {
    val batchId = StoreKeys.sanitize(batchKey)
    val s = batch.sparkSession
    validateCapacity(s, dir, capacity)
    val weights = batch
      .select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .groupBy("v").agg(count(lit(1)).as("w"))
      .persist()
    try {
      val g = weights.agg(count(lit(1)), coalesce(sum("w"), lit(0L))).head
      val nDistinct = g.getLong(0); val total = g.getLong(1)
      val exact = nDistinct <= capacity
      val rows =
        if (exact) weights.orderBy("v")
        else compacted(weights, total, capacity).orderBy("v")
      rows.coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/quant/batch_id=$batchId")
      val budget = if (exact) 0L else ceilDiv(total, capacity.toLong)
      import s.implicits._
      Seq((capacity, !exact, budget, total))
        .toDF("capacity", "compacted", "budget", "n")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/meta/batch_id=$batchId")
    } finally { weights.unpersist(); () }
  }

  /** GROUPED batch append: one summary per `groupCol` group (rows
    * (grp, v, w) + per-group meta) — the store shape behind
    * per-language / per-jurisdiction latency-percentile asks. Groups
    * inside `capacity` distinct values stay exact; over-capacity
    * groups compact on the same closed-form grid, with the cumulative
    * rank from a per-GROUP window (per-group distinct values bound
    * that window by contract — a group with corpus-scaled continuous
    * values belongs in the global store per group, or pre-binned in
    * [[HistogramSketch]]). */
  def addBatchGrouped(batch: DataFrame, groupCol: String, valueCol: String,
      dir: String, batchId: Long, capacity: Int = 4096): Unit = {
    val s = batch.sparkSession
    validateCapacity(s, dir, capacity)
    val weights = batch
      .select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("v"))
      .filter(col("grp").isNotNull && col("v").isNotNull && !isnan(col("v")))
      .groupBy("grp", "v").agg(count(lit(1)).as("w"))
      .persist()
    try {
      val stats = weights.groupBy("grp")
        .agg(count(lit(1)).as("nd"), sum("w").as("total"))
      val tagged = weights.join(broadcast(stats), Seq("grp"))
      val exactRows = tagged.filter(col("nd") <= capacity)
        .select("grp", "v", "w")
      val compactedRows = tagged.filter(col("nd") > capacity)
        .withColumn("cum",
          sum("w").over(Window.partitionBy("grp").orderBy("v")))
        .withColumn("j", explode(gridCoverExpr(capacity)))
        .select(col("grp"), col("v"), gridWeightExpr(capacity).as("w"))
      exactRows.unionByName(compactedRows)
        .repartition(1).sortWithinPartitions("grp", "v")
        .write.mode("overwrite").parquet(s"$dir/quant/batch_id=$batchId")
      stats
        .select(col("grp"), lit(capacity).as("capacity"),
          (col("nd") > capacity).as("compacted"),
          when(col("nd") > capacity,
            expr(s"(total + ${capacity - 1}L) div ${capacity}L"))
            .otherwise(lit(0L)).as("budget"),
          col("total").as("n"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/meta/batch_id=$batchId")
    } finally { weights.unpersist(); () }
  }

  /** Fold of every stored summary: (v, w) with weights summed — ≤
    * batches × capacity rows (control-plane sized; every downstream
    * window rides on THIS, never on corpus data). */
  def merged(spark: SparkSession, dir: String): DataFrame =
    StoreRead.parquet(spark, s"$dir/quant")
      .groupBy("v").agg(sum("w").as("w"))

  /** Group-wise fold of a grouped store: (grp, v, w). */
  def mergedGrouped(spark: SparkSession, dir: String): DataFrame =
    StoreRead.parquet(spark, s"$dir/quant")
      .groupBy("grp", "v").agg(sum("w").as("w"))

  /** (every stored summary is the exact weighted census, summed rank
    * budget across batches/groups). Quantiles from an all-exact store
    * are corpus-exact; otherwise each reported value's true rank is
    * within the budget of the requested one. */
  def exactness(spark: SparkSession, dir: String): (Boolean, Long) = {
    val m = StoreRead.parquet(spark, s"$dir/meta")
      .agg(max(col("compacted").cast("int")), sum("budget")).head
    (m.getInt(0) == 0, m.getLong(1))
  }

  /** Rank quantiles served ENTIRELY from the store: for each q the
    * SMALLEST stored value whose cumulative weight reaches
    * ceil(q · n) — the discrete lower quantile, the same IEEE-double
    * `ceil(q * n)` both engines evaluate identically (the BM25
    * determinism discipline). One (q, value) row per requested q. */
  def quantiles(spark: SparkSession, dir: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    import spark.implicits._
    val m = merged(spark, dir)
    // cum window over ≤ batches × capacity summary rows — bounded fold
    val cum = m.withColumn("cum", sum("w").over(Window.orderBy("v")))
      .withColumn("n", sum("w").over(Window.partitionBy()))
    cum.join(broadcast(qs.toDF("q")),
        col("cum") >= ceil(col("q") * col("n")).cast("long"))
      .groupBy("q").agg(min("v").as("value"))
      .orderBy("q")
  }

  /** CDF probe — the INVERSE of [[quantiles]] ("what share of rows
    * sit at or below v?"): cumulative weight at each probe value over
    * the folded summary, as (value, rank, n, cdf). Exact in the exact
    * regime; rank error within the store budget otherwise. One fold ∝
    * batches × capacity rows; probes ride a broadcast. */
  def cdfAt(spark: SparkSession, dir: String,
      values: Seq[Double]): DataFrame = {
    require(values.nonEmpty, "at least one probe value")
    import spark.implicits._
    val m = merged(spark, dir)
    val n = m.agg(coalesce(sum("w"), lit(0L))).head.getLong(0)
    require(n > 0L, "empty quantile store")
    // LEFT join FROM the probe list: a probe below every stored value
    // must still answer (value, rank 0, cdf 0.0) — an inner join would
    // silently drop it from the result, violating the "cumulative
    // weight at each probe value" contract
    values.toDF("value")
      .join(m, col("v") <= col("value"), "left")
      .groupBy("value")
      .agg(coalesce(sum("w"), lit(0L)).as("rank"))
      .withColumn("n", lit(n))
      .withColumn("cdf", round(col("rank").cast("double") / lit(n.toDouble), 6))
      .orderBy("value")
  }

  /** Per-group rank quantiles from a grouped store — same target
    * semantics as [[quantiles]], one (grp, q, value) row per group ×
    * requested q. */
  def quantilesGrouped(spark: SparkSession, dir: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    import spark.implicits._
    val m = mergedGrouped(spark, dir)
    val cum = m
      .withColumn("cum", sum("w").over(
        Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", sum("w").over(Window.partitionBy("grp")))
    cum.join(broadcast(qs.toDF("q")),
        col("cum") >= ceil(col("q") * col("n")).cast("long"))
      .groupBy("grp", "q").agg(min("v").as("value"))
      .orderBy("grp", "q")
  }

  // ---- closed-form equi-weight grid ----

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1L) / b

  /** Grid points covered by a row whose cumulative weight interval is
    * (cum − w, cum] over columns `cum`, `w`, `total`: j ∈
    * (⌊(cum−w)·k/total⌋, ⌊cum·k/total⌋] — t_j = ⌈j·total/k⌉ ≤ c ⟺
    * j·total ≤ c·k, so the integer `div` bounds are exact (plain `/`
    * on longs is DOUBLE division in Spark SQL, lossy past 2^53 —
    * cum·k reaches ~4e16 at 100 TB). Empty for rows covering no grid
    * point (their weight folds into the next representative's grid
    * interval); `sequence` is guarded because an unguarded
    * sequence(lo, hi) with lo > hi DESCENDS instead of being empty.
    * Total fan-out across a batch is exactly k. */
  private def gridCoverExpr(k: Int): Column = expr(
    s"""CASE WHEN (cum * ${k}L) div total >= ((cum - w) * ${k}L) div total + 1L
       | THEN sequence(((cum - w) * ${k}L) div total + 1L,
       |               (cum * ${k}L) div total)
       | ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)

  /** Weight of grid representative `j`: t_j − t_{j−1} with t_j =
    * ⌈j·total/k⌉ — the grid weights sum back to total exactly. */
  private def gridWeightExpr(k: Int): Column = expr(
    s"((j * total + ${k - 1}L) div ${k}L) - " +
      s"(((j - 1L) * total + ${k - 1}L) div ${k}L)")

  /** Distributed compaction of a global batch: range-partition the
    * distinct values, local cum-sum per partition (window keyed by
    * the partition id — no single-partition window anywhere),
    * per-partition totals collected as ONE row each (control plane)
    * and broadcast back as prefix offsets, then the closed-form grid
    * cover/weight. The ≤ k result rows are materialized eagerly
    * (localCheckpoint) so the range-partitioned intermediate can be
    * released before the caller's write. */
  private def compacted(weights: DataFrame, total: Long,
      k: Int): DataFrame = {
    val s = weights.sparkSession
    import s.implicits._
    val parts = weights.repartitionByRange(col("v"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val totals = parts.groupBy("pid").agg(sum("w").as("pw"))
        .orderBy("pid").as[(Int, Long)].collect()
      var acc = 0L
      val offsets = totals.map { case (pid, pw) =>
        val o = (pid, acc); acc += pw; o
      }
      val offDf = broadcast(offsets.toSeq.toDF("pid", "off"))
      parts
        .withColumn("lcum",
          sum("w").over(Window.partitionBy("pid").orderBy("v")))
        .join(offDf, Seq("pid"))
        .withColumn("cum", col("lcum") + col("off"))
        .withColumn("total", lit(total))
        .withColumn("j", explode(gridCoverExpr(k)))
        .select(col("v"), gridWeightExpr(k).as("w"))
        .localCheckpoint(true)
    } finally { parts.unpersist(); () }
  }

  /** One store = one capacity: summaries compacted at different grid
    * resolutions carry incompatible budgets. */
  private def validateCapacity(spark: SparkSession, dir: String,
      capacity: Int): Unit = {
    require(capacity > 0, "capacity must be positive")
    try {
      val caps = StoreRead.parquet(spark, s"$dir/meta")
        .select("capacity").distinct().collect().map(_.getInt(0))
      require(caps.forall(_ == capacity),
        s"store capacity ${caps.mkString(",")} != $capacity")
    } catch { case e: Exception
        if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") =>
      ()
    }
  }
}
