package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GLOBAL ranking WITHOUT the single-partition window: `row_number`,
  * `rank`, `percent_rank`, `cume_dist`, `ntile` over a full-table
  * ordering, computed with the same SQL semantics as the built-in
  * window functions but never moving the data to one partition (the
  * plan Spark produces for `Window.orderBy(...)` with no partition
  * key — correct, and a scale-killer on anything bigger than a
  * dimension).
  *
  * Shape (the two-phase distributed-ranking recipe, shared with
  * [[QuantileSketch]]'s compaction): distinct values range-partition
  * by value and cum-sum locally (a window keyed by the partition id),
  * per-partition totals collect as ONE row each (control plane) and
  * broadcast back as prefix offsets — every value then knows how many
  * rows precede it globally. Rank-family columns are closed forms of
  * that prefix: rank = before + 1 (ties share it), cume_dist =
  * (before + peers)/n, row_number adds the per-VALUE position (a
  * window partitioned by value — bounded by the duplicate count, not
  * the table), and ntile's balanced buckets are integer arithmetic on
  * row_number (exact below 2^53). percent_rank and cume_dist are one
  * IEEE divide each, engine-identical.
  */
object GlobalRank {

  /** `df` with `row_number`, `rank`, `percent_rank`, `cume_dist`, and
    * `ntile` columns appended, ordered by (`valueCol`, `idCol`) —
    * `idCol` breaks ties for the POSITIONAL functions (row_number,
    * ntile) exactly as `ORDER BY value, id` would; the rank-family
    * functions order by `valueCol` alone, per SQL. NULL-valued rows
    * are EXCLUDED (dropped from the output and from n) — the honest
    * contract for a ranking metric; SQL's nulls-first window rows
    * would otherwise silently shift every real rank while the
    * equi-join back dropped the null rows themselves.
    *
    * Skew caveat, stated not hidden: the positional columns route
    * every row of one VALUE through that value's keyed window, so a
    * pathological tie domain (90 % of rows sharing one value) makes a
    * hot task — rank/percent_rank/cume_dist don't care (closed forms
    * of the prefix), but row_number/ntile callers on heavy-tie
    * domains should pre-salt the tie-break or rank a de-duplicated
    * projection. */
  def withRanks(df: DataFrame, valueCol: String, idCol: String,
      nTiles: Int = 10): DataFrame = {
    require(nTiles >= 1, s"nTiles must be >= 1, got $nTiles")
    val s = df.sparkSession
    import s.implicits._
    val w = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("_v")).agg(count(lit(1)).as("_w"))
      .repartitionByRange(col("_v"))
      .withColumn("_pid", spark_partition_id())
      .persist()
    try {
      val totals = w.groupBy("_pid").agg(sum("_w").as("pw"))
        .orderBy("_pid").as[(Int, Long)].collect()
      var acc = 0L
      val offs = totals.map { case (pid, pw) =>
        val o = (pid, acc); acc += pw; o
      }
      val n = acc
      require(n > 0L, "GlobalRank over an empty frame")
      val offDf = broadcast(offs.toSeq.toDF("_pid", "_off"))
      val local = Window.partitionBy("_pid").orderBy("_v")
      // (value, rows strictly before it, peer count) — value-domain
      // sized; checkpointed so the range-partitioned intermediate can
      // be released
      val prefix = w.withColumn("_lcum", sum("_w").over(local))
        .join(offDf, Seq("_pid"))
        .select(col("_v"),
          (col("_lcum") + col("_off") - col("_w")).as("_before"),
          col("_w").as("_peers"))
        .localCheckpoint(true)
      val byId = Window.partitionBy(col(valueCol)).orderBy(col(idCol))
      val rn = col("_before") + row_number().over(byId)
      df.join(prefix, col(valueCol) === col("_v"))
        .withColumn("row_number", rn)
        .withColumn("rank", col("_before") + lit(1L))
        .withColumn("percent_rank",
          if (n > 1L)
            round((col("rank") - 1L).cast("double") / lit((n - 1).toDouble), 6)
          else lit(0.0))
        .withColumn("cume_dist",
          round((col("_before") + col("_peers")).cast("double")
            / lit(n.toDouble), 6))
        .withColumn("ntile", ntileOf(col("row_number"), n, nTiles))
        .drop("_v", "_before", "_peers")
    } finally { w.unpersist(); () }
  }

  /** SQL NTILE(k) from a global row_number: the first n mod k buckets
    * take ⌈n/k⌉ rows, the rest ⌊n/k⌋. n and k are driver constants,
    * so the bucket boundary arithmetic uses exact doubles (n < 2^53)
    * — no long `/` double-division trap. */
  private def ntileOf(rn: Column, n: Long, k: Int): Column = {
    val q = n / k; val rem = n % k
    if (q == 0L) rn.cast("int") // fewer rows than tiles: bucket = position
    else {
      val cut = rem * (q + 1)
      when(rn <= cut, floor((rn - 1L).cast("double") / (q + 1).toDouble) + 1.0)
        .otherwise(floor((rn - cut - 1L).cast("double") / q.toDouble)
          + rem.toDouble + 1.0)
        .cast("int")
    }
  }
}
