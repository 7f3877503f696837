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
    // value census, range-partitioned by value, materialized ONCE:
    // every downstream consumer (the local cumsum, the per-partition
    // totals, the grand total) reads the cached blocks. Replaces the
    // persist + driver collect + second checkpoint shape — one
    // materialization job instead of two plus a driver round trip
    // (r21; the offsets now ride a window over the per-partition
    // totals, and n became a column with the identical IEEE ops).
    val w = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("_v")).agg(count(lit(1)).as("_w"))
      .repartitionByRange(col("_v"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    require(!w.isEmpty, "GlobalRank over an empty frame")
    // prefix offsets from the ≤ one-row-per-partition totals —
    // control-plane sized: the totals fold into ONE row
    // (pid-sorted array) and a running-sum lambda emits each
    // partition's offset — exactly the fold the driver collect used
    // to do, now inside the plan (no driver action, no window; the
    // array is bounded by the shuffle-partition count).
    val packed = totalsOf(w)
      .agg(array_sort(collect_list(struct(col("_pid"), col("_pw"))))
        .as("_ts"))
    val offs = packed
      .select(explode(expr(
        """aggregate(_ts,
          |  struct(cast(0 as bigint) as acc,
          |         cast(array() as array<struct<_pid: int, _off: bigint>>) as out),
          |  (s, x) -> struct(s.acc + x._pw as acc,
          |    array_append(s.out, struct(x._pid as _pid, s.acc as _off)) as out),
          |  s -> s.out)""".stripMargin)).as("_o"),
        expr("aggregate(_ts, cast(0 as bigint), (s, x) -> s + x._pw)")
          .as("_n"))
      .select(col("_o._pid").as("_pid"), col("_o._off").as("_off"),
        col("_n"))
      .withColumn("_q", expr(s"_n div $nTiles"))
      .withColumn("_rem", expr(s"_n % $nTiles"))
    val local = Window.partitionBy("_pid").orderBy("_v")
    val prefix = w.withColumn("_lcum", sum("_w").over(local))
      .join(broadcast(offs), Seq("_pid"))
      .select(col("_v"),
        (col("_lcum") + col("_off") - col("_w")).as("_before"),
        col("_w").as("_peers"), col("_n"), col("_q"), col("_rem"))
    val byId = Window.partitionBy(col(valueCol)).orderBy(col(idCol))
    val rn = col("_before") + row_number().over(byId)
    val nD = col("_n").cast("double")
    df.join(prefix, col(valueCol) === col("_v"))
      .withColumn("row_number", rn)
      .withColumn("rank", col("_before") + lit(1L))
      .withColumn("percent_rank",
        when(col("_n") > 1L,
          round((col("rank") - 1L).cast("double") / (nD - lit(1.0)), 6))
          .otherwise(lit(0.0)))
      .withColumn("cume_dist",
        round((col("_before") + col("_peers")).cast("double") / nD, 6))
      .withColumn("ntile",
        ntileOf(col("row_number"), col("_q"), col("_rem")))
      .drop("_v", "_before", "_peers", "_n", "_q", "_rem")
  }

  private def totalsOf(w: DataFrame): DataFrame =
    w.groupBy("_pid").agg(sum("_w").as("_pw"))

  /** SQL NTILE(k) from a global row_number: the first n mod k buckets
    * take ⌈n/k⌉ rows, the rest ⌊n/k⌋. q = n div k and rem = n mod k
    * arrive as exact integer columns; the bucket boundary arithmetic
    * uses exact doubles (n < 2^53) — no long `/` double-division
    * trap. Same ops as the former driver-constant form, literal →
    * column. */
  private def ntileOf(rn: Column, q: Column, rem: Column): Column = {
    val cut = rem * (q + lit(1L))
    when(q === 0L, rn.cast("int")) // fewer rows than tiles: bucket = position
      .otherwise(
        when(rn <= cut,
          floor((rn - 1L).cast("double") / (q + lit(1L)).cast("double"))
            + lit(1.0))
          .otherwise(floor((rn - cut - 1L).cast("double") / q.cast("double"))
            + rem.cast("double") + lit(1.0))
          .cast("int"))
  }
}
