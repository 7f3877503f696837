package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval / range join — the second operator family Spark lacks a
  * native strategy for (guide §custom-operator). A naive
  * `a.join(b, |a.t − b.t| <= tol)` plans BroadcastNestedLoopJoin:
  * O(n·m) comparisons, a non-starter at scale. The bucketized pattern
  * instead: quantize time into `tol`-wide buckets, explode each LEFT
  * row into its bucket and the two adjacent ones, equi-join on
  * (key, bucket) — any pair within `tol` differs by at most one
  * bucket, so exactly one probe hits — then filter the exact
  * predicate. Shuffle on (key, bucket); candidate set ≈ 3 × bucket
  * occupancy; no duplicate pairs by construction.
  */
object RangeJoin {

  /** Pairs of (left, right) rows with the same `keyCol` whose
    * `timeCol`s differ by at most `tolMicros`. Output columns are
    * prefixed `l_` / `r_`. */
  def withinInterval(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, tolMicros: Long): DataFrame = {
    def prefixed(df: DataFrame, prefix: String): DataFrame =
      df.columns.foldLeft(df)((acc, c) => acc.withColumnRenamed(c, s"$prefix$c"))

    val l = prefixed(left, "l_")
      .withColumn("l_us", unix_micros(col(s"l_$timeCol")))
      .withColumn("_bucket", explode(array(Seq(-1, 0, 1).map(p =>
        expr(s"l_us div $tolMicros + $p")): _*)))
      .withColumn("_key", col(s"l_$keyCol"))
    val r = prefixed(right, "r_")
      .withColumn("r_us", unix_micros(col(s"r_$timeCol")))
      .withColumn("_bucket", expr(s"r_us div $tolMicros"))
      .withColumn("_key", col(s"r_$keyCol"))

    l.join(r, Seq("_key", "_bucket"))
      .filter(abs(col("l_us") - col("r_us")) <= tolMicros)
      .drop("_key", "_bucket", "l_us", "r_us")
  }
}
