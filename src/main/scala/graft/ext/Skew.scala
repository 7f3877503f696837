package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §4 / builder scale mandate): salting
  * for hot keys. AQE's skew-join splitting covers joins at runtime;
  * salting covers the aggregation path and deterministic pre-planned
  * layouts.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on
    * (key, salt = hash(fine-grain col) % buckets), then final-aggregate
    * on key. A single hot key spreads over `buckets` reducers in phase
    * one instead of melting a single task. Results are identical to a
    * direct groupBy for decomposable aggregates (sum/count/min/max).
    *
    * `aggs`: (partial expression over input cols, final expression over
    * the partial column, output name). Decimal inputs keep exactness.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      buckets: Int,
      aggs: Seq[(Column, String => Column, String)]): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltSource), lit(buckets)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(aggs.head._1.as(s"_p0"),
        aggs.tail.zipWithIndex.map { case ((p, _, _), i) =>
          p.as(s"_p${i + 1}")
        }: _*)
    partial
      .groupBy(col("_key"))
      .agg(aggs.head._2(s"_p0").as(aggs.head._3),
        aggs.tail.zipWithIndex.map { case ((_, f, n), i) =>
          f(s"_p${i + 1}").as(n)
        }: _*)
      .withColumnRenamed("_key", "key")
  }
}
