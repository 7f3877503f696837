package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver's synthetic parquet tables (TESTDATA.md):
  * TPC-H-ish star schema plus `events` (stream analog), `documents`
  * (text corpus) and `embeddings` (vector corpus).
  *
  * All reads go through `spark.read.parquet` so Catalyst predicate
  * pushdown / column pruning apply; at cluster scale the same call works
  * over a partitioned directory tree unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
