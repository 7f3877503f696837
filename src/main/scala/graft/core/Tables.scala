package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Memoized analyzed plans per (session, dir, table): the base
    * corpus tables are immutable inputs, but a bare-path
    * `spark.read.parquet` re-lists the directory and re-reads footer
    * schemas on EVERY call — pure per-query planning overhead that a
    * catalog-backed deployment never pays (the metastore carries the
    * schema). Reusing the DataFrame reuses its relation (and its
    * cached file index); nothing about execution changes — every
    * action still scans the parquet. Keyed by session so a stopped
    * session's plans are never served to a new one. */
  private val loaded = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long, Long), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // (length, mtime) in the key: a rewritten fixture can never be
    // served a stale file index (same discipline as buildOnce)
    val f = new java.io.File(path)
    loaded.computeIfAbsent((spark, path, f.length(), f.lastModified()),
      _ => normalize(spark.read.parquet(path)))
  }

  /** Timestamp normalization every corpus read shares (the SQL table
    * functions load raw paths through this too, so their results stay
    * comparable with the catalog queries' loads):
    * Spark has no TIMESTAMP(NANOS) type; with
    * spark.sql.legacy.parquet.nanosAsLong=true (set by our sessions)
    * nanos columns surface as LongType nanos-since-epoch. Convert to a
    * proper timestamp (integer division — double math would lose
    * precision above 2^53). */
  def normalize(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // Parquet written with isAdjustedToUTC=false surfaces as
      // TIMESTAMP_NTZ (a driver-side testdata refresh flipped this in
      // round 9, silently dropping the unix_micros-based queries from
      // the correctness file). Sessions pin the TZ to UTC, so the cast
      // preserves every wall-clock value while restoring the plain
      // TIMESTAMP type the whole catalog is written against.
      else if (f.dataType == TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast(TimestampType))
      else acc
    }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
