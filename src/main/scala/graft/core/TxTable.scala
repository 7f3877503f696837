package graft.core

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Transactional parquet table — the Delta/Iceberg seam of
  * `core.Table` made real with nothing but parquet + one atomic file
  * rename (the public table-format recipe: immutable data files, a
  * versioned manifest as the commit point).
  *
  * Layout:
  * {{{
  *   <dir>/data/<uuid>.parquet        immutable data files
  *   <dir>/_manifests/v<000…N>.tsv    one manifest per committed version
  * }}}
  *
  * A manifest lists `(bucket, file)` pairs; the table state at version
  * N is exactly the files named by manifest N. A commit writes the new
  * manifest to a temp name and RENAMES it into place — a single-file
  * rename, atomic on HDFS/POSIX (on S3 this is where a conditional PUT
  * slots in). Consequences, versus the directory-swap protocol of
  * [[Table]]:
  *
  *  - **Snapshot isolation**: readers plan against the file list of the
  *    version current at read time; later commits add files and a new
  *    manifest but never touch listed files, so an in-flight job keeps
  *    reading its snapshot — the read-after-swap hazard class is gone
  *    structurally (no `localCheckpoint` defensiveness needed).
  *  - **Time travel**: `readVersion(n)` re-reads any un-vacuumed state.
  *  - **Bucket pruning without a bucket column**: the manifest tags each
  *    file with its key-hash bucket, so `upsert`/`deleteWhere` pick the
  *    files to rewrite DRIVER-side from manifest metadata and the new
  *    commit re-links every untouched file as-is. A 1-row update writes
  *    one bucket's worth of new data and one small manifest.
  *  - **O(1) commit cost in table size**: no renames of data
  *    directories, no whole-table rewrite; `vacuum` garbage-collects
  *    files unreferenced by retained versions, `compact` rewrites a
  *    version into one file per bucket.
  *
  * Single-writer, like the reference (merge concurrency 1,
  * `worker.ts:26`); multi-writer needs a CAS on the manifest name —
  * the documented seam for a lock service / conditional PUT.
  * At 100 TB: manifests list O(buckets × files-per-bucket) lines of
  * driver-side metadata (the Iceberg avro-manifest analog); bucket
  * count is sized so a bucket ≈ a few GB (see [[Warehouse]] scaladoc).
  */
final class TxTable(
    spark: SparkSession,
    val dir: String,
    val schema: StructType,
    val keys: Seq[String],
    val numBuckets: Int = 16) extends TableOps {

  require(keys.nonEmpty, "TxTable requires key columns")
  require(numBuckets > 0, "TxTable requires numBuckets > 0")

  private val dataDir = s"$dir/data"
  private val manifestDir = s"$dir/_manifests"

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketExpr: Column =
    pmod(hash(keys.map(col): _*), lit(numBuckets)).cast(IntegerType)

  // ---- manifests ----

  /** (bucket, absolute file path) pairs of one committed version. */
  private case class Manifest(version: Long, entries: Seq[(Int, String)])

  private def manifestPath(v: Long): Path =
    new Path(manifestDir, f"v$v%020d.tsv")

  def exists: Boolean = fs.exists(new Path(manifestDir))

  def versions: Seq[Long] =
    if (!exists) Nil
    else fs.listStatus(new Path(manifestDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".tsv"))
      .map(n => n.stripPrefix("v").stripSuffix(".tsv").toLong)
      .sorted

  def currentVersion: Long = versions.lastOption.getOrElse(-1L)

  private def loadManifest(v: Long): Manifest = {
    val in = fs.open(manifestPath(v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val entries = text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val Array(b, f) = line.split("\t", 2)
      (b.toInt, s"$dataDir/$f")
    }
    Manifest(v, entries)
  }

  /** Commit `entries` as version `base + 1`, where `base` is the
    * version the writer READ its state from: write tmp manifest,
    * fsync-close, check no one has claimed `base + 1`, rename into
    * place. Optimistic concurrency: if another writer committed since
    * `base` was read, the version check fails and the caller's work is
    * rejected instead of silently dropping the other writer's commit
    * (lost update). The exists-check + rename pair is the seam a real
    * object-store deployment replaces with one conditional PUT. */
  private def commit(entries: Seq[(Int, String)], base: Long): Long = {
    val f = fs
    f.mkdirs(new Path(manifestDir))
    val v = base + 1
    val tmp = new Path(manifestDir, s".tmp-${UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.write(entries.sortBy(_._1)
      .map { case (b, p) => s"$b\t${p.stripPrefix(s"$dataDir/")}" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(v)
    if (f.exists(target)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"commit conflict: version $v already exists (another writer " +
          s"committed after this one read version $base)")
    }
    if (!f.rename(tmp, target))
      throw new IllegalStateException(s"commit rename failed at version $v")
    v
  }

  def createIfAbsent(): Unit = if (!exists) commit(Nil, -1L)

  // ---- reads ----

  private def emptyDf: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def readFiles(files: Seq[String]): DataFrame =
    if (files.isEmpty) emptyDf
    else spark.read.schema(schema).parquet(files: _*)

  /** Snapshot read of the current version: the plan pins this
    * version's file list, so later commits never disturb it. */
  def read: DataFrame = readVersion(currentVersion)

  /** Time travel to any retained version. */
  def readVersion(v: Long): DataFrame =
    if (v < 0) emptyDf else readFiles(loadManifest(v).entries.map(_._2))

  def count(): Long = read.count()

  /** Point lookup via MANIFEST pruning: the key's bucket is computed
    * driver-side with the same Murmur3 (seed 42) Spark's `hash()`
    * uses, and only that bucket's files are planned — metadata-level
    * data skipping, no directory listing of the other buckets. */
  def lookup(values: Seq[Any]): DataFrame = {
    require(values.length == keys.length, s"expected ${keys.length} key values")
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val lits = keys.zip(values).map { case (k, v) =>
      Literal.create(v, schema(k).dataType)
    }
    val b = math.floorMod(
      Murmur3Hash(lits, 42).eval(null).asInstanceOf[Int], numBuckets)
    val files =
      if (!exists) Nil
      else loadManifest(currentVersion).entries
        .filter(_._1 == b).map(_._2)
    val keyPred = keys.zip(values).map { case (k, v) =>
      col(k) === lit(v).cast(schema(k).dataType)
    }.reduce(_ && _)
    readFiles(files).filter(keyPred)
  }

  // ---- writes ----

  /** Write `df` bucketed into fresh immutable data files; returns their
    * manifest entries. One file per non-empty bucket. */
  private def stageFiles(df: DataFrame): Seq[(Int, String)] = {
    val f = fs
    f.mkdirs(new Path(dataDir))
    val stage = new Path(dir, s".stage-${UUID.randomUUID().toString.take(8)}")
    df.select(schema.fields.map(fl => col(fl.name).cast(fl.dataType)): _*)
      .withColumn("_kb", bucketExpr)
      .repartition(col("_kb"))
      .write.mode(SaveMode.Overwrite).partitionBy("_kb").parquet(stage.toString)
    val entries = f.listStatus(stage).toSeq
      .filter(_.getPath.getName.startsWith("_kb="))
      .flatMap { d =>
        val b = d.getPath.getName.stripPrefix("_kb=").toInt
        f.listStatus(d.getPath).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map { file =>
            val name = s"${UUID.randomUUID()}.parquet"
            if (!f.rename(file.getPath, new Path(dataDir, name)))
              throw new IllegalStateException(s"stage move failed: $file")
            (b, s"$dataDir/$name")
          }
      }
    f.delete(stage, true)
    entries
  }

  /** S12 — append: new files, manifest = old ∪ new. */
  def append(df: DataFrame): Unit = {
    createIfAbsent()
    val base = currentVersion
    commit(loadManifest(base).entries ++ stageFiles(df), base)
  }

  /** S9 — insert keys not present (ON CONFLICT DO NOTHING). */
  def insertIfAbsent(df: DataFrame): Unit = {
    createIfAbsent()
    val base = currentVersion
    val cur = loadManifest(base).entries
    val incoming = df.dropDuplicates(keys)
    val fresh = incoming.join(
      readFiles(cur.map(_._2)).select(keys.map(col): _*), keys, "left_anti")
    commit(cur ++ stageFiles(fresh), base)
  }

  /** S10/S13 — MERGE, last-writer-wins per key. Only files of buckets
    * containing updated keys are rewritten; every other file is
    * re-linked into the new manifest untouched. */
  def upsert(df: DataFrame): Unit = {
    createIfAbsent()
    // no localCheckpoint needed: even if `df` derives from this table,
    // its plan pins the files of the snapshot it was read from, which
    // a commit never mutates (only vacuum deletes files)
    val updates = df
      .select(schema.fields.map(fl => col(fl.name).cast(fl.dataType)): _*)
      .dropDuplicates(keys)
    val touched = updates.select(bucketExpr.as("_kb")).distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return
    val base = currentVersion
    val cur = loadManifest(base).entries
    val (hit, kept) = cur.partition { case (b, _) => touched(b) }
    val existing = readFiles(hit.map(_._2))
    val merged = existing
      .join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
    commit(kept ++ stageFiles(merged), base)
  }

  /** S16 — delete matching rows; rewrites only buckets with matches. */
  def deleteWhere(cond: Column): Unit = {
    if (!exists) return
    val base = currentVersion
    val cur = loadManifest(base).entries
    val hitCond = coalesce(cond, lit(false))
    val touched = readFiles(cur.map(_._2)).filter(hitCond)
      .select(bucketExpr.as("_kb"))
      .distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return
    val (hit, kept) = cur.partition { case (b, _) => touched(b) }
    val remain = readFiles(hit.map(_._2)).filter(!hitCond)
    commit(kept ++ stageFiles(remain), base)
  }

  /** S17 — truncate: an empty manifest; prior versions stay readable
    * until vacuumed. */
  def truncate(): Unit = {
    createIfAbsent()
    commit(Nil, currentVersion)
  }

  /** Rewrite the current version into one file per bucket (small-file
    * compaction; old version remains for time travel). */
  def compact(): Unit = {
    createIfAbsent()
    val base = currentVersion
    commit(stageFiles(readVersion(base)), base)
  }

  def optimize(): Unit = compact()

  /** Files referenced by the CURRENT version (manifest metadata — no
    * directory listing). */
  def dataFileCount: Int =
    if (!exists) 0 else loadManifest(currentVersion).entries.length

  /** Drop manifests older than the newest `keepVersions` and delete
    * data files no retained manifest references. Bounds storage; the
    * retention window is the time-travel horizon. */
  def vacuum(keepVersions: Int = 1): Unit = {
    val f = fs
    val vs = versions
    if (vs.isEmpty) return
    val keep = vs.takeRight(math.max(1, keepVersions))
    val referenced = keep.flatMap(v => loadManifest(v).entries.map(_._2)).toSet
    if (f.exists(new Path(dataDir)))
      f.listStatus(new Path(dataDir)).foreach { st =>
        if (!referenced(st.getPath.toUri.getPath) &&
            !referenced(st.getPath.toString))
          f.delete(st.getPath, false)
      }
    vs.dropRight(math.max(1, keepVersions))
      .foreach(v => f.delete(manifestPath(v), false))
  }
}
