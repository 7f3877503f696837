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
  * **Multi-writer**: commits are optimistic with retry/rebase — the
  * reference runs scan workers at concurrency 2 against Postgres MVCC
  * (`services/api/src/worker.ts:18`), and this matches that contract.
  * A writer claims version `base+1` with an atomic exclusive create
  * (`O_CREAT|O_EXCL` on local FS, server-side exclusive create on
  * HDFS — NOT check-then-rename, which silently overwrites on POSIX
  * rename(2)); on conflict the losing mutation re-reads the new
  * current version, re-applies itself against that snapshot, and
  * re-commits, up to `commitRetries` attempts. No lost updates: every
  * committed manifest extends the version it was rebased onto. On an
  * object store the claim is the seam a conditional PUT replaces.
  * Files staged by a failed attempt are unreferenced and swept by
  * `vacuum`.
  * At 100 TB: manifests list O(buckets × files-per-bucket) lines of
  * driver-side metadata (the Iceberg avro-manifest analog); bucket
  * count is sized so a bucket ≈ a few GB (see [[Warehouse]] scaladoc).
  */
final class TxTable(
    spark: SparkSession,
    val dir: String,
    val schema: StructType,
    val keys: Seq[String],
    val numBuckets: Int = 16,
    val commitRetries: Int = 8) extends TableOps {

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

  private def claimPath(v: Long): Path =
    new Path(manifestDir, f"v$v%020d.claim")

  /** Atomically claim the right to commit version `v`. Exactly one
    * caller (process- or thread-wise) wins: on the local FS this is
    * `File.createNewFile` (`open(O_CREAT|O_EXCL)` — POSIX-atomic,
    * unlike Hadoop's RawLocalFileSystem `create(overwrite = false)`
    * whose exists-check races); on HDFS `create(path, false)` is an
    * atomic server-side exclusive create. On an object store this is
    * the conditional-PUT seam. The claim file outlives the commit (it
    * is what makes the claim durable) and ages out with its manifest
    * in `vacuum`. */
  private def claimVersion(v: Long): Boolean = {
    val claim = claimPath(v)
    val scheme = claim.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val local = new java.io.File(
        if (scheme == null) claim.toString else claim.toUri.getPath)
      try local.createNewFile()
      catch { case _: java.io.IOException => false }
    } else {
      try { fs.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** Count of commit conflicts this instance has hit (diagnostics /
    * tests: proves the optimistic-concurrency path was exercised). */
  def commitConflicts: Long = conflictCounter.get()
  private val conflictCounter = new java.util.concurrent.atomic.AtomicLong

  private def conflict(v: Long, base: Long): Nothing = {
    conflictCounter.incrementAndGet()
    throw new TxTable.CommitConflict(
      s"commit conflict: version $v already claimed (another writer " +
        s"committed after this one read version $base)")
  }

  /** Commit `entries` as version `base + 1`, where `base` is the
    * version the writer READ its state from. Protocol: atomically
    * claim `base + 1` (exclusive create — see [[claimVersion]]), then
    * write the manifest to a tmp name and rename it into place; only
    * the claim winner renames, so the rename can never overwrite a
    * committed manifest. If another writer committed since `base` was
    * read, the claim fails with [[TxTable.CommitConflict]] and the
    * caller rebases (see [[withRetry]]) instead of silently dropping
    * the other writer's commit. */
  private def commit(entries: Seq[(Int, String)], base: Long): Long = {
    val f = fs
    f.mkdirs(new Path(manifestDir))
    val v = base + 1
    val target = manifestPath(v)
    // fast-path reject before burning a claim: someone already won v,
    // or this writer's base is stale by more than one version
    if (f.exists(target) || currentVersion >= v) conflict(v, base)
    if (!claimVersion(v)) conflict(v, base)
    val tmp = new Path(manifestDir, s".tmp-${UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.write(entries.sortBy(_._1)
      .map { case (b, p) => s"$b\t${p.stripPrefix(s"$dataDir/")}" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, target))
      throw new IllegalStateException(s"commit rename failed at version $v")
    v
  }

  /** Run `body` (which must re-read `currentVersion` as its base —
    * every mutation below does) until it commits, rebasing on
    * [[TxTable.CommitConflict]] up to `commitRetries` attempts with
    * jittered backoff. Each retry recomputes the mutation against the
    * NEW current snapshot, so concurrent writers serialize without
    * lost updates. Data files staged by a failed attempt are simply
    * never referenced; `vacuum` sweeps them. */
  private def withRetry[A](body: => A): A = {
    var attempt = 1
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(body)
      catch {
        case e: TxTable.CommitConflict =>
          if (attempt >= math.max(1, commitRetries)) throw e
          attempt += 1
          Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current()
              .nextLong(2L + attempt * 5L))
      }
    }
    out.get
  }

  def createIfAbsent(): Unit =
    if (!exists) {
      // a conflict here means another writer created the table — done
      try commit(Nil, -1L)
      catch { case _: TxTable.CommitConflict => () }
    }

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

  /** S12 — append: new files, manifest = old ∪ new. The staged files
    * don't depend on the base version, so a rebase after a conflict
    * only re-reads the manifest and re-commits — no data rewrite. */
  def append(df: DataFrame): Unit = {
    createIfAbsent()
    val staged = stageFiles(df)
    withRetry {
      val base = currentVersion
      commit(loadManifest(base).entries ++ staged, base)
    }
  }

  /** S9 — insert keys not present (ON CONFLICT DO NOTHING). */
  def insertIfAbsent(df: DataFrame): Unit = {
    createIfAbsent()
    withRetry {
      val base = currentVersion
      val cur = loadManifest(base).entries
      val incoming = df.dropDuplicates(keys)
      val fresh = incoming.join(
        readFiles(cur.map(_._2)).select(keys.map(col): _*), keys, "left_anti")
      commit(cur ++ stageFiles(fresh), base)
    }
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
    withRetry {
      val base = currentVersion
      val cur = loadManifest(base).entries
      val (hit, kept) = cur.partition { case (b, _) => touched(b) }
      val existing = readFiles(hit.map(_._2))
      val merged = existing
        .join(updates.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(updates)
      commit(kept ++ stageFiles(merged), base)
    }
  }

  /** S16 — delete matching rows; rewrites only buckets with matches. */
  def deleteWhere(cond: Column): Unit = {
    if (!exists) return
    val hitCond = coalesce(cond, lit(false))
    withRetry {
      val base = currentVersion
      val cur = loadManifest(base).entries
      val touched = readFiles(cur.map(_._2)).filter(hitCond)
        .select(bucketExpr.as("_kb"))
        .distinct().collect().map(_.getInt(0)).toSet
      if (touched.nonEmpty) {
        val (hit, kept) = cur.partition { case (b, _) => touched(b) }
        val remain = readFiles(hit.map(_._2)).filter(!hitCond)
        commit(kept ++ stageFiles(remain), base)
      }
    }
  }

  /** S17 — truncate: an empty manifest; prior versions stay readable
    * until vacuumed. */
  def truncate(): Unit = {
    createIfAbsent()
    withRetry(commit(Nil, currentVersion))
  }

  /** Rewrite the current version into one file per bucket (small-file
    * compaction; old version remains for time travel). */
  def compact(): Unit = {
    createIfAbsent()
    withRetry {
      val base = currentVersion
      commit(stageFiles(readVersion(base)), base)
    }
  }

  def optimize(): Unit = compact()

  /** Files referenced by the CURRENT version (manifest metadata — no
    * directory listing). */
  def dataFileCount: Int =
    if (!exists) 0 else loadManifest(currentVersion).entries.length

  /** Drop manifests older than the newest `keepVersions` and delete
    * data files no retained manifest references — but NEVER anything
    * younger than `minAgeMs`. Bounds storage; the retention window is
    * the time-travel horizon AND the reader-lifetime contract: a
    * snapshot read pins a *file list*, so a job that holds a plan open
    * longer than `minAgeMs` after its version ages out of
    * `keepVersions` can hit FileNotFound. Size `minAgeMs` above the
    * longest job lifetime (default 7 days, the Delta `retentionHours`
    * analog); tests and aggressive space reclamation pass `0L`
    * explicitly.
    *
    * File identity is compared by MANIFEST-RELATIVE basename, not full
    * path: manifests store bare file names, `dataDir` contains only
    * this table's files, and basename comparison is exact regardless
    * of how `dir` was spelled (relative, `.`/`..`, `file:///`) — a
    * full-path string comparison would silently match nothing and
    * delete live data. Also sweeps aged-out commit claims and orphaned
    * tmp/stage debris from failed attempts. */
  def vacuum(
      keepVersions: Int = 1,
      minAgeMs: Long = TxTable.DefaultVacuumRetentionMs): Unit = {
    val f = fs
    val vs = versions
    if (vs.isEmpty) return
    val now = System.currentTimeMillis()
    def aged(st: org.apache.hadoop.fs.FileStatus): Boolean =
      now - st.getModificationTime >= minAgeMs
    val keep = vs.takeRight(math.max(1, keepVersions))
    // manifests store bare names; stripPrefix inverts exactly what
    // loadManifest prepended, so this is the raw manifest name
    val referenced: Set[String] = keep
      .flatMap(v => loadManifest(v).entries.map(_._2.stripPrefix(s"$dataDir/")))
      .toSet
    if (f.exists(new Path(dataDir)))
      f.listStatus(new Path(dataDir)).foreach { st =>
        if (!referenced(st.getPath.getName) && aged(st))
          f.delete(st.getPath, false)
      }
    val oldestKept = keep.head
    vs.filter(_ < oldestKept).foreach { v =>
      val p = manifestPath(v)
      if (f.exists(p) && aged(f.getFileStatus(p))) {
        f.delete(p, false)
        f.delete(claimPath(v), false) // its claim ages out with it
      }
    }
    // orphaned debris from crashed/failed commit attempts
    f.listStatus(new Path(manifestDir)).foreach { st =>
      if (st.getPath.getName.startsWith(".tmp-") && aged(st))
        f.delete(st.getPath, false)
    }
    f.listStatus(new Path(dir)).foreach { st =>
      if (st.getPath.getName.startsWith(".stage-") && aged(st))
        f.delete(st.getPath, true)
    }
  }
}

object TxTable {
  /** Default vacuum retention: nothing younger than this is ever
    * deleted, protecting live snapshot readers (see [[TxTable.vacuum]]). */
  val DefaultVacuumRetentionMs: Long = 7L * 24 * 60 * 60 * 1000

  /** A writer lost the race for its target version; the mutation is
    * rebased onto the new current version and retried. */
  final class CommitConflict(msg: String) extends RuntimeException(msg)
}
