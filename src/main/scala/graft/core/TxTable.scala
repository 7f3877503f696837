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
  * reference runs its scan workers at concurrency 2 and its merge
  * (table-mutating) worker at concurrency 1 against Postgres MVCC
  * (`services/api/src/worker.ts:18,26`); this protocol admits both.
  * A writer claims version `base+1` with an atomic exclusive create
  * (`O_CREAT|O_EXCL` on local FS, server-side exclusive create on
  * HDFS — NOT check-then-rename, which silently overwrites on POSIX
  * rename(2)); on conflict the losing mutation re-reads the new
  * current version, re-applies itself against that snapshot, and
  * re-commits, with capped-exponential backoff until `commitBudgetMs`
  * elapses. No lost updates: every committed manifest extends the
  * version it was rebased onto. On an object store the claim is the
  * seam a conditional PUT replaces.
  *
  * **Crash recovery**: the claim is a short-lived lock marker, deleted
  * after the manifest rename lands. A winner that dies mid-commit
  * leaves an orphan claim; any later writer that loses the claim while
  * the claimed manifest is absent AND the claim is older than
  * `claimStalenessMs` sweeps the orphan and retakes the version, so a
  * crash never wedges the table. If the presumed-dead winner was
  * merely stalled (GC pause longer than the staleness window) and
  * wakes after its claim was retaken, its manifest rename fails
  * against the thief's committed manifest and it rebases — the race
  * stays lost-update-free because the manifest rename, not the claim,
  * is the commit point.
  *
  * Data files are staged OUTSIDE `data/` and moved in only after the
  * claim is won (see [[stageFiles]]), so `vacuum` can never observe an
  * uncommitted file in `data/` outside a claim-held window bounded by
  * one commit's duration. Files staged by a failed attempt are
  * unreferenced and deleted by the mutation itself or swept by
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
    val commitBudgetMs: Long = TxTable.DefaultCommitBudgetMs,
    val claimStalenessMs: Long = TxTable.DefaultClaimStalenessMs) extends TableOps {

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
    * the conditional-PUT seam. The claim is a short-lived lock marker:
    * the winner deletes it once the manifest rename lands, so a claim
    * that persists is either an in-flight commit or a crashed one
    * (see [[acquireClaim]] for how the latter is swept). */
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

  /** [[claimVersion]] plus crash recovery: losing the claim while the
    * claimed version's MANIFEST is absent means either a commit is in
    * flight (claim younger than `claimStalenessMs` → back off, the
    * caller conflicts and rebases) or the claimant died mid-commit
    * (claim stale → delete the orphan and take the claim ourselves).
    * Without this sweep an orphaned claim at `currentVersion + 1`
    * would make every future writer lose the claim forever — a
    * permanently wedged table. Size `claimStalenessMs` above the
    * longest plausible commit stall (manifest write + rename + one GC
    * pause); a stalled-not-dead winner that loses its claim to the
    * sweep still cannot lose data — its manifest rename fails and it
    * rebases. */
  private def acquireClaim(v: Long): Boolean = {
    if (claimVersion(v)) return true
    if (fs.exists(manifestPath(v))) return false // v genuinely taken
    val st =
      try Some(fs.getFileStatus(claimPath(v)))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None =>
        // claim vanished between our attempts (winner committed and
        // cleaned, or an orphan was swept) — one more try
        claimVersion(v)
      case Some(s)
          if System.currentTimeMillis() - s.getModificationTime >= claimStalenessMs =>
        fs.delete(claimPath(v), false) // orphan of a crashed winner
        claimVersion(v)
      case _ => false // live commit in flight
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
    * claim `base + 1` (exclusive create + orphan sweep — see
    * [[acquireClaim]]), move any still-staged entry into `data/`
    * (uncommitted files are thus visible there only inside this
    * claim-held window), then write the manifest to a tmp name and
    * RENAME it into place — the rename, not the claim, is the commit
    * point. If another writer committed since `base` was read, the
    * claim (or, after a stolen stale claim, the rename) fails with
    * [[TxTable.CommitConflict]]; moved files are moved back to their
    * stage paths and the caller rebases (see [[withRetry]]) instead
    * of silently dropping the other writer's commit. */
  private def commit(entries: Seq[(Int, String)], base: Long): Long = {
    val f = fs
    f.mkdirs(new Path(manifestDir))
    val v = base + 1
    val target = manifestPath(v)
    // fast-path reject before burning a claim: someone already won v,
    // or this writer's base is stale by more than one version
    if (f.exists(target) || currentVersion >= v) conflict(v, base)
    if (!acquireClaim(v)) conflict(v, base)
    f.mkdirs(new Path(dataDir))
    val moved = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    def rollbackMoves(): Unit =
      moved.reverseIterator.foreach { case (from, to) => f.rename(to, from) }
    def releaseClaim(): Unit = f.delete(claimPath(v), false)
    val finalEntries =
      try entries.map { case (b, p) =>
        if (p.startsWith(s"$dataDir/")) (b, p)
        else {
          val to = new Path(dataDir, s"${UUID.randomUUID()}.parquet")
          if (!f.rename(new Path(p), to))
            throw new IllegalStateException(s"stage move failed: $p")
          moved += ((new Path(p), to))
          (b, s"$dataDir/${to.getName}")
        }
      }
      catch { case e: Throwable => rollbackMoves(); releaseClaim(); throw e }
    val tmp = new Path(manifestDir, s".tmp-${UUID.randomUUID().toString.take(8)}")
    try {
      val out = f.create(tmp, false)
      try out.write(finalEntries.sortBy(_._1)
        .map { case (b, p) => s"$b\t${p.stripPrefix(s"$dataDir/")}" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    } catch { case e: Throwable => rollbackMoves(); releaseClaim(); throw e }
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      rollbackMoves()
      if (f.exists(target)) {
        // this writer stalled past claimStalenessMs, its claim was
        // retaken, and the thief committed v first — rebase
        conflict(v, base)
      }
      releaseClaim()
      throw new IllegalStateException(s"commit rename failed at version $v")
    }
    releaseClaim() // the claim's job ends at the committed manifest
    v
  }

  /** Run `body` (which must re-read `currentVersion` as its base —
    * every mutation below does) until it commits, rebasing on
    * [[TxTable.CommitConflict]] with capped exponential backoff until
    * `commitBudgetMs` has elapsed (a TIME budget, not an attempt
    * count: a fixed small attempt count with millisecond sleeps would
    * make a healthy loser give up while a slow winner's manifest
    * write is still in flight). Each retry recomputes the mutation
    * against the NEW current snapshot, so concurrent writers
    * serialize without lost updates. Data files staged by a failed
    * attempt are simply never referenced; the mutation deletes its
    * stage on exit and `vacuum` sweeps any crash leftovers. */
  private def withRetry[A](body: => A): A = {
    val deadline = System.currentTimeMillis() + math.max(0L, commitBudgetMs)
    var attempt = 0
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(body)
      catch {
        case e: TxTable.CommitConflict =>
          if (System.currentTimeMillis() >= deadline) throw e
          attempt += 1
          val cap = math.min(250L, 4L << math.min(attempt, 6))
          Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(1L, cap + 1))
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

  /** Write `df` bucketed into fresh immutable files under a private
    * `.stage-*` directory — NOT `data/`: uncommitted bytes must never
    * be visible where `vacuum` deletes unreferenced files, or a
    * `vacuum(minAgeMs = 0)` racing an in-flight writer would delete
    * its staged files before the commit references them. [[commit]]
    * moves the files into `data/` only after the version claim is
    * won. Returns the manifest entries (stage paths) and the stage
    * dir, which the caller deletes when the mutation ends. One file
    * per non-empty bucket. */
  private def stageFiles(df: DataFrame): (Seq[(Int, String)], Path) = {
    val f = fs
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
          .map(file => (b, file.getPath.toString))
      }
    (entries, stage)
  }

  /** Stage `df`, commit `keep ∪ staged` on top of `base`, and delete
    * the stage dir whether or not the commit succeeded (a failed
    * mutation's data is garbage; the table state is untouched). */
  private def stageAndCommit(
      keep: Seq[(Int, String)], df: DataFrame, base: Long): Long = {
    val (staged, stage) = stageFiles(df)
    try commit(keep ++ staged, base)
    finally fs.delete(stage, true)
  }

  /** S12 — append: new files, manifest = old ∪ new. The staged files
    * don't depend on the base version, so a rebase after a conflict
    * only re-reads the manifest and re-commits — no data rewrite
    * (commit's post-conflict rollback returns them to the stage). */
  def append(df: DataFrame): Unit = {
    createIfAbsent()
    val (staged, stage) = stageFiles(df)
    try withRetry {
      val base = currentVersion
      commit(loadManifest(base).entries ++ staged, base)
    } finally fs.delete(stage, true)
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
      stageAndCommit(cur, fresh, base)
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
      stageAndCommit(kept, merged, base)
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
        stageAndCommit(kept, remain, base)
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
      stageAndCommit(Nil, readVersion(base), base)
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
    * analog). With CONCURRENT WRITERS it must also exceed the longest
    * in-flight commit: uncommitted files appear in `data/` only
    * inside a claim-held commit window (staging is outside `data/` —
    * see [[stageFiles]]), but a `vacuum(minAgeMs = 0)` landing inside
    * that window could still delete a just-moved file before its
    * manifest lands. Tests pass `0L` explicitly and only
    * single-writer.
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
      if (f.exists(p) && aged(f.getFileStatus(p))) f.delete(p, false)
    }
    // orphaned debris from crashed/failed commit attempts. A claim is
    // garbage once its manifest exists (crash between rename and
    // claim-delete); a manifest-less claim is a crashed winner, but
    // only past the staleness window — younger ones are in-flight
    // commits (acquireClaim sweeps these on demand too).
    f.listStatus(new Path(manifestDir)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".tmp-") && aged(st)) f.delete(st.getPath, false)
      else if (n.endsWith(".claim")) {
        val v = n.stripPrefix("v").stripSuffix(".claim").toLong
        val committed = f.exists(manifestPath(v))
        val age = now - st.getModificationTime
        if ((committed && aged(st)) ||
            (!committed && age >= math.max(minAgeMs, claimStalenessMs)))
          f.delete(st.getPath, false)
      }
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

  /** Default total time a conflicting writer keeps rebasing before
    * giving up with [[CommitConflict]] (see [[TxTable.withRetry]]). */
  val DefaultCommitBudgetMs: Long = 30L * 1000

  /** Default age past which a manifest-less claim is presumed the
    * orphan of a crashed writer and swept (see [[TxTable.acquireClaim]]).
    * Must exceed a commit's manifest write + rename plus the longest
    * plausible stall (GC pause, FS hiccup). */
  val DefaultClaimStalenessMs: Long = 10L * 60 * 1000

  /** A writer lost the race for its target version; the mutation is
    * rebased onto the new current version and retried. */
  final class CommitConflict(msg: String) extends RuntimeException(msg)
}
