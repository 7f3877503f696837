package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE FUNCTIONS for the extension operators — the `spark.sql`
  * user's door into the engine surfaces that aren't relational
  * compositions (ranked retrieval, vector search, funnels):
  *
  * {{{
  * SELECT * FROM graft_bm25('/idx/dir', 'spark table vector', 10)
  * SELECT * FROM graft_knn('/data/embeddings.parquet',
  *                         'vec_id', 'embedding', 0, 20)
  * SELECT * FROM graft_funnel('/data/events.parquet',
  *                            'view:0,click:24,purchase:24')
  * }}}
  *
  * Registered through `SparkSessionExtensions.injectTableFunction`
  * (loaded by [[GraftExtensions]]), so the functions exist in every
  * session the engine builds — pure SQL text reaches them, no Scala.
  * Arguments must be literals (they parameterize the PLAN the builder
  * returns: index directory, query terms, k). The returned plan is the
  * same one the Scala entry points build — `graft_bm25` serves from
  * the persisted postings index without reading text, `graft_knn` is
  * the broadcast-query brute-force cosine (exact baseline), and
  * `graft_funnel` is the one-shuffle ordered fold — so SQL pays
  * exactly the Scala path's cost, never a degraded re-implementation.
  */
object GraftTableFunctions {

  private def evalArg(exprs: Seq[Expression], i: Int, what: String): Any = {
    require(i < exprs.length, s"missing argument ${i + 1} ($what)")
    val e = exprs(i)
    require(e.foldable, s"argument ${i + 1} ($what) must be a literal")
    val v = e.eval(null)
    require(v != null, s"argument ${i + 1} ($what) must not be null")
    v
  }

  private def str(exprs: Seq[Expression], i: Int, what: String): String =
    evalArg(exprs, i, what) match {
      case u: UTF8String => u.toString
      case s: String     => s
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} ($what) must be a string, got $other")
    }

  private def int(exprs: Seq[Expression], i: Int, what: String): Int =
    evalArg(exprs, i, what) match {
      case n: Int   => n
      case n: Long  => n.toInt
      case n: Short => n.toInt
      case n: Byte  => n.toInt
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} ($what) must be an integer, got $other")
    }

  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** Data-reading TVFs accept BOTH raw parquet paths and graft table
    * directories: a table dir (detected by `_manifests`) loads
    * through the provider — snapshot-pinned, zone-map-pruned,
    * DV-masked — so "run a funnel over the transactional events
    * table" is one SQL call, not an export. */
  private def loadAny(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path, "_manifests")
    val isTable = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(p)
    graft.core.Tables.normalize(
      if (isTable) spark.read.format("graft").load(path)
      else spark.read.parquet(path))
  }

  /** `graft_bm25(indexDir, query, k [, idCol])` — BM25 top-k from a
    * persisted [[graft.ext.TextIndex]] postings index (text never
    * read; scores identical to the Scala entry point). */
  private def bm25(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "index directory")
    val terms = str(exprs, 1, "query").toLowerCase
      .split("\\s+").filter(_.nonEmpty).toSeq
    val k = int(exprs, 2, "k")
    val idCol = if (exprs.length > 3) str(exprs, 3, "id column") else "doc_id"
    plan(graft.ext.TextIndex.bm25Search(spark, dir, idCol, terms, k))
  }

  /** `graft_knn(parquetPath, idCol, embCol, queryId, k)` — exact
    * brute-force cosine top-k against the row whose `idCol` equals
    * `queryId`: query vector broadcast, per-row double dot product,
    * score rounded to 6 dp (cross-engine determinism), top-k via
    * TakeOrdered. Output = the table's columns minus the embedding,
    * plus `score`. */
  private def knn(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val path = str(exprs, 0, "parquet path")
    val idCol = str(exprs, 1, "id column")
    val embCol = str(exprs, 2, "embedding column")
    val queryId = evalArg(exprs, 3, "query id") match {
      case n: Int => n.toLong
      case n: Long => n
      case other => throw new IllegalArgumentException(
        s"query id must be integral, got $other")
    }
    val k = int(exprs, 4, "k")
    val emb = loadAny(spark, path)
      .withColumn("_e", col(embCol).cast("array<double>"))
    val q = emb.filter(col(idCol) === queryId)
      .select(col("_e").as("_qe"))
    val out = emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("_dot", expr(
        "aggregate(zip_with(_e, _qe, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
      .withColumn("_na", sqrt(expr(
        "aggregate(_e, 0D, (acc, x) -> acc + x * x)")))
      .withColumn("_nq", sqrt(expr(
        "aggregate(_qe, 0D, (acc, x) -> acc + x * x)")))
      .withColumn("score", round(col("_dot") / (col("_na") * col("_nq")), 6))
      .drop("_e", "_qe", "_dot", "_na", "_nq", embCol)
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
    plan(out)
  }

  /** `graft_funnel(parquetPath, 'type:windowHours,...')` — the
    * one-row conversion funnel ([[graft.ext.Funnel.fold]]; ONE shuffle
    * on user, ordered sequential fold) over an events parquet with
    * (user_id, ts, event_type) columns. The first step's window is
    * ignored (entry may fire at any time). */
  private def funnel(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val path = str(exprs, 0, "parquet path")
    val stepsSpec = str(exprs, 1, "steps")
    val steps = stepsSpec.split(",").map(_.trim).filter(_.nonEmpty).map { s =>
      s.split(":") match {
        case Array(t, w) => graft.ext.Funnel.Step(t.trim, w.trim.toInt, t.trim)
        case Array(t)    => graft.ext.Funnel.Step(t.trim, 24, t.trim)
        case _ => throw new IllegalArgumentException(
          s"bad step '$s' - want 'type:windowHours'")
      }
    }.toSeq
    val events = loadAny(spark, path)
    plan(graft.ext.Funnel.fold(events,
      col("user_id"), col("ts"), col("event_type"), steps))
  }

  /** `graft_history(tableDir)` — the DESCRIBE HISTORY analog as a
    * table function: version, commit time, live file count, added/
    * removed file deltas, meta keys, straight from
    * [[graft.core.TxTable.history]] (retained manifests only, no
    * data I/O). */
  private def history(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "table directory")
    val tx = graft.core.TxTable.openReadOnly(spark, dir)
    plan(tx.history)
  }

  /** `graft_files(tableDir)` — the live file inventory of the current
    * snapshot (path, bucket, live rows, tombstoned rows): manifest
    * metadata only, the ops view behind "how fragmented is this
    * table / how many rows are DV-masked?". */
  private def files(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "table directory")
    val tx = graft.core.TxTable.openReadOnly(spark, dir)
    val s = tx.currentSchema
    import spark.implicits._
    val rows = tx.currentFileInfo.map { f =>
      val live = graft.core.FileStats.fromJson(f.statsJson, s)
        .map(_.rows - f.dvRows)
      (f.path.substring(f.path.lastIndexOf('/') + 1), f.bucket,
        live.getOrElse(-1L), f.dvRows)
    }
    plan(rows.toDF("file", "bucket", "live_rows", "dv_rows")
      .orderBy("bucket", "file"))
  }

  /** `graft_changes(tableDir, fromVersion, toVersion)` — the
    * row-level CDC diff between two retained versions as SQL text
    * (`TxTable.changes`: inserts, update pre/post images, deletes,
    * each tagged `_change_type`). */
  private def changes(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "table directory")
    val fromV = int(exprs, 1, "from version").toLong
    val toV = int(exprs, 2, "to version").toLong
    val tx = graft.core.TxTable.openReadOnly(spark, dir,
      requireDescriptor = true) // the CDC diff needs the key columns
    plan(tx.changes(fromV, toV))
  }

  /** `graft_refs(tableDir)` — the named-ref ledger as SQL text: one
    * row per tag (retention-pinning `VERSION AS OF '<ref>'` targets)
    * and per branch (in-table write-audit-publish clones), with the
    * version a tag pins. Metadata listings only. */
  private def refs(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "table directory")
    val tx = graft.core.TxTable.openReadOnly(spark, dir)
    import spark.implicits._
    val rows =
      tx.tags.toSeq.sortBy(_._1).map { case (n, v) => ("tag", n, v) } ++
        tx.branches.map(b => ("branch", b,
          tx.branch(b).currentVersion))
    plan(rows.toDF("kind", "name", "version"))
  }

  /** `graft_delta_changes(tableDir, fromVersion[, toVersion])` — the
    * exported Delta log's Change Data Feed as SQL text
    * ([[graft.core.DeltaImport.readChanges]]): delta-spark's
    * `table_changes` shape over the interop surface, so a SQL user
    * consumes the feed without the Scala API. */
  private def deltaChanges(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "table directory")
    val fromV = int(exprs, 1, "from delta version").toLong
    val toV = if (exprs.length > 2)
      Some(int(exprs, 2, "to delta version").toLong) else None
    plan(graft.core.DeltaImport.readChanges(spark, dir, fromV, toV))
  }

  /** `graft_delta_scan(dir [, version])` — a FOREIGN Delta Lake
    * table as SQL text (full protocol replay: checkpoints, DVs, CDF
    * metadata, columnMapping name/id binding), optionally pinned to a
    * log version. The SQL-only door to [[graft.core.DeltaImport]] —
    * reading someone else's lakehouse no longer needs Scala. */
  /** Trailing optional TVF arguments, dispatched on the literal's
    * TYPE so nothing collides with predicate text: an INT/BIGINT
    * pins a version/snapshot; a TIMESTAMP or DATE literal
    * (`TIMESTAMP '2026-01-01 00:00:00'`) pins a point in time —
    * resolved through each dialect's own timeline (Delta commit-file
    * mtimes, the Iceberg snapshot-log); a STRING is always a
    * predicate in SQL text routed to the import's `readWhere`
    * (driver-side file skipping from the foreign stats — a bare TVF
    * result would only get row-group pushdown, never manifest-level
    * pruning). They may appear in any order; version and timestamp
    * pins conflict. */
  private def scanArgs(exprs: Seq[Expression], what: String)
      : (Option[Long], Option[String], Option[Long]) = {
    import org.apache.spark.sql.types.{DateType, TimestampType, TimestampNTZType}
    val out = (1 until exprs.length)
      .map(i => (evalArg(exprs, i, what), exprs(i).dataType))
      .foldLeft((Option.empty[Long], Option.empty[String],
        Option.empty[Long])) {
        case ((v, p, t), (n: Long, _: TimestampType)) =>
          (v, p, t.orElse(Some(n / 1000L))) // instant micros -> millis
        case ((v, p, t), (n: Long, _: TimestampNTZType)) =>
          // NTZ micros are a WALL-CLOCK datetime, not an instant —
          // bind it through the session timezone before comparing
          // against commit mtimes / the snapshot-log, or the pin
          // shifts by the zone offset in any non-UTC session
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            java.lang.Math.floorDiv(n, 1000000L),
            (java.lang.Math.floorMod(n, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
          val zone = java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          (v, p, t.orElse(Some(ldt.atZone(zone).toInstant.toEpochMilli)))
        case ((v, p, t), (d: Integer, _: DateType)) =>
          (v, p, t.orElse(Some(d.toLong * 86400000L))) // days -> millis
        case ((v, p, t), (n: Int, _))  => (v.orElse(Some(n.toLong)), p, t)
        case ((v, p, t), (n: Long, _)) => (v.orElse(Some(n)), p, t)
        case ((v, p, t), (s: UTF8String, _)) =>
          val str = s.toString
          // the bare 'ts=<value>' shape is AMBIGUOUS (an equality
          // predicate on a column named ts, or the retired string
          // form of the time pin) — refuse with both remedies rather
          // than silently picking one
          require(!str.matches("^ts=\\S+$"),
            s"ambiguous argument '$str': pin a point in time with a " +
              "typed TIMESTAMP/DATE literal, or space the predicate " +
              "('ts = ...') to filter a column named ts")
          (v, p.orElse(Some(str)), t)
        case (_, (other, dt)) => throw new IllegalArgumentException(
          s"$what: expected a version (int), TIMESTAMP/DATE literal " +
            s"or predicate (string), got $other: $dt")
      }
    require(out._1.isEmpty || out._3.isEmpty,
      s"$what: a version pin and a timestamp pin conflict - pass one")
    out
  }

  /** Attach CATALOG STATISTICS to a foreign scan's single parquet
    * relation so the planner stops flying blind over imported trees:
    * exact row count (log/manifest metadata) + NDV (Puffin, when
    * published). Under `spark.sql.cbo.enabled` the CBO then sizes
    * PROJECTIONS as rowCount × pruned-column width — the decision
    * that flips a small-but-wide foreign dim from sort-merge to
    * broadcast (raw file size alone counts every column the query
    * never reads). Applied only to the clean single-relation shape:
    * DV-masked unions keep their native file-size stats (attaching
    * table totals to each leg would double-count), and with CBO off
    * the relation's own sizeInBytes is served unchanged. */
  private def withForeignStats(lp: LogicalPlan, name: String,
      rowCount: Option[Long], ndv: Map[String, Long]): LogicalPlan = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat,
      CatalogStatistics, CatalogStorageFormat, CatalogTable,
      CatalogTableType}
    import org.apache.spark.sql.catalyst.TableIdentifier
    if (rowCount.isEmpty) return lp // NDV is unusable without rowCount
    val lrs = lp.collect { case lr: LogicalRelation => lr }
    if (lrs.length != 1) lp
    else lp.transform {
      case lr: LogicalRelation if lr.catalogTable.isEmpty =>
        val stats = CatalogStatistics(
          sizeInBytes = BigInt(lr.relation.sizeInBytes),
          rowCount = rowCount.map(BigInt(_)),
          colStats = ndv.map { case (c0, n) =>
            c0 -> CatalogColumnStat(distinctCount = Some(BigInt(n))) })
        lr.copy(catalogTable = Some(CatalogTable(
          identifier = TableIdentifier(name),
          tableType = CatalogTableType.EXTERNAL,
          storage = CatalogStorageFormat.empty,
          schema = lr.relation.schema,
          provider = Some("parquet"),
          stats = Some(stats))))
    }
  }

  private def deltaScan(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "delta table directory")
    val (verPin, pred, tsPin) = scanArgs(exprs, "graft_delta_scan")
    val asOf = verPin.orElse(
      tsPin.map(graft.core.DeltaImport.versionAsOf(spark, dir, _)))
    pred match {
      case Some(p) => plan(graft.core.DeltaImport.readWhere(spark, dir,
        org.apache.spark.sql.functions.expr(p), asOf))
      case None =>
        // ONE log replay serves both the scan and its statistics
        val snap = graft.core.DeltaImport.snapshot(spark, dir, asOf)
        withForeignStats(
          plan(graft.core.DeltaImport.serveSnapshot(spark, dir, snap)),
          "graft_delta_scan",
          graft.core.DeltaImport.rowCount(snap), Map.empty)
    }
  }

  /** `graft_iceberg_scan(dir [, snapshotId])` — a FOREIGN Apache
    * Iceberg v1/v2 table as SQL text (manifest-list walk, position +
    * equality deletes, name mapping), optionally pinned to a
    * snapshot id ([[graft.core.IcebergImport]]'s SQL door). */
  private def icebergScan(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "iceberg table directory")
    val (idPin, pred, tsPin) = scanArgs(exprs, "graft_iceberg_scan")
    val snapId = idPin.orElse(
      tsPin.map(graft.core.IcebergImport.snapshotIdAsOf(spark, dir, _)))
    pred match {
      case Some(p) => plan(graft.core.IcebergImport.readWhere(spark, dir,
        org.apache.spark.sql.functions.expr(p), snapId))
      case None =>
        // ONE manifest walk serves both the scan and its statistics;
        // NDV comes from the tree's declared Puffin sketches
        val snap = graft.core.IcebergImport.snapshot(spark, dir, snapId)
        withForeignStats(
          plan(graft.core.IcebergImport.serve(spark, snap)),
          "graft_iceberg_scan",
          graft.core.IcebergImport.rowCount(snap),
          graft.core.IcebergImport.statisticsNdv(spark, dir))
    }
  }

  /** `graft_delta_history(dir)` — DESCRIBE HISTORY for a FOREIGN
    * Delta log: per retained commit its mtime timeline, add/remove/
    * cdc action counts, whether it carried a metaData action, and
    * the operation (commitInfo's word, else inferred from the
    * actions). Driver metadata only, O(log). */
  private def deltaHistory(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "delta table directory")
    import spark.implicits._
    plan(graft.core.DeltaImport.history(spark, dir)
      .toDF("version", "timestamp_ms", "adds", "removes", "cdc_files",
        "meta_change", "operation")
      .orderBy("version"))
  }

  /** `graft_iceberg_snapshots(dir)` — the snapshot inventory of a
    * FOREIGN Iceberg tree: id, sequence, commit timestamp, declared
    * operation, parent, and whether the snapshot is on the MAIN
    * lineage (staged WAP snapshots are not). One metadata.json
    * parse. */
  private def icebergSnapshots(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "iceberg table directory")
    import spark.implicits._
    plan(graft.core.IcebergImport.snapshotsInfo(spark, dir)
      .toDF("snapshot_id", "sequence_number", "timestamp_ms",
        "operation", "parent_id", "on_main")
      .orderBy("sequence_number", "snapshot_id"))
  }

  /** `graft_copy_ledger(tableDir)` — COPY INTO's exactly-once ledger
    * as SQL text: one row per source file ever loaded (path, size,
    * mtime), the ops view behind "did my load pick this file up?".
    * Commit-meta only, no data I/O. */
  private def copyLedger(exprs: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = str(exprs, 0, "table directory")
    val tx = graft.core.TxTable.openReadOnly(spark, dir)
    import spark.implicits._
    val rows = graft.core.CopyInto.ledger(tx).toSeq.sorted.map { fp =>
      // split from the RIGHT: the two numeric fields can't contain
      // '|', a path theoretically could
      val i2 = fp.lastIndexOf('|')
      val i1 = if (i2 > 0) fp.lastIndexOf('|', i2 - 1) else -1
      if (i1 > 0)
        (fp.take(i1), fp.substring(i1 + 1, i2).toLong,
          fp.drop(i2 + 1).toLong)
      else (fp, -1L, -1L)
    }
    plan(rows.toDF("path", "size", "mtime").orderBy("path"))
  }

  private def tvf(name: String,
      builder: Seq[Expression] => LogicalPlan): (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftTableFunctions.getClass.getName, name),
      builder)

  def register(e: SparkSessionExtensions): Unit = {
    e.injectTableFunction(tvf("graft_bm25", bm25))
    e.injectTableFunction(tvf("graft_knn", knn))
    e.injectTableFunction(tvf("graft_funnel", funnel))
    e.injectTableFunction(tvf("graft_history", history))
    e.injectTableFunction(tvf("graft_files", files))
    e.injectTableFunction(tvf("graft_changes", changes))
    e.injectTableFunction(tvf("graft_refs", refs))
    e.injectTableFunction(tvf("graft_delta_changes", deltaChanges))
    e.injectTableFunction(tvf("graft_copy_ledger", copyLedger))
    e.injectTableFunction(tvf("graft_delta_scan", deltaScan))
    e.injectTableFunction(tvf("graft_iceberg_scan", icebergScan))
    e.injectTableFunction(tvf("graft_delta_history", deltaHistory))
    e.injectTableFunction(tvf("graft_iceberg_snapshots", icebergSnapshots))
  }
}
