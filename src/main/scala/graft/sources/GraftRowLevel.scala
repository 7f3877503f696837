package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** ROW-LEVEL SQL DML (`UPDATE`, `MERGE INTO`, subquery `DELETE`) for
  * graft tables — the reference's single most load-bearing sink is an
  * ON-CONFLICT upsert (`services/api/src/repository.ts:25-78`) plus
  * point updates (`src/jobs/scan.ts:20`, `src/index.ts:377`); through
  * SQL text those are `MERGE INTO` / `UPDATE`, served here via
  * Spark's delta-based row-level operation API ([[SupportsDelta]]).
  *
  * Design — MERGE-ON-READ, the cheapest correct mutation at scale:
  * every operation decomposes into row deletes and row inserts
  * (updates are split by Spark itself:
  * `representUpdateAsDeleteAndInsert = true`).
  *
  *  - a DELETE of a row becomes a deletion-vector tombstone
  *    (`_graft_file`, `_graft_pos`) — the row identity the scan
  *    exposes as non-nullable metadata columns. No data file is
  *    rewritten, ever: a 1-row UPDATE on a 100 TB table writes
  *    kilobytes of sidecar plus one small insert file.
  *  - an INSERT row is staged executor-side straight to parquet
  *    ([[RowParquet]]) — commit messages carry FILE PATHS, never rows,
  *    so driver coordination stays O(tasks) at any data size.
  *  - the commit applies tombstones + inserts ATOMICALLY through the
  *    guarded commit protocol (`TxTable.applyRowDelta`): one manifest
  *    version, CHECK admission on the inserted rows, key bucketing,
  *    bloom layout, CAS publish. A concurrent commit between the scan
  *    and the publish aborts with an honest serializability error
  *    (the delta was computed against the scanned snapshot; replaying
  *    it on a moved table could resurrect or double-apply rows).
  *
  * Spark plans the scan side through the table's ordinary
  * [[GraftScanBuilder]], so zone-map/bloom file pruning and column
  * pruning apply to the MERGE's target scan exactly as to any read.
  */
final class GraftRowLevelOperationBuilder(table: GraftTable,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(table, info.command())
}

final class GraftRowLevelOperation(table: GraftTable,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String =
    s"GraftRowLevelOperation[$cmd] on ${table.name()}"

  /** The target scan IS the table's normal scan (pruned, DV-masked,
    * pinned at the table's load version). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(table)

  /** Row identity = physical position: exact under duplicate keys
    * (append-built tables may hold them), and it maps 1:1 onto the
    * deletion-vector tombstone the commit writes. */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftTable.FileCol),
    Expressions.column(GraftTable.PosCol))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  /** Updates arrive as delete + reinsert pairs — one writer code path,
    * and an update that moves a row across buckets (key-column SET)
    * lands it in the right bucket for free. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

final class GraftDeltaWriteBuilder(table: GraftTable)
    extends DeltaWriteBuilder {
  override def build(): DeltaWrite =
    new GraftDeltaWrite(table.dir, table.resolvedSchema, table.pinnedVersion)
}

final class GraftDeltaWrite(dir: String, rowSchema: StructType,
    scannedVersion: Long) extends DeltaWrite {
  override def description(): String = s"GraftDeltaWrite `$dir`"
  override def toBatch: DeltaBatchWrite =
    new GraftDeltaBatchWrite(dir, rowSchema, scannedVersion)
}

/** What one completed delta task reports back: the staged file paths
  * (either may be absent if the task produced no ops of that kind). */
final case class GraftDeltaTaskResult(deleteFile: Option[String],
    insertFile: Option[String]) extends WriterCommitMessage

final class GraftDeltaBatchWrite(dir: String, rowSchema: StructType,
    scannedVersion: Long) extends DeltaBatchWrite {

  private val stageDir = s"$dir/.stage-rl-${UUID.randomUUID().toString.take(8)}"

  // the session's Hadoop configuration, serialized as entries so the
  // EXECUTOR writers build filesystems with the same credentials /
  // endpoints the driver has (a bare new Configuration() on an
  // object-store deployment would lack them)
  private val hadoopConfKv: Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    SparkSession.active.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue).toArray
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DeltaWriterFactory =
    GraftDeltaWriterFactory(stageDir, rowSchema, hadoopConfKv)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val results = messages.collect { case m: GraftDeltaTaskResult => m }
      val delFiles = results.flatMap(_.deleteFile).toSeq
      val insFiles = results.flatMap(_.insertFile).toSeq
      val tx = GraftDataSource.openForRead(spark, dir)
      val dels =
        if (delFiles.isEmpty) None
        else Some(spark.read
          .schema(GraftDeltaWriter.dvSchema).parquet(delFiles: _*))
      val ins =
        if (insFiles.isEmpty) None
        else Some(spark.read.schema(rowSchema).parquet(insFiles: _*))
      tx.applyRowDelta(dels, ins, scannedVersion)
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    val p = new Path(stageDir)
    val fs = p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }
}

final case class GraftDeltaWriterFactory(stageDir: String,
    rowSchema: StructType, hadoopConfKv: Array[(String, String)])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stageDir, rowSchema, partitionId, taskId,
      hadoopConfKv)
}

object GraftDeltaWriter {
  /** Tombstone schema — identical to the DV sidecar rows
    * `TxTable.deleteWhereLight` writes. */
  val dvSchema: StructType = StructType(Seq(
    StructField("_dv_file", StringType, nullable = false),
    StructField("_dv_pos", LongType, nullable = false)))
}

/** Executor task writer: streams delete tombstones and insert rows to
  * task-unique staged parquet (lazily opened — a task with no ops of a
  * kind stages nothing). Task retries get distinct (partition, task)
  * file names; only files named in COMMITTED messages are ever read,
  * and the whole stage dir dies with the job either way. */
final class GraftDeltaWriter(stageDir: String, rowSchema: StructType,
    partitionId: Int, taskId: Long,
    hadoopConfKv: Array[(String, String)] = Array.empty)
    extends DeltaWriter[InternalRow] {

  private lazy val conf: Configuration = {
    val c = new Configuration()
    hadoopConfKv.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private var delWriter: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var insWriter: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private def delPath = s"$stageDir/del-$partitionId-$taskId.parquet"
  private def insPath = s"$stageDir/ins-$partitionId-$taskId.parquet"

  private def ensureDirs(): Unit = {
    val p = new Path(stageDir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    ()
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    // id fields arrive in rowId() order: [_graft_file, _graft_pos]
    if (delWriter == null) {
      ensureDirs()
      delWriter = RowParquet.open(delPath, GraftDeltaWriter.dvSchema, conf)
    }
    delWriter.write(new GenericInternalRow(
      Array[Any](id.getUTF8String(0).copy(), id.getLong(1))))
  }

  override def insert(row: InternalRow): Unit = {
    if (insWriter == null) {
      ensureDirs()
      insWriter = RowParquet.open(insPath, rowSchema, conf)
    }
    insWriter.write(row)
  }

  /** Not taken when `representUpdateAsDeleteAndInsert` is true, but
    * correct if a future Spark version routes updates here whole. */
  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val hadDel = delWriter != null
    val hadIns = insWriter != null
    close()
    GraftDeltaTaskResult(
      if (hadDel) Some(delPath) else None,
      if (hadIns) Some(insPath) else None)
  }

  override def abort(): Unit = {
    close()
    val fs = new Path(stageDir).getFileSystem(conf)
    if (delWriter != null) fs.delete(new Path(delPath), false)
    if (insWriter != null) fs.delete(new Path(insPath), false)
    ()
  }

  override def close(): Unit = {
    if (delWriter != null) delWriter.close()
    if (insWriter != null) insWriter.close()
  }
}
