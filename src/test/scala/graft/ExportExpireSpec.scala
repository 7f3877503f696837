package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.core.{DeltaExport, DeltaImport, IcebergExport, IcebergImport, TxTable}

/** Exported-tree maintenance (`expireOrphans` / `expireLog` /
  * `CALL graft.export_expire`): superseded Iceberg metadata and
  * pre-checkpoint Delta commits retire; everything the current
  * metadata references — including time travel — survives. */
class ExportExpireSpec extends SparkSpec {
  import spark.implicits._

  test("iceberg: orphaned metadata expires; reference closure survives") {
    val dir = tmpDir("expire-ice") + "/t"
    val data = (1L to 60L).map(k => (k, k % 5L)).toDF("k", "g")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    IcebergExport.writeIcebergMetadata(spark, t)
    t.upsert(Seq((1L, 99L), (2L, 99L)).toDF("k", "g"))
    IcebergExport.writeIcebergMetadata(spark, t)
    val metaDir = new File(dir, "metadata")
    def avros = metaDir.listFiles().count(_.getName.endsWith(".avro"))
    val before = avros

    // with spec-true manifest REUSE, a re-sync references the whole
    // retained history - nothing orphans while versions are retained
    assert(IcebergExport.expireOrphans(spark, t, 0L)._1 === 0)
    assert(avros === before)
    val headSnapId = 1000L + t.currentVersion

    // RETENTION is what orphans metadata: vacuum to the head version,
    // re-sync (the metadata drops the expired snapshots), expire
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    IcebergExport.writeIcebergMetadata(spark, t)
    val (removed, bytes) = IcebergExport.expireOrphans(spark, t, 0L)
    assert(removed > 0 && bytes > 0L,
      "dropped snapshots' manifests and lists must expire")
    assert(avros < before)

    // the surviving head still reads exactly
    assert(IcebergImport.read(spark, dir)
      .agg(sum("g")).head.getLong(0) ===
      t.read.agg(sum("g")).head.getLong(0))
    assert(IcebergImport.read(spark, dir, Some(headSnapId))
      .count() === 60L)

    // idempotent: a second pass finds nothing
    assert(IcebergExport.expireOrphans(spark, t, 0L)._1 === 0)

    // a crashed writeAvro's torn temp is orphaned by construction
    // (the atomic rename never ran) and ages out here
    val torn = new File(metaDir, ".m-v9-s19-0-g0-h00000000.avro.tmp")
    assert(torn.createNewFile())
    assert(IcebergExport.expireOrphans(spark, t, 0L)._1 === 1)
    assert(!torn.exists())
  }

  test("iceberg: the grace window protects fresh files") {
    val dir = tmpDir("expire-grace") + "/t"
    val data = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    IcebergExport.writeIcebergMetadata(spark, t)
    t.upsert(Seq((1L, 9.0)).toDF("k", "v"))
    IcebergExport.writeIcebergMetadata(spark, t)
    // everything was written seconds ago: an hour's grace removes 0
    assert(IcebergExport.expireOrphans(spark, t,
      60L * 60L * 1000L)._1 === 0)
  }

  test("delta: pre-checkpoint commits retire; retained checkpoints still time travel") {
    val dir = tmpDir("expire-delta") + "/t"
    val data = (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    DeltaExport.writeDeltaLog(spark, t)          // delta 0
    t.append(Seq((21L, 21.0)).toDF("k", "v"))
    DeltaExport.syncDeltaLog(spark, t)           // delta 1
    t.append(Seq((22L, 22.0)).toDF("k", "v"))
    DeltaExport.syncDeltaLog(spark, t)           // delta 2
    DeltaExport.writeCheckpoint(spark, t)        // cp @ 2
    t.append(Seq((23L, 23.0)).toDF("k", "v"))
    DeltaExport.syncDeltaLog(spark, t)           // delta 3
    DeltaExport.writeCheckpoint(spark, t)        // cp @ 3

    val logDir = new File(dir, "_delta_log")
    def jsons = logDir.listFiles().map(_.getName)
      .count(_.matches("\\d{20}\\.json"))
    assert(jsons === 4)

    // keep both checkpoints: cut at the OLDER one (2) - commits 0,1 go
    assert(DeltaExport.expireLog(spark, t, keepCheckpoints = 2) === 2)
    assert(jsons === 2)
    // head reads bootstrap from cp3; v2 boots from the RETAINED cp2
    assert(DeltaImport.read(spark, dir).count() === 23L)
    val v2 = DeltaImport.snapshot(spark, dir, Some(2L))
    assert(v2.fromCheckpoint === Some(2L))
    assert(DeltaImport.read(spark, dir, Some(2L)).count() === 22L)
    // below the cut: honest refusal, gap named
    val e = intercept[Exception] {
      DeltaImport.read(spark, dir, Some(1L)).count()
    }
    assert(e.getMessage.contains("missing commits"))

    // tighten to one checkpoint: cut at 3, cp2 + commit 2 retire
    assert(DeltaExport.expireLog(spark, t, keepCheckpoints = 1) === 2)
    assert(DeltaImport.read(spark, dir).count() === 23L)

    // a log with no checkpoint is untouched
    val dir2 = tmpDir("expire-delta2") + "/t"
    val t2 = new TxTable(spark, dir2, data.schema, Seq("k"), numBuckets = 1)
    t2.append(data)
    DeltaExport.writeDeltaLog(spark, t2)
    assert(DeltaExport.expireLog(spark, t2) === 0)
  }

  test("CALL graft.export_expire sweeps both dialects in one verb") {
    val dir = tmpDir("expire-call") + "/t"
    val data = (1L to 15L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    IcebergExport.writeIcebergMetadata(spark, t)
    DeltaExport.writeDeltaLog(spark, t)
    t.upsert(Seq((1L, 0.5)).toDF("k", "v"))
    t.vacuum(keepVersions = 1, minAgeMs = 0L) // orphan the old snapshot
    IcebergExport.writeIcebergMetadata(spark, t)
    DeltaExport.syncDeltaLog(spark, t)
    DeltaExport.writeCheckpoint(spark, t)
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      val rows = spark.sql(s"CALL graft.export_expire('${t.dir}', '0', '1')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows("iceberg_files_removed").toInt > 0)
      assert(rows("delta_files_removed").toInt > 0)
      assert(IcebergImport.read(spark, dir).count() === 15L)
      assert(DeltaImport.read(spark, dir).count() === 15L)
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }
}
