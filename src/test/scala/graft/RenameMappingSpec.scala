package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Metadata-only RENAME COLUMN via column mapping: the renamed field
  * keeps its creation-time parquet name (`graft.physical` field
  * metadata), so a rename is one metadata commit at any table size —
  * no file rewrite — and every read/write/prune path translates at
  * the file boundary. */
class RenameMappingSpec extends SparkSpec {
  import spark.implicits._

  private def kv(n: Int = 4, dir: String = tmpDir("rnm") + "/t"): TxTable =
    new TxTable(spark, dir, StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType),
      StructField("w", DoubleType))),
      Seq("k"), numBuckets = n)

  private def dataFiles(t: TxTable): Set[String] =
    new java.io.File(t.dir + "/data").listFiles() match {
      case null => Set.empty
      case fs => fs.map(_.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith(".")).toSet
    }

  test("rename is metadata-only: zero data files touched, values survive") {
    val t = kv()
    t.append((1 to 100).map(i => (s"k$i", i, i * 0.5)).toDF("k", "v", "w"))
    val before = dataFiles(t)
    val vBefore = t.currentVersion
    t.renameColumn("v", "value")
    assert(dataFiles(t) === before, "rename must not write any data file")
    assert(t.currentVersion === vBefore + 1)
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "value", "w"))
    val got = t.read.orderBy("k").select("k", "value").limit(3)
      .as[(String, Int)].collect().toSeq
    assert(got === Seq(("k1", 1), ("k10", 10), ("k100", 100)))
    // time travel below the rename reads the OLD declared name
    assert(t.readVersion(vBefore).schema.fieldNames.toSeq ===
      Seq("k", "v", "w"))
  }

  test("key column renames freely; upsert/lookup/delete bind the new name") {
    val t = kv()
    t.append((1 to 50).map(i => (s"k$i", i, 0.0)).toDF("k", "v", "w"))
    t.renameColumn("k", "id")
    val before = dataFiles(t)
    t.upsert(Seq(("k7", -7, 1.0), ("new1", 100, 2.0)).toDF("id", "v", "w"))
    assert(t.read.count() === 51)
    assert(t.read.filter(col("id") === "k7").select("v")
      .as[Int].head() === -7)
    // only the touched buckets were rewritten (co-location intact:
    // pre- and post-rename rows of one key hash to the same bucket)
    assert((before -- dataFiles(t)).size <= 2)
    assert(t.lookup(Seq("new1")).select("v").as[Int].head() === 100)
    t.deleteWhere(col("id") === "new1")
    assert(t.read.count() === 50)
  }

  test("zone-map skipping prunes on the renamed column") {
    val t = kv(n = 1)
    // cluster v so per-file zone maps are disjoint
    (0 until 4).foreach(b => t.append(
      (1 to 50).map(i => (s"k${b * 50 + i}", b * 50 + i, 0.0))
        .toDF("k", "v", "w")))
    t.renameColumn("v", "value")
    val rep = t.skipReport(col("value") > 190)
    assert(rep.total === 4 && rep.scanned === 1,
      s"expected 1/4 files scanned, got ${rep.scanned}/${rep.total}")
    assert(t.scanWhere(col("value") > 190).count() === 10)
  }

  test("evolution after rename; physical-name collision refused") {
    val t = kv()
    t.append(Seq(("a", 1, 0.0)).toDF("k", "v", "w"))
    t.renameColumn("v", "value")
    t.appendEvolving(Seq(("b", 2, 0.0, "x")).toDF("k", "value", "w", "tag"))
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "value", "w", "tag"))
    assert(t.read.filter(col("k") === "a").select("tag")
      .as[String].collect().toSeq === Seq(null))
    // 'v' is the physical name of 'value': files already bind it
    val e = intercept[IllegalArgumentException] {
      t.addColumns(StructType(Seq(StructField("v", StringType))))
    }
    assert(e.getMessage.contains("physical"))
    // chained rename keeps the ORIGINAL physical name
    t.renameColumn("value", "val2")
    assert(t.read.filter(col("k") === "a").select("val2")
      .as[Int].head() === 1)
    // a retired logical name is reusable for a NEW rename target
    t.renameColumn("w", "v_weight")
    assert(t.currentSchema.fieldNames.toSeq ===
      Seq("k", "val2", "v_weight", "tag"))
  }

  test("drop of a renamed column retires its PHYSICAL name") {
    val t = kv()
    t.append(Seq(("a", 1, 0.5)).toDF("k", "v", "w"))
    t.renameColumn("w", "weight")
    t.dropColumns(Seq("weight"))
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "v"))
    // pre-drop files hold the data under physical 'w': resurrection
    // guard must fire on the PHYSICAL name
    val e = intercept[IllegalArgumentException] {
      t.addColumns(StructType(Seq(StructField("w", DoubleType))))
    }
    assert(e.getMessage.contains("dropped"))
  }

  test("CDC: a rename commit nets zero row changes; diffs across it bind new names") {
    val t = kv()
    t.append(Seq(("a", 1, 0.0), ("b", 2, 0.0)).toDF("k", "v", "w")) // v1
    val v1 = t.currentVersion
    t.renameColumn("v", "value")                                    // v2
    val v2 = t.currentVersion
    assert(t.changes(v1, v2).count() === 0, "rename must be a no-op diff")
    t.upsert(Seq(("b", 20, 0.0)).toDF("k", "value", "w"))           // v3
    val d = t.changes(v1, t.currentVersion)
    assert(d.schema.fieldNames.contains("value"))
    assert(d.filter(col("_change_type") === "update_postimage")
      .select("value").as[Int].collect().toSeq === Seq(20))
  }

  test("CHECK-referenced column refuses rename; others stay enforced") {
    val t = kv()
    t.append(Seq(("a", 1, 0.0)).toDF("k", "v", "w"))
    t.addCheckConstraint("pos_v", "v >= 0")
    val e = intercept[IllegalArgumentException](t.renameColumn("v", "value"))
    assert(e.getMessage.contains("CHECK"))
    t.renameColumn("w", "weight") // unreferenced: fine
    // the constraint still gates writes (binds the unrenamed name)
    val bad = intercept[Exception](
      t.append(Seq(("z", -5, 0.0)).toDF("k", "v", "weight")))
    assert(bad.getMessage.contains("pos_v"))
  }

  test("rebucketTo collapses the mapping into a fresh physical=logical table") {
    val t = kv()
    t.append(Seq(("a", 1, 0.0)).toDF("k", "v", "w"))
    t.renameColumn("v", "value")
    val dst = t.rebucketTo(tmpDir("rnm-mig") + "/fresh", 4)
    assert(!dst.columnMappingActive)
    assert(dst.read.select("value").as[Int].head() === 1)
    // fresh files bind the declared name directly
    val raw = spark.read.parquet(
      new java.io.File(dst.dir, "data").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq: _*)
    assert(raw.columns.contains("value"))
  }

  test("Iceberg export: renamed table publishes schema.name-mapping.default; import round-trips") {
    val t = kv()
    t.append((1 to 20).map(i => (s"k$i", i, i * 0.5)).toDF("k", "v", "w"))
    t.renameColumn("v", "value")
    t.renameColumn("k", "id")
    t.deleteWhereLight(col("value") === 5) // a DV → position-delete file
    graft.core.IcebergExport.writeIcebergMetadata(spark, t)
    val md = scala.io.Source.fromFile(
      new java.io.File(t.dir, "metadata/v1.metadata.json")).mkString
    assert(md.contains("schema.name-mapping.default"))
    assert(md.contains("\\\"names\\\":[\\\"k\\\"]") ||
      md.contains("\"names\":[\"k\"]"), "mapping must carry physical 'k'")
    val back = graft.core.IcebergImport.read(spark, t.dir)
    assert(back.columns.toSeq === Seq("id", "value", "w"))
    assert(back.count() === 19)
    assert(back.filter(col("id") === "k9").select("value")
      .as[Int].head() === 9)
    // PER-SNAPSHOT SCHEMAS: a snapshot pinned BELOW the renames
    // reads the declared names of ITS epoch (spec schema-id), over
    // the same physical files
    assert(md.replaceAll("\\s", "").contains("\"schema-id\":1"),
      "history must publish the pre-rename schema too")
    val old = graft.core.IcebergImport.read(spark, t.dir,
      snapshotId = Some(1000L + 1L)) // v1 = pre-rename append
    assert(old.columns.toSeq === Seq("k", "v", "w"))
    assert(old.count() === 20) // pre-delete epoch: all rows live
    assert(old.filter(col("k") === "k9").select("v").as[Int].head() === 9)
  }

  test("Delta export: renamed table publishes columnMapping NAME mode; import round-trips") {
    val t = kv()
    t.append((1 to 30).map(i => (s"k$i", i, i * 0.5)).toDF("k", "v", "w"))
    t.renameColumn("v", "value")
    t.renameColumn("k", "id") // key rename rides along
    t.deleteWhereLight(col("value") === 3) // a DV'd file in the export
    graft.core.DeltaExport.syncDeltaLog(spark, t)
    // the log declares name mode with per-field physicalName + stable id
    val logTxt = scala.io.Source.fromFile(
      new java.io.File(t.dir, "_delta_log/00000000000000000000.json"))
      .mkString
    assert(logTxt.contains("\"delta.columnMapping.mode\":\"name\""))
    assert(logTxt.contains("delta.columnMapping.physicalName"))
    assert(logTxt.contains("columnMapping")) // protocol feature/floor
    // round-trip: stock-shaped reader binds physical names, surfaces
    // declared names, masks the DV
    val back = graft.core.DeltaImport.read(spark, t.dir)
    assert(back.columns.toSeq === Seq("id", "value", "w"))
    assert(back.count() === 29)
    assert(back.filter(col("id") === "k7").select("value")
      .as[Int].head() === 7)
    // a LATER rename re-syncs: ids stay stable, binding stays right
    t.renameColumn("w", "weight")
    t.upsert(Seq(("k1", 100, 9.9)).toDF("id", "value", "weight"))
    graft.core.DeltaExport.syncDeltaLog(spark, t)
    val back2 = graft.core.DeltaImport.read(spark, t.dir)
    assert(back2.columns.toSeq === Seq("id", "value", "weight"))
    assert(back2.filter(col("id") === "k1").select("value")
      .as[Int].head() === 100)
    assert(back2.count() === 29)
  }

  test("replaceRedefining keeps the mapping of surviving renamed columns") {
    val t = kv()
    t.append(Seq(("a", 1, 0.0)).toDF("k", "v", "w"))
    t.renameColumn("k", "id") // KEY rename: physical binding must survive
    t.replaceRedefining(
      Seq(("x", 9)).toDF("id", "v"),
      StructType(Seq(StructField("id", StringType),
        StructField("v", IntegerType))))
    assert(t.read.as[(String, Int)].collect().toSeq === Seq(("x", 9)))
    t.upsert(Seq(("x", 10)).toDF("id", "v")) // key still binds
    assert(t.read.as[(String, Int)].collect().toSeq === Seq(("x", 10)))
  }

  test("stream resolved between two renames binds the pinned epoch's names") {
    val dir = tmpDir("rnm-stream") + "/t"
    val b1 = Seq((1L, 10)).toDF("k", "v")
    val t = new TxTable(spark, dir, b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1)                 // v1
    t.renameColumn("v", "value") // v2 — the stream resolves HERE
    val q = spark.readStream.format("graft")
      .option("startingVersion", "-1").load(dir)
      .writeStream.format("memory").queryName("rnmtail")
      .option("checkpointLocation", tmpDir("rnm-stream-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      // a FURTHER rename after resolution must not null the column:
      // the reader rebinds "value" via the version it was resolved
      // at (physical name "v"), not the moved head
      t.renameColumn("value", "val2") // v3
      t.append(Seq((2L, 20)).toDF("k", "val2")) // v4
      q.processAllAvailable()
      val got = spark.table("rnmtail").orderBy("k")
        .as[(Long, Int)].collect().toSeq
      assert(got === Seq((1L, 10), (2L, 20)))
    } finally q.stop()
  }

  test("SQL surface: ALTER TABLE RENAME COLUMN end-to-end through DSv2") {
    val root = tmpDir("rnm-sql")
    val t = kv(dir = root + "/sqlt")
    t.append((1 to 40).map(i => (s"k$i", i, i * 1.0)).toDF("k", "v", "w"))
    spark.conf.set("spark.sql.catalog.rnmc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rnmc.root", root)
    val before = dataFiles(t)
    spark.sql("ALTER TABLE rnmc.sqlt RENAME COLUMN v TO value")
    assert(dataFiles(t) === before, "SQL rename must not rewrite data")
    // scan (vectorized path), filter pushdown, projection
    val rows = spark.sql(
      "SELECT k, value FROM rnmc.sqlt WHERE value > 38 ORDER BY value")
      .as[(String, Int)].collect().toSeq
    assert(rows === Seq(("k39", 39), ("k40", 40)))
    // aggregate pushdown answers from manifest stats under the new name
    val agg = spark.sql(
      "SELECT count(*) AS n, min(value) AS mn, max(value) AS mx " +
        "FROM rnmc.sqlt").head()
    assert((agg.getLong(0), agg.getInt(1), agg.getInt(2)) === ((40L, 1, 40)))
    // row-level DML binds the new names (delete via subquery scan)
    spark.sql("DELETE FROM rnmc.sqlt WHERE value = 40")
    assert(spark.sql("SELECT count(*) FROM rnmc.sqlt").head().getLong(0) === 39L)
    // DESCRIBE surfaces the DECLARED key name after a key rename
    spark.sql("ALTER TABLE rnmc.sqlt RENAME COLUMN k TO id")
    val props = spark.sql("SHOW TBLPROPERTIES rnmc.sqlt")
      .as[(String, String)].collect().toMap
    assert(props("keys") === "id")
    spark.sql("UPDATE rnmc.sqlt SET value = 0 WHERE id = 'k1'")
    assert(spark.sql(
      "SELECT value FROM rnmc.sqlt WHERE id = 'k1'").head().getInt(0) === 0)
  }
}
