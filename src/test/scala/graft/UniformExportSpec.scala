package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{DeltaExport, DeltaImport, IcebergExport, IcebergImport, TxTable}

/** UNIFORM export (the Delta UniForm analog): both metadata dialects
  * published over ONE copy of the data — `_delta_log/` and the
  * Iceberg `metadata/` tree reference the table's own parquet files
  * in place, and both readers serve the same live rows, including a
  * merge-on-read delete each dialect encodes its own way (DV sidecar
  * vs position-delete file). The tx_uniform_roundtrip oracle row pins
  * the values against DuckDB; THIS suite pins the shared-files
  * property that makes it "uniform" rather than two copies. */
class UniformExportSpec extends SparkSpec {
  import spark.implicits._

  test("both dialects reference the table's own files; reads agree") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    val t = new TxTable(spark, tmpDir("uniform1") + "/t", schema,
      Seq("k"), numBuckets = 2)
    t.append((1L to 200L).map(i => (i, i * 10)).toDF("k", "v"))
    t.append((201L to 400L).map(i => (i, i * 10)).toDF("k", "v"))
    t.deleteWhereLight(col("k") % 7 === 0) // DVs live in both dialects
    DeltaExport.syncDeltaLog(spark, t)
    IcebergExport.writeIcebergMetadata(spark, t)

    // one copy of the data: every Delta add resolves to a live file of
    // the table itself (no rewrite, no relocation)
    val live = t.currentFileInfo.map(f =>
      new java.io.File(f.path).getName).toSet
    val deltaAdds = DeltaImport.snapshot(spark, t.dir).adds
      .map(a => new java.io.File(a.path).getName).toSet
    assert(deltaAdds === live,
      s"Delta log must reference the table's own live files, " +
        s"got ${deltaAdds.size} adds vs ${live.size} live")

    // both readers serve identical live rows (delete applied by DV
    // sidecar on the Delta side, position-delete file on Iceberg's)
    val viaDelta = DeltaImport.read(spark, t.dir)
      .select("k", "v").as[(Long, Long)].collect().sorted.toSeq
    val viaIceberg = IcebergImport.read(spark, t.dir)
      .select("k", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(viaDelta === viaIceberg)
    assert(viaDelta.size === 400 - 57, "the MoR delete must apply")
    assert(viaDelta.forall { case (k, _) => k % 7 != 0 })

    // a follow-up commit syncs incrementally into BOTH dialects
    t.append(Seq((401L, 4010L)).toDF("k", "v"))
    DeltaExport.syncDeltaLog(spark, t)
    IcebergExport.writeIcebergMetadata(spark, t)
    assert(DeltaImport.read(spark, t.dir).count() ===
      IcebergImport.read(spark, t.dir).count())
    assert(DeltaImport.read(spark, t.dir).count() === 344L)

    // the SQL doors: both dialects of the SAME table joined in pure
    // SQL text through the scan TVFs - foreign-lakehouse reads need
    // no Scala
    val sql = spark.sql(
      s"""SELECT count(*) AS n, sum(d.v - i.v) AS drift
         |FROM graft_delta_scan('${t.dir}') d
         |JOIN graft_iceberg_scan('${t.dir}') i ON d.k = i.k""".stripMargin)
      .head()
    assert(sql.getLong(0) === 344L)
    assert(sql.getLong(1) === 0L, "both dialects must serve equal rows")

    // predicate-string arguments route to readWhere (manifest-level
    // file skipping, not just row-group pushdown) and must be exact
    val expect = (1L to 401L)
      .count(k => k % 7 != 0 && k <= 100).toLong
    assert(spark.sql(
      s"SELECT count(*) FROM graft_delta_scan('${t.dir}', 'k <= 100')")
      .head().getLong(0) === expect)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_iceberg_scan('${t.dir}', 'k <= 100')")
      .head().getLong(0) === expect)
  }
}
