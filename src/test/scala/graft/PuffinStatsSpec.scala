package graft

import java.io.File

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{IcebergExport, IcebergImport, Puffin, TxTable}

/** Puffin NDV statistics: the export writes REAL Apache DataSketches
  * theta sketches (the library Spark ships) into a spec Puffin file,
  * the metadata declares it with exact byte extents, and the import
  * twin lifts foreign NDV back into the CBO feed. */
class PuffinStatsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String, rows: Long = 500L): (TxTable, String) = {
    val dir = tmpDir(tag) + "/t"
    val df = (1L to rows)
      .map(k => (k, k % 7L, s"name_${k % 13}", (k % 97).toDouble))
      .toDF("k", "g", "nm", "x")
    val t = new TxTable(spark, dir, df.schema, Seq("k"), numBuckets = 2)
    t.append(df)
    (t, dir)
  }

  test("writeStatistics emits a spec Puffin file the metadata declares with real extents") {
    val (t, dir) = mk("puffin")
    val statsPath = IcebergExport.writeStatistics(spark, t)
    IcebergExport.writeIcebergMetadata(spark, t)

    // raw structure: magic at both ends, footer math consistent
    val f = new File(new java.net.URI(statsPath).getPath)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(bytes.slice(0, 4).sameElements(Puffin.Magic))
    assert(bytes.slice(bytes.length - 4, bytes.length)
      .sameElements(Puffin.Magic))
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val info = Puffin.readFooter(fs, new Path(statsPath))
    assert(info.fileSize === bytes.length.toLong)
    assert(info.blobs.size === 4) // k, g, nm, x
    // blob extents are REAL: each slice deserializes as a theta
    // sketch whose estimate matches the exact NDV
    val exact = Map(1 -> 500.0, 2 -> 7.0, 3 -> 13.0, 4 -> 97.0)
    info.blobs.foreach { b =>
      assert(b.blobType === Puffin.ThetaV1)
      assert(b.snapshotId === 1001L) // v1 append
      assert(b.sequenceNumber === 4L) // 2v+2
      val blob = Puffin.readBlob(fs, new Path(statsPath), b)
      val sk = org.apache.datasketches.theta.Sketches.heapifySketch(
        org.apache.datasketches.memory.Memory.wrap(blob))
      val want = exact(b.fields.head)
      // 500 distinct < 2^12 nominal: every sketch is EXACT mode
      assert(sk.getEstimate === want,
        s"field ${b.fields.head}: ${sk.getEstimate} != $want")
      assert(b.properties("ndv").toLong === want.toLong)
    }

    // the metadata's statistics field references the file with its
    // real size and footer extent
    val md = JsonMethods.parse(java.nio.file.Files.readString(
      java.nio.file.Path.of(dir, "metadata", "v1.metadata.json")))
    val stats = (md \ "statistics") match {
      case JArray(List(s)) => s
      case other => fail(s"expected one statistics entry, got $other")
    }
    assert((stats \ "snapshot-id") === JInt(1001))
    assert((stats \ "file-size-in-bytes") === JInt(bytes.length))
    assert((stats \ "file-footer-size-in-bytes") === JInt(info.footerSize))
    val blobMeta = (stats \ "blob-metadata") match {
      case JArray(bs) => bs
      case _ => fail("no blob-metadata")
    }
    assert(blobMeta.size === 4)
    assert(blobMeta.forall(b => (b \ "type") == JString(Puffin.ThetaV1)))
  }

  test("the distributed sketch is byte-identical to a driver-side DataSketches build") {
    // union-compatibility pin: Spark's theta_sketch_agg over our
    // single-value serialization must retain the SAME hash set a
    // stock DataSketches user building from the same bytes gets —
    // ordered compact serialization makes that byte-comparable
    val (t, dir) = mk("puffin-pin", rows = 200L)
    val statsPath = IcebergExport.writeStatistics(spark, t)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val info = Puffin.readFooter(fs, new Path(statsPath))
    val gBlob = info.blobs.find(_.fields == Seq(2)).get // column g
    val got = Puffin.readBlob(fs, new Path(statsPath), gBlob)
    val ref = org.apache.datasketches.theta.UpdateSketch.builder()
      .setLogNominalEntries(12).build()
    (0L to 6L).foreach(v =>
      ref.update(graft.functions.IcebergValueFn.ofLong(v)))
    assert(got.sameElements(ref.compact(true, null).toByteArray),
      "distributed sketch bytes diverge from a stock DataSketches build")
  }

  test("statisticsNdv lifts declared NDV; declareColumnAnalysis feeds the CBO") {
    val (t, dir) = mk("puffin-ndv")
    IcebergExport.writeStatistics(spark, t)
    IcebergExport.writeIcebergMetadata(spark, t)
    val ndv = IcebergImport.statisticsNdv(spark, dir)
    assert(ndv === Map("k" -> 500L, "g" -> 7L, "nm" -> 13L, "x" -> 97L))

    // seed a fresh table's analysis from the foreign numbers: the
    // import-side CBO story (no data pass, one metadata commit)
    val (t2, _) = mk("puffin-adopt")
    t2.declareColumnAnalysis(ndv.view.mapValues(n =>
      TxTable.ColAnalysis(n, None, None)).toMap)
    val (_, cols) = t2.columnAnalysis.get
    assert(cols("g").ndv === 7L)
    assert(cols("k").ndv === 500L)
    // unknown columns refuse
    val e = intercept[IllegalArgumentException] {
      t2.declareColumnAnalysis(Map("nope" -> TxTable.ColAnalysis(1L, None, None)))
    }
    assert(e.getMessage.contains("not in the schema"))
  }

  test("a foreign property-less blob decodes the sketch for its estimate") {
    val (t, dir) = mk("puffin-noprop", rows = 300L)
    val statsPath = IcebergExport.writeStatistics(spark, t)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // strip the ndv properties (a writer is not required to emit
    // them) by rewriting the puffin with property-less blobs
    val info = Puffin.readFooter(fs, new Path(statsPath))
    val blobs = info.blobs.map(b => (b.blobType, b.fields, b.snapshotId,
      b.sequenceNumber, Puffin.readBlob(fs, new Path(statsPath), b),
      Map.empty[String, String]))
    Puffin.write(fs, new Path(statsPath), blobs)
    IcebergExport.writeIcebergMetadata(spark, t)
    val ndv = IcebergImport.statisticsNdv(spark, dir)
    assert(ndv("k") === 300L)
    assert(ndv("g") === 7L)
  }

  test("CALL graft.export_stats publishes the Puffin file and re-syncs metadata") {
    val (t, dir) = mk("puffin-call")
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      val out = spark.sql(s"CALL graft.export_stats('${t.dir}')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out("statistics").endsWith("stats-1001.puffin"))
      assert(new File(dir, "metadata/v1.metadata.json").exists())
      assert(IcebergImport.statisticsNdv(spark, dir)("g") === 7L)
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }

  test("maintenance exportStats policy republishes Puffin stats on refresh") {
    val (t, dir) = mk("puffin-auto")
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      IcebergExport.writeStatistics(spark, t)
      IcebergExport.writeIcebergMetadata(spark, t) // tree exists
      t.setTableProperties(Map(
        "graft.autoAnalyze.staleVersions" -> "1",
        "graft.autoAnalyze.exportStats" -> "true"))
      def call(): Map[String, String] = spark.sql(
        s"CALL graft.maintenance('${t.dir}')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // first call: no colstats declaration yet -> analyze + republish
      val out = call()
      assert(out("analyzed_columns").toInt >= 4)
      assert(out("stats_exported") === "true")
      // the republished declaration covers the NEW head snapshot
      val ndv = IcebergImport.statisticsNdv(spark, dir)
      assert(ndv("g") === 7L)
      // idle follow-up: no refresh, no republish
      val out2 = call()
      assert(out2("analyzed_columns") === "0")
      assert(out2("stats_exported") === "false")
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }

  test("CALL graft.import_stats adopts foreign NDV in one metadata commit") {
    val (src, srcDir) = mk("puffin-imp-src")
    IcebergExport.writeStatistics(spark, src)
    IcebergExport.writeIcebergMetadata(spark, src)
    val (dst, _) = mk("puffin-imp-dst")
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      val v = dst.currentVersion
      val out = spark.sql(
        s"CALL graft.import_stats('${dst.dir}', '$srcDir')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out("ndv_g") === "7")
      assert(dst.currentVersion === v + 1) // exactly one metadata commit
      val (_, cols) = dst.columnAnalysis.get
      assert(cols("k").ndv === 500L)
      // nothing adoptable refuses loudly
      val empty = new TxTable(spark, tmpDir("puffin-imp-none") + "/t",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("zzz",
            org.apache.spark.sql.types.LongType))), Seq("zzz"),
        numBuckets = 1)
      empty.createIfAbsent()
      val e = intercept[Exception] {
        spark.sql(
          s"CALL graft.import_stats('${empty.dir}', '$srcDir')").collect()
      }
      assert(e.getMessage.contains("nothing to adopt"))
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }

  test("foreign trees pick the newest stats by SEQUENCE, not by random snapshot id") {
    // foreign snapshot ids are random longs: the OLD snapshot here
    // has the LARGER id, so an id-sort would serve stale NDV
    val dir = tmpDir("puffin-seq")
    val metaDir = new File(dir, "metadata"); metaDir.mkdirs()
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def puffin(name: String, ndv: Long): String = {
      val sk = org.apache.datasketches.theta.UpdateSketch.builder().build()
      (1L to ndv).foreach(v =>
        sk.update(graft.functions.IcebergValueFn.ofLong(v)))
      val p = new Path(metaDir.toString, name)
      Puffin.write(fs, p, Seq((Puffin.ThetaV1, Seq(1), 0L, 0L,
        sk.compact(true, null).toByteArray, Map("ndv" -> ndv.toString))))
      fs.makeQualified(p).toString
    }
    val oldStats = puffin("stats-old.puffin", 5L)   // snapshot 9000, seq 1
    val newStats = puffin("stats-new.puffin", 42L)  // snapshot 100,  seq 2
    val md =
      s"""{"format-version":2,"table-uuid":"u","location":"$dir",
         |"current-snapshot-id":555,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |  {"id":1,"name":"k","required":false,"type":"long"}]}],
         |"current-schema-id":0,
         |"snapshots":[
         |  {"snapshot-id":9000,"sequence-number":1,"timestamp-ms":1},
         |  {"snapshot-id":100,"sequence-number":2,"timestamp-ms":2}],
         |"statistics":[
         |  {"snapshot-id":9000,"statistics-path":"$oldStats",
         |   "file-size-in-bytes":1,"file-footer-size-in-bytes":1,
         |   "blob-metadata":[{"type":"${Puffin.ThetaV1}",
         |     "snapshot-id":9000,"sequence-number":1,"fields":[1],
         |     "properties":{"ndv":"5"}}]},
         |  {"snapshot-id":100,"statistics-path":"$newStats",
         |   "file-size-in-bytes":1,"file-footer-size-in-bytes":1,
         |   "blob-metadata":[{"type":"${Puffin.ThetaV1}",
         |     "snapshot-id":100,"sequence-number":2,"fields":[1],
         |     "properties":{"ndv":"42"}}]}]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(metaDir.toString, "v1.metadata.json"), md)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(metaDir.toString, "version-hint.text"), "1")
    assert(IcebergImport.statisticsNdv(spark, dir) === Map("k" -> 42L))
  }

  test("stats for an expired snapshot drop out of the declaration") {
    val (t, dir) = mk("puffin-exp")
    IcebergExport.writeStatistics(spark, t)
    // fake an expired snapshot's stats file: the declaration must
    // skip it (its snapshot is not in the exported set)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ghost = new Path(dir, "metadata/stats-99999.puffin")
    Puffin.write(fs, ghost, Seq((Puffin.ThetaV1, Seq(1), 99999L, 1L,
      org.apache.datasketches.theta.UpdateSketch.builder().build()
        .compact(true, null).toByteArray, Map("ndv" -> "0"))))
    IcebergExport.writeIcebergMetadata(spark, t)
    val md = JsonMethods.parse(java.nio.file.Files.readString(
      java.nio.file.Path.of(dir, "metadata", "v1.metadata.json")))
    val ids = (md \ "statistics") match {
      case JArray(es) => es.map(e => (e \ "snapshot-id"))
      case _ => Nil
    }
    assert(ids === List(JInt(1001)))
  }
}
