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
