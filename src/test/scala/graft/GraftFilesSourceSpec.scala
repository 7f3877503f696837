package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Streaming file-discovery source (`graft-files`) — the continuous
  * COPY INTO: exactly-once discovery through a checkpoint-anchored
  * ledger, restart/replay convergence, the replaced-file contract,
  * and bounded backlog drain. */
class GraftFilesSourceSpec extends SparkSpec {
  import spark.implicits._

  private def publish(dir: String, name: String,
      rows: Seq[(String, Int)]): Unit = {
    val stage = new java.io.File(dir, s".stage-$name")
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
      .parquet(stage.toString)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(dir, s"$name.parquet")))
    stage.listFiles().foreach(_.delete()); stage.delete()
    ()
  }

  private val srcSchema = StructType(Seq(
    StructField("k", StringType), StructField("v", IntegerType)))

  private def drain(src: String, sink: TxTable, ck: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val q = extra.foldLeft(
        spark.readStream.format("graft-files").schema(srcSchema)) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start(sink.dir)
    q.awaitTermination()
  }

  test("files land exactly once across micro-batch runs; re-run no-ops") {
    val src = tmpDir("gfsrc")
    val ck = tmpDir("gfck")
    val t = new TxTable(spark, tmpDir("gft") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publish(src, "a", Seq(("a1", 1), ("a2", 2)))
    drain(src, t, ck)
    assert(t.read.count() === 2)
    publish(src, "b", Seq(("b1", 10)))
    publish(src, "c", Seq(("c1", 20), ("c2", 21)))
    drain(src, t, ck)
    assert(t.read.count() === 5)
    // verbatim re-run: the ledger makes it a no-op
    val v = t.currentVersion
    drain(src, t, ck)
    assert(t.read.count() === 5 && t.currentVersion === v,
      "no new files -> no new batch, no new commit")
    assert(t.read.orderBy("k").as[(String, Int)].collect().toSeq ===
      Seq(("a1", 1), ("a2", 2), ("b1", 10), ("c1", 20), ("c2", 21)))
  }

  test("human-readable spark.sql.files.maxPartitionBytes ('128m') does not crash the stream") {
    val src = tmpDir("gfiles-conf")
    val sinkDir = tmpDir("gfiles-conf-sink") + "/t"
    val sink = new TxTable(spark, sinkDir, srcSchema, Seq("k"),
      numBuckets = 2)
    sink.createIfAbsent()
    publish(src, "m0", Seq(("a", 1), ("b", 2)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    try drain(src, sink, tmpDir("gfiles-conf-ck"))
    finally
      spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    assert(sink.read.count() === 2L)
  }

  test("a file replaced in place (new bytes, same name) loads again") {
    val src = tmpDir("gfsrc2")
    val ck = tmpDir("gfck2")
    val t = new TxTable(spark, tmpDir("gft2") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publish(src, "a", Seq(("a1", 1)))
    drain(src, t, ck)
    assert(t.read.count() === 1)
    Thread.sleep(1100) // local-FS mtime granularity is 1s
    new java.io.File(src, "a.parquet").delete()
    publish(src, "a", Seq(("a1", 1), ("a9", 9)))
    drain(src, t, ck)
    // append contract, same as COPY INTO: both deliveries retained
    assert(t.read.count() === 3)
  }

  test("maxFilesPerTrigger bounds each batch; AvailableNow drains all") {
    val src = tmpDir("gfsrc3")
    val ck = tmpDir("gfck3")
    val t = new TxTable(spark, tmpDir("gft3") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    (1 to 5).foreach(i => publish(src, s"f$i", Seq((s"k$i", i))))
    drain(src, t, ck, Map("maxFilesPerTrigger" -> "2"))
    assert(t.read.count() === 5, "chunked drain must still land all")
    // the ledger shows the chunking: ceil(5/2) = 3 discovery batches
    // (it lives under the stream's per-source checkpoint subdir)
    def find(f: java.io.File): Option[java.io.File] =
      if (f.getName == "graft-files-ledger") Some(f)
      else Option(f.listFiles()).toSeq.flatten
        .filter(_.isDirectory).flatMap(find).headOption
    val ledgerDir = find(new java.io.File(ck))
      .getOrElse(fail(s"no graft-files-ledger under $ck"))
    val ledger = ledgerDir.listFiles()
      .filterNot(_.getName.startsWith(".")).map(_.getName.toLong).sorted
    assert(ledger.length === 3, s"expected 3 ledger batches, got " +
      ledger.mkString(","))
  }

  test("archiveDir moves committed files out of the landing prefix") {
    val src = tmpDir("gfsrc5")
    val arch = tmpDir("gfarch5")
    val ck = tmpDir("gfck5")
    val t = new TxTable(spark, tmpDir("gft5") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publish(src, "a", Seq(("a1", 1), ("a2", 2)))
    publish(src, "b", Seq(("b1", 3)))
    drain(src, t, ck, Map("archiveDir" -> arch))
    assert(t.read.count() === 3)
    // Spark durably commits a batch at the NEXT run's startup — only
    // then do its files move (never before the sink committed them)
    publish(src, "c", Seq(("c1", 4)))
    drain(src, t, ck, Map("archiveDir" -> arch))
    assert(t.read.count() === 4)
    val archived = new java.io.File(arch).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(archived.toSeq === Seq("a.parquet", "b.parquet"),
      s"run-1 files must be archived, got ${archived.toSeq}")
    // archiving lags ONE batch (Spark commits a source batch when it
    // constructs the next one): once d lands, c's batch commits and
    // its file moves — only the un-ingested tail stays in the prefix
    publish(src, "d", Seq(("d1", 5)))
    drain(src, t, ck, Map("archiveDir" -> arch))
    val left = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    assert(left.toSeq === Seq("d.parquet"),
      s"landing dir must hold only the tail batch, got ${left.toSeq}")
    assert(t.read.count() === 5, "archiving must never re-serve or drop")
    // archiveDir inside the source prefix is refused
    publish(src, "e", Seq(("e1", 6)))
    val e = intercept[Exception] {
      drain(src, t, ck, Map("archiveDir" -> (src + "/done")))
    }
    assert(e.getMessage.contains("outside the source") ||
      Option(e.getCause).exists(_.getMessage.contains("outside the source")))
  }

  test("archiveDir never moves a file replaced in place before its batch commits") {
    val src = tmpDir("gfsrc6")
    val arch = tmpDir("gfarch6")
    val ck = tmpDir("gfck6")
    val t = new TxTable(spark, tmpDir("gft6") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publish(src, "a", Seq(("a1", 1), ("a2", 2)))
    drain(src, t, ck, Map("archiveDir" -> arch))      // batch 0: a(v1)
    assert(t.read.count() === 2)
    // REPLACE a in place: the new bytes belong to a FUTURE batch. When
    // batch 0 commits (next run's startup), the archive pass must see
    // the fingerprint changed and leave the file for its own batch —
    // moving it would strand that batch's replay on a missing path
    // and silently lose the replacement content
    Thread.sleep(1100) // mtime tick (fingerprint is path|size|mtime)
    publish(src, "a", Seq(("a3", 7), ("a4", 8), ("a5", 9)))
    publish(src, "b", Seq(("b1", 10)))
    drain(src, t, ck, Map("archiveDir" -> arch))      // batch 1: a(v2), b
    assert(t.read.count() === 2 + 3 + 1,
      "the replaced content must load (by the replaced-file contract)")
    assert(new java.io.File(src, "a.parquet").exists(),
      "a file whose current bytes are NOT yet committed must stay put")
    // once batch 1 commits, the (now-matching) file archives normally
    publish(src, "c", Seq(("c1", 20)))
    drain(src, t, ck, Map("archiveDir" -> arch))      // batch 2: c
    assert(t.read.count() === 7)
    val archived = new java.io.File(arch).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(archived.contains("a.parquet") && archived.contains("b.parquet"),
      s"committed files must archive once their bytes are durable, " +
        s"got ${archived.toSeq}")
    // replay converges after all the movement
    val v = t.currentVersion
    drain(src, t, ck, Map("archiveDir" -> arch))
    assert(t.read.count() === 7 && t.currentVersion === v)
  }

  test("restart with the same checkpoint replays without duplicates") {
    val src = tmpDir("gfsrc4")
    val ck = tmpDir("gfck4")
    val t = new TxTable(spark, tmpDir("gft4") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publish(src, "a", Seq(("a1", 1), ("a2", 2)))
    drain(src, t, ck)
    publish(src, "b", Seq(("b1", 3)))
    // a fresh stream instance on the same checkpoint rebuilds its
    // seen-set from the ledger: file a must not be rediscovered
    drain(src, t, ck)
    assert(t.read.count() === 3)
    assert(t.read.select("k").as[String].collect().sorted.toSeq ===
      Seq("a1", "a2", "b1"))
  }

  private def publishText(dir: String, name: String,
      lines: Seq[String]): Unit = {
    val tmp = new java.io.File(dir, s".$name.tmp")
    java.nio.file.Files.write(tmp.toPath,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(tmp.renameTo(new java.io.File(dir, name)))
    ()
  }

  test("csv with an imposed schema: replace-in-place + restart replay") {
    val src = tmpDir("gfcsv")
    val ck = tmpDir("gfcsvck")
    val t = new TxTable(spark, tmpDir("gfcsvt") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publishText(src, "a.csv", Seq("k,v", "a1,1", "a2,2"))
    drain(src, t, ck, Map("format" -> "csv", "header" -> "true",
      "pattern" -> "*.csv"))
    assert(t.read.orderBy("k").as[(String, Int)].collect().toSeq ===
      Seq(("a1", 1), ("a2", 2)))
    // replace in place: new bytes, same name -> re-served; upsert
    // keys dedup the re-delivery
    publishText(src, "a.csv", Seq("k,v", "a1,1", "a2,2", "a3,3"))
    drain(src, t, ck, Map("format" -> "csv", "header" -> "true",
      "pattern" -> "*.csv"))
    assert(t.read.count() === 5) // append contract: a1/a2 re-landed
    // a fresh stream on the same checkpoint replays nothing
    val v = t.currentVersion
    drain(src, t, ck, Map("format" -> "csv", "header" -> "true",
      "pattern" -> "*.csv"))
    assert(t.currentVersion === v)
    // schema is IMPOSED, never inferred
    val e = intercept[Exception] {
      spark.readStream.format("graft-files").option("format", "csv")
        .load(src)
    }
    assert(e.getMessage.contains("EXPLICIT .schema"))
  }

  test("json lines under the imposed schema; absent columns null-fill") {
    val src = tmpDir("gfjson")
    val ck = tmpDir("gfjsonck")
    val t = new TxTable(spark, tmpDir("gfjsont") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publishText(src, "a.json", Seq(
      """{"k":"j1","v":5}""", """{"k":"j2"}"""))
    drain(src, t, ck, Map("format" -> "json"))
    assert(t.read.orderBy("k").collect().map(r =>
      (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSeq ===
      Seq(("j1", 5), ("j2", -1)))
  }

  test("a multi-row-group landed file fans out to >1 partition, " +
      "identical results") {
    val src = tmpDir("gfsplit")
    val ck = tmpDir("gfsplitck")
    val t = new TxTable(spark, tmpDir("gfsplitt") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    // small row groups => one file, many row groups
    val stage = new java.io.File(src, ".stage-big")
    (1 to 20000).map(i => (f"k$i%05d", i)).toDF("k", "v").coalesce(1)
      .write.option("parquet.block.size", "4096")
      .mode("overwrite").parquet(stage.toString)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(src, "big.parquet")))
    val size = new java.io.File(src, "big.parquet").length()
    assert(size > 40000L, s"need a multi-row-group file, got $size bytes")
    // cap partitions well below the file size -> several byte ranges
    drain(src, t, ck, Map("maxBytesPerPartition" -> (size / 4).toString))
    assert(t.read.count() === 20000L)
    assert(t.read.agg(sum("v")).head.getLong(0) ===
      (1 to 20000).map(_.toLong).sum)
    // the plan really fanned out: replay the committed ledger range
    // through a fresh stream instance and count its partitions
    val stream = new graft.sources.GraftFilesMicroBatchStream(spark,
      src, "*", srcSchema, ck + "/sources/0",
      maxFilesPerTrigger = None, archiveDir = None,
      maxBytesPerPartition = Some(size / 4))
    val parts = stream.planInputPartitions(
      graft.sources.GraftFilesOffset(0L),
      stream.reportLatestOffset()
        .asInstanceOf[graft.sources.GraftFilesOffset])
    assert(parts.length >= 4,
      s"a ${size}B file at ${size / 4}B/partition must fan out, " +
        s"got ${parts.length}")
    val ranges = parts.map(_.asInstanceOf[
      graft.sources.GraftInputPartition]).sortBy(_.start)
    assert(ranges.head.start === 0L)
    assert(ranges.map(r => r.start + r.length).max === size,
      "ranges must tile the exact file size")
    // a second drain with no cap is still exactly-once (no dup)
    val v = t.currentVersion
    drain(src, t, ck)
    assert(t.currentVersion === v && t.read.count() === 20000L)
  }

  test("hive-partitioned landings surface k=v segments as typed columns") {
    val src = tmpDir("gfhive")
    val ck = tmpDir("gfhive-ck")
    val hSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType),
      StructField("dt", DateType), StructField("region", StringType)))
    val t = new TxTable(spark, tmpDir("gfhive-t") + "/t", hSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    // two date partitions: one with a hive-escaped space AND a
    // literal '+' (legal unescaped - URLDecoder would corrupt it to a
    // space), one with the hive null sentinel
    publish(src + "/dt=2026-01-01/region=us%20east+1", "a",
      Seq(("a1", 1), ("a2", 2)))
    publish(src + "/dt=2026-01-02/region=__HIVE_DEFAULT_PARTITION__",
      "b", Seq(("b1", 10)))
    def drainHive(): Unit = {
      val q = spark.readStream.format("graft-files").schema(hSchema)
        .option("hivePartitions", "true")
        .load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start(t.dir)
      q.awaitTermination()
    }
    drainHive()
    val rows = t.read.orderBy("k").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getDate(2).toString).toSeq ===
      Seq("2026-01-01", "2026-01-01", "2026-01-02"))
    assert(rows.map(r => Option(r.getString(3))).toSeq ===
      Seq(Some("us east+1"), Some("us east+1"), None))
    // restart replay: same checkpoint, nothing new - values stable
    val ver = t.currentVersion
    drainHive()
    assert(t.currentVersion === ver && t.read.count() === 3)
    // a late file in an existing partition still lands with its path values
    publish(src + "/dt=2026-01-01/region=eu", "c", Seq(("c1", 7)))
    drainHive()
    assert(t.read.filter(col("region") === "eu").count() === 1)
  }

  private def publishAvro(dir: String, name: String,
      rows: Seq[(String, Int)]): Unit = {
    import org.apache.avro.{Schema => ASchema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    new java.io.File(dir).mkdirs()
    val asch: ASchema = SchemaBuilder.record("rec").fields()
      .optionalString("k").optionalInt("v").endRecord()
    val tmp = new java.io.File(dir, s".$name.avro.tmp")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](asch))
    w.create(asch, tmp)
    rows.foreach { case (k, v) =>
      val r = new GenericData.Record(asch)
      r.put("k", k); r.put("v", v)
      w.append(r)
    }
    w.close()
    assert(tmp.renameTo(new java.io.File(dir, s"$name.avro")))
    ()
  }

  test("avro landings decode under the imposed schema; restart replays") {
    val src = tmpDir("gfavro")
    val ck = tmpDir("gfavro-ck")
    val t = new TxTable(spark, tmpDir("gfavro-t") + "/t", srcSchema,
      Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    publishAvro(src, "a", Seq(("a1", 1), ("a2", 2)))
    drain(src, t, ck, Map("format" -> "avro", "pattern" -> "*.avro"))
    assert(t.read.orderBy("k").collect().map(r =>
      (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a1", 1), ("a2", 2)))
    // re-run no-ops; a new file serves exactly once
    publishAvro(src, "b", Seq(("b1", 10)))
    drain(src, t, ck, Map("format" -> "avro", "pattern" -> "*.avro"))
    drain(src, t, ck, Map("format" -> "avro", "pattern" -> "*.avro"))
    assert(t.read.count() === 3)
    assert(t.read.agg(sum("v")).head.getLong(0) === 13L)
  }
}
