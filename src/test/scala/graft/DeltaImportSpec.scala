package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.{DeltaExport, DeltaImport, TxTable}

/** Delta-protocol import: the production reader must (a) round-trip
  * [[DeltaExport]]'s own snapshots exactly, (b) replay MULTI-commit
  * logs written by other engines per the protocol's state
  * reconstruction rules (adds minus removes, re-add replaces,
  * last metaData wins), (c) materialize log-carried partition values
  * as typed columns, and (d) refuse what it cannot honestly read
  * (higher protocol floors, gapped logs) instead of misreading. */
class DeltaImportSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def writeCommit(tableDir: String, version: Long,
      lines: Seq[String]): Unit = {
    val logDir = new File(tableDir, "_delta_log")
    logDir.mkdirs()
    Files.write(Paths.get(logDir.toString, f"$version%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private val protoLine =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private def metaLine(schemaJson: String, partCols: Seq[String]) = {
    val pc = partCols.map(c => s""""$c"""").mkString(",")
    s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          org.json4s.JString(schemaJson)))},""" +
      s""""partitionColumns":[$pc],"configuration":{},"createdTime":1}}"""
  }

  private def metaLineConf(schemaJson: String, partCols: Seq[String],
      conf: Map[String, String]): String = {
    val pc = partCols.map(c => s""""$c"""").mkString(",")
    val cj = conf.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          org.json4s.JString(schemaJson)))},""" +
      s""""partitionColumns":[$pc],"configuration":{$cj},"createdTime":1}}"""
  }

  /** Write a single-file parquet dir, return the data file's name
    * relative to tableDir. */
  private def dataFile(tableDir: String, sub: String,
      df: org.apache.spark.sql.DataFrame): String = {
    val out = new File(tableDir, sub)
    df.coalesce(1).write.mode("overwrite").parquet(out.toString)
    val f = out.listFiles().filter(_.getName.endsWith(".parquet")).head
    s"$sub/${f.getName}"
  }

  test("columnMapping id mode binds by parquet footer field id, not name") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = tmpDir("deltai-id") + "/t"
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    // file columns: (pq_a LONG, id=1) and (pq_b STRING, id=2). The
    // LOGICAL schema names a STRING column "pq_a" — the long column's
    // parquet name — and its physicalNames match NOTHING in the file:
    // binding by name (logical or physical) would misread or fail;
    // only footer-field-id binding reads this table correctly (the
    // Iceberg-uniform-convert shape id mode exists for).
    def idMd(i: Long) = new MetadataBuilder()
      .putLong("parquet.field.id", i).build()
    val fileSchema = StructType(Seq(
      StructField("pq_a", LongType, nullable = true, idMd(1)),
      StructField("pq_b", StringType, nullable = true, idMd(2))))
    val data = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "x"), Row(2L, "y"), Row(3L, "z")), 1), fileSchema)
    val rel = dataFile(dir, "data", data)
    def fmd(id: Long, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    val logical = StructType(Seq(
      StructField("user_id", LongType, nullable = true,
        fmd(1, "col-aaaa")),
      StructField("pq_a", StringType, nullable = true,
        fmd(2, "col-bbbb"))))
    writeCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLineConf(logical.json, Nil, Map(
        "delta.columnMapping.mode" -> "id",
        "delta.columnMapping.maxColumnId" -> "2")),
      s"""{"add":{"path":"$rel","partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true}}"""))
    val out = DeltaImport.read(spark, dir)
    assert(out.columns.toSeq === Seq("user_id", "pq_a"))
    assert(rows(out) ===
      Set(Seq(1L, "x"), Seq(2L, "y"), Seq(3L, "z")))
  }

  test("readWhere skips files by add-action stats (pruning-proof)") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("deltai-skip") + "/t"
    val rel = dataFile(dir, "data",
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    // the second add points at a file that DOES NOT EXIST, with stats
    // proving k in [100, 200]: a reader that fails to prune it would
    // die with FileNotFound - success IS the skipping proof
    writeCommit(dir, 0, Seq(protoLine, metaLine(schema.json, Nil),
      s"""{"add":{"path":"$rel","partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true,"stats":""" +
        """"{\"numRecords\":2,\"minValues\":{\"k\":1},""" +
        """\"maxValues\":{\"k\":2},\"nullCount\":{\"k\":0}}"}}""",
      """{"add":{"path":"data/ghost.parquet","partitionValues":{},""" +
        """"size":1,"modificationTime":1,"dataChange":true,"stats":""" +
        """"{\"numRecords\":5,\"minValues\":{\"k\":100},""" +
        """\"maxValues\":{\"k\":200},\"nullCount\":{\"k\":0}}"}}"""))
    val got = DeltaImport.readWhere(spark, dir, col("k") < 10L)
    assert(rows(got) === Set(Seq(1L, "a"), Seq(2L, "b")))
    // sanity: the unpruned read DOES fail on the ghost file
    intercept[Exception] { DeltaImport.read(spark, dir).collect() }
    // a predicate overlapping the ghost's range must keep it (and
    // fail honestly - pruning never drops a may-match file)
    intercept[Exception] {
      DeltaImport.readWhere(spark, dir, col("k") > 150L).collect()
    }
  }

  test("columnMapping NAME mode with partition columns maps partitionValues") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("deltai-mappart") + "/t"
    // data files carry ONLY the physical value column; the partition
    // column exists in the log alone, keyed by its PHYSICAL name in
    // every add action's partitionValues (the protocol's contract)
    val relA = dataFile(dir, "p=10",
      Seq(1L, 2L).toDF("c-val"))
    val relB = dataFile(dir, "p=20",
      Seq(3L).toDF("c-val"))
    def fmd(id: Long, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    val logical = StructType(Seq(
      StructField("p", IntegerType, nullable = true, fmd(1, "c-part")),
      StructField("v", LongType, nullable = true, fmd(2, "c-val"))))
    writeCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLineConf(logical.json, Seq("p"), Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "2")),
      s"""{"add":{"path":"$relA","partitionValues":{"c-part":"10"},""" +
        """"size":1,"modificationTime":1,"dataChange":true}}""",
      s"""{"add":{"path":"$relB","partitionValues":{"c-part":"20"},""" +
        """"size":1,"modificationTime":1,"dataChange":true}}"""))
    val out = DeltaImport.read(spark, dir)
    assert(out.columns.toSeq === Seq("p", "v"))
    assert(rows(out) === Set(Seq(10, 1L), Seq(10, 2L), Seq(20, 3L)))
  }

  test("round-trips DeltaExport's snapshot through the production reader") {
    val dir = tmpDir("deltai-rt") + "/t"
    val data = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t.upsert(Seq((2L, "B", 21.0)).toDF("k", "name", "v"))
    t.deleteWhere(col("k") === 3L)
    DeltaExport.writeDeltaLog(spark, t)
    val back = DeltaImport.read(spark, dir)
    // names + types must match the log's declared schema; nullability
    // relaxes to true, the standard Spark file-scan behavior
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      t.currentSchema.map(f => (f.name, f.dataType)))
    assert(rows(back) === rows(t.read))
  }

  test("multi-commit replay: remove drops, re-add replaces, order holds") {
    val dir = tmpDir("deltai-mc") + "/t"
    val schema = Seq((0L, "")).toDF("k", "s").schema
    val f1 = dataFile(dir, "d1", Seq((1L, "one"), (2L, "two")).toDF("k", "s"))
    val f2 = dataFile(dir, "d2", Seq((3L, "three")).toDF("k", "s"))
    val f3 = dataFile(dir, "d3", Seq((4L, "four")).toDF("k", "s"))
    writeCommit(dir, 0L, Seq(protoLine, metaLine(schema.json, Nil),
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""",
      s"""{"add":{"path":"$f2","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    writeCommit(dir, 1L, Seq(
      s"""{"remove":{"path":"$f2","deletionTimestamp":2,"dataChange":true}}""",
      s"""{"add":{"path":"$f3","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))
    // commit 2: re-add f1 (metadata refresh) — must not duplicate it
    writeCommit(dir, 2L, Seq(
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":3,"dataChange":false}}"""))
    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 2L)
    assert(snap.files.map(_._1).count(_.endsWith(f1.split("/").last)) === 1)
    assert(rows(DeltaImport.read(spark, dir)) ===
      Set(Seq(1L, "one"), Seq(2L, "two"), Seq(4L, "four")))
  }

  test("log-carried partition values materialize as typed columns") {
    val dir = tmpDir("deltai-pv") + "/t"
    import org.apache.spark.sql.types._
    val full = StructType(Seq(StructField("k", LongType),
      StructField("p", IntegerType), StructField("s", StringType)))
    val f1 = dataFile(dir, "p1", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val f2 = dataFile(dir, "p2", Seq((3L, "c")).toDF("k", "s"))
    writeCommit(dir, 0L, Seq(protoLine, metaLine(full.json, Seq("p")),
      s"""{"add":{"path":"$f1","partitionValues":{"p":"7"},"size":1,"modificationTime":1,"dataChange":true}}""",
      s"""{"add":{"path":"$f2","partitionValues":{"p":null},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val back = DeltaImport.read(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("k", "p", "s"))
    assert(back.schema("p").dataType === IntegerType)
    assert(rows(back) === Set(Seq(1L, 7, "a"), Seq(2L, 7, "b"),
      Seq(3L, null, "c")))
  }

  test("syncDeltaLog follows TxTable commits; VERSION AS OF time-travels") {
    val dir = tmpDir("deltai-sync") + "/t"
    val data = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    // first sync = full export (commit 0)
    val c0 = DeltaExport.syncDeltaLog(spark, t)
    assert(c0.exists(_.endsWith("00000000000000000000.json")))
    val atV0 = rows(DeltaImport.read(spark, dir))

    t.upsert(Seq((2L, 21.0), (5L, 50.0)).toDF("k", "v"))
    t.deleteWhere(col("k") === 3L)
    // second sync = the diff commit (removes rewritten buckets' old
    // files, adds their new ones)
    val c1 = DeltaExport.syncDeltaLog(spark, t)
    assert(c1.exists(_.endsWith("00000000000000000001.json")))
    val lines = scala.io.Source.fromFile(
      c1.get.stripPrefix("file:"), "UTF-8").getLines().toSeq
    assert(lines.exists(_.contains("\"remove\"")))
    assert(lines.exists(_.contains("\"add\"")))

    // current read follows the table; as-of 0 replays the old snapshot
    assert(rows(DeltaImport.read(spark, dir)) === rows(t.read))
    assert(rows(DeltaImport.read(spark, dir, asOf = Some(0L))) === atV0)
    assert(rows(DeltaImport.read(spark, dir)) ===
      Set(Seq(1L, 10.0), Seq(2L, 21.0), Seq(4L, 40.0), Seq(5L, 50.0)))

    // already-current log: sync is a no-op, nothing written
    assert(DeltaExport.syncDeltaLog(spark, t).isEmpty)
    assert(DeltaImport.snapshot(spark, dir).version === 1L)
  }

  test("checkpoint bootstraps a long synced history without the JSON prefix") {
    val dir = tmpDir("deltai-cp") + "/t"
    val data = Seq((1L, 0.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    // 13 synced commits at interval 5 → checkpoints at 5 and 10
    assert(DeltaExport.syncDeltaLog(spark, t, checkpointInterval = 5).nonEmpty)
    (1L to 12L).foreach { i =>
      t.upsert(Seq((i % 4L, i.toDouble)).toDF("k", "v"))
      assert(DeltaExport.syncDeltaLog(spark, t, checkpointInterval = 5).nonEmpty)
    }
    val logDir = new File(dir, "_delta_log")
    assert(new File(logDir, "00000000000000000010.checkpoint.parquet").exists())
    assert(new File(logDir, "_last_checkpoint").exists())

    // the bootstrap must NOT replay the JSON prefix: only the tail
    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 12L)
    assert(snap.fromCheckpoint === Some(10L))
    assert(snap.replayedJsonCommits === 2,
      s"expected 2 tail commits, replayed ${snap.replayedJsonCommits}")
    assert(rows(DeltaImport.read(spark, dir)) === rows(t.read))

    // vacuum the JSON prefix (protocol allows it once checkpointed):
    // current reads still work from the checkpoint alone…
    (0L to 10L).foreach(v =>
      new File(logDir, f"$v%020d.json").delete())
    val snap2 = DeltaImport.snapshot(spark, dir)
    assert(snap2.fromCheckpoint === Some(10L) &&
      snap2.replayedJsonCommits === 2)
    assert(rows(DeltaImport.read(spark, dir)) === rows(t.read))
    // …the checkpoint preserves add.stats (skipping parity for
    // bootstrapped readers)…
    assert(snap2.adds.forall(_.stats.exists(_.contains("numRecords"))),
      "checkpoint lost add.stats")
    // …and time travel BELOW the checkpoint refuses with the gap
    // named instead of replaying a history that no longer exists
    val e = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir, asOf = Some(3L))
    }
    assert(e.getMessage.contains("missing commits"))
  }

  test("inline deletion vectors (storageType i) mask merge-on-read") {
    val dir = tmpDir("deltai-inline") + "/t"
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("k", "s")
    val rel = dataFile(dir, "data", df)
    // foreign writer shape: the bitmap bytes ride the descriptor
    // itself, Base85-encoded - delete physical rows 0 and 3
    val bitmap = graft.core.DeltaDv.serializeBitmap(Iterator(0L, 3L))
    val enc = graft.core.DeltaDv.encodeBase85(bitmap)
    // round-trip sanity of the codec itself
    assert(graft.core.DeltaDv
      .deserializeBitmap(graft.core.DeltaDv.decodeBase85(enc, bitmap.length))
      .toSeq === Seq(0L, 3L))
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      metaLine(df.schema.json, Nil),
      s"""{"add":{"path":"$rel","partitionValues":{},"size":1,""" +
        s""""modificationTime":1,"dataChange":true,"deletionVector":{""" +
        s""""storageType":"i","pathOrInlineDv":"$enc",""" +
        s""""sizeInBytes":${bitmap.length},"cardinality":2}}}"""))
    val back = DeltaImport.read(spark, dir)
    assert(back.count() === 8L)
    // physical rows 0 and 3 of the single file are gone; parquet
    // wrote df's rows in order after coalesce(1)
    val kept = back.collect().map(_.getLong(0)).toSet
    val written = spark.read.parquet(s"$dir/$rel")
      .collect().map(_.getLong(0)).toSeq
    assert(kept === written.zipWithIndex
      .filterNot { case (_, i) => i == 0 || i == 3 }.map(_._1).toSet)
  }

  test("refuses unsupported protocols and gapped logs honestly") {
    // reader v3 demanding a feature we don't implement → refused
    val dir = tmpDir("deltai-ref") + "/t"
    val schema = Seq((0L, "")).toDF("k", "s").schema
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],""" +
        """"writerFeatures":["typeWidening"]}}""",
      metaLine(schema.json, Nil)))
    val e1 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir)
    }
    assert(e1.getMessage.contains("typeWidening"))

    // reader v2 (column mapping implied) → ACCEPTED at the protocol
    // gate (name mode binds by physicalName, id mode by footer field
    // id — see the id-mode test above); a MALFORMED id-mode log
    // (fields missing delta.columnMapping.id) refuses AT SCAN TIME
    // instead of guessing a name binding
    val dirB = tmpDir("deltai-ref2") + "/t"
    writeCommit(dirB, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(schema.json, Nil)))
    assert(DeltaImport.snapshot(spark, dirB).version === 0L)
    val dirB2 = tmpDir("deltai-ref2b") + "/t"
    writeCommit(dirB2, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(schema.json, Nil).replace(
        "\"configuration\":{}",
        "\"configuration\":{\"delta.columnMapping.mode\":\"id\"}")))
    val eB = intercept[IllegalArgumentException] {
      DeltaImport.read(spark, dirB2)
    }
    assert(eB.getMessage.contains("delta.columnMapping.id"))
    // an unknown mapping mode stays an honest refusal
    val dirB3 = tmpDir("deltai-ref2c") + "/t"
    writeCommit(dirB3, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(schema.json, Nil).replace(
        "\"configuration\":{}",
        "\"configuration\":{\"delta.columnMapping.mode\":\"weird\"}")))
    val eB3 = intercept[UnsupportedOperationException] {
      DeltaImport.read(spark, dirB3)
    }
    assert(eB3.getMessage.contains("weird"))

    // reader v3 limited to deletionVectors → ACCEPTED (we mask DVs)
    val dirC = tmpDir("deltai-ref3") + "/t"
    writeCommit(dirC, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      metaLine(schema.json, Nil)))
    val ok = DeltaImport.snapshot(spark, dirC)
    assert(ok.protocol.minReaderVersion === 3)
    assert(ok.protocol.readerFeatures === Seq("deletionVectors"))

    val dir2 = tmpDir("deltai-gap") + "/t"
    writeCommit(dir2, 1L, Seq(protoLine, metaLine(schema.json, Nil)))
    val e2 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir2)
    }
    assert(e2.getMessage.contains("missing commits"))
  }

  // ---- foreign checkpoint dialects: multipart + v2 (UUID/sidecar) ----

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType,
    LongType, MapType, StringType, StructField, StructType}

  /** The checkpoint action row shape stock writers use (the columns
    * this reader consumes; real checkpoints carry more — ignored). */
  private val actionSchema = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("createdTime", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))),
    StructField("sidecar", StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType))))))

  private def protoRow(reader: Int = 1, writer: Int = 2,
      rf: Seq[String] = null, wf: Seq[String] = null): Row =
    Row(Row(reader, writer, rf, wf), null, null, null)
  private def metaRow(schemaJson: String): Row =
    Row(null, Row("t", Row("parquet"), schemaJson, Seq.empty[String], 1L),
      null, null)
  private def addRow(rel: String, size: Long): Row =
    Row(null, null,
      Row(rel, Map.empty[String, String], size, 1L, true,
        """{"numRecords":2}"""), null)
  private def sidecarRow(name: String, size: Long): Row =
    Row(null, null, null, Row(name, size, 1L))

  /** Write action rows as ONE parquet file with an exact name. */
  private def writeActionsFile(intoDir: File, name: String,
      actions: Seq[Row]): Unit = {
    intoDir.mkdirs()
    val tmp = new File(intoDir, s".tmp-$name")
    spark.createDataFrame(
      java.util.Arrays.asList(actions: _*), actionSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new File(intoDir, name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
  }

  test("MULTIPART checkpoint bootstraps with the JSON prefix vacuumed") {
    val dir = tmpDir("deltai-mp") + "/t"
    val logDir = new File(dir, "_delta_log")
    val data1 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val data2 = Seq((3L, 30.0), (4L, 40.0)).toDF("k", "v")
    val rel1 = dataFile(dir, "d1", data1)
    val rel2 = dataFile(dir, "d2", data2)
    def sz(rel: String) = new File(dir, rel).length()
    // checkpoint at v2 split across two parts (actions may land in
    // ANY part, per the protocol); NO json commits exist at all —
    // the vacuumed-prefix shape stock writers produce past
    // checkpoint.partSize
    writeActionsFile(logDir,
      "00000000000000000002.checkpoint.0000000001.0000000002.parquet",
      Seq(protoRow(), metaRow(data1.schema.json)))
    writeActionsFile(logDir,
      "00000000000000000002.checkpoint.0000000002.0000000002.parquet",
      Seq(addRow(rel1, sz(rel1)), addRow(rel2, sz(rel2))))
    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 2L)
    assert(snap.fromCheckpoint === Some(2L))
    assert(snap.replayedJsonCommits === 0)
    assert(snap.adds.size === 2)
    assert(rows(DeltaImport.read(spark, dir)) ===
      Set(Seq(1L, 10.0), Seq(2L, 20.0), Seq(3L, 30.0), Seq(4L, 40.0)))

    // a json tail after the checkpoint composes on top
    val data3 = Seq((5L, 50.0)).toDF("k", "v")
    val rel3 = dataFile(dir, "d3", data3)
    writeCommit(dir, 3L, Seq(
      s"""{"add":{"path":"$rel3","partitionValues":{},"size":${sz(rel3)},""" +
        s""""modificationTime":1,"dataChange":true}}"""))
    assert(DeltaImport.snapshot(spark, dir).version === 3L)
    assert(rows(DeltaImport.read(spark, dir)).size === 5)

    // an INCOMPLETE part set is not a checkpoint: with part 2 gone
    // and no json prefix, the table honestly refuses
    new File(logDir,
      "00000000000000000002.checkpoint.0000000002.0000000002.parquet")
      .delete()
    val e = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("missing commits"))
  }

  test("V2 checkpoint (UUID main + sidecars) bootstraps; feature accepted") {
    val dir = tmpDir("deltai-v2cp") + "/t"
    val logDir = new File(dir, "_delta_log")
    val data1 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val data2 = Seq((3L, 30.0)).toDF("k", "v")
    val rel1 = dataFile(dir, "d1", data1)
    val rel2 = dataFile(dir, "d2", data2)
    def sz(rel: String) = new File(dir, rel).length()
    // live adds split across two sidecar files under _sidecars/
    val scDir = new File(logDir, "_sidecars")
    writeActionsFile(scDir, "s1.parquet", Seq(addRow(rel1, sz(rel1))))
    writeActionsFile(scDir, "s2.parquet", Seq(addRow(rel2, sz(rel2))))
    def scSize(n: String) = new File(scDir, n).length()
    // UUID-named v2 main: protocol DECLARES v2Checkpoint (reader v3),
    // metaData, and the sidecar pointers — no adds inline
    writeActionsFile(logDir,
      "00000000000000000004.checkpoint." +
        "0aa38b51-6b3a-4c5e-9f5e-0123456789ab.parquet",
      Seq(
        protoRow(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")),
        metaRow(data1.schema.json),
        sidecarRow("s1.parquet", scSize("s1.parquet")),
        sidecarRow("s2.parquet", scSize("s2.parquet"))))
    // the JSON prefix is fully vacuumed: bootstrap MUST come from the
    // v2 checkpoint, not replay
    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 4L)
    assert(snap.fromCheckpoint === Some(4L))
    assert(snap.protocol.readerFeatures === Seq("v2Checkpoint"))
    assert(snap.adds.size === 2)
    assert(snap.adds.forall(_.stats.exists(_.contains("numRecords"))),
      "sidecar adds lost stats")
    assert(rows(DeltaImport.read(spark, dir)) ===
      Set(Seq(1L, 10.0), Seq(2L, 20.0), Seq(3L, 30.0)))
  }

  test("V2 checkpoint with a JSON main (inline adds) bootstraps") {
    val dir = tmpDir("deltai-v2cpj") + "/t"
    val logDir = new File(dir, "_delta_log")
    logDir.mkdirs()
    val data1 = Seq((7L, 70.0), (8L, 80.0)).toDF("k", "v")
    val rel1 = dataFile(dir, "d1", data1)
    val sz1 = new File(dir, rel1).length()
    val mainLines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      metaLine(data1.schema.json, Nil),
      s"""{"add":{"path":"$rel1","partitionValues":{},"size":$sz1,""" +
        s""""modificationTime":1,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":2}"}}""")
    Files.write(Paths.get(logDir.toString,
      "00000000000000000001.checkpoint." +
        "9bc0e1f2-1234-4abc-8def-aabbccddeeff.json"),
      mainLines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 1L && snap.fromCheckpoint === Some(1L))
    assert(rows(DeltaImport.read(spark, dir)) ===
      Set(Seq(7L, 70.0), Seq(8L, 80.0)))

    // an UNKNOWN reader feature in the checkpoint still refuses
    val dir2 = tmpDir("deltai-v2cpu") + "/t"
    val log2 = new File(dir2, "_delta_log"); log2.mkdirs()
    Files.write(Paths.get(log2.toString,
      "00000000000000000001.checkpoint." +
        "9bc0e1f2-1234-4abc-8def-aabbccddee00.json"),
      (Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint","futureMagic"],""" +
        """"writerFeatures":[]}}""",
        metaLine(data1.schema.json, Nil))
        .mkString("", "\n", "\n")).getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir2)
    }
    assert(e.getMessage.contains("futureMagic"))
  }

  test("variantShredding: SHREDDED parquet reassembles through the declared VariantType") {
    val dir = tmpDir("deltai-shred") + "/t"
    val kW = "spark.sql.variant.writeShredding.enabled"
    val kI = "spark.sql.variant.inferShreddingSchema"
    val olds = Seq(kW, kI).map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption)
    val df = spark.range(0L, 50L).select(col("id").as("k"),
      parse_json(format_string("""{"a":%d,"b":"s%d"}""",
        col("id"), col("id"))).as("pv"))
    try {
      spark.conf.set(kW, "true"); spark.conf.set(kI, "true")
      df.coalesce(1).write.parquet(s"$dir/data")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val file = new File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // honesty check: the staged file IS shredded (typed subcolumns in
    // the parquet group) — otherwise this test would only re-prove
    // the plain variantType path
    val pin = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString),
        spark.sparkContext.hadoopConfiguration))
    val footerSchema =
      try pin.getFooter.getFileMetaData.getSchema.toString
      finally pin.close()
    assert(footerSchema.contains("typed_value"),
      s"fixture did not shred:\n$footerSchema")

    // a foreign log declaring BOTH variant features over the file
    val schemaJson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JString(df.schema.json)))
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["variantType","variantShredding"],""" +
        """"writerFeatures":["variantType","variantShredding"]}}""",
      s"""{"metaData":{"id":"shred","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":$schemaJson,""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"data/${file.getName}","partitionValues":{},""" +
        s""""size":${file.length()},"modificationTime":1,""" +
        s""""dataChange":true}}"""))
    val back = DeltaImport.read(spark, dir)
    assert(back.schema("pv").dataType ===
      org.apache.spark.sql.types.VariantType)
    // typed extraction over the REASSEMBLED variant equals recompute
    assert(back.select(sum(variant_get(col("pv"), "$.a", "long")))
      .head.getLong(0) === (0L until 50L).sum)
    assert(back.where(variant_get(col("pv"), "$.b", "string") === "s7")
      .select("k").head.getLong(0) === 7L)
  }

  test("a dropped column round-trips as ABSENT (stock readers project by name)") {
    val dir = tmpDir("deltai-drop") + "/t"
    val data = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t.dropColumns(Seq("name")) // metadata-only: files still hold 'name'
    DeltaExport.writeDeltaLog(spark, t)
    val back = DeltaImport.read(spark, dir)
    // the exported schemaString is the narrowed schema; the reader
    // projects the data files by name, so the physically-present
    // dropped column never resurfaces through the interop path either
    assert(back.columns.toSeq === Seq("k", "v"))
    assert(rows(back) === rows(t.read))
  }
}
