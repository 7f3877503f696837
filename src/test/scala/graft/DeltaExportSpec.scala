package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{DeltaExport, TxTable}

/** Delta-protocol export: the generated `_delta_log` must satisfy a
  * reader implementing the OPEN Delta protocol reading rules
  * (PROTOCOL.md): protocol gate, last-metaData-wins, live file set =
  * adds minus removes, schemaString = Spark StructType JSON. The
  * reconstructed table must read byte-equal to TxTable, and the log
  * SHAPE is pinned by a checked-in golden (volatile fields
  * normalized). */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal Delta log reader per the public protocol: one JSON action
    * per line; protocol must be supported; the live files are add
    * paths minus remove paths (single-commit logs have no removes). */
  private case class DeltaSnapshot(schema: StructType, files: Seq[String])
  private def readDeltaLog(commitPath: String, root: String): DeltaSnapshot = {
    val lines = scala.io.Source.fromFile(
      commitPath.stripPrefix("file:"), "UTF-8").getLines().toSeq
      .filter(_.nonEmpty)
    val actions = lines.map(JsonMethods.parse(_))
    val protocol = actions.collectFirst {
      case a if (a \ "protocol") != JNothing => a \ "protocol" }
    assert(protocol.isDefined, "protocol action required in commit 0")
    val JInt(r) = protocol.get \ "minReaderVersion"
    assert(r.toInt <= 1, s"reader version $r unsupported at the floor")
    val meta = actions.collect {
      case a if (a \ "metaData") != JNothing => a \ "metaData" }.lastOption
    assert(meta.isDefined, "metaData action required in commit 0")
    val JString(schemaString) = meta.get \ "schemaString"
    val JString(provider) = meta.get \ "format" \ "provider"
    assert(provider === "parquet")
    val adds = actions.collect {
      case a if (a \ "add") != JNothing =>
        val JString(p) = (a \ "add") \ "path"; p }
    val removes = actions.collect {
      case a if (a \ "remove") != JNothing =>
        val JString(p) = (a \ "remove") \ "path"; p }.toSet
    DeltaSnapshot(
      DataType.fromJson(schemaString).asInstanceOf[StructType],
      adds.filterNot(removes).map(p => s"$root/$p"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("a Delta reader reconstructs the exported snapshot exactly") {
    val dir = tmpDir("deltax") + "/t"
    val data = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t.upsert(Seq((2L, "B", 21.0)).toDF("k", "name", "v"))
    t.deleteWhere(col("k") === 3L)
    val commit = DeltaExport.writeDeltaLog(spark, t)
    assert(commit.endsWith("_delta_log/00000000000000000000.json"))
    val snap = readDeltaLog(commit, dir)
    assert(snap.schema === t.currentSchema)
    assert(snap.files.nonEmpty)
    assert(snap.files.forall(!_.contains(":/")), "paths must be relative")
    val viaDelta = spark.read.schema(snap.schema)
      .parquet(snap.files: _*)
    assert(rows(viaDelta) === rows(t.read))
    assert(rows(viaDelta) === Set(Seq(1L, "a", 10.0), Seq(2L, "B", 21.0),
      Seq(4L, "d", 40.0)))
  }

  test("outstanding deletion vectors export NATIVELY at protocol (3,7)") {
    val dir = tmpDir("deltax-dv") + "/t"
    val data = (1L to 20L).map(k => (k, s"n$k")).toDF("k", "name")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t.deleteWhereLight(col("k") <= 5L)
    val commit = DeltaExport.writeDeltaLog(spark, t) // no materialize
    val actions = scala.io.Source.fromFile(
      commit.stripPrefix("file:"), "UTF-8").getLines().toSeq
      .filter(_.nonEmpty).map(JsonMethods.parse(_))

    // protocol action: table features, DV named in BOTH lists
    val proto = actions.collectFirst {
      case a if (a \ "protocol") != JNothing => a \ "protocol" }.get
    assert((proto \ "minReaderVersion") === JInt(3))
    assert((proto \ "minWriterVersion") === JInt(7))
    assert((proto \ "readerFeatures") ===
      JArray(List(JString("deletionVectors"))))
    assert((proto \ "writerFeatures") ===
      JArray(List(JString("deletionVectors"))))
    val meta = actions.collectFirst {
      case a if (a \ "metaData") != JNothing => a \ "metaData" }.get
    assert((meta \ "configuration" \ "delta.enableDeletionVectors") ===
      JString("true"))

    // stock-reader descriptor shape on every DV'd add: storageType u,
    // prefix+Base85-UUID path, offset past the version byte, honest
    // cardinality, and stats demoted to tightBounds=false
    val adds = actions.collect {
      case a if (a \ "add") != JNothing => a \ "add" }
    val dvAdds = adds.filter(a => (a \ "deletionVector") != JNothing)
    assert(dvAdds.nonEmpty, "a file with tombstones must carry a DV")
    var totalCard = 0L
    dvAdds.foreach { a =>
      val d = a \ "deletionVector"
      assert((d \ "storageType") === JString("u"))
      val JString(enc) = d \ "pathOrInlineDv"
      assert(enc.length >= 20)
      def num(j: JValue): Long = j match {
        case JLong(l) => l
        case JInt(i)  => i.toLong
        case other    => fail(s"not a number: $other")
      }
      val off = num(d \ "offset")
      val size = num(d \ "sizeInBytes")
      val card = num(d \ "cardinality")
      assert(off >= 1L && size > 0L && card > 0L)
      totalCard += card
      val JString(st) = a \ "stats"
      assert(st.contains("\"tightBounds\":false"))
      // the blob itself round-trips: CRC-validated read, portable
      // RoaringBitmapArray decode, cardinality agreement
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val bytes = graft.core.DeltaDv.readDvBlob(fs, dir, enc, off, size)
      assert(graft.core.DeltaDv.deserializeBitmap(bytes).length.toLong
        === card)
    }
    assert(totalCard === 5L, "exactly the 5 tombstoned rows")
    // the DV file is the protocol's: one leading format-version byte
    val bin = new java.io.File(dir).listFiles()
      .find(_.getName.startsWith("deletion_vector_")).get
    val head = java.nio.file.Files.readAllBytes(bin.toPath)
    assert(head(0) === 1.toByte)

    // merge-on-read round trip through the production reader, with
    // the tombstones still outstanding on the TxTable side
    val viaDelta = graft.core.DeltaImport.read(spark, dir)
    assert(rows(viaDelta) === rows(t.read))
    assert(viaDelta.count() === 15L)
  }

  test("syncDeltaLog re-adds a file whose DV grew; floor logs upgrade") {
    val dir = tmpDir("deltax-dvsync") + "/t"
    val data = (1L to 30L).map(k => (k, s"n$k")).toDF("k", "name")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    DeltaExport.writeDeltaLog(spark, t) // clean → floor (1,2)
    val s0 = graft.core.DeltaImport.snapshot(spark, dir)
    assert(s0.protocol.minReaderVersion === 1)

    t.deleteWhereLight(col("k") <= 4L)
    assert(DeltaExport.syncDeltaLog(spark, t).isDefined)
    val s1 = graft.core.DeltaImport.snapshot(spark, dir)
    // same commit carries the protocol upgrade and the DV'd re-adds
    assert(s1.protocol.minReaderVersion === 3)
    assert(s1.protocol.readerFeatures === Seq("deletionVectors"))
    assert(s1.adds.flatMap(_.deletionVector).map(_.cardinality).sum === 4L)
    assert(rows(graft.core.DeltaImport.read(spark, dir)) === rows(t.read))

    // a further delete grows the DV → remove+add with the NEW
    // descriptor; the reader must follow
    t.deleteWhereLight(col("k") > 4L && col("k") <= 9L)
    assert(DeltaExport.syncDeltaLog(spark, t).isDefined)
    val s2 = graft.core.DeltaImport.snapshot(spark, dir)
    assert(s2.adds.flatMap(_.deletionVector).map(_.cardinality).sum === 9L)
    assert(rows(graft.core.DeltaImport.read(spark, dir)) === rows(t.read))
    assert(graft.core.DeltaImport.read(spark, dir).count() === 21L)
    // already-current log: sync is a no-op
    assert(DeltaExport.syncDeltaLog(spark, t).isEmpty)

    // materialization folds the DVs into plain files → the next sync
    // re-adds clean files (no descriptors) and the read still agrees
    t.materializeDeletes()
    assert(DeltaExport.syncDeltaLog(spark, t).isDefined)
    val s3 = graft.core.DeltaImport.snapshot(spark, dir)
    assert(s3.adds.flatMap(_.deletionVector).isEmpty)
    assert(rows(graft.core.DeltaImport.read(spark, dir)) === rows(t.read))
  }

  test("change data feed: cdc actions, derived inserts, honest refusals") {
    val dir = tmpDir("deltax-cdf") + "/t"
    val data = (1L to 20L).map(k => (k, k % 5L, k * 1.0)).toDF("k", "g", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)                                     // tx v1
    DeltaExport.syncDeltaLog(spark, t, cdf = true)     // delta commit 0
    val s0 = graft.core.DeltaImport.snapshot(spark, dir)
    assert(s0.protocol.writerFeatures.contains("changeDataFeed"))
    assert(s0.protocol.minReaderVersion === 1) // CDF alone: reader floor
    val cfg0 = JsonMethods.parse(s0.metaRaw.get) \ "configuration"
    assert((cfg0 \ "delta.enableChangeDataFeed") === JString("true"))
    assert((cfg0 \ "graft.txVersion") === JString("1"))

    t.upsert(Seq((4L, 4L, 104.0), (8L, 3L, 108.0)).toDF("k", "g", "v"))
    t.deleteWhereLight(col("g") === 0L) // k ∈ {5,10,15,20}
    assert(DeltaExport.syncDeltaLog(spark, t, cdf = true).isDefined)

    val ch = graft.core.DeltaImport.readChanges(spark, dir, 0L)
    assert(ch.columns.toSeq ===
      Seq("k", "g", "v", "_change_type", "_commit_version"))
    // commit 0: the initial snapshot derives inserts from its adds
    val c0 = ch.filter(col("_commit_version") === 0L)
    assert(c0.count() === 20L)
    assert(c0.select("_change_type").distinct().head().getString(0) ===
      "insert")
    // commit 1: updates carry pre+post images, deletes the pre rows
    val c1 = ch.filter(col("_commit_version") === 1L)
      .collect().map(r => (r.getString(3), r.getLong(0), r.getDouble(2)))
    assert(c1.count(_._1 == "update_preimage") === 2)
    assert(c1.count(_._1 == "update_postimage") === 2)
    assert(c1.filter(_._1 == "update_postimage").map(_._3).sorted.toSeq ===
      Seq(104.0, 108.0))
    assert(c1.filter(_._1 == "update_preimage").map(_._3).sorted.toSeq ===
      Seq(4.0, 8.0))
    assert(c1.filter(_._1 == "delete").map(_._2).sorted.toSeq ===
      Seq(5L, 10L, 15L, 20L))
    // replaying the feed reconstructs the table state
    val byVersion = graft.core.DeltaImport.readChanges(spark, dir, 0L)
      .collect().groupBy(_.getLong(4)).toSeq.sortBy(_._1)
    var state = Map.empty[Long, (Long, Double)]
    byVersion.foreach { case (_, rows2) =>
      rows2.foreach { r =>
        val (k, g, v, tp) =
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
        tp match {
          case "insert" | "update_postimage" => state += k -> ((g, v))
          case "delete"                      => state -= k
          case "update_preimage"             => ()
        }
      }
    }
    assert(state === t.read.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap)

    // a no-change sync stays a no-op even in cdf mode
    assert(DeltaExport.syncDeltaLog(spark, t, cdf = true).isEmpty)

    // the same feed as SQL text through the TVF
    val sqlFeed = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM " +
        s"graft_delta_changes('$dir', 1) GROUP BY 1 ORDER BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlFeed === Map("delete" -> 4L,
      "update_preimage" -> 2L, "update_postimage" -> 2L))

    // a log synced WITHOUT cdf that removed rows refuses the feed
    // with the remedy, never a guessed reconstruction
    val dir2 = tmpDir("deltax-nocdf") + "/t"
    val t2 = new TxTable(spark, dir2, data.schema, Seq("k"), numBuckets = 2)
    t2.append(data)
    DeltaExport.writeDeltaLog(spark, t2)
    t2.deleteWhere(col("k") <= 5L)
    assert(DeltaExport.syncDeltaLog(spark, t2).isDefined)
    val e = intercept[IllegalArgumentException] {
      graft.core.DeltaImport.readChanges(spark, dir2, 0L).count()
    }
    assert(e.getMessage.contains("cdf = true"))
  }

  test("CHECK constraints export as delta.constraints.*; log survives rename") {
    val dir0 = tmpDir("deltax-checks") + "/t"
    val data = (1L to 10L).map(i => (i, i * 2.0)).toDF("k", "v")
    val t = new TxTable(spark, dir0, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t.addCheckConstraint("v_pos", "v >= 0")
    DeltaExport.writeDeltaLog(spark, t)
    val s0 = graft.core.DeltaImport.snapshot(spark, dir0)
    // legacy writer-3 floor carries constraints without features mode
    assert(s0.protocol.minReaderVersion === 1)
    assert(s0.protocol.minWriterVersion === 3)
    val cfg = JsonMethods.parse(s0.metaRaw.get) \ "configuration"
    assert((cfg \ "delta.constraints.v_pos") === JString("v >= 0"))

    // constraint drift alone forces a metaData refresh on sync
    t.addCheckConstraint("v_cap", "v <= 1000")
    assert(DeltaExport.syncDeltaLog(spark, t).isDefined)
    val s1 = graft.core.DeltaImport.snapshot(spark, dir0)
    val cfg1 = JsonMethods.parse(s1.metaRaw.get) \ "configuration"
    assert((cfg1 \ "delta.constraints.v_cap") === JString("v <= 1000"))
    assert((cfg1 \ "delta.constraints.v_pos") === JString("v >= 0"))
    assert(DeltaExport.syncDeltaLog(spark, t).isEmpty) // then a no-op

    // the log is table-relative: a directory relocation keeps it
    // fully readable and syncable at the new path
    val dir1 = tmpDir("deltax-checks-moved") + "/t"
    val moved = t.relocateTo(dir1)
    assert(rows(graft.core.DeltaImport.read(spark, dir1)) ===
      rows(moved.read))
    moved.append(Seq((11L, 5.0)).toDF("k", "v"))
    assert(DeltaExport.syncDeltaLog(spark, moved).isDefined)
    assert(graft.core.DeltaImport.read(spark, dir1).count() === 11L)
  }

  test("checkpoints carry DV descriptors and the features protocol") {
    val dir = tmpDir("deltax-dvcp") + "/t"
    val data = (1L to 16L).map(k => (k, k * 2.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t.deleteWhereLight(col("k") % 4 === 0L)
    DeltaExport.writeDeltaLog(spark, t)
    DeltaExport.writeCheckpoint(spark, t)
    // drop the JSON commit: a bootstrapped reader must reconstruct
    // protocol + DVs from the checkpoint parquet alone
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/_delta_log/00000000000000000000.json"), false)
    val snap = graft.core.DeltaImport.snapshot(spark, dir)
    assert(snap.fromCheckpoint === Some(0L))
    assert(snap.protocol.minReaderVersion === 3)
    assert(snap.adds.flatMap(_.deletionVector).map(_.cardinality).sum === 4L)
    val viaDelta = graft.core.DeltaImport.read(spark, dir)
    assert(viaDelta.count() === 12L)
    assert(rows(viaDelta) === rows(t.read))
  }

  test("log shape matches the checked-in golden (volatile fields normalized)") {
    val dir = tmpDir("deltax-golden") + "/t"
    // one bucket -> one add action, so the golden is order-stable
    val data = Seq((1L, "alpha", true), (2L, "beta", false),
      (3L, null: String, true)).toDF("k", "name", "flag")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    val commit = DeltaExport.writeDeltaLog(spark, t)
    val got = scala.io.Source.fromFile(
      commit.stripPrefix("file:"), "UTF-8").mkString
    val normalized = got
      .replaceAll(""""id":"[0-9a-f-]{36}"""", """"id":"<UUID>"""")
      .replaceAll(""""createdTime":\d+""", """"createdTime":<TS>""")
      .replaceAll(""""modificationTime":\d+""", """"modificationTime":<TS>""")
      .replaceAll(""""size":\d+""", """"size":<N>""")
      .replaceAll(""""path":"data/[^"]+"""", """"path":"data/<FILE>"""")
    val golden = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/delta-export-golden.jsonl"), "UTF-8")
      .mkString
    assert(normalized === golden)
  }

  test("rowTracking: stable baseRowId ranges, sticky feature, checkpoint-durable") {
    import graft.core.DeltaImport
    implicit val fmts: Formats = DefaultFormats
    val dir = tmpDir("delta-rt") + "/t"
    val df = (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, df.schema, Seq("k"), numBuckets = 2)
    t.append(df)
    assert(DeltaExport.syncDeltaLog(spark, t, rowTracking = true).nonEmpty)

    def snap() = DeltaImport.snapshot(spark, dir)
    def rowsOf(a: DeltaImport.AddFile): Long =
      (JsonMethods.parse(a.stats.get) \ "numRecords").extract[Long]
    val s1 = snap()
    assert(s1.protocol.writerFeatures.contains("rowTracking"))
    assert(s1.protocol.writerFeatures.contains("domainMetadata"))
    // every add carries a base id; ranges are DISJOINT and tile [0, 40)
    assert(s1.adds.forall(_.baseRowId.isDefined))
    val ranges1 = s1.adds.map(a => (a.baseRowId.get, rowsOf(a))).sortBy(_._1)
    assert(ranges1.map(_._2).sum === 40L)
    ranges1.sliding(2).foreach {
      case Seq((a, n), (b, _)) => assert(a + n <= b, s"overlap at $a+$n vs $b")
      case _ => ()
    }
    val metaConf = (JsonMethods.parse(s1.metaRaw.get) \ "configuration")
      .extract[Map[String, String]]
    assert(metaConf.get("delta.enableRowTracking") === Some("true"))
    // spec convention: the watermark is the HIGHEST ASSIGNED id
    // (40 rows -> 39), not the next fresh base
    assert(metaConf.get("graft.rowIdHighWaterMark") === Some("39"))
    // the spec channel: a delta.rowTracking domainMetadata action
    val logDir = new java.io.File(dir, "_delta_log")
    val c0 = java.nio.file.Files.readString(
      java.nio.file.Path.of(logDir.toString, "0" * 20 + ".json"))
    assert(c0.contains(""""domain":"delta.rowTracking""""))
    assert(c0.contains("""{\"rowIdHighWaterMark\":39}"""))

    // append: old files KEEP their ids, the new one starts at the
    // watermark; the feature is STICKY (no rowTracking arg)
    t.append(Seq((41L, 41.0)).toDF("k", "v"))
    assert(DeltaExport.syncDeltaLog(spark, t).nonEmpty)
    val s2 = snap()
    val ids1 = s1.adds.map(a => a.path -> a.baseRowId.get).toMap
    s2.adds.foreach(a => ids1.get(a.path).foreach(prev =>
      assert(a.baseRowId === Some(prev), s"id moved for ${a.path}")))
    val fresh = s2.adds.filterNot(a => ids1.contains(a.path))
    assert(fresh.nonEmpty && fresh.forall(_.baseRowId.exists(_ >= 40L)))

    // a DV-growth re-add keeps baseRowId (row ids never move)
    val ids2 = s2.adds.map(a => a.path -> a.baseRowId.get).toMap
    t.deleteWhereLight(col("k") === 3L)
    assert(DeltaExport.syncDeltaLog(spark, t).nonEmpty)
    val s3 = snap()
    assert(s3.adds.forall(_.baseRowId.isDefined))
    s3.adds.foreach(a => assert(a.baseRowId === Some(ids2(a.path)),
      s"DV re-add moved ${a.path}"))

    // checkpoint carries ids AND the domain watermark; a vacuumed
    // JSON prefix bootstraps with both intact
    val cpPath = DeltaExport.writeCheckpoint(spark, t)
    val dm = spark.read.parquet(cpPath)
    assert(dm.columns.contains("domainMetadata"))
    assert(dm.where(col("domainMetadata.domain") === "delta.rowTracking")
      .count() === 1L)
    (0L to s3.version).foreach(v =>
      new java.io.File(logDir, f"$v%020d.json").delete())
    val s4 = snap()
    assert(s4.fromCheckpoint === Some(s3.version))
    assert(s4.adds.forall(_.baseRowId.isDefined))
    s4.adds.foreach(a => assert(a.baseRowId === Some(ids2(a.path))))

    // enabling on an EXISTING plain log backfills every live file
    val dir2 = tmpDir("delta-rt2") + "/t"
    val t2 = new TxTable(spark, dir2, df.schema, Seq("k"), numBuckets = 1)
    t2.append(df)
    assert(DeltaExport.syncDeltaLog(spark, t2).nonEmpty) // plain
    assert(DeltaImport.snapshot(spark, dir2).adds
      .forall(_.baseRowId.isEmpty))
    assert(DeltaExport.syncDeltaLog(spark, t2, rowTracking = true).nonEmpty)
    val b = DeltaImport.snapshot(spark, dir2)
    assert(b.protocol.writerFeatures.contains("rowTracking"))
    assert(b.adds.forall(_.baseRowId.isDefined))
  }

  test("rowTracking watermark survives a foreign metaData rewrite; " +
    "checkpoints carry foreign domains") {
    import graft.core.DeltaImport
    implicit val fmts: Formats = DefaultFormats
    val dir = tmpDir("delta-rtrec") + "/t"
    val df = (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, df.schema, Seq("k"), numBuckets = 2)
    t.append(df)
    assert(DeltaExport.syncDeltaLog(spark, t, rowTracking = true).nonEmpty)
    val s1 = DeltaImport.snapshot(spark, dir)
    val published = s1.adds.map(_.baseRowId.get)

    // a stock writer rewrites metaData WITHOUT graft's private key and
    // commits its own domain (clustering) — the spec watermark now
    // rides only the delta.rowTracking domainMetadata action
    val metaJ = org.json4s.jackson.JsonMethods.parse(s1.metaRaw.get)
    val scrubbedConf = metaJ.transformField {
      case ("configuration", JObject(kvs)) =>
        ("configuration", JObject(kvs.filterNot(_._1.startsWith("graft."))))
    }
    val logDir = new java.io.File(dir, "_delta_log")
    val foreign = new java.io.File(logDir,
      f"${s1.version + 1}%020d.json")
    val w = new java.io.PrintWriter(foreign, "UTF-8")
    try {
      w.println(org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          JObject("metaData" -> scrubbedConf))))
      w.println("""{"domainMetadata":{"domain":"delta.clustering",""" +
        """"configuration":"{\"clusteringColumns\":[]}","removed":false}}""")
    } finally w.close()

    val s2 = DeltaImport.snapshot(spark, dir)
    assert(s2.domainMetadata.contains("delta.rowTracking"))
    assert(s2.domainMetadata.contains("delta.clustering"))

    // re-sync after new rows: fresh bases must come from the domain
    // watermark, never collide with the published ranges
    t.append(Seq((41L, 41.0), (42L, 42.0)).toDF("k", "v"))
    assert(DeltaExport.syncDeltaLog(spark, t).nonEmpty)
    val s3 = DeltaImport.snapshot(spark, dir)
    val fresh = s3.adds.flatMap(_.baseRowId).filterNot(published.contains)
    assert(fresh.nonEmpty && fresh.forall(_ >= 40L),
      s"fresh bases $fresh must start above the recovered watermark")

    // checkpoint carries the foreign domain forward (spec: ALL
    // non-removed domainMetadata), not just delta.rowTracking
    val cp = DeltaExport.writeCheckpoint(spark, t)
    val dmRows = spark.read.parquet(cp)
      .where(col("domainMetadata").isNotNull)
      .select("domainMetadata.domain").as[String].collect().toSet
    assert(dmRows.contains("delta.clustering"))
    assert(dmRows.contains("delta.rowTracking"))
    // and the bootstrap (vacuumed JSON prefix) still serves both
    (0L to s3.version).foreach(v =>
      new java.io.File(logDir, f"$v%020d.json").delete())
    val s4 = DeltaImport.snapshot(spark, dir)
    assert(s4.domainMetadata.contains("delta.clustering"))
    assert(s4.domainMetadata.contains("delta.rowTracking"))
  }
}
