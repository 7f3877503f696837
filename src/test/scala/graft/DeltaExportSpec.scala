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
}
