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

  test("outstanding deletion vectors refuse export until materialized") {
    val dir = tmpDir("deltax-dv") + "/t"
    val data = (1L to 20L).map(k => (k, s"n$k")).toDF("k", "name")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t.deleteWhereLight(col("k") <= 5L)
    val e = intercept[IllegalArgumentException] {
      DeltaExport.writeDeltaLog(spark, t)
    }
    assert(e.getMessage.contains("materializeDeletes"))
    t.materializeDeletes()
    val commit = DeltaExport.writeDeltaLog(spark, t)
    val snap = readDeltaLog(commit, dir)
    val viaDelta = spark.read.schema(snap.schema).parquet(snap.files: _*)
    assert(rows(viaDelta) === rows(t.read))
    assert(viaDelta.count() === 15L)
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
