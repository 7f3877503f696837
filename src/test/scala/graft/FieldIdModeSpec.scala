package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{DeltaExport, DeltaImport, TxTable}

/** `fieldIds = true` tables: sticky per-column ids stamped into every
  * staged parquet footer, published as `delta.columnMapping.mode=id`
  * logs whose `delta.columnMapping.id`s ARE the footer ids — the
  * binding Iceberg-uniform converts and id-resolving stock readers
  * need. Import binds through a flag-scoped child session, never a
  * parent-session conf mutation. */
class FieldIdModeSpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: Formats = DefaultFormats

  private def footerIds(path: String): Map[String, Int] = {
    val pf = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        spark.sparkContext.hadoopConfiguration))
    try pf.getFooter.getFileMetaData.getSchema.getFields
      .toArray.map { f0 =>
        val f = f0.asInstanceOf[org.apache.parquet.schema.Type]
        f.getName -> (if (f.getId == null) -1 else f.getId.intValue())
      }.toMap
    finally pf.close()
  }

  private def loggedMeta(dir: String): JValue = {
    val log = new File(dir, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    log.flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
      .map(JsonMethods.parse(_))
      .flatMap(j => (j \ "metaData") match {
        case JNothing => None
        case m => Some(m)
      }).last
  }

  test("staged footers carry sticky field ids; delta exports mode=id; " +
      "round-trip binds by id through a scoped child session") {
    val dir = tmpDir("fieldid") + "/t"
    val data = (1L to 60L).map(i => (i, s"n$i", i * 2.0))
      .toDF("k", "name", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"),
      numBuckets = 2, fieldIds = true)
    t.append(data)

    // every staged footer: parquet.field.id == the schema's sticky ids
    val ids = t.currentSchema.fields.map(f =>
      f.name -> f.metadata.getLong(TxTable.FieldIdKey).toInt).toMap
    assert(ids === Map("k" -> 1, "name" -> 2, "v" -> 3))
    t.currentFileInfo.foreach { f =>
      assert(footerIds(f.path) === ids, s"footer of ${f.path}")
    }

    // rename + evolve, then export: the log must be id mode with the
    // footer ids, and the added column numbers past the max
    t.renameColumn("name", "label")
    t.addColumns(new StructType().add("extra", LongType))
    t.append(Seq((100L, "x", 1.0, 7L)).toDF("k", "label", "v", "extra"))
    DeltaExport.syncDeltaLog(spark, t)
    val meta = loggedMeta(dir)
    assert((meta \ "configuration" \ "delta.columnMapping.mode")
      .extract[String] === "id")
    val schemaJ = JsonMethods.parse((meta \ "schemaString").extract[String])
    val logged = (schemaJ \ "fields").children.map { f =>
      ((f \ "name").extract[String],
        (f \ "metadata" \ "delta.columnMapping.id").extract[Long],
        (f \ "metadata" \ "delta.columnMapping.physicalName")
          .extract[String])
    }
    assert(logged === List(("k", 1L, "k"), ("label", 2L, "name"),
      ("v", 3L, "v"), ("extra", 4L, "extra")))
    // internal keys never leave the engine
    assert(!(meta \ "schemaString").extract[String].contains("graft."))

    // round trip through our own id importer == the table itself
    val back = DeltaImport.read(spark, dir)
    assert(back.columns.toSeq === Seq("k", "label", "v", "extra"))
    assert(back.collect().map(_.toSeq).toSet ===
      t.read.collect().map(_.toSeq).toSet)
    // the PARENT session's flag was never mutated
    assert(spark.conf.get(
      "spark.sql.parquet.fieldId.read.enabled") === "false")
  }

  test("dropped field ids are never reissued (footer resurrection guard)") {
    val dir = tmpDir("fieldid-drop") + "/t"
    val t = new TxTable(spark,
      dir, new StructType().add("k", LongType).add("a", LongType),
      Seq("k"), numBuckets = 1, fieldIds = true)
    t.append(Seq((1L, 10L)).toDF("k", "a"))
    t.addColumns(new StructType().add("b", LongType)) // id 3
    t.dropColumns(Seq("b"))
    t.addColumns(new StructType().add("c", LongType))
    val cId = t.currentSchema("c").metadata.getLong(TxTable.FieldIdKey)
    assert(cId === 4L,
      "dropped id 3 lives in old footers and must never be reissued")
  }

  test("a log synced in name mode STAYS name mode (spec transition rule)") {
    val dir = tmpDir("fieldid-sticky") + "/t"
    val data = (1L to 10L).map(i => (i, i * 1.0)).toDF("k", "v")
    // plain table first: name-mode log (after a rename)
    val t0 = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t0.append(data)
    t0.renameColumn("v", "w")
    DeltaExport.syncDeltaLog(spark, t0)
    assert((loggedMeta(dir) \ "configuration" \ "delta.columnMapping.mode")
      .extract[String] === "name")
    // reopening WITH fieldIds (hypothetical misconfiguration): the
    // synced log must not flip to id over files without footer ids
    val t1 = new TxTable(spark, dir, data.schema, Seq("k"),
      numBuckets = 1, fieldIds = true)
    t1.append(Seq((11L, 5.0)).toDF("k", "w"))
    DeltaExport.syncDeltaLog(spark, t1)
    assert((loggedMeta(dir) \ "configuration" \ "delta.columnMapping.mode")
      .extract[String] === "name")
  }
}
