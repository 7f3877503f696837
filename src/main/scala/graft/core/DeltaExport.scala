package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** DELTA-PROTOCOL EXPORT — the interop path the north star names
  * ("table formats like Delta/Iceberg that Spark natively supports"):
  * publish a [[TxTable]] snapshot as a Delta Lake table by writing a
  * `_delta_log` commit file INSIDE the table directory, per the open
  * Delta transaction-log protocol (delta.io PROTOCOL.md). Pure JSON
  * over the manifest — no Delta jars, no data rewrite: the add
  * actions reference the snapshot's existing parquet files by
  * table-relative path, so a Delta reader rooted at `table.dir` reads
  * the same bytes TxTable serves.
  *
  * Protocol floor is (minReaderVersion 1, minWriterVersion 2) — the
  * lowest floor, readable by every Delta client. That floor cannot
  * express merge-on-read deletion vectors (reader v3 territory), so a
  * snapshot with outstanding DVs is REFUSED with the remedy
  * (`materializeDeletes()`) rather than exported wrong; shallow-clone
  * foreign file references are refused for the same
  * reader-compatibility reason. Zone maps translate to Delta
  * `add.stats` (numRecords / minValues / maxValues / nullCount) so a
  * Delta reader data-skips exactly where TxTable would.
  *
  * The export is a SNAPSHOT mirror (one commit 00...0.json, the
  * current version), not a live dual-format table: TxTable commits
  * after an export do not appear in the Delta log until re-export —
  * re-exporting overwrites the log with the new snapshot.
  */
object DeltaExport {

  /** Write `table.dir/_delta_log/00000000000000000000.json` for the
    * current snapshot. Returns the commit file's path. */
  def writeDeltaLog(spark: SparkSession, table: TxTable): String = {
    val files = table.currentFileInfo
    require(files.forall(_.dvRows == 0L),
      "snapshot has outstanding deletion vectors, which Delta protocol " +
        "(1,2) cannot express - run materializeDeletes() first")
    val root = new Path(table.dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(root).toString.stripSuffix("/") + "/"
    val schema = table.currentSchema

    def relative(p: String): String = {
      val q = fs.makeQualified(new Path(p)).toString
      require(q.startsWith(rootUri),
        s"foreign file reference $p (shallow clone?) cannot be exported " +
          "as a table-relative Delta add action")
      q.stripPrefix(rootUri)
    }

    // Delta add.stats: numRecords + min/max/nullCount per column the
    // zone maps cover. Timestamp extrema are omitted (Delta wants ISO
    // strings; the manifest stores comparable micros) — stats are an
    // optimization, absence only costs skipping.
    def deltaStats(statsJson: String): Option[String] =
      FileStats.fromJson(statsJson, schema).map { st =>
        import org.apache.spark.sql.types._
        // extrema only for types whose JSON rendering a Delta reader
        // interprets the same way we do: a timestamp's comparable
        // micros would render as a bare number and MISLEAD a reader
        // expecting ISO strings — worse than no stats
        def plainJson(c: String): Boolean =
          schema.find(_.name == c).map(_.dataType).exists {
            case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
                _: FloatType | _: DoubleType | _: StringType |
                _: BooleanType => true
            case _ => false
          }
        def jval(v: Any): Option[JValue] = v match {
          case l: Long    => Some(JLong(l))
          case d: Double  => Some(JDouble(d))
          case s: String  => Some(JString(s))
          case b: Boolean => Some(JBool(b))
          case _          => None
        }
        val statted = st.cols.toSeq.sortBy(_._1)
          .filter { case (c, _) => plainJson(c) }
        val mins = statted.flatMap { case (c, s) =>
          s.min.flatMap(jval).map(c -> _) }
        val maxs = statted.flatMap { case (c, s) =>
          s.max.flatMap(jval).map(c -> _) }
        val nulls = statted.collect { case (c, s) if s.nulls >= 0L =>
          c -> (JLong(s.nulls): JValue) }
        JsonMethods.compact(JsonMethods.render(JObject(
          "numRecords" -> JLong(st.rows),
          "minValues" -> JObject(mins.toList),
          "maxValues" -> JObject(maxs.toList),
          "nullCount" -> JObject(nulls.toList))))
      }

    val protocol = JObject("protocol" -> JObject(
      "minReaderVersion" -> JInt(1), "minWriterVersion" -> JInt(2)))
    val metaData = JObject("metaData" -> JObject(
      "id" -> JString(java.util.UUID.randomUUID().toString),
      "format" -> JObject("provider" -> JString("parquet"),
        "options" -> JObject()),
      // Delta's schemaString IS the Spark StructType JSON format
      "schemaString" -> JString(schema.json),
      "partitionColumns" -> JArray(Nil),
      "configuration" -> JObject(),
      "createdTime" -> JLong(System.currentTimeMillis())))
    val adds = files.sortBy(_.path).map { f =>
      val status = fs.getFileStatus(new Path(f.path))
      JObject("add" -> JObject(List(
        "path" -> JString(relative(f.path)),
        "partitionValues" -> JObject(),
        "size" -> JLong(status.getLen),
        "modificationTime" -> JLong(status.getModificationTime),
        "dataChange" -> JBool(true)) ++
        deltaStats(f.statsJson).map(s => "stats" -> (JString(s): JValue))))
    }

    val logDir = new Path(root, "_delta_log")
    fs.mkdirs(logDir)
    val commit = new Path(logDir, f"${0L}%020d.json")
    val out = fs.create(commit, true)
    try out.write((protocol +: metaData +: adds)
      .map(j => JsonMethods.compact(JsonMethods.render(j)))
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    commit.toString
  }
}
