package graft.core

import java.net.URLDecoder
import java.nio.charset.StandardCharsets

import scala.io.Source

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** DELTA-PROTOCOL IMPORT — the read half of the interop path
  * ([[DeltaExport]] is the write half): open a Delta Lake table
  * directory by replaying its `_delta_log` JSON commits into a live
  * file set, then serve the data as a plain DataFrame over exactly
  * those parquet files. Pure JSON over the open protocol
  * (delta.io PROTOCOL.md) — no Delta jars.
  *
  * Replay semantics per the protocol's state reconstruction rules:
  * the latest `metaData` wins (schema + partition columns), `add`
  * upserts a path into the live set (a re-add replaces the prior
  * entry), `remove` drops it (tombstone timestamps don't matter for
  * reads), `commitInfo`/`txn` are no-ops. Paths are percent-decoded
  * and resolved table-relative unless absolute (both legal).
  *
  * Honest protocol floor: `minReaderVersion` must be 1 — that is the
  * floor [[DeltaExport]] writes and the only one whose data files are
  * self-describing parquet. Higher floors (column mapping, deletion
  * vectors, v2 checkpoints) change how the files must be interpreted,
  * so a table demanding them is REFUSED, never misread. Checkpointed
  * logs are readable as long as every JSON commit from 0 is still
  * present (the replay ignores `_last_checkpoint` and reconstructs
  * from the full JSON history); a log whose head commits were vacuumed
  * away is refused with the gap named.
  *
  * Scale: replay is driver-side metadata work proportional to the LOG
  * (one JSON line per action), never the data; the resulting scan
  * lists exactly the live files — no directory listing, so stale
  * files awaiting vacuum are invisible, same as TxTable's own reads.
  * Partition values come from the log per the protocol (they are NOT
  * in the data files) and attach as per-file-group literal columns.
  */
object DeltaImport {

  /** Reconstructed snapshot: what the log says the table IS now. */
  final case class Snapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      /** live data files: absolute path -> partition values (raw
        * protocol strings; null value = null partition). */
      files: Seq[(String, Map[String, Option[String]])])

  private implicit val fmts: Formats = DefaultFormats

  /** Replay the JSON commits under `dir/_delta_log` into a
    * [[Snapshot]] — all of them, or only those up to `asOf`
    * (Delta-style VERSION AS OF time travel: the log IS the history,
    * so reading an older version is just stopping the replay early). */
  def snapshot(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): Snapshot = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, "_delta_log")
    require(fs.exists(logDir), s"$dir has no _delta_log - not a Delta table")

    val commitRe = "(\\d{20})\\.json".r
    val allCommits = fs.listStatus(logDir).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case commitRe(v) => Some(v.toLong -> st.getPath)
          case _           => None
        }
      }
      .sortBy(_._1)
    require(allCommits.nonEmpty, s"$dir/_delta_log holds no JSON commits")
    require(allCommits.head._1 == 0L && allCommits.map(_._1) == (0L to
        allCommits.last._1),
      s"log is missing commits ${(0L to allCommits.last._1).toSet --
        allCommits.map(_._1).toSet} (vacuumed into a checkpoint?) - " +
        "JSON replay needs the contiguous history from 0")
    val commits = asOf match {
      case None => allCommits
      case Some(v) =>
        require(v >= 0L && v <= allCommits.last._1,
          s"version $v not in the log (0..${allCommits.last._1})")
        allCommits.takeWhile(_._1 <= v)
    }

    val rootUri = fs.makeQualified(root).toString.stripSuffix("/")
    def resolve(raw: String): String = {
      val p = URLDecoder.decode(raw, StandardCharsets.UTF_8.name())
      if (p.contains("://") || p.startsWith("/")) p else s"$rootUri/$p"
    }

    var schema: StructType = null
    var partCols: Seq[String] = Nil
    // LinkedHashMap keeps add order for deterministic file lists
    val live = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[String, Option[String]]]

    commits.foreach { case (_, path) =>
      val in = fs.open(path)
      val lines =
        try Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.filter(_.trim.nonEmpty).foreach { line =>
        val j = JsonMethods.parse(line)
        (j \ "protocol") match {
          case JNothing => ()
          case p =>
            val r = (p \ "minReaderVersion").extract[Int]
            require(r <= 1,
              s"table demands minReaderVersion $r (column mapping / " +
                "deletion vectors / v2 checkpoints) - this reader " +
                "honestly supports protocol 1 only")
        }
        (j \ "metaData") match {
          case JNothing => ()
          case m =>
            val fmt = (m \ "format" \ "provider").extractOpt[String]
            require(fmt.forall(_ == "parquet"),
              s"unsupported storage format ${fmt.get}")
            schema = DataType.fromJson((m \ "schemaString").extract[String])
              .asInstanceOf[StructType]
            partCols = (m \ "partitionColumns").extract[Seq[String]]
        }
        (j \ "add") match {
          case JNothing => ()
          case a =>
            val pv = (a \ "partitionValues") match {
              case JObject(kvs) => kvs.map {
                case (k, JString(v)) => k -> Some(v)
                case (k, _)          => k -> None
              }.toMap
              case _ => Map.empty[String, Option[String]]
            }
            live.put(resolve((a \ "path").extract[String]), pv)
        }
        (j \ "remove") match {
          case JNothing => ()
          case r => live.remove(resolve((r \ "path").extract[String]))
        }
      }
    }
    require(schema != null, "log replay found no metaData action")
    Snapshot(commits.last._1, schema, partCols, live.toSeq)
  }

  /** Read the table's state as a DataFrame with the log's declared
    * schema (partition columns included, typed per schema) — current,
    * or at `asOf` (VERSION AS OF). */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, dir, asOf)
    val dataSchema = StructType(
      snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    def scan(paths: Seq[String]): DataFrame =
      spark.read.schema(dataSchema).parquet(paths: _*)

    val out =
      if (snap.files.isEmpty) {
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
      } else if (snap.partitionColumns.isEmpty) {
        scan(snap.files.map(_._1))
      } else {
        // partition values live in the LOG, not the files: group the
        // live set by its value tuple and attach each group's values
        // as literal columns cast to the declared type (protocol
        // serialization: strings; null = null). Group count is the
        // table's partition count - driver-side metadata, not data.
        snap.files.groupBy(_._2).toSeq
          .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
          .map { case (pv, fs) =>
            val withParts = snap.partitionColumns.foldLeft(scan(fs.map(_._1))) {
              (df, c) =>
                val dt = snap.schema(c).dataType
                val v: Column = pv.get(c).flatten match {
                  case Some(s) => lit(s).cast(dt)
                  case None    => lit(null).cast(dt)
                }
                df.withColumn(c, v)
            }
            withParts
          }
          .reduce(_ unionByName _)
      }
    out.select(snap.schema.map(f => col(f.name)).toSeq: _*)
  }
}
