package graft.core

import scala.jdk.CollectionConverters._
import scala.io.Source

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** ICEBERG-SPEC IMPORT — the [[DeltaImport]] twin for
  * [[IcebergExport]]: read an Apache Iceberg v1/v2 metadata tree
  * (HadoopCatalog layout, per the published spec at
  * iceberg.apache.org/spec) back to a live file set + Spark schema,
  * and serve it as a DataFrame. With both directions implemented the
  * interop is symmetric and testable as a TRUE round-trip
  * (export → import → row-for-row equality), not just layout checks.
  *
  * Resolution walks the spec's pointer chain exactly as a stock
  * reader does:
  *
  *   metadata/version-hint.text → v<hint>.metadata.json
  *     → current-snapshot-id (or a caller-pinned snapshot id — the
  *       VERSION AS OF analog) → snapshot.manifest-list (avro)
  *     → manifest_file records → manifest avro(s)
  *     → manifest_entry records (status ≠ DELETED) → data_file paths
  *
  * All driver-side METADATA reads, bounded by manifest size — the
  * data files themselves are never touched here; the returned
  * DataFrame scans them under the metadata schema with full Spark
  * parallelism.
  *
  * v2 POSITION DELETES are read natively: delete manifests
  * (content=1) resolve to the spec's delete parquet files
  * (`file_path` + `pos`), and the returned DataFrame masks the
  * tombstoned rows merge-on-read through the same anti-join-on-
  * (file, row_index) plan TxTable's own DV reads use — only the
  * referenced data files pay the mask. Position deletes name their
  * target files EXPLICITLY (a file rewritten after the delete has a
  * new path the delete cannot reference), so sequence-number scoping
  * is not needed for them. EQUALITY deletes do scope by sequence
  * number and are honestly REFUSED rather than served as wrong rows.
  */
object IcebergImport {

  final case class Snapshot(snapshotId: Long, schema: StructType,
      files: Seq[String], recordCounts: Seq[Long],
      posDeleteFiles: Seq[String] = Nil)

  private def sparkType(t: String): DataType = t match {
    case "boolean"     => BooleanType
    case "int"         => IntegerType
    case "long"        => LongType
    case "float"       => FloatType
    case "double"      => DoubleType
    case "string"      => StringType
    case "binary"      => BinaryType
    case "date"        => DateType
    case "timestamptz" => TimestampType
    case "timestamp"   => TimestampNTZType
    case dec if dec.startsWith("decimal(") =>
      val Array(p, s) = dec.stripPrefix("decimal(").stripSuffix(")")
        .split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new UnsupportedOperationException(
      s"iceberg import does not map type '$other' " +
        "(flat relational schemas only)")
  }

  private def schemaFrom(j: JValue): StructType = {
    val fields = (j \ "fields") match {
      case JArray(fs) => fs.map { f =>
        val name = (f \ "name") match { case JString(s) => s
          case _ => throw new IllegalArgumentException("field without name") }
        val required = (f \ "required") match { case JBool(b) => b
          case _ => false }
        val tpe = (f \ "type") match {
          case JString(s) => sparkType(s)
          case _ => throw new UnsupportedOperationException(
            s"iceberg import does not map nested field '$name'")
        }
        StructField(name, tpe, nullable = !required)
      }
      case _ => throw new IllegalArgumentException("schema has no fields")
    }
    StructType(fields)
  }

  private def readAvro(fs: FileSystem, p: Path,
      conf: org.apache.hadoop.conf.Configuration): Seq[GenericRecord] = {
    val in = new FsInput(p, conf)
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  /** Resolve the current (or pinned) snapshot of the Iceberg table at
    * `dir` to (schema, live data files). */
  def snapshot(spark: SparkSession, dir: String,
      snapshotId: Option[Long] = None): Snapshot = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val metaDir = new Path(root, "metadata")

    // HadoopCatalog pointer chain
    val hintPath = new Path(metaDir, "version-hint.text")
    require(fs.exists(hintPath),
      s"$dir/metadata has no version-hint.text - not a HadoopCatalog " +
        "iceberg table")
    val hint = {
      val in = fs.open(hintPath)
      try Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    val mdPath = new Path(metaDir, s"v$hint.metadata.json")
    require(fs.exists(mdPath), s"version hint points at missing $mdPath")
    val md = {
      val in = fs.open(mdPath)
      try JsonMethods.parse(Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

    val fv = (md \ "format-version") match {
      case JInt(v) => v.toInt
      case _ => throw new IllegalArgumentException("no format-version")
    }
    require(fv <= 2,
      s"table is format-version $fv - this reader honestly supports v1/v2")

    // schema: current-schema-id into schemas (v2), else legacy "schema"
    val schema = (md \ "schemas", md \ "current-schema-id") match {
      case (JArray(ss), JInt(cur)) =>
        schemaFrom(ss.find(s => (s \ "schema-id") == JInt(cur)).getOrElse(
          throw new IllegalArgumentException(s"schema-id $cur not found")))
      case _ => schemaFrom(md \ "schema") // v1 single-schema layout
    }

    val snaps = (md \ "snapshots") match {
      case JArray(ss) => ss
      case _ => Nil
    }
    // stock HadoopCatalog writers emit current-snapshot-id: -1 (and an
    // empty snapshots array) for a created-but-never-written table —
    // per spec that is a valid EMPTY table, not an error
    val currentId: Option[Long] = (md \ "current-snapshot-id") match {
      case JInt(v) if v.toLong >= 0L => Some(v.toLong)
      case _ => None
    }
    if (snapshotId.isEmpty && currentId.isEmpty)
      return Snapshot(-1L, schema, Nil, Nil)
    val wantedId: Long = snapshotId.orElse(currentId).get
    val snap = snaps.find(s => (s \ "snapshot-id") match {
      case JInt(v) => v.toLong == wantedId
      case _ => false
    }).getOrElse(throw new IllegalArgumentException(
      s"snapshot $wantedId is not in $mdPath (retained: " +
        snaps.flatMap(s => (s \ "snapshot-id").toOption).mkString(", ") + ")"))

    val listPath = (snap \ "manifest-list") match {
      case JString(p) => new Path(p)
      case _ => throw new UnsupportedOperationException(
        "snapshot has no manifest-list (v1 inline manifests unsupported)")
    }

    // manifest list → manifests, split by content (0 data, 1 deletes)
    val manifests = readAvro(fs, listPath, conf)
    val (deleteManifests, dataManifests) = manifests.partition { m =>
      Option(m.get("content")).exists(_.asInstanceOf[Int] != 0)
    }

    // manifests → live data files (status 2 = DELETED drops the row)
    val filesAndCounts = dataManifests.flatMap { m =>
      val mPath = new Path(m.get("manifest_path").toString)
      readAvro(fs, mPath, conf).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status == 2) None
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"data file format $fmt unsupported (parquet only)")
          Some(df.get("file_path").toString ->
            df.get("record_count").asInstanceOf[Long])
        }
      }
    }

    // delete manifests → live POSITION-delete files; equality deletes
    // (content=2 on the data_file record) are refused, never misread
    val posDeletes = deleteManifests.flatMap { m =>
      val mPath = new Path(m.get("manifest_path").toString)
      readAvro(fs, mPath, conf).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status == 2) None
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.get("content"))
            .map(_.asInstanceOf[Int]).getOrElse(0)
          require(content == 1,
            s"snapshot $wantedId carries an EQUALITY delete file " +
              "(content=2), which needs sequence-number scoping this " +
              "reader does not implement - position deletes only")
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"delete file format $fmt unsupported (parquet only)")
          Some(df.get("file_path").toString)
        }
      }
    }
    Snapshot(wantedId, schema,
      filesAndCounts.map(_._1), filesAndCounts.map(_._2), posDeletes)
  }

  /** Read the current (or pinned) snapshot as a DataFrame under the
    * metadata schema. Position deletes mask MERGE-ON-READ: only the
    * data files a delete file actually references pay the anti-join
    * (one driver-side metadata pass over the delete files' distinct
    * targets decides the split); clean files stream straight
    * through. The tombstones stay a DataFrame end to end — nothing
    * position-shaped is collected. */
  def read(spark: SparkSession, dir: String,
      snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, split}
    val s = snapshot(spark, dir, snapshotId)
    if (s.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
    if (s.posDeleteFiles.isEmpty)
      return spark.read.schema(s.schema).parquet(s.files: _*)

    // basenames are the join identity (iceberg file names embed
    // UUIDs); full-URI equality would be brittle across the file:/ vs
    // file:/// qualifications different writers emit
    def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val tomb = spark.read.parquet(s.posDeleteFiles: _*)
      .select(element_at(split(col("file_path"), "/"), -1).as("_del_file"),
        col("pos").as("_del_pos"))
      .distinct()
    val targeted = tomb.select("_del_file").distinct()
      .collect().map(_.getString(0)).toSet // file-count-bounded metadata
    val (dirty, clean) = s.files.partition(f => targeted(base(f)))
    val cleanDf =
      if (clean.isEmpty) None
      else Some(spark.read.schema(s.schema).parquet(clean: _*))
    val dirtyDf =
      if (dirty.isEmpty) None
      else Some(spark.read.schema(s.schema).parquet(dirty: _*)
        .withColumn("_file",
          element_at(split(col("_metadata.file_path"), "/"), -1))
        .withColumn("_pos", col("_metadata.row_index"))
        .join(tomb, col("_file") === col("_del_file") &&
          col("_pos") === col("_del_pos"), "left_anti")
        .drop("_file", "_pos"))
    (cleanDf.toSeq ++ dirtyDf.toSeq).reduce(_ unionByName _)
  }
}
