package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{DeltaExport, DeltaImport, IcebergExport, IcebergImport, TxTable}

/** TIMESTAMP AS OF on FOREIGN trees: Delta resolves through commit-
  * file modification times (delta-spark's rule), Iceberg through the
  * spec's snapshot-log; both ride the scan TVFs as typed TIMESTAMP/DATE literals. */
class ForeignTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  test("delta: versionAsOf resolves by commit mtime; a TIMESTAMP literal rides the TVF") {
    val dir = tmpDir("ttdelta") + "/t"
    val data = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    DeltaExport.writeDeltaLog(spark, t)  // delta 0
    t.append(Seq((11L, 11.0)).toDF("k", "v"))
    DeltaExport.syncDeltaLog(spark, t)   // delta 1

    // pin the timeline: commit 0 at t0, commit 1 at t0+60s
    val logDir = new File(dir, "_delta_log")
    val c0 = new File(logDir, "0" * 20 + ".json")
    val c1 = new File(logDir, "0" * 19 + "1.json")
    val t0 = 1700000000000L
    assert(c0.setLastModified(t0) && c1.setLastModified(t0 + 60000L))

    assert(DeltaImport.versionAsOf(spark, dir, t0 + 30000L) === 0L)
    assert(DeltaImport.versionAsOf(spark, dir, t0 + 90000L) === 1L)
    val e = intercept[IllegalArgumentException] {
      DeltaImport.versionAsOf(spark, dir, t0 - 1L)
    }
    assert(e.getMessage.contains("before the earliest"))

    // a TIMESTAMP literal between the commits -> version 0's rows
    assert(spark.sql(
      s"SELECT count(*) FROM graft_delta_scan('$dir', " +
        s"timestamp_millis(${t0 + 30000L}))")
      .head.getLong(0) === 10L)
    // a version pin and a timestamp pin conflict
    val e2 = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_delta_scan('$dir', 1, " +
          s"timestamp_millis($t0))").collect()
    }
    assert(e2.getMessage.contains("conflict"))

    // the history TVF: both commits, mtime timeline, inferred ops
    val hist = spark.sql(s"SELECT * FROM graft_delta_history('$dir')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(6)))
    assert(hist.map(_._1).toSeq === Seq(0L, 1L))
    assert(hist.map(_._2).toSeq === Seq(t0, t0 + 60000L))
    assert(hist.forall(_._3 == "append"))
  }

  test("iceberg: snapshotIdAsOf resolves by snapshot-log; a TIMESTAMP literal rides the TVF") {
    val dir = tmpDir("tticeberg") + "/t"
    val data = (1L to 8L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    t.append(Seq((9L, 9.0)).toDF("k", "v"))
    IcebergExport.writeIcebergMetadata(spark, t)

    // the export's own snapshot-log is the timeline
    val md = JsonMethods.parse(scala.io.Source.fromFile(
      new File(dir, "metadata/v1.metadata.json")).mkString)
    val log = (md \ "snapshot-log") match {
      case JArray(es) => es.map { e =>
        ((e \ "timestamp-ms"), (e \ "snapshot-id")) match {
          case (JInt(ts), JInt(id)) => (ts.toLong, id.toLong)
          case other => fail(s"bad snapshot-log entry $other")
        }
      }
      case _ => fail("no snapshot-log")
    }
    assert(log.size >= 3) // v0 create + two appends
    val (ts1, id1) = log(1) // the first append's snapshot
    assert(IcebergImport.snapshotIdAsOf(spark, dir, ts1) === id1)
    assert(IcebergImport.snapshotIdAsOf(spark, dir,
      log.last._1 + 1000L) === log.last._2)
    val e = intercept[IllegalArgumentException] {
      IcebergImport.snapshotIdAsOf(spark, dir, log.head._1 - 1L)
    }
    assert(e.getMessage.contains("before the earliest"))

    // TVF: pinned at the first append's commit instant -> 8 rows
    assert(spark.sql(
      s"SELECT count(*) FROM graft_iceberg_scan('$dir', " +
        s"timestamp_millis($ts1))")
      .head.getLong(0) === 8L)
    // a STRING stays a predicate - a `ts` COLUMN never collides with
    // the timestamp pin (which is a typed TIMESTAMP/DATE literal)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_iceberg_scan('$dir', 'k > 8')")
      .head.getLong(0) === 1L)
    // snapshot-id and timestamp pins conflict
    val e2 = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_iceberg_scan('$dir', $id1, " +
          s"timestamp_millis($ts1))").collect()
    }
    assert(e2.getMessage.contains("conflict"))

    // the snapshots TVF: the exported lineage, all on main, honest ops
    val snaps = spark.sql(
      s"SELECT * FROM graft_iceberg_snapshots('$dir')")
      .collect().map(r => (r.getLong(0), r.getString(3), r.getBoolean(5)))
    assert(snaps.length === log.size)
    assert(snaps.forall(_._3), "export publishes only the main lineage")
    assert(snaps.forall(_._2 == "append"))
  }

  test("TIMESTAMP_NTZ literal binds through the session timezone, not UTC") {
    val dir = tmpDir("ttntz") + "/t"
    val data = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    DeltaExport.writeDeltaLog(spark, t)  // delta 0
    t.append(Seq((11L, 11.0)).toDF("k", "v"))
    DeltaExport.syncDeltaLog(spark, t)   // delta 1

    val logDir = new File(dir, "_delta_log")
    val t0 = 1700000000000L // 2023-11-14T22:13:20Z
    assert(new File(logDir, "0" * 20 + ".json").setLastModified(t0))
    assert(new File(logDir, "0" * 19 + "1.json")
      .setLastModified(t0 + 60000L))

    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata") // UTC+5:30
    try {
      // the wall-clock in Kolkata 30s after commit 0: NTZ carries no
      // zone, so the pin must resolve through the SESSION zone — read
      // as UTC it would land 5.5h earlier, BEFORE the earliest commit,
      // and refuse
      val wall = java.time.Instant.ofEpochMilli(t0 + 30000L)
        .atZone(java.time.ZoneId.of("Asia/Kolkata")).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
      assert(spark.sql(
        s"SELECT count(*) FROM graft_delta_scan('$dir', " +
          s"TIMESTAMP_NTZ '$wall')").head.getLong(0) === 10L)
      // a zoned TIMESTAMP literal of the same wall-clock agrees
      assert(spark.sql(
        s"SELECT count(*) FROM graft_delta_scan('$dir', " +
          s"TIMESTAMP '$wall')").head.getLong(0) === 10L)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
