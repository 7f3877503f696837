package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{DeltaExport, TxTable}

/** Streaming Change Data Feed
  * (`readStream.format("graft").option("readChangeFeed","true")`):
  * the cdf-exported Delta log consumed as a stream — table_changes
  * rows, exactly-once delta-version offsets, honest refusals. */
class GraftCdfStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streams the feed: snapshot inserts, then cdc commits; restart-safe") {
    val dir = tmpDir("cdfstream") + "/t"
    val data = (1L to 12L).map(k => (k, k % 3L, k * 1.0)).toDF("k", "g", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    DeltaExport.syncDeltaLog(spark, t, cdf = true) // delta 0: snapshot

    val ck = tmpDir("cdfstream-ck")
    val out = tmpDir("cdfstream-out")
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def feed() = spark.read.parquet(out)
    drain()
    val after0 = feed().collect()
    assert(after0.length === 12)
    assert(after0.forall(r => r.getString(3) == "insert" &&
      r.getLong(4) == 0L))

    // mutations under a cdf sync arrive as the NEXT batch - change
    // files verbatim, nothing re-served
    t.upsert(Seq((1L, 1L, 101.0)).toDF("k", "g", "v"))
    t.deleteWhereLight(col("g") === 0L) // k ∈ {3,6,9,12}
    DeltaExport.syncDeltaLog(spark, t, cdf = true) // delta 1
    drain()
    val rows = feed().collect()
    assert(rows.length === 12 + 2 + 4) // + update pre/post + 4 deletes
    val c1 = rows.filter(_.getLong(4) == 1L)
      .map(r => (r.getString(3), r.getLong(0)))
    assert(c1.count(_._1 == "update_preimage") === 1)
    assert(c1.count(_._1 == "update_postimage") === 1)
    assert(c1.filter(_._1 == "delete").map(_._2).sorted.toSeq ===
      Seq(3L, 6L, 9L, 12L))
    // replay with the same checkpoint and nothing new: a no-op
    drain()
    assert(feed().count() === 18L)

    // the streamed feed equals the batch feed row for row
    val batch = graft.core.DeltaImport.readChanges(spark, dir, 0L)
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet === batch)
  }

  test("maxCommitsPerTrigger chunks the feed drain") {
    val dir = tmpDir("cdfstream-rate") + "/t"
    val data = (1L to 9L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data.filter(col("k") <= 3L))
    DeltaExport.writeDeltaLog(spark, t)     // delta 0
    t.append(data.filter(col("k") > 3L && col("k") <= 6L))
    DeltaExport.syncDeltaLog(spark, t)      // delta 1
    t.append(data.filter(col("k") > 6L))
    DeltaExport.syncDeltaLog(spark, t)      // delta 2

    val out = tmpDir("cdfstream-rate-out")
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("maxCommitsPerTrigger", "1")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("cdfstream-rate-ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() === 9L)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0L)
    assert(dataBatches >= 2,
      s"a 1-commit cap must chunk the drain, saw $dataBatches batches")
  }

  test("variant columns ride the CDF stream (unshredded change files)") {
    val dir = tmpDir("cdfstream-var") + "/t"
    val data = Seq(
      (1L, """{"a": 5}"""), (2L, """{"a": 7}"""), (3L, """{"a": 9}"""))
      .toDF("k", "j").withColumn("v", parse_json(col("j"))).drop("j")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    DeltaExport.syncDeltaLog(spark, t, cdf = true) // delta 0
    t.deleteWhereLight(col("k") === 2L)
    DeltaExport.syncDeltaLog(spark, t, cdf = true) // delta 1: change file
    val out = tmpDir("cdfstream-var-out")
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("cdfstream-var-ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(out)
      .select(col("k"), try_variant_get(col("v"), "$.a", "int").as("a"),
        col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // snapshot inserts carry the bytes; the delete's change file
    // re-serves the retracted row's variant intact
    assert(rows.count(_._3 == "insert") === 3)
    assert(rows.filter(_._3 == "delete").toSeq === Seq((2L, 7, "delete")))
    assert(rows.filter(_._1 == 1L).forall(_._2 == 5))
  }

  test("columnMapping NAME mode streams real values; ID mode refuses") {
    // name mode: a renamed table's files keep the PHYSICAL column
    // name - the stream must bind it, never null-fill the declared one
    val dir = tmpDir("cdfstream-map") + "/t"
    val data = (1L to 8L).map(k => (k, k * 2.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 1)
    t.append(data)
    t.renameColumn("v", "amount")
    DeltaExport.writeDeltaLog(spark, t, cdf = true)
    val out = tmpDir("cdfstream-map-out")
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmpDir("cdfstream-map-ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.columns.take(2).toSeq === Seq("k", "amount"))
    assert(got.agg(sum("amount")).head.getDouble(0) === (1L to 8L)
      .map(_ * 2.0).sum, "physical-named bytes must serve, not nulls")

    // id mode: the row reader cannot bind field ids - refuse, never
    // misread
    val dir2 = tmpDir("cdfstream-idm") + "/t"
    val t2 = new TxTable(spark, dir2, data.schema, Seq("k"),
      numBuckets = 1, fieldIds = true)
    t2.append(data)
    t2.renameColumn("v", "amount")
    DeltaExport.writeDeltaLog(spark, t2, cdf = true)
    val e = intercept[Exception] {
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(dir2).schema
    }
    val msg = causeMessages(e)
    assert(msg.contains("ID mode"))
  }

  test("honest refusals: no log, and mutation commits without change data") {
    val dir = tmpDir("cdfstream-ref") + "/t"
    val data = (1L to 6L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    // no _delta_log at all
    val e0 = intercept[Exception] {
      spark.readStream.format("graft").option("readChangeFeed", "true")
        .load(dir).schema
    }
    assert(Iterator.iterate(e0: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      .contains("_delta_log"))

    // a non-cdf log whose commit removed rows refuses mid-stream
    DeltaExport.writeDeltaLog(spark, t)
    t.deleteWhere(col("k") <= 2L)
    DeltaExport.syncDeltaLog(spark, t) // no cdf: remove+add, no feed
    val e1 = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.format("memory").queryName("cdf_refuse")
        .option("checkpointLocation", tmpDir("cdfstream-ref-ck"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(Iterator.iterate(e1: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      .contains("cdf = true"))
  }
}
