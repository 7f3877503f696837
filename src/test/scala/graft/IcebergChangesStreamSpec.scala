package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{IcebergExport, TxTable}

/** Iceberg CHANGELOG streaming
  * (`readStream.format("graft").option("icebergChanges","true")`):
  * mutation snapshots served as a `_change_type`-tagged retraction
  * feed — inserts from added data files, deletes resolved from
  * position-delete manifests to full rows, `_change_sequence` for
  * deterministic multi-snapshot application. */
class IcebergChangesStreamSpec extends SparkSpec {
  import spark.implicits._

  private def drainTo(dir: String, out: String, ck: String): Unit = {
    val q = spark.readStream.format("graft")
      .option("icebergChanges", "true").load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("position deletes stream as full-row retractions with sequence tags") {
    val dir = tmpDir("icech") + "/t"
    val a = (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 2)
    t.append(a)                                   // v1 seq 4? (2v+2)
    t.append((41L to 60L).map(k => (k, k * 1.0)).toDF("k", "v")) // v2
    t.deleteWhereLight(col("k") % 10 === 0)       // v3: DVs
    IcebergExport.writeIcebergMetadata(spark, t)

    val out = tmpDir("icech-out")
    val ck = tmpDir("icech-ck")
    drainTo(dir, out, ck)
    val got = spark.read.parquet(out)
    // every row of both appends arrives as an insert
    assert(got.filter(col("_change_type") === "insert").count() === 60L)
    // the retraction carries the FULL row (the MERGE key needs it)
    val dels = got.filter(col("_change_type") === "delete")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1)
    assert(dels.map(_._1).toSeq === Seq(10L, 20L, 30L, 40L, 50L, 60L))
    assert(dels.forall { case (k, v) => v == k * 1.0 })
    // sequence tags order the feed: deletes carry the delete
    // snapshot's sequence, strictly after both appends'
    val insMaxSeq = got.filter(col("_change_type") === "insert")
      .agg(max("_change_sequence")).head.getLong(0)
    val delSeq = got.filter(col("_change_type") === "delete")
      .select("_change_sequence").distinct().collect().map(_.getLong(0))
    assert(delSeq.length === 1 && delSeq.head > insMaxSeq)

    // a verbatim re-run serves nothing new (offsets at the head)
    drainTo(dir, out, ck)
    assert(spark.read.parquet(out).count() === 66L)
  }

  test("foreachBatch MERGE reconstitutes the exact final state") {
    val dir = tmpDir("icech-m") + "/t"
    val a = (1L to 50L).map(k => (k, k * 2.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 2)
    t.append(a)
    t.deleteWhereLight(col("k") % 7 === 0)
    IcebergExport.writeIcebergMetadata(spark, t)

    val sinkDir = tmpDir("icech-sink") + "/t"
    val sink = new TxTable(spark, sinkDir, a.schema, Seq("k"),
      numBuckets = 2)
    sink.createIfAbsent()
    val q = spark.readStream.format("graft")
      .option("icebergChanges", "true").load(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // deterministic application: ascending sequence, deletes
        // before inserts within each (the copy-on-write order)
        val seqs = batch.select("_change_sequence").distinct()
          .collect().map(_.getLong(0)).sorted
        seqs.foreach { s =>
          val grp = batch.filter(col("_change_sequence") === s)
          val delKeys = grp.filter(col("_change_type") === "delete")
            .select("k").collect().map(_.getLong(0))
          if (delKeys.nonEmpty)
            sink.deleteWhereLight(col("k").isin(delKeys.toSeq: _*))
          val ins = grp.filter(col("_change_type") === "insert")
            .select("k", "v")
          if (!ins.isEmpty) sink.upsert(ins)
        }
        ()
      }
      .option("checkpointLocation", tmpDir("icech-m-ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val want = (1L to 50L).filter(_ % 7 != 0)
    assert(sink.read.select("k").as[Long].collect().sorted
      === want.toArray)
    assert(sink.read.agg(sum("v")).head.getDouble(0)
      === want.map(_ * 2.0).sum)
  }

  test("the plain tail's refusal names icebergChanges as a remedy") {
    val dir = tmpDir("icech-ref") + "/t"
    val a = (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, a.schema, Seq("k"), numBuckets = 1)
    t.append(a)
    t.deleteWhereLight(col("k") === 5L)
    IcebergExport.writeIcebergMetadata(spark, t)
    val q = spark.readStream.format("graft").option("icebergTail", "true")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", tmpDir("icech-ref-out"))
      .option("checkpointLocation", tmpDir("icech-ref-ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def rootMsg(t0: Throwable): String =
      Iterator.iterate(t0)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(rootMsg(e).contains("icebergChanges=true"))
  }
}
