package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.TxTable

/** Native streaming SINK: `writeStream.format("graft")` /
  * `.toTable(...)` land micro-batches through the guarded commit
  * protocol exactly-once (per-query epoch ledger in commit metadata),
  * with append / upsert / complete modes. */
class GraftStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  /** A keyed destination table the sink can bucket into. */
  private def mkDest(dir: String): TxTable = {
    val t = new TxTable(spark, dir,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    t.createIfAbsent()
    t
  }

  test("graft-to-graft pipeline: append epochs land exactly the source rows") {
    val src = tmpDir("gsink-src") + "/t"
    val dst = tmpDir("gsink-dst") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val d = mkDest(dst)

    val ck = tmpDir("gsink-ck")
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    run()
    assert(d.read.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // the epoch ledger rode the commit atomically
    assert(d.commitMeta(d.currentVersion).keys
      .exists(_.startsWith("stream_batch:")))

    // new source commits arrive as the NEXT epochs; old rows not re-sent
    s.append(Seq((3L, "c")).toDF("k", "s"))
    run()
    assert(d.read.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // staged files are cleaned up after each epoch commit
    val stageLeft = new java.io.File(dst).listFiles()
      .filter(_.getName.startsWith(".stage-stream-"))
    assert(stageLeft.isEmpty, s"stage dirs left: ${stageLeft.mkString(",")}")
  }

  test("replayed epoch converges: same tag + fresh checkpoint is a no-op") {
    val src = tmpDir("gsink-replay-src") + "/t"
    val dst = tmpDir("gsink-replay-dst") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val d = mkDest(dst)

    def runWithFreshCheckpoint(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", tmpDir("gsink-replay-ck"))
        .option("graft.tag", "pipeline-A") // pinned ledger tag
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    runWithFreshCheckpoint()
    val after1 = d.read.count()
    assert(after1 === 2L)
    // a crash-and-restart that lost the checkpoint re-sends epoch 0
    // with the SAME content; the ledger makes it a no-op
    runWithFreshCheckpoint()
    assert(d.read.count() === after1)
    assert(d.latestMeta("stream_batch:pipeline-A").get.startsWith("0:2:"))

    // but a pinned tag + fresh checkpoint over a CHANGED source is NOT
    // silently skippable: epoch 0 would now carry rows the ledger never
    // saw, so the sink fails with the remedy instead of losing them
    s.append(Seq((3L, "c")).toDF("k", "s"))
    val e = intercept[Exception] { runWithFreshCheckpoint() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("different content"), msgs)
    assert(d.read.count() === after1) // nothing half-applied
  }

  test("graft.tag with path separators or colons is refused") {
    val src = tmpDir("gsink-tag-src") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, "a")).toDF("k", "s"))
    val dst = tmpDir("gsink-tag-dst") + "/t"
    mkDest(dst)
    // '/' would escape the stage directory, ':' would corrupt the
    // ledger value format
    for (bad <- Seq("a/b", "a:b", "")) {
      val e = intercept[Exception] {
        val q = spark.readStream.format("graft")
          .option("startingVersion", "-1").load(src)
          .writeStream.format("graft")
          .option("checkpointLocation", tmpDir("gsink-tag-ck"))
          .option("graft.tag", bad)
          .trigger(Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination()
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
        .contains("graft.tag"), s"tag '$bad' not refused")
    }
  }

  test("graft.mode=upsert: later epochs win per key (live ON-CONFLICT)") {
    val src = tmpDir("gsink-ups-src") + "/t"
    val dst = tmpDir("gsink-ups-dst") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val d = mkDest(dst)

    val ck = tmpDir("gsink-ups-ck")
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ck)
        .option("graft.mode", "upsert")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    run()
    // second source commit REWRITES key 1 and adds key 3
    s.append(Seq((1L, "a2"), (3L, "c")).toDF("k", "s"))
    run()
    assert(d.read.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("outputMode(complete): each epoch REPLACES the table (live aggregate)") {
    val srcDir = tmpDir("gsink-agg-src")
    Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("g", "v")
      .write.mode("overwrite").parquet(srcDir)
    val dst = tmpDir("gsink-agg-dst") + "/t"
    val d = new TxTable(spark, dst,
      Seq(("x", 0L)).toDF("g", "total").schema, Seq("g"), numBuckets = 2)
    d.createIfAbsent()

    val q = spark.readStream
      .schema(Seq(("a", 1L)).toDF("g", "v").schema)
      .parquet(srcDir)
      .groupBy("g").agg(sum("v").as("total"))
      .writeStream.format("graft")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("gsink-agg-ck"))
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    assert(d.read.orderBy("g").as[(String, Long)].collect().toSeq ===
      Seq(("a", 4L), ("b", 2L)))
  }

  test("update mode refused without graft.mode=upsert; accepted with it") {
    val src = tmpDir("gsink-upd-src") + "/t"
    val dst = tmpDir("gsink-upd-dst") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, "a")).toDF("k", "s"))
    mkDest(dst)

    // blind update-as-append on a keyed table would duplicate keys:
    // the plain builder does NOT implement the update marker, so
    // Spark itself refuses the mode at start
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .outputMode("update")
        .option("checkpointLocation", tmpDir("gsink-upd-ck1"))
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    assert(e.getMessage.toLowerCase.contains("update"))

    val q2 = spark.readStream.format("graft")
      .option("startingVersion", "-1").load(src)
      .writeStream.format("graft")
      .outputMode("update")
      .option("graft.mode", "upsert")
      .option("checkpointLocation", tmpDir("gsink-upd-ck2"))
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q2.awaitTermination()
    val d = graft.core.TxTable.openReadOnly(spark, dst)
    assert(d.read.as[(Long, String)].collect().toSeq === Seq((1L, "a")))
  }

  test("CHECK admission gates sink epochs: a violating batch fails, commits nothing") {
    val src = tmpDir("gsink-chk-src") + "/t"
    val dst = tmpDir("gsink-chk-dst") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, 0.0)).toDF("k", "v").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, 1.5), (2L, -7.0)).toDF("k", "v"))
    val d = new TxTable(spark, dst,
      Seq((0L, 0.0)).toDF("k", "v").schema, Seq("k"), numBuckets = 2)
    d.createIfAbsent()
    d.addCheckConstraint("v_pos", "v >= 0")

    val e = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", tmpDir("gsink-chk-ck"))
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("v_pos"), msgs)
    // the epoch was refused WHOLE: no rows, no ledger advance
    assert(d.read.count() === 0L)
    assert(d.versions.flatMap(d.commitMeta(_).keys)
      .forall(!_.startsWith("stream_batch:")))
  }

  test("graft.evolve=true: schema-drifting epochs widen the sink table") {
    val src = tmpDir("gsink-evo-src") + "/t"
    val dst = tmpDir("gsink-evo-dst") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, "a")).toDF("k", "s"))
    val d = mkDest(dst)

    val ck = tmpDir("gsink-evo-ck")
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ck)
        .option("graft.evolve", "true")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    run()
    assert(d.read.columns.toSeq === Seq("k", "s"))
    // the source gains a column; the restarted stream carries it and
    // the sink widens the table IN the epoch commit (old rows null)
    s.appendEvolving(Seq((2L, "b", 7L)).toDF("k", "s", "score"))
    run()
    assert(d.currentSchema.fieldNames.toSeq === Seq("k", "s", "score"))
    assert(d.read.orderBy("k").as[(Long, String, Option[Long])]
      .collect().toSeq === Seq((1L, "a", None), (2L, "b", Some(7L))))
    // without the option, drifting batches are refused, not dropped
    val s2 = new TxTable(spark, tmpDir("gsink-evo-src2") + "/t",
      Seq((0L, "x", 0L)).toDF("k", "s", "extra").schema, Seq("k"),
      numBuckets = 2)
    s2.append(Seq((9L, "z", 1L)).toDF("k", "s", "extra"))
    val dst2 = tmpDir("gsink-evo-dst2") + "/t"
    mkDest(dst2)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(s2.dir)
        .writeStream.format("graft")
        .option("checkpointLocation", tmpDir("gsink-evo-ck2"))
        .trigger(Trigger.AvailableNow())
        .start(dst2)
      q.awaitTermination()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      .contains("evolve"))
  }

  test("graft.evolve + graft.mode=upsert: drifting epochs upsert, widen, replay-converge") {
    val src = tmpDir("gsink-evoup-src") + "/t"
    val dst = tmpDir("gsink-evoup-dst") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val d = mkDest(dst)

    val ck = tmpDir("gsink-evoup-ck")
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ck)
        .option("graft.mode", "upsert")
        .option("graft.evolve", "true")
        .option("graft.tag", "evo-up")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    run()
    assert(d.read.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))

    // the SOURCE evolves mid-pipeline (append-only: an update is a
    // re-sent key): the restarted stream carries the new column and
    // the sink widens + upserts IN the same epoch commit
    s.appendEvolving(Seq((2L, "B", 9L), (3L, "c", 5L))
      .toDF("k", "s", "score"))
    run()
    assert(d.currentSchema.fieldNames.toSeq === Seq("k", "s", "score"))
    assert(d.read.orderBy("k").as[(Long, String, Option[Long])]
      .collect().toSeq ===
      Seq((1L, "a", None), (2L, "B", Some(9L)), (3L, "c", Some(5L))))

    // batch twin: the same rows through the BATCH evolving upsert
    // must land the identical state
    val twin = new TxTable(spark, tmpDir("gsink-evoup-twin") + "/t",
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    twin.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    twin.upsertEvolving(Seq((2L, "B", 9L), (3L, "c", 5L))
      .toDF("k", "s", "score"))
    assert(d.read.orderBy("k").collect().map(_.toSeq).toSeq ===
      twin.read.orderBy("k").collect().map(_.toSeq).toSeq)

    // replay: a re-run with nothing new is a no-op, and the ledger
    // watermark names the last epoch
    val head = d.currentVersion
    run()
    assert(d.currentVersion === head)
    assert(d.latestMeta("stream_batch:evo-up").isDefined)
  }

  test("two independent streams into ONE table keep separate ledgers") {
    val srcA = tmpDir("gsink-2a") + "/t"
    val srcB = tmpDir("gsink-2b") + "/t"
    val dst = tmpDir("gsink-2dst") + "/t"
    val sA = new TxTable(spark, srcA,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    sA.append(Seq((1L, "a"), (2L, "a")).toDF("k", "s"))
    val sB = new TxTable(spark, srcB,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    sB.append(Seq((10L, "b")).toDF("k", "s"))
    val d = mkDest(dst)

    def run(src: String, tag: String, ck: String): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "-1").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ck)
        .option("graft.tag", tag)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    val ckA = tmpDir("gsink-2ck-a"); val ckB = tmpDir("gsink-2ck-b")
    run(srcA, "feedA", ckA)
    run(srcB, "feedB", ckB)
    assert(d.read.count() === 3L)
    // per-tag ledgers: replaying EITHER pipeline from a LOST checkpoint
    // re-sends its epoch 0 and converges to a no-op, without touching
    // the other pipeline's ledger
    run(srcA, "feedA", tmpDir("gsink-2ck-a-replay"))
    assert(d.read.count() === 3L)
    assert(d.latestMeta("stream_batch:feedA").get.startsWith("0:2:"))
    assert(d.latestMeta("stream_batch:feedB").get.startsWith("0:1:"))
    // normal operation (surviving checkpoint): a new commit on one
    // feed flows as that pipeline's NEXT epoch, the other untouched
    sB.append(Seq((11L, "b2")).toDF("k", "s"))
    run(srcB, "feedB", ckB)
    assert(d.read.count() === 4L)
    assert(d.latestMeta("stream_batch:feedB").get.startsWith("1:1:"))
    assert(d.latestMeta("stream_batch:feedA").get.startsWith("0:2:"))
  }

  test("writeStream.toTable through the catalog identifier") {
    val root = tmpDir("gsink-cat")
    spark.conf.set("spark.sql.catalog.sinkcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sinkcat.root", root)
    spark.sql("CREATE TABLE sinkcat.evout (k BIGINT, s STRING) " +
      "TBLPROPERTIES('keys'='k','buckets'='2')")

    val src = tmpDir("gsink-cat-src") + "/t"
    val s = new TxTable(spark, src,
      Seq((0L, "x")).toDF("k", "s").schema, Seq("k"), numBuckets = 2)
    s.append(Seq((7L, "g"), (8L, "h")).toDF("k", "s"))

    val q = spark.readStream.format("graft")
      .option("startingVersion", "-1").load(src)
      .writeStream
      .option("checkpointLocation", tmpDir("gsink-cat-ck"))
      .trigger(Trigger.AvailableNow())
      .toTable("sinkcat.evout")
    q.awaitTermination()
    assert(spark.sql("SELECT k FROM sinkcat.evout ORDER BY k")
      .as[Long].collect().toSeq === Seq(7L, 8L))
  }
}
