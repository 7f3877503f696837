package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming vs batch on the same transforms (Spark unified engine).
  * Watermark semantics make streaming-append a SUBSET of batch: late
  * rows relative to an earlier micro-batch are dropped, and windows
  * not yet passed by the final watermark stay in state. The tests
  * assert exactly that contract: streamed ⊆ batch, and every window
  * safely behind the final watermark IS emitted. Files are written in
  * time-range order so watermarks advance monotonically.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsDir = {
    val dir = tmpDir("events-src")
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    batch.repartitionByRange(3, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val batchEvents = spark.read
    .schema(EventStreams.eventSchema).parquet(eventsDir)

  private lazy val maxTs: java.sql.Timestamp =
    batchEvents.agg(max("ts")).as[java.sql.Timestamp].collect().head

  private def safeCutoff(hoursBack: Int): java.sql.Timestamp =
    new java.sql.Timestamp(maxTs.getTime - hoursBack * 3600L * 1000)

  test("tumbling windows: streamed ⊆ batch; all safely-closed windows emitted") {
    val stream = EventStreams.readStream(spark, eventsDir, maxFilesPerTrigger = 2)
    EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream, "1 hour"), "tumbling_out")
    val streamed = spark.table("tumbling_out")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = EventStreams.tumblingCounts(batchEvents, "1 hour")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    // windows ending well before (lateness + window) behind max ts must
    // all have been emitted by the final watermark
    val cutoff = safeCutoff(hoursBack = 3)
    val mustEmit = batch.filter(_._1.before(cutoff))
    assert(mustEmit.subsetOf(streamed))
  }

  test("session windows: streamed ⊆ batch; closed sessions emitted") {
    val stream = EventStreams.readStream(spark, eventsDir, maxFilesPerTrigger = 3)
    EventStreams.runToMemory(
      EventStreams.sessionCounts(stream, "30 minutes"), "session_out")
    val streamed = spark.table("session_out")
      .select("session_start", "user_id", "n_events")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    val batch = EventStreams.sessionCounts(batchEvents, "30 minutes")
      .select("session_start", "user_id", "n_events")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    val cutoff = safeCutoff(hoursBack = 2)
    val mustEmit = batch.filter(_._1.before(cutoff))
    assert(mustEmit.subsetOf(streamed))
  }

  test("sliding windows produce denser coverage than tumbling") {
    val tumble = EventStreams.tumblingCounts(batchEvents, "1 hour").count()
    val slide = EventStreams
      .slidingCounts(batchEvents, "1 hour", "15 minutes").count()
    assert(slide > 2 * tumble)
  }

  test("flatMapGroupsWithState milestones: streaming state matches batch math") {
    val stream = EventStreams.readStream(spark, eventsDir, maxFilesPerTrigger = 2)
      .as[EventStreams.Event]
    EventStreams.runToMemory(
      EventStreams.userMilestones(stream, step = 10).toDF(), "milestones_out")
    val streamed = spark.table("milestones_out")
      .select("user_id", "n_events", "milestone")
      .as[(Long, Long, Long)].collect().toSet
    // batch math: every user emits floor(count/10) milestones
    val counts = batchEvents.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val expected = counts.flatMap { case (u, n) =>
      (1L to n / 10).map(m => (u, m * 10, m))
    }.toSet
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup: duplicated source events land exactly once") {
    // duplicate every event across two files, read as a stream
    val dupDir = tmpDir("events-dup")
    val base = batchEvents.limit(500)
    base.write.mode("overwrite").parquet(dupDir)
    base.write.mode("append").parquet(dupDir)
    val stream = EventStreams.readStream(spark, dupDir, maxFilesPerTrigger = 10)
    EventStreams.runToMemory(
      EventStreams.dedupedEvents(stream), "dedup_out")
    val got = spark.table("dedup_out")
    assert(got.count() === got.select("event_id").distinct().count())
    assert(got.count() === 500)
  }

  test("stream-static enrichment join broadcasts the dimension") {
    val userDim = batchEvents.select("user_id").distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(3)))
    val stream = EventStreams.readStream(spark, eventsDir, maxFilesPerTrigger = 5)
    EventStreams.runToMemory(
      EventStreams.enriched(stream, userDim)
        .groupBy("cohort").agg(count(lit(1)).as("n")), "enriched_out",
      outputMode = "complete")
    val got = spark.table("enriched_out")
      .as[(Long, Long)].collect().toMap
    assert(got.values.sum === batchEvents.count())
    assert(got.keySet === Set(0L, 1L, 2L))
  }

  test("stream-stream interval join matches batch when fed in one micro-batch") {
    val stream = EventStreams.readStream(spark, eventsDir, maxFilesPerTrigger = 10)
    EventStreams.runToMemory(
      EventStreams.purchasesWithRecentClicks(stream), "ssj_out")
    val streamed = spark.table("ssj_out")
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    val batch = EventStreams.purchasesWithRecentClicks(batchEvents)
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("foreachBatch parquet sink lands all rows") {
    val out = tmpDir("sink-out")
    val cp = tmpDir("sink-cp")
    val stream = EventStreams.readStream(spark, eventsDir, maxFilesPerTrigger = 2)
    val q = EventStreams.toParquetSink(
      stream.filter(col("event_type") === "purchase"), out, cp)
    q.awaitTermination()
    val landed = spark.read.parquet(out + "/batch=*").count()
    val expected = batchEvents.filter(col("event_type") === "purchase").count()
    assert(landed === expected)
  }
}
