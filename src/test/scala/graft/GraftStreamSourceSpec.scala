package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** Streaming tail of a TxTable: micro-batches = commit ranges
  * (exactly-once version offsets), and non-append commits fail the
  * stream honestly instead of emitting wrong rows. */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  test("readStream tails appends across commits; offsets are versions") {
    val dir = tmpDir("gstream") + "/t"
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val t = new TxTable(spark, dir, b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1) // v0

    val q = spark.readStream.format("graft")
      .option("startingVersion", "-1") // from the beginning
      .load(dir)
      .writeStream.format("memory").queryName("gtail")
      .option("checkpointLocation", tmpDir("gstream-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gtail").count() === 2L)

      t.append(Seq((3L, "c")).toDF("k", "s")) // v1
      t.append(Seq((4L, "d")).toDF("k", "s")) // v2
      q.processAllAvailable()
      val got = spark.table("gtail").collect().map(_.getLong(0)).toSet
      assert(got === Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("table maintenance (compaction) does not kill or duplicate the stream") {
    val dir = tmpDir("gstream-compact") + "/t"
    val b1 = (1L to 16L).map(i => (i, "a")).toDF("k", "s")
    val t = new TxTable(spark, dir, b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1)
    val q = spark.readStream.format("graft")
      .option("startingVersion", "-1").load(dir)
      .writeStream.format("memory").queryName("gtail3")
      .option("checkpointLocation", tmpDir("gstream-compact-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gtail3").count() === 16L)
      // maintenance rewrites every file; the live row set is unchanged
      t.compactClustered(Seq("k"), filesPerBucket = 2)
      t.append(Seq((100L, "z")).toDF("k", "s"))
      q.processAllAvailable()
      // compacted rows NOT re-served, the new append IS served
      assert(spark.table("gtail3").count() === 17L)
      assert(spark.table("gtail3").collect().map(_.getLong(0)).toSet ===
        ((1L to 16L).toSet + 100L))
    } finally q.stop()
  }

  test("non-append commits fail the stream with the changeFeed remedy") {
    val dir = tmpDir("gstream-del") + "/t"
    val b1 = (1L to 20L).map(i => (i, i % 3L)).toDF("k", "g")
    val t = new TxTable(spark, dir, b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1)
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName("gtail2")
      .option("checkpointLocation", tmpDir("gstream-del-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      // a deletion-vector write retracts rows from an EXISTING file —
      // the append-tail stream must refuse, naming the CDC remedy
      t.deleteWhereLight(col("g") === 0L)
      val e = intercept[Exception] { q.processAllAvailable() }
      val msgs = causeMessages(e)
      assert(msgs.contains("changeFeed"), msgs)
    } finally q.stop()
  }

  test("streaming read via CATALOG identifier: readStream.table(lake.t)") {
    val root = tmpDir("gstream-cat")
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val t = new TxTable(spark, s"$root/ev", b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1)
    spark.conf.set("spark.sql.catalog.slake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.slake.root", root)

    val q = spark.readStream
      .option("startingVersion", "-1")
      .table("slake.ev")
      .writeStream.format("memory").queryName("gtail_cat")
      .option("checkpointLocation", tmpDir("gstream-cat-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gtail_cat").count() === 2L)
      t.append(Seq((3L, "c")).toDF("k", "s"))
      q.processAllAvailable()
      assert(spark.table("gtail_cat").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("maxVersionsPerTrigger drains a backlog in bounded per-commit batches") {
    val dir = tmpDir("gstream-rate") + "/t"
    val b1 = Seq((1L, "a")).toDF("k", "s")
    val t = new TxTable(spark, dir, b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1)                               // v0
    t.append(Seq((2L, "b")).toDF("k", "s"))    // v1
    t.append(Seq((3L, "c")).toDF("k", "s"))    // v2

    // a stream starting from scratch faces a 3-commit backlog; rate
    // limiting must chunk it ONE commit per micro-batch (bounded task
    // count per trigger at any backlog size), and AvailableNow must
    // still drain to the end pinned at start
    val q = spark.readStream.format("graft")
      .option("startingVersion", "-1")
      .option("maxVersionsPerTrigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName("gtail_rate")
      .option("checkpointLocation", tmpDir("gstream-rate-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      assert(spark.table("gtail_rate").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 3L))
      val fed = q.recentProgress.filter(_.numInputRows > 0)
      assert(fed.length === 3,
        s"expected 3 one-commit batches, got ${fed.length}: " +
          fed.map(_.numInputRows).mkString(","))
      assert(fed.forall(_.numInputRows === 1))
    } finally q.stop()
  }

  test("maxVersionsPerTrigger above Int.MaxValue clamps, never stalls") {
    val dir = tmpDir("gstream-clamp") + "/t"
    val b1 = Seq((1L, "a")).toDF("k", "s")
    val t = new TxTable(spark, dir, b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1)
    t.append(Seq((2L, "b")).toDF("k", "s"))
    // pre-fix, (Int.MaxValue+1).toInt wraps to a NEGATIVE take() →
    // every batch plans empty and the stream stalls silently forever
    val q = spark.readStream.format("graft")
      .option("startingVersion", "-1")
      .option("maxVersionsPerTrigger", (Int.MaxValue.toLong + 1L).toString)
      .load(dir)
      .writeStream.format("memory").queryName("gtail_clamp")
      .option("checkpointLocation", tmpDir("gstream-clamp-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      assert(spark.table("gtail_clamp").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L))
    } finally q.stop()
  }

  test("startingTimestamp serves exactly the commits published at/after it") {
    val dir = tmpDir("gstream-ts") + "/t"
    val b1 = Seq((1L, "a")).toDF("k", "s")
    val t = new TxTable(spark, dir, b1.schema, Seq("k"), numBuckets = 2)
    t.append(b1)
    Thread.sleep(1100) // manifest publish times are second-granular mtimes
    val cut = System.currentTimeMillis()
    t.append(Seq((2L, "b")).toDF("k", "s"))

    val q = spark.readStream.format("graft")
      .option("startingTimestamp", cut.toString)
      .load(dir)
      .writeStream.format("memory").queryName("gtail_ts")
      .option("checkpointLocation", tmpDir("gstream-ts-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      // only the post-cut commit is served; the pre-cut rows are not
      assert(spark.table("gtail_ts").collect().map(_.getLong(0)).toSet ===
        Set(2L))
    } finally q.stop()

    // a timestamp predating the whole history = serve everything
    val q2 = spark.readStream.format("graft")
      .option("startingTimestamp", "0")
      .load(dir)
      .writeStream.format("memory").queryName("gtail_ts0")
      .option("checkpointLocation", tmpDir("gstream-ts0-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q2.awaitTermination()
      assert(spark.table("gtail_ts0").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L))
    } finally q2.stop()

    val both = intercept[Exception] {
      // newScanBuilder guards batch and streaming alike; count() forces
      // the scan to be built
      spark.read.format("graft")
        .option("startingVersion", "-1")
        .option("startingTimestamp", "0")
        .load(dir).count()
    }
    assert(Iterator.iterate(both: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      .contains("not both"))
  }
}
