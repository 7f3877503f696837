package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** Multi-writer stress over the claim-based commit protocol: N
  * threads race appends / upserts / guarded commits against ONE table
  * directory (each through its own TxTable instance, as separate
  * processes would be). Asserts the protocol's contract under real
  * contention — serializable history (one manifest per commit, no
  * gaps), no lost updates (every writer's rows present), and progress
  * (no livelock within the commit budget). Seeded and deterministic
  * in outcome, not interleaving. */
class GraftConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def race(n: Int)(body: Int => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = (0 until n).map { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try body(i)
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown() // maximize overlap: everyone starts together
    tasks.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    if (!failures.isEmpty) throw failures.peek()
  }

  private def openWriter(dir: String,
      schema: org.apache.spark.sql.types.StructType): TxTable =
    new TxTable(spark, dir, schema, Seq("k"), numBuckets = 2,
      commitBudgetMs = 180000L)

  test("racing appenders: every batch lands, history is gap-free") {
    val dir = tmpDir("conc-append") + "/t"
    val schema = Seq((0L, 0L)).toDF("k", "w").schema
    val writers = 6
    val batches = 4
    val rowsPerBatch = 10L
    new TxTable(spark, dir, schema, Seq("k"), numBuckets = 2)
      .createIfAbsent() // v0 settled before the race
    race(writers) { w =>
      val t = openWriter(dir, schema)
      (0 until batches).foreach { b =>
        val base = (w.toLong * batches + b) * rowsPerBatch
        t.append((base until base + rowsPerBatch)
          .map(k => (k, w.toLong)).toDF("k", "w"))
      }
    }
    val t = openWriter(dir, schema)
    // no lost updates: every writer's every batch present exactly once
    assert(t.read.count() === writers * batches * rowsPerBatch)
    assert(t.read.select("k").distinct().count() ===
      writers * batches * rowsPerBatch)
    // serializable history: one version per commit, contiguous ledger
    val vs = t.versions
    assert(vs.size === writers * batches + 1) // + the v0 create
    assert(vs.sorted === (vs.min to vs.max))
    // every writer's rows attributable
    val byWriter = t.read.groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until writers).foreach(w =>
      assert(byWriter(w.toLong) === batches * rowsPerBatch))
  }

  test("racing upserts on SHARED keys: last-writer-wins, none lost") {
    val dir = tmpDir("conc-upsert") + "/t"
    val schema = Seq((0L, 0L, 0L)).toDF("k", "writer", "marker").schema
    val writers = 5
    val sharedKeys = 20L
    new TxTable(spark, dir, schema, Seq("k"), numBuckets = 2)
      .createIfAbsent()
    race(writers) { w =>
      val t = openWriter(dir, schema)
      // every writer upserts ALL shared keys plus one PRIVATE marker
      // key - if any commit were lost, its marker would vanish
      val rows = (1L to sharedKeys).map(k => (k, w.toLong, 0L)) :+
        (1000L + w, w.toLong, 1L)
      t.upsert(rows.toDF("k", "writer", "marker"))
    }
    val t = openWriter(dir, schema)
    val all = t.read.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly the shared keys + one marker per writer; no duplicates
    assert(all.length === (sharedKeys + writers).toInt)
    assert(all.map(_._1).distinct.length === all.length)
    // no lost update: every writer's private marker survived
    assert(all.filter(_._3 == 1L).map(_._2).sorted.toSeq ===
      (0L until writers.toLong))
    // whole-row atomicity: each shared key's row names ONE writer
    val owners = all.filter(_._3 == 0L).map(_._2).distinct
    assert(owners.forall(o => o >= 0 && o < writers))
    // last-writer-wins is per-commit: all shared keys in one upsert
    // batch must agree on the same winning writer
    assert(owners.length === 1,
      s"one upsert commit must win wholesale, saw writers ${owners.toSeq}")
  }

  test("guarded commits under contention: preconditions re-check per attempt") {
    val dir = tmpDir("conc-guard") + "/t"
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    new TxTable(spark, dir, schema, Seq("k"), numBuckets = 2)
      .createIfAbsent()
    val writers = 6
    // each writer appends ONLY IF its slot watermark is unset - the
    // guard admits exactly one commit per slot even when every writer
    // races the same slot
    val landed = new java.util.concurrent.atomic.AtomicInteger(0)
    race(writers) { w =>
      val t = openWriter(dir, schema)
      val ok = t.appendIf(
        Seq((w.toLong, 1L)).toDF("k", "v"),
        Map("slot" -> "s1"))(snap => snap.meta("slot").isEmpty)
      if (ok) { landed.incrementAndGet(); () }
    }
    val t = openWriter(dir, schema)
    assert(landed.get() === 1,
      s"exactly one guarded commit must win slot s1, got ${landed.get()}")
    assert(t.read.count() === 1L)
    assert(t.latestMeta("slot") === Some("s1"))
  }

  test("publishBranch races a main writer: serializable, never partial") {
    val dir = tmpDir("conc-wap") + "/t"
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    val t0 = new TxTable(spark, dir, schema, Seq("k"), numBuckets = 2)
    t0.append((1L to 20L).map(k => (k, 0L)).toDF("k", "v"))
    val b = t0.createBranch("race")
    b.append((100L to 109L).map(k => (k, 1L)).toDF("k", "v"))

    val publishOk = new java.util.concurrent.atomic.AtomicBoolean(false)
    race(2) { w =>
      val t = openWriter(dir, schema)
      if (w == 0) {
        try { t.publishBranch("race"); publishOk.set(true) }
        catch { case _: IllegalArgumentException | _: TxTable.CommitConflict =>
          () } // CAS refusal is a legal outcome
      } else {
        t.append((200L to 204L).map(k => (k, 2L)).toDF("k", "v"))
      }
    }
    val t = openWriter(dir, schema)
    val n = t.read.count()
    // the appender ALWAYS lands (it rebases); the publish lands only
    // if its CAS won - and then the state holds base+branch+append.
    // Nothing in between, nothing lost, never a partial flip.
    if (publishOk.get) assert(n === 20L + 10L + 5L)
    else {
      assert(n === 20L + 5L)
      assert(t.read.filter(col("k") >= 100L && col("k") <= 109L)
        .count() === 0L, "a refused publish must leak nothing")
    }
    assert(t.read.filter(col("v") === 2L).count() === 5L)
  }

  test("append/delete/upsert mixed race: row accounting stays exact") {
    val dir = tmpDir("conc-mixed") + "/t"
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    val t0 = new TxTable(spark, dir, schema, Seq("k"), numBuckets = 2)
    t0.append((1L to 100L).map(k => (k, 0L)).toDF("k", "v"))
    race(4) { w =>
      val t = openWriter(dir, schema)
      w match {
        case 0 => t.append((101L to 120L).map(k => (k, 9L)).toDF("k", "v"))
        case 1 => t.deleteWhereLight(col("k") <= 10L)
        case 2 => t.upsert((11L to 20L).map(k => (k, 7L)).toDF("k", "v"))
        case 3 => t.append((121L to 140L).map(k => (k, 9L)).toDF("k", "v"))
      }
    }
    val t = openWriter(dir, schema)
    // 100 - 10 deleted + 20 + 20 appended = 130, upsert count-neutral
    assert(t.read.count() === 130L)
    assert(t.read.filter(col("k") <= 10L).count() === 0L)
    assert(t.read.filter(col("k").between(11L, 20L) && col("v") === 7L)
      .count() === 10L)
    assert(t.read.filter(col("v") === 9L).count() === 40L)
  }

  test("identity appends under auto-compaction: ids unique, files bounded") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("conc-idac") + "/t"
    val md = new MetadataBuilder()
      .putLong(TxTable.IdentityStartKey, 1L)
      .putLong(TxTable.IdentityStepKey, 1L)
      .putBoolean(TxTable.IdentityAllowExplicitKey, false).build()
    val schema = StructType(Seq(
      StructField("row_id", LongType, nullable = true, md),
      StructField("k", LongType)))
    def open() = new TxTable(spark, dir, schema, Seq("k"),
      numBuckets = 2, commitBudgetMs = 180000L)
    val t0 = open()
    t0.createIfAbsent()
    t0.setTableProperties(Map(TxTable.AutoCompactKey -> "4"))
    // the mark CAS, the append commit and the follow-up layout_only
    // compaction all interleave across writers — allocation must stay
    // collision-free and compaction must neither lose rows nor ids
    race(4) { w =>
      val t = open()
      (0 until 3).foreach { b =>
        t.append((1L to 25L).map(i => w * 1000L + b * 100L + i).toDF("k"))
      }
    }
    val t = open()
    assert(t.read.count() === 4 * 3 * 25)
    assert(t.read.filter(col("row_id").isNull).count() === 0L,
      "every row allocated")
    val ids = t.read.select("row_id").as[Long].collect()
    assert(ids.distinct.length === ids.length,
      "auto-compaction races must never duplicate or reuse an id")
    // a lost final compaction race is swallowed by contract, so the
    // bound carries slack; unbounded growth would blow well past it
    assert(t.dataFileCount <= 12,
      s"auto-compaction must keep files bounded under the race, " +
        s"got ${t.dataFileCount}")
  }
}
