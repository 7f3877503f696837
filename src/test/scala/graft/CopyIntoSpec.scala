package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{CopyInto, TxTable}

/** COPY INTO — idempotent batch file ingest with an exactly-once
  * ledger (cumulative fingerprints in commit meta, CAS'd commits). */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def table(dir: String): TxTable =
    new TxTable(spark, dir, StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = 4)

  private def writeSrc(dir: String, name: String,
      rows: Seq[(String, Int)]): Unit =
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/.stage-$name") // stage then move to a stable name
  private def publish(dir: String, name: String): Unit = {
    val d = new java.io.File(s"$dir/.stage-$name")
    val part = d.listFiles().find(_.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(dir, s"$name.parquet")))
    d.listFiles().foreach(_.delete()); d.delete()
    ()
  }
  private def addFile(dir: String, name: String,
      rows: Seq[(String, Int)]): Unit = {
    writeSrc(dir, name, rows); publish(dir, name)
  }

  test("loads once; re-run is a no-op; new files load incrementally") {
    val src = tmpDir("cpsrc")
    val t = table(tmpDir("cpt") + "/t")
    addFile(src, "a", Seq(("a1", 1), ("a2", 2)))
    addFile(src, "b", Seq(("b1", 10)))
    val r1 = CopyInto.run(spark, t, src)
    assert(r1.loaded === 2 && r1.rows === 3L)
    assert(t.read.count() === 3)
    val r2 = CopyInto.run(spark, t, src)
    assert(r2.loaded === 0 && r2.skipped === 2)
    assert(t.read.count() === 3, "re-run must not duplicate")
    addFile(src, "c", Seq(("c1", 100), ("c2", 101)))
    val r3 = CopyInto.run(spark, t, src)
    assert(r3.loaded === 1 && r3.skipped === 2 && r3.rows === 2L)
    assert(t.read.count() === 5)
    // ledger survives unrelated commits (latestMeta scans back)
    t.append(Seq(("z", 0)).toDF("k", "v"))
    assert(CopyInto.run(spark, t, src).loaded === 0)
  }

  test("a file replaced in place (new bytes, same name) loads again") {
    val src = tmpDir("cpsrc2")
    val t = table(tmpDir("cpt2") + "/t")
    addFile(src, "a", Seq(("a1", 1)))
    CopyInto.run(spark, t, src)
    Thread.sleep(1100) // mtime granularity on the local FS is 1s
    new java.io.File(src, "a.parquet").delete()
    addFile(src, "a", Seq(("a1", 1), ("a9", 9)))
    val r = CopyInto.run(spark, t, src)
    assert(r.loaded === 1)
    assert(t.read.count() === 3) // append contract: both deliveries
  }

  test("csv with the table's schema imposed; glob pattern filters") {
    val src = tmpDir("cpsrc3")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(src, "x.csv"), "k,v\nc1,7\nc2,8\n")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(src, "ignore.txt"), "junk")
    val t = table(tmpDir("cpt3") + "/t")
    val r = CopyInto.run(spark, t, src, format = "csv",
      pattern = "*.csv", options = Map("header" -> "true"))
    assert(r.loaded === 1 && r.rows === 2L)
    assert(t.read.orderBy("k").as[(String, Int)].collect().toSeq ===
      Seq(("c1", 7), ("c2", 8)))
  }

  test("concurrent copies of the same source load every file exactly once") {
    val src = tmpDir("cpsrc4")
    (1 to 6).foreach(i => addFile(src, s"f$i", Seq((s"k$i", i))))
    val t = table(tmpDir("cpt4") + "/t")
    t.createIfAbsent()
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val runs = Future.sequence((1 to 3).map(_ =>
      Future(CopyInto.run(spark, t, src))))
    val results = Await.result(runs, 120.seconds)
    assert(results.map(_.loaded).sum === 6,
      s"every file exactly once, got ${results.map(_.loaded)}")
    assert(t.read.count() === 6)
  }

  test("SQL: CALL graft.copy_into") {
    val root = tmpDir("cpsql")
    val src = tmpDir("cpsrc5")
    addFile(src, "a", Seq(("s1", 1), ("s2", 2)))
    table(root + "/t").createIfAbsent()
    spark.conf.set("spark.sql.catalog.cpc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cpc.root", root)
    val out = spark.sql(s"CALL graft.copy_into('cpc.t', '$src')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("loaded_files") === "1" && out("loaded_rows") === "2")
    val again = spark.sql(s"CALL graft.copy_into('cpc.t', '$src')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(again("loaded_files") === "0" && again("skipped_files") === "1")
    assert(spark.sql("SELECT count(*) FROM cpc.t").head().getLong(0) === 2L)
    // csv with reader options through SQL ('k=v;k=v' form)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(src, "extra.csv"), "k|v\ns3|30\n")
    val csvOut = spark.sql(
      s"CALL graft.copy_into('cpc.t', '$src', 'csv', '*.csv', " +
        "'header=true;sep=|')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(csvOut("loaded_files") === "1" && csvOut("loaded_rows") === "1")
    assert(spark.sql("SELECT v FROM cpc.t WHERE k = 's3'")
      .head().getInt(0) === 30)
    // the ledger surfaces as SQL text
    val led = spark.sql(s"SELECT * FROM graft_copy_ledger('$root/t')")
    assert(led.columns.toSeq === Seq("path", "size", "mtime"))
    val row = led.head()
    assert(row.getString(0).endsWith("a.parquet") && row.getLong(1) > 0)
  }

  test("source files are read ONCE per load (no pre-count pass)") {
    val src = tmpDir("cpsrc7")
    val n = 5000
    addFile(src, "big", (1 to n).map(i => (s"k$i", i)))
    val t = table(tmpDir("cpt7") + "/t")
    t.createIfAbsent()
    // count every record any Spark task reads during the load: the
    // single staging pass reads ~n; the old pre-count() read 2n
    val recs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          recs.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = CopyInto.run(spark, t, src)
      assert(r.loaded === 1 && r.rows === n.toLong,
        "row count must come from the staged footer stats")
      // drain the listener bus (poll to stability - waitUntilEmpty
      // is private[spark])
      var last = -1L; var stable = 0
      val deadline = System.currentTimeMillis() + 30000
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        val cur = recs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      assert(recs.get() >= n.toLong,
        s"the staging read must be visible (saw ${recs.get()})")
      assert(recs.get() < 2L * n,
        s"read ${recs.get()} records for $n source rows - the source " +
          "was read more than once")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("copy into a RENAMED table binds the declared names") {
    val src = tmpDir("cpsrc6")
    val t = table(tmpDir("cpt6") + "/t")
    t.append(Seq(("a", 1)).toDF("k", "v"))
    t.renameColumn("v", "value")
    Seq(("b", 2)).toDF("k", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/stage")
    val part = new java.io.File(s"$src/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(src, "b.parquet")))
    val r = CopyInto.run(spark, t, src)
    assert(r.loaded === 1)
    assert(t.read.orderBy("k").select("k", "value")
      .as[(String, Int)].collect().toSeq === Seq(("a", 1), ("b", 2)))
  }
}
