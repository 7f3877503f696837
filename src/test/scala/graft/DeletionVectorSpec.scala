package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Merge-on-read deletes (deletion vectors): `deleteWhereLight` writes
  * a tiny (file, row position) tombstone sidecar and re-links every
  * data file; reads mask tombstoned rows. Every claim is paired with a
  * byte-stability or parity assertion against the copy-on-write path.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tkv(n: Int = 4): TxTable =
    new TxTable(spark, tmpDir("dv") + "/kv", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = n)

  private def dataFiles(t: TxTable): Map[String, Long] =
    new java.io.File(t.dir + "/data").listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => f.getName -> f.lastModified()).toMap

  test("a light delete removes rows from every read path without touching data files") {
    val t = tkv()
    t.append((1 to 200).map(i => (s"k$i", i)).toDF("k", "v"))
    val before = dataFiles(t)
    t.deleteWhereLight(col("v") > 150)
    // data files byte-identical and re-linked, only a sidecar appeared
    assert(dataFiles(t) === before, "light delete must not rewrite data files")
    assert(new java.io.File(t.dir + "/_dv").listFiles()
      .count(_.getName.endsWith(".parquet")) === 1)
    // every read path masks the tombstoned rows
    assert(t.read.count() === 150)
    assert(t.count() === 150) // metadata-only count stays exact
    assert(t.read.agg(max("v")).as[Int].head() === 150)
    assert(t.scanWhere(col("v") > 100).count() === 50)
    assert(t.lookup(Seq("k151")).count() === 0)
    assert(t.lookup(Seq("k150")).count() === 1)
    // time travel: the pre-delete version still shows all rows
    assert(t.readVersion(t.currentVersion - 1).count() === 200)
  }

  test("light deletes accumulate; re-deleting tombstoned rows is a no-op") {
    val t = tkv(2)
    t.append((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"))
    t.deleteWhereLight(col("v") > 90)   // 10 rows
    t.deleteWhereLight(col("v") > 80)   // 10 more, overlap recomputed live
    assert(t.read.count() === 80)
    assert(t.count() === 80)
    val v = t.currentVersion
    t.deleteWhereLight(col("v") > 80)   // all already tombstoned: no-op
    assert(t.currentVersion === v, "empty delta must not commit")
    assert(t.count() === 80)
  }

  test("light delete equals copy-on-write delete row-for-row") {
    val rows = (1 to 300).map(i => (s"k$i", i))
    val a = tkv(); val b = tkv()
    a.append(rows.toDF("k", "v")); b.append(rows.toDF("k", "v"))
    val pred = col("v") % 7 === 0
    a.deleteWhere(pred)
    b.deleteWhereLight(pred)
    assert(a.read.orderBy("v").as[(String, Int)].collect().toSeq ===
      b.read.orderBy("v").as[(String, Int)].collect().toSeq)
    assert(a.count() === b.count())
  }

  test("upsert and insertIfAbsent see through DVs: deleted keys resurrect cleanly") {
    val t = tkv(2)
    t.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))
    t.deleteWhereLight(col("k") === "b")
    assert(t.read.count() === 2)
    // insertIfAbsent: the tombstoned key counts as ABSENT
    t.insertIfAbsent(Seq(("b", 20), ("a", 99)).toDF("k", "v"))
    assert(t.read.orderBy("k").as[(String, Int)].collect().toSeq ===
      Seq(("a", 1), ("b", 20), ("c", 3)))
    // upsert over a DV'd bucket rewrites it; the dead row must not resurrect
    t.deleteWhereLight(col("k") === "c")
    t.upsert(Seq(("a", 100)).toDF("k", "v"))
    assert(t.read.orderBy("k").as[(String, Int)].collect().toSeq
      .filterNot(_._1 == "b") === Seq(("a", 100)))
  }

  test("CDC: a deletion-vector commit emits exactly the tombstoned rows as deletes") {
    val t = tkv(2)
    t.append(Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)).toDF("k", "v"))
    val v1 = t.currentVersion
    t.deleteWhereLight(col("v") >= 3)
    val ch = t.changes(v1, t.currentVersion)
      .select("_change_type", "k", "v").as[(String, String, Int)]
      .collect().toSet
    assert(ch === Set(("delete", "c", 3), ("delete", "d", 4)))
  }

  test("materializeDeletes folds DVs into data; results unchanged; sidecar vacuumable") {
    val t = tkv(2)
    t.append((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"))
    t.deleteWhereLight(col("v") <= 10)
    val expect = t.read.orderBy("v").as[(String, Int)].collect().toSeq
    t.materializeDeletes()
    assert(t.read.orderBy("v").as[(String, Int)].collect().toSeq === expect)
    assert(t.count() === 90)
    // no manifest entry references a DV anymore; vacuum sweeps the sidecar
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    val dvFiles = Option(new java.io.File(t.dir + "/_dv").listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    assert(dvFiles === 0, "orphaned DV sidecar must be vacuumed")
    // data reads stay intact post-vacuum
    assert(t.read.count() === 90)
  }

  test("materializeDeletes(minDeadFraction) rewrites only heavily-masked buckets") {
    val t2 = tkv(2)
    t2.append((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"))
    t2.deleteWhereLight(col("v") <= 2) // tiny dead fraction overall
    val filesBefore = dataFiles(t2)
    t2.materializeDeletes(minDeadFraction = 0.5) // nothing is >50% dead
    assert(dataFiles(t2) === filesBefore, "below threshold: no rewrite")
    assert(t2.read.count() === 98)
    t2.materializeDeletes() // unconditional: folds everything
    assert(t2.read.count() === 98)
    assert(t2.count() === 98)
    val m = new java.io.File(t2.dir + "/_manifests").listFiles()
      .filter(_.getName.endsWith(".tsv")).maxBy(_.getName)
    assert(!scala.io.Source.fromFile(m).getLines()
      .filterNot(_.startsWith("#")).exists(_.split("\t", 4).length == 4),
      "no DV refs may remain after unconditional materialization")
  }

  test("vacuum keeps DV sidecars referenced by retained versions") {
    val t = tkv(2)
    t.append((1 to 50).map(i => (s"k$i", i)).toDF("k", "v"))
    t.deleteWhereLight(col("v") > 40)
    t.append(Seq(("x", 1000)).toDF("k", "v")) // newer commit re-links the DV
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.read.count() === 41)
    assert(t.count() === 41)
    assert(t.scanWhere(col("v") > 30).count() === 11) // 31..40 + x
  }

  test("upsertLight equals upsert row-for-row without rewriting existing files") {
    val rows = (1 to 200).map(i => (s"k$i", i))
    val a = tkv(); val b = tkv()
    a.append(rows.toDF("k", "v")); b.append(rows.toDF("k", "v"))
    val bBefore = dataFiles(b)
    val ups = Seq(("k5", -5), ("k100", -100), ("new1", 1000)).toDF("k", "v")
    a.upsert(ups)
    b.upsertLight(ups)
    assert(a.read.orderBy("v").as[(String, Int)].collect().toSeq ===
      b.read.orderBy("v").as[(String, Int)].collect().toSeq)
    assert(a.count() === b.count() && b.count() === 201)
    // light path: every pre-existing data file byte-identical, one new
    // small file per touched bucket appeared
    val bAfter = dataFiles(b)
    assert(bBefore.forall { case (n, ts) => bAfter.get(n).contains(ts) },
      "upsertLight must not rewrite existing data files")
    assert(bAfter.size > bBefore.size)
    // idempotence: same upsert again — same result
    b.upsertLight(ups)
    assert(b.read.orderBy("v").as[(String, Int)].collect().toSeq ===
      a.read.orderBy("v").as[(String, Int)].collect().toSeq)
  }

  test("upsertLight CDC: update pre/post images and inserts, no ride-alongs") {
    val t = tkv(2)
    t.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))
    val v1 = t.currentVersion
    t.upsertLight(Seq(("b", 20), ("d", 4)).toDF("k", "v"))
    val ch = t.changes(v1, t.currentVersion)
      .select("_change_type", "k", "v").as[(String, String, Int)]
      .collect().toSet
    assert(ch === Set(
      ("update_preimage", "b", 2), ("update_postimage", "b", 20),
      ("insert", "d", 4)))
  }

  test("restore rolls back to a prior version as a new commit") {
    val t = tkv(2)
    t.append((1 to 50).map(i => (s"k$i", i)).toDF("k", "v"))
    val good = t.currentVersion
    t.deleteWhere(col("v") > 10)
    t.upsert(Seq(("k1", -1)).toDF("k", "v"))
    assert(t.read.count() === 10)
    t.restore(good)
    assert(t.read.count() === 50)
    assert(t.read.agg(min("v"), max("v")).as[(Int, Int)].head() === ((1, 50)))
    assert(t.currentVersion > good, "restore must move history forward")
    assert(t.commitMeta(t.currentVersion) === Map("restored_from" -> good.toString))
    // the bad states remain time-travelable until vacuum
    assert(t.readVersion(good + 1).count() === 10)
    // vacuum keeps the re-referenced files
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.read.count() === 50)
  }

  test("shallow clone: zero-copy, snapshot-isolated, writable, materializable") {
    val t = tkv(2)
    t.append((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"))
    t.deleteWhereLight(col("v") > 90) // clone must inherit the DV too
    val cloneDir = tmpDir("dvclone") + "/c"
    val c = t.shallowCloneTo(cloneDir)
    // zero copy: the clone owns no data files at all
    assert(!new java.io.File(cloneDir + "/data").exists() ||
      new java.io.File(cloneDir + "/data").listFiles().isEmpty)
    assert(c.read.orderBy("v").as[(String, Int)].collect().toSeq ===
      t.read.orderBy("v").as[(String, Int)].collect().toSeq)
    assert(c.count() === 90)
    // clone writes never touch the source
    val srcFiles = dataFiles(t)
    c.upsert(Seq(("k1", -1)).toDF("k", "v"))
    c.deleteWhereLight(col("k") === "k2")
    assert(dataFiles(t) === srcFiles)
    assert(t.read.filter(col("k").isin("k1", "k2")).count() === 2)
    assert(c.read.filter(col("k") === "k1").as[(String, Int)].head()._2 === -1)
    assert(c.read.filter(col("k") === "k2").count() === 0)
    // source writes after the clone are invisible to it (pinned list)
    t.append(Seq(("zz", 999)).toDF("k", "v"))
    assert(c.read.filter(col("k") === "zz").count() === 0)
    // compact() cuts the foreign dependency: all refs become local
    c.compact()
    val manifest = new java.io.File(cloneDir + "/_manifests").listFiles()
      .filter(_.getName.endsWith(".tsv")).maxBy(_.getName)
    val body = scala.io.Source.fromFile(manifest).getLines()
      .filterNot(_.startsWith("#")).mkString("\n")
    assert(!body.contains(":/") && !body.contains(t.dir),
      s"materialized clone must not reference the source:\n$body")
    assert(c.read.count() === 89)
  }

  test("deletes and zone maps compose: the position scan prunes to candidate files") {
    val t = tkv(1)
    t.append((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"))      // v ∈ [1,100]
    t.append((101 to 200).map(i => (s"k$i", i)).toDF("k", "v"))    // v ∈ [101,200]
    t.deleteWhereLight(col("v") === 150)
    assert(t.read.count() === 199)
    // only the second file carries a DV: the clean one reads direct
    val m = new java.io.File(t.dir + "/_manifests").listFiles()
      .filter(_.getName.endsWith(".tsv")).map(_.getName).max
    val lines = scala.io.Source.fromFile(
      new java.io.File(t.dir + "/_manifests/" + m)).getLines()
      .filterNot(_.startsWith("#")).toSeq
    assert(lines.count(_.split("\t", 4).length == 4) === 1,
      s"exactly one entry should carry a DV:\n${lines.mkString("\n")}")
  }
}
