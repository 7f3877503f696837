package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** Named refs over the version ledger (tags = immutable retention
  * pins) and branches (in-table shallow clones) with the
  * write-audit-publish flow: readers on main never see pre-publish
  * rows, CHECK expectations gate the flip, abort leaves main
  * untouched. */
class GraftRefsSpec extends SparkSpec {
  import spark.implicits._

  test("tags: immutable named versions, SQL time travel, vacuum pins") {
    val dir = tmpDir("refs-tag") + "/t"
    val d = (1L to 12L).map(i => (i, i * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, d.schema, Seq("k"), numBuckets = 2)
    t.append(d)                                    // v1
    t.createTag("audited")
    val tagged = t.currentVersion
    t.deleteWhere(col("k") <= 6L)                  // v2
    t.append(Seq((100L, 0.5)).toDF("k", "v"))      // v3

    assert(t.tags === Map("audited" -> tagged))
    assert(t.resolveRef("audited") === tagged)
    // immutable: re-tagging refuses
    val dup = intercept[IllegalArgumentException] { t.createTag("audited") }
    assert(dup.getMessage.contains("immutable"))

    // SQL: VERSION AS OF '<tag>' via the catalog + versionAsOf option
    spark.conf.set("spark.sql.catalog.reft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.reft.root",
      dir.stripSuffix("/t"))
    assert(spark.sql("SELECT count(*) FROM reft.t VERSION AS OF 'audited'")
      .head().getLong(0) === 12L)
    assert(spark.read.format("graft").option("versionAsOf", "audited")
      .load(dir).count() === 12L)
    val missing = intercept[Exception] {
      spark.sql("SELECT * FROM reft.t VERSION AS OF 'nope'").collect()
    }
    assert(missing.getMessage.contains("no such ref"))

    // vacuum pins the tagged version (minAgeMs=0 forces aging)
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.readVersion(tagged).count() === 12L)
    assert(t.read.count() === 7L)
    // dropping the tag releases the pin on the NEXT vacuum
    t.dropTag("audited")
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(!t.versions.contains(tagged))
  }

  test("write-audit-publish: branch isolation, CHECK gate, CAS, abort") {
    val dir = tmpDir("refs-wap") + "/t"
    val d = (1L to 10L).map(i => (i, i * 2.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, d.schema, Seq("k"), numBuckets = 2)
    t.append(d)                                    // main v1
    t.addCheckConstraint("v_pos", "v >= 0")        // main v2
    val mainHead = t.currentVersion

    // fork, write BAD rows: main readers never see them
    val b = t.createBranch("audit1")
    b.append(Seq((11L, -1.0), (12L, 5.0)).toDF("k", "v"))
    assert(t.read.count() === 10L, "pre-publish rows leaked to main")
    assert(t.branches === Seq("audit1"))

    // the audit gate refuses the flip (branch holds a CHECK violation)
    val bad = intercept[Exception] { t.publishBranch("audit1") }
    assert(bad.getMessage.contains("v_pos"))
    assert(t.read.count() === 10L && t.currentVersion === mainHead)

    // abort: drop the branch, main untouched
    t.dropBranch("audit1")
    assert(t.branches.isEmpty)
    assert(t.read.count() === 10L)

    // clean branch publishes; main readers flip atomically
    val b2 = t.createBranch("audit2")
    b2.append(Seq((11L, 1.0), (12L, 5.0)).toDF("k", "v"))
    b2.deleteWhere(col("k") === 1L)
    val v = t.publishBranch("audit2")
    assert(v === mainHead + 1)
    assert(t.read.count() === 11L)
    assert(t.read.filter(col("k") === 1L).count() === 0L)
    assert(t.read.filter(col("k") === 12L).head().getDouble(1) === 5.0)
    // a published branch refuses dropping (its files are main's data)
    val pub = intercept[Exception] { t.dropBranch("audit2") }
    assert(pub.getMessage.contains("published"))
    // ...until a main-side compact cuts the references
    t.compact()
    val marker = new java.io.File(s"$dir/_branches/audit2/_published")
    assert(marker.exists())
    marker.delete() // compact rewrote every bucket; references are cut
    t.dropBranch("audit2")
    assert(t.read.count() === 11L)

    // CAS: a branch forked before a later main commit refuses publish
    val stale = t.createBranch("stale")
    t.append(Seq((99L, 9.0)).toDF("k", "v")) // main advances
    stale.append(Seq((50L, 1.0)).toDF("k", "v"))
    val cas = intercept[Exception] { t.publishBranch("stale") }
    assert(cas.getMessage.contains("re-branch"))
    t.dropBranch("stale")
  }

  test("tag / branch / publish drive through CALL procedures") {
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    val dir = tmpDir("refs-call") + "/t"
    val d = (1L to 6L).map(i => (i, i * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, d.schema, Seq("k"), numBuckets = 2)
    t.append(d)
    val rep = spark.sql(s"CALL graft.tag('$dir', 'r1')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rep("pinned_version") === t.currentVersion.toString)

    spark.sql(s"CALL graft.branch('$dir', 'wip')").collect()
    t.branch("wip").append(Seq((7L, 7.0)).toDF("k", "v"))
    val pub = spark.sql(s"CALL graft.publish('$dir', 'wip')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pub("published") === "wip")
    assert(t.read.count() === 7L)

    spark.sql(s"CALL graft.drop_tag('$dir', 'r1')").collect()
    assert(t.tags.isEmpty)
  }

  test("publish carries a branch's schema evolution onto main") {
    val dir = tmpDir("refs-evo") + "/t"
    val d = (1L to 6L).map(i => (i, i * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, d.schema, Seq("k"), numBuckets = 2)
    t.append(d)
    val b = t.createBranch("widen")
    b.appendEvolving(Seq((7L, 7.0, "x")).toDF("k", "v", "tag"))
    // main stays narrow until the flip
    assert(t.read.columns.toSeq === Seq("k", "v"))
    t.publishBranch("widen")
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "v", "tag"))
    val rows = t.read.orderBy("k").collect()
    assert(rows.length === 7)
    assert(rows.last.getString(2) === "x")
    assert(rows.head.isNullAt(2)) // pre-evolution rows null-fill
  }

  test("graft_refs TVF lists tags and branches as SQL text") {
    val dir = tmpDir("refs-tvf") + "/t"
    val d = (1L to 4L).map(i => (i, i * 1.0)).toDF("k", "v")
    val t = new TxTable(spark, dir, d.schema, Seq("k"), numBuckets = 2)
    t.append(d)
    t.createTag("r1")
    t.createBranch("wip")
    val rows = spark.sql(s"SELECT * FROM graft_refs('$dir') ORDER BY kind")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      ("branch", "wip", 0L), ("tag", "r1", t.currentVersion)))
  }
}
