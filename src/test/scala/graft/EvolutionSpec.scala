package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Schema evolution on the transactional manifest protocol: widening
  * commits record their schema in the manifest header; existing data
  * files are never rewritten and read the new columns as null. */
class EvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tkv(n: Int = 2): TxTable =
    new TxTable(spark, tmpDir("evo") + "/kv", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = n)

  test("appendEvolving widens the schema; old files read new columns as null") {
    val t = tkv()
    t.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    val filesBefore = t.dataFileCount
    t.appendEvolving(Seq(("c", 3, "fresh")).toDF("k", "v", "note"))
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "v", "note"))
    val got = t.read.orderBy("k").as[(String, Int, Option[String])].collect().toSeq
    assert(got === Seq(("a", 1, None), ("b", 2, None), ("c", 3, Some("fresh"))))
    // the old files were re-linked, not rewritten
    assert(t.dataFileCount > filesBefore)
    assert(t.read.count() === 3)
  }

  test("evolving writers may omit columns in either direction (null-filled)") {
    val t = tkv()
    t.appendEvolving(Seq(("a", 1, "x")).toDF("k", "v", "note"))
    // an OLD-shape producer appends without the evolved column
    t.appendEvolving(Seq(("b", 2)).toDF("k", "v"))
    assert(t.read.orderBy("k").as[(String, Int, Option[String])].collect().toSeq
      === Seq(("a", 1, Some("x")), ("b", 2, None)))
  }

  test("upsertEvolving merges with the widened schema; plain upsert then preserves it") {
    val t = tkv()
    t.append((1 to 10).map(i => (s"k$i", i)).toDF("k", "v"))
    t.upsertEvolving(Seq(("k3", 300, "tagged")).toDF("k", "v", "note"))
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "v", "note"))
    val m = t.read.as[(String, Int, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("k3") === ((300, Some("tagged"))) && m("k5") === ((5, None)))
    // NON-evolving upsert on the evolved table keeps the new column
    t.upsert(Seq(("k3", 301, "kept"), ("k4", 4, null)).toDF("k", "v", "note"))
    val m2 = t.read.as[(String, Int, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m2("k3") === ((301, Some("kept"))))
    assert(t.count() === 10)
  }

  test("time travel reads each version under ITS schema") {
    val t = tkv()
    t.append(Seq(("a", 1)).toDF("k", "v"))          // v1: (k, v)
    t.appendEvolving(Seq(("b", 2, "n")).toDF("k", "v", "note")) // v2: +note
    assert(t.readVersion(1).schema.fieldNames.toSeq === Seq("k", "v"))
    assert(t.readVersion(2).schema.fieldNames.toSeq === Seq("k", "v", "note"))
    assert(t.readVersion(1).count() === 1)
  }

  test("type changes are rejected loudly") {
    val t = tkv()
    t.append(Seq(("a", 1)).toDF("k", "v"))
    val bad = Seq(("b", "not-an-int")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] { t.appendEvolving(bad) }
    assert(e.getMessage.contains("cannot change column 'v'"))
  }

  test("zone maps and CDC work across an evolution commit") {
    val t = tkv()
    t.append((1 to 50).map(i => (s"k$i", i)).toDF("k", "v")) // v1
    t.appendEvolving((51 to 60).map(i => (s"k$i", i, s"s${i % 3}"))
      .toDF("k", "v", "note")) // v2
    // skipping on the evolved column: old files have no 'note' stats →
    // conservatively kept; new files prune exactly
    assert(t.skipReport(col("note") === "zzz").scanned <= t.dataFileCount)
    assert(t.scanWhere(col("note") === "s1").count() ===
      t.read.filter(col("note") === "s1").count())
    // value predicate still prunes to the matching batch across schemas
    assert(t.skipReport(col("v") >= 55).scanned <= 2)
    // CDC across the evolution commit carries the new column
    val ch = t.changes(1, 2).select("_change_type", "k", "note")
      .as[(String, String, Option[String])].collect().toSet
    assert(ch === (51 to 60).map(i =>
      ("insert", s"k$i", Some(s"s${i % 3}"))).toSet)
    // deleting by the evolved column only rewrites matching buckets
    t.deleteWhere(col("note") === "s0")
    assert(t.read.filter(col("note").isNotNull).count() === 6) // s1×3 + s2×3
    assert(t.count() === 56) // 60 − the four i%3==0 keys in 51..60
  }

  test("compact preserves the evolved schema and back-fills nulls physically") {
    val t = tkv()
    t.append(Seq(("a", 1)).toDF("k", "v"))
    t.appendEvolving(Seq(("b", 2, "x")).toDF("k", "v", "note"))
    t.compact()
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "v", "note"))
    assert(t.read.orderBy("k").as[(String, Int, Option[String])].collect().toSeq
      === Seq(("a", 1, None), ("b", 2, Some("x"))))
    // post-compaction every live file physically contains the column →
    // IsNotNull skipping is exact again
    val rep = t.skipReport(col("note").isNotNull)
    assert(rep.scanned < rep.total || rep.total === 1)
  }

  test("dropColumns: metadata-only narrowing; time travel keeps the column") {
    val t = tkv()
    t.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))       // v0 create, v1 data
    t.appendEvolving(Seq(("c", 3, "n")).toDF("k", "v", "note")) // v2
    val filesBefore = t.dataFileCount
    t.dropColumns(Seq("NOTE"))                             // v3, case-insensitive
    assert(t.currentSchema.fieldNames.toSeq === Seq("k", "v"))
    // no data file rewritten: same files, narrower declared schema
    assert(t.dataFileCount === filesBefore)
    assert(t.read.columns.toSeq === Seq("k", "v"))
    assert(t.read.count() === 3)
    // each version reads under ITS schema: pre-drop still has note
    assert(t.readVersion(2L).columns.contains("note"))
    assert(t.droppedColumns === Set("note"))
    // appends after the drop conform to the narrowed schema
    t.append(Seq(("d", 4)).toDF("k", "v"))
    assert(t.read.count() === 4)
  }

  test("dropColumns refusals: keys, unknown, every column, CHECK references") {
    val t = tkv()
    t.append(Seq(("a", 1)).toDF("k", "v"))
    val key = intercept[IllegalArgumentException] {
      t.dropColumns(Seq("k"))
    }
    assert(key.getMessage.contains("key column"))
    val nope = intercept[IllegalArgumentException] {
      t.dropColumns(Seq("ghost"))
    }
    assert(nope.getMessage.contains("ghost"))
    // a CHECK referencing the column blocks the drop with the remedy
    val t2 = tkv()
    t2.append(Seq(("a", 1)).toDF("k", "v"))
    t2.addCheckConstraint("v_pos", "v >= 0")
    val chk = intercept[IllegalArgumentException] {
      t2.dropColumns(Seq("v"))
    }
    assert(chk.getMessage.contains("dropCheckConstraint"))
  }

  test("resurrection guard: a dropped name can never be re-added") {
    val t = tkv()
    t.append(Seq(("a", 1)).toDF("k", "v"))
    t.appendEvolving(Seq(("b", 2, 9L)).toDF("k", "v", "score"))
    t.dropColumns(Seq("score"))
    // addColumns refuses (including different case / different type)
    val add = intercept[IllegalArgumentException] {
      t.addColumns(StructType(Seq(StructField("Score", StringType))))
    }
    assert(add.getMessage.contains("resurrect"))
    // the implicit evolving-writer path refuses too
    val evo = intercept[IllegalArgumentException] {
      t.appendEvolving(Seq(("c", 3, 7L)).toDF("k", "v", "score"))
    }
    assert(evo.getMessage.contains("resurrect"))
    // and the stale physical values really are the hazard the guard
    // names: a pre-drop data file still holds score=9 on disk
    val paths = t.providerSnapshot(t.currentVersion, None)._2.map(_._1)
    val raw = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    assert(raw.columns.contains("score"))

    // the guard is not retirable: dropMeta refuses the governance key
    val dm = intercept[IllegalArgumentException] {
      t.dropMeta(Seq("dropped_cols"))
    }
    assert(dm.getMessage.contains("reserved"))
  }

  test("dropColumns refuses descriptor-less opens (placeholder keys)") {
    val t = tkv()
    t.append(Seq(("a", 1)).toDF("k", "v"))
    // simulate a legacy table: no _table.json write descriptor
    assert(new java.io.File(t.dir, "_table.json").delete())
    val ro = TxTable.openReadOnly(spark, t.dir)
    val e = intercept[IllegalArgumentException] {
      ro.dropColumns(Seq("v"))
    }
    assert(e.getMessage.contains("_table.json"))
  }
}
