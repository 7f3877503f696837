package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Table, Warehouse}

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def kv(): Table = {
    val wh = new Warehouse(spark, tmpDir("wh"))
    wh.table("kv", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))), Seq("k"))
  }

  test("createIfAbsent yields empty readable table") {
    val t = kv(); t.createIfAbsent()
    assert(t.read.count() === 0)
    assert(t.read.schema.fieldNames.toSeq === Seq("k", "v"))
  }

  test("append then read") {
    val t = kv()
    t.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    assert(t.read.count() === 2)
  }

  test("insertIfAbsent skips existing keys (ON CONFLICT DO NOTHING)") {
    val t = kv()
    t.append(Seq(("a", 1)).toDF("k", "v"))
    t.insertIfAbsent(Seq(("a", 99), ("b", 2)).toDF("k", "v"))
    val got = t.read.orderBy("k").as[(String, Int)].collect().toSeq
    assert(got === Seq(("a", 1), ("b", 2)))
  }

  test("upsert replaces by key (ON CONFLICT DO UPDATE) and is idempotent") {
    val t = kv()
    t.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    val updates = Seq(("b", 20), ("c", 30)).toDF("k", "v")
    t.upsert(updates)
    t.upsert(updates) // idempotence: twice ≡ once
    val got = t.read.orderBy("k").as[(String, Int)].collect().toSeq
    assert(got === Seq(("a", 1), ("b", 20), ("c", 30)))
  }

  test("deleteWhere removes matching rows, keeps null-predicate rows") {
    val t = kv()
    t.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))
    t.deleteWhere(col("v") >= 2)
    assert(t.read.as[(String, Int)].collect().toSeq === Seq(("a", 1)))
  }

  test("truncate empties but preserves schema") {
    val t = kv()
    t.append(Seq(("a", 1)).toDF("k", "v"))
    t.truncate()
    assert(t.read.count() === 0)
    assert(t.read.schema.fieldNames.toSeq === Seq("k", "v"))
  }

  test("compact rewrites to the target file count preserving data") {
    val t = kv()
    (1 to 5).foreach(i => t.append(Seq((s"k$i", i)).toDF("k", "v")))
    val before = new java.io.File(t.dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 5)
    t.compact(1, sortCols = Seq("k"))
    val after = new java.io.File(t.dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after === 1)
    assert(t.read.orderBy("k").as[(String, Int)].collect().map(_._2).toSeq ===
      Seq(1, 2, 3, 4, 5))
  }

  test("createAll creates every domain table") {
    val wh = new Warehouse(spark, tmpDir("whall"))
    wh.createAll()
    assert(wh.domainTable("regulation_items").read.count() === 0)
    assert(wh.domainTable("links").read.count() === 0)
  }
}
