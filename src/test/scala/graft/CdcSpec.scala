package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Row-level CDC derived from the TxTable manifest log: `changes` (net
  * version diff) and `changeFeed` (per-commit, replayable). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def tkv(n: Int = 4): TxTable =
    new TxTable(spark, tmpDir("cdc") + "/kv", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType),
      StructField("note", StringType))),
      Seq("k"), numBuckets = n)

  private def rows(df: DataFrame): Set[(String, String, Int, String)] =
    df.select("_change_type", "k", "v", "note")
      .as[(String, String, Int, String)].collect().toSet

  test("appends surface as inserts; untouched-bucket rows never appear") {
    val t = tkv()
    t.append(Seq(("a", 1, "x"), ("b", 2, "y")).toDF("k", "v", "note")) // v1
    assert(rows(t.changes(0, 1)) ===
      Set(("insert", "a", 1, "x"), ("insert", "b", 2, "y")))
    // second append: only the new rows, not re-linked history
    t.append(Seq(("c", 3, "z")).toDF("k", "v", "note")) // v2
    assert(rows(t.changes(1, 2)) === Set(("insert", "c", 3, "z")))
  }

  test("upsert yields update pre/post images for changed keys, inserts for new, nothing for ride-alongs") {
    val t = tkv(2) // 2 buckets → co-bucketed ride-along rows guaranteed
    t.append((1 to 20).map(i => (s"k$i", i, "orig")).toDF("k", "v", "note")) // v1
    t.upsert(Seq(("k5", 500, "upd"), ("new", 0, "ins")).toDF("k", "v", "note")) // v2
    val ch = rows(t.changes(1, 2))
    assert(ch === Set(
      ("update_preimage", "k5", 5, "orig"),
      ("update_postimage", "k5", 500, "upd"),
      ("insert", "new", 0, "ins")))
  }

  test("deletes carry the preimage; truncate deletes everything") {
    val t = tkv(2)
    t.append(Seq(("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z"))
      .toDF("k", "v", "note")) // v1
    t.deleteWhere(col("v") >= 2) // v2
    assert(rows(t.changes(1, 2)) ===
      Set(("delete", "b", 2, "y"), ("delete", "c", 3, "z")))
    t.truncate() // v3
    assert(rows(t.changes(2, 3)) === Set(("delete", "a", 1, "x")))
  }

  test("net diff across a range collapses intermediate states") {
    val t = tkv(2)
    t.append(Seq(("a", 1, "x"), ("b", 2, "y")).toDF("k", "v", "note")) // v1
    t.upsert(Seq(("a", 10, "i1"), ("tmp", 7, "t")).toDF("k", "v", "note")) // v2
    t.upsert(Seq(("a", 100, "i2")).toDF("k", "v", "note")) // v3
    t.deleteWhere(col("k") === "tmp") // v4
    val net = rows(t.changes(1, 4))
    // tmp was inserted then deleted → absent from the NET diff;
    // a's two updates collapse into one pre(v1)/post(v4) pair
    assert(net === Set(
      ("update_preimage", "a", 1, "x"),
      ("update_postimage", "a", 100, "i2")))
    assert(t.changes(1, 1).count() === 0) // self-diff is empty
  }

  test("changeFeed replays to the exact final table state") {
    val t = tkv(3)
    t.append((1 to 30).map(i => (s"k$i", i, "a")).toDF("k", "v", "note"))
    t.upsert((1 to 10).map(i => (s"k$i", -i, "b")).toDF("k", "v", "note"))
    t.deleteWhere(col("v") > 25)
    t.insertIfAbsent(Seq(("k2", 999, "ignored"), ("kx", 0, "c"))
      .toDF("k", "v", "note"))
    val feed = t.changeFeed(0L)
      .select("_commit_version", "_change_type", "k", "v", "note")
      .as[(Long, String, String, Int, String)].collect()
      .sortBy(_._1)
    // replay: fold the per-commit feed into a key→row map
    val state = scala.collection.mutable.Map.empty[String, (Int, String)]
    feed.foreach {
      case (_, "insert", k, v, n)            => state(k) = (v, n)
      case (_, "update_postimage", k, v, n)  => state(k) = (v, n)
      case (_, "update_preimage", _, _, _)   => ()
      case (_, "delete", k, _, _)            => state.remove(k)
      case other => fail(s"unexpected change row: $other")
    }
    val want = t.read.select("k", "v", "note").as[(String, Int, String)]
      .collect().map { case (k, v, n) => k -> (v, n) }.toMap
    assert(state.toMap === want, "replayed feed must equal the table")
    // feed versions cover every commit after the floor
    assert(feed.map(_._1).distinct.sorted.toSeq ===
      t.versions.filter(_ > 0).sorted)
  }

  test("changes works on wide no-data-col edge (keys only)") {
    val t = new TxTable(spark, tmpDir("cdck") + "/t", StructType(Seq(
      StructField("k", StringType))), Seq("k"), numBuckets = 1)
    t.append(Seq("a", "b").toDF("k"))
    t.upsert(Seq("a", "c").toDF("k")) // a re-upserted identical → no change
    val ch = t.changes(1, 2).select("_change_type", "k")
      .as[(String, String)].collect().toSet
    assert(ch === Set(("insert", "c")))
  }
}
