package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable
import graft.ext.Replication

/** CDC-driven follower tables: sync must converge the follower to the
  * leader's exact contents, incrementally, idempotently, and across a
  * vacuumed horizon. */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", IntegerType)))

  private def tbl(tag: String, buckets: Int): TxTable =
    new TxTable(spark, tmpDir(tag) + "/t", schema, Seq("k"), numBuckets = buckets)

  private def contents(t: TxTable) =
    t.read.as[(String, Int)].collect().toSet

  test("sync converges a differently-bucketed follower, incrementally") {
    val leader = tbl("repl-l", 4)
    val follower = tbl("repl-f", 2) // row-level replication: layout may differ
    leader.append((1 to 50).map(i => (s"k$i", i)).toDF("k", "v"))
    assert(Replication.sync(leader, follower) >= 1)
    assert(contents(follower) === contents(leader))

    val followerV = follower.currentVersion
    leader.upsert(Seq(("k5", 500), ("new", 0)).toDF("k", "v"))
    leader.deleteWhere(col("v") > 40 && col("v") < 100)
    assert(Replication.sync(leader, follower) === 2)
    assert(contents(follower) === contents(leader))
    // the whole incremental sync landed as ONE follower commit
    assert(follower.currentVersion === followerV + 1)

    // idempotent: nothing new
    assert(Replication.sync(leader, follower) === 0)
    assert(Replication.appliedVersion(follower) === leader.currentVersion)
  }

  test("concurrent syncs never double-apply or resurrect (watermark CAS)") {
    val leader = tbl("repl-c", 2)
    val follower = tbl("repl-cf", 2)
    leader.append((1 to 30).map(i => (s"k$i", i)).toDF("k", "v"))
    Replication.sync(leader, follower)
    leader.deleteWhere(col("v") > 25)
    leader.upsert(Seq(("k1", -1)).toDF("k", "v"))
    // two racers catch up the same commits: exactly one applies them
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map(_ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = Replication.sync(leader, follower)
        }))
      val applied = futs.map(_.get())
      assert(applied.count(_ > 0) === 1, s"applied=$applied")
    } finally pool.shutdown()
    assert(contents(follower) === contents(leader))
    assert(follower.read.filter(col("v") > 25).count() === 0,
      "deleted keys must not resurrect")
    assert(Replication.appliedVersion(follower) === leader.currentVersion)
  }

  test("a key deleted and re-inserted across the sync window upserts (post-image wins)") {
    val leader = tbl("repl-d", 2)
    val follower = tbl("repl-e", 2)
    leader.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    Replication.sync(leader, follower)
    leader.deleteWhere(col("k") === "a")
    leader.append(Seq(("a", 99)).toDF("k", "v")) // net: update a → 99
    leader.deleteWhere(col("k") === "b")          // net: delete b
    Replication.sync(leader, follower)
    assert(contents(follower) === Set(("a", 99)))
    assert(contents(follower) === contents(leader))
  }

  test("vacuumed leader horizon falls back to a one-commit snapshot") {
    val leader = tbl("repl-v", 2)
    val follower = tbl("repl-w", 2)
    leader.append(Seq(("a", 1)).toDF("k", "v"))
    Replication.sync(leader, follower)
    leader.upsert(Seq(("a", 2), ("b", 3)).toDF("k", "v"))
    leader.compact()
    leader.vacuum(keepVersions = 1, minAgeMs = 0L) // follower's watermark gone
    assert(Replication.sync(leader, follower) >= 1)
    assert(contents(follower) === contents(leader))
    assert(Replication.appliedVersion(follower) === leader.currentVersion)
  }

  test("applyChanges merges upserts and deletes in one commit; upsert wins ties") {
    val t = tbl("repl-m", 2)
    t.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))
    val v = t.currentVersion
    t.applyChanges(
      upserts = Seq(("b", 20), ("d", 4)).toDF("k", "v"),
      deleteKeys = Seq("a", "b").toDF("k")) // b in both → upsert wins
    assert(t.currentVersion === v + 1)
    assert(contents(t) === Set(("b", 20), ("c", 3), ("d", 4)))
  }
}
