package graft

import org.apache.spark.sql.functions._

import graft.ext.Reconcile

/** Anti-entropy table diff: the bucket-fingerprint narrowing must land
  * on exactly the naive full-outer-join verdict. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = (1L to 1000L)
    .map(k => (k, s"name_$k", k * 10.0)).toDF("k", "name", "value")

  test("identical tables diff to empty") {
    val d = Reconcile.diffSummary(base, base, "k", nBuckets = 32)
    assert(d.count() === 0L)
  }

  test("summary matches the naive classification exactly") {
    // drift: drop 1..10, change 101..110, add 2001..2005
    val drifted = base.filter(col("k") > 10)
      .withColumn("value",
        when(col("k").between(101, 110), col("value") + 1.0)
          .otherwise(col("value")))
      .unionByName((2001L to 2005L)
        .map(k => (k, s"name_$k", k * 10.0)).toDF("k", "name", "value"))
    val got = Reconcile.diffSummary(base, drifted, "k", nBuckets = 32)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "only_left" -> ((10L, 1L, 10L)),
      "changed" -> ((10L, 101L, 110L)),
      "only_right" -> ((5L, 2001L, 2005L))))
  }

  test("localized drift touches few buckets; key-only drift still seen") {
    // a single changed key — the diff must find exactly it even though
    // 31 of 32 bucket fingerprints (on average) are clean and never
    // reach the row-level join
    val drifted = base.withColumn("name",
      when(col("k") === 500L, lit("renamed")).otherwise(col("name")))
    val got = Reconcile.diffSummary(base, drifted, "k", nBuckets = 32)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("changed", 1L, 500L, 500L)))
  }

  test("a null moving between columns is a detected change, not a hash skip") {
    // xxhash64 passes nulls through unchanged; without the isnull
    // discriminators, ('x', NULL) -> (NULL, 'x') hashes identically
    // and the bucket fingerprints would read clean
    val l = Seq((1L, Option("x"), Option.empty[String]),
      (2L, Option("a"), Option("b"))).toDF("k", "c1", "c2")
    val r = Seq((1L, Option.empty[String], Option("x")),
      (2L, Option("a"), Option("b"))).toDF("k", "c1", "c2")
    val got = Reconcile.diffSummary(l, r, "k", nBuckets = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("changed", 1L, 1L, 1L)))
  }

  test("mismatched schemas are refused") {
    intercept[IllegalArgumentException] {
      Reconcile.diffSummary(base, base.withColumnRenamed("name", "nm"), "k")
    }
  }

  private def driftedTwin = base.filter(col("k") > 10)
    .withColumn("value",
      when(col("k").between(101, 110), col("value") + 1.0)
        .otherwise(col("value")))
    .unionByName((2001L to 2005L)
      .map(k => (k, s"name_$k", k * 10.0)).toDF("k", "name", "value"))

  test("repair converges the drifted table to the source in one JobTxn") {
    val loc = tmpDir("rec-repair")
    val table = new graft.core.TxTable(spark, s"$loc/t", base.schema,
      Seq("k"), numBuckets = 4)
    table.append(driftedTwin)
    val stats = Reconcile.repair(base, table, s"$loc/journal", nBuckets = 32)
    assert(stats === Reconcile.RepairStats(upserted = 20L, deleted = 5L))
    assert(Reconcile.diffSummary(base, table.read.select("k", "name", "value"),
      "k", nBuckets = 32).count() === 0L)
    assert(table.read.select("k", "name", "value").as[(Long, String, Double)]
      .collect().length === 1000)
    // idempotent: repairing a converged table is a no-op (no commits)
    val v = table.currentVersion
    assert(Reconcile.repair(base, table, s"$loc/journal", nBuckets = 32)
      === Reconcile.RepairStats(0L, 0L))
    assert(table.currentVersion === v)
  }

  test("crashed repair rolls back via the JobTxn sweep, then converges") {
    val loc = tmpDir("rec-repair-crash")
    val table = new graft.core.TxTable(spark, s"$loc/t", base.schema,
      Seq("k"), numBuckets = 4)
    table.append(driftedTwin)
    val v1 = table.currentVersion
    val preRepair = table.read.select("k").as[Long].collect().toSet
    // simulate a crash mid-repair: journal published, the upsert leg
    // committed, process died before the delete leg and the rollback
    graft.core.JobTxn.writeJournal(spark,
      new org.apache.hadoop.fs.Path(s"$loc/journal", "txn-dead.tsv"),
      Seq("t" -> v1))
    table.upsertLight(base.filter(col("k") <= 10))
    assert(table.currentVersion !== v1)
    val n = graft.core.JobTxn.recover(spark, s"$loc/journal",
      Map("t" -> table))
    assert(n === 1)
    // restore() commits a NEW version whose content mirrors v1 — the
    // sweep guarantee is content, not a rewound counter
    assert(table.read.select("k").as[Long].collect().toSet === preRepair,
      "sweep must restore the pre-repair content")
    // the re-run (at-least-once job scheduling) then converges cleanly
    val stats = Reconcile.repair(base, table, s"$loc/journal", nBuckets = 32)
    assert(stats === Reconcile.RepairStats(20L, 5L))
    assert(Reconcile.diffSummary(base, table.read.select("k", "name", "value"),
      "k", nBuckets = 32).count() === 0L)
  }
}
