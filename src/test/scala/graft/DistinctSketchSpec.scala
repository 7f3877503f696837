package graft

import org.apache.spark.sql.functions._

import graft.ext.DistinctSketch

/** Persisted HLL distinct-count sketches: incremental union must
  * equal the single-pass sketch EXACTLY, estimates must sit inside
  * the HLL error envelope, and new batches must become visible. */
class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read
    .parquet("/root/testdata/sf0.01/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus")

  test("union of per-batch sketches tracks the whole-corpus sketch and the truth") {
    val dir = tmpDir("sketch-inc")
    // three arbitrary batches partitioning the corpus
    Seq(0, 1, 2).foreach { b =>
      DistinctSketch.addBatch(
        orders.filter(col("o_orderkey") % 3 === b),
        Seq("o_custkey", "o_orderstatus"), dir, batchId = b)
    }
    val whole = tmpDir("sketch-whole")
    DistinctSketch.addBatch(orders, Seq("o_custkey", "o_orderstatus"),
      whole, batchId = 0)
    // NOT bit-identical (batch sketches promote sparse→dense on
    // different paths than one big sketch); both must sit inside the
    // lgK=12 envelope of the true cardinality
    val trueCust = orders.select("o_custkey").distinct().count()
    val inc = DistinctSketch.estimate(spark, dir, "o_custkey")
    val one = DistinctSketch.estimate(spark, whole, "o_custkey")
    Seq("incremental" -> inc, "single-pass" -> one).foreach { case (tag, e) =>
      assert(math.abs(e - trueCust).toDouble / trueCust < 0.08,
        s"$tag estimate $e vs true $trueCust")
    }
    // tiny cardinality: both modes exact, so union IS exact
    assert(DistinctSketch.estimate(spark, dir, "o_orderstatus") ===
      DistinctSketch.estimate(spark, whole, "o_orderstatus"))
    // determinism: re-running the same batches reproduces the estimate
    val dir2 = tmpDir("sketch-inc2")
    Seq(0, 1, 2).foreach { b =>
      DistinctSketch.addBatch(
        orders.filter(col("o_orderkey") % 3 === b),
        Seq("o_custkey", "o_orderstatus"), dir2, batchId = b)
    }
    assert(DistinctSketch.estimate(spark, dir2, "o_custkey") === inc)
  }

  test("estimates land inside the HLL error envelope of the truth") {
    val dir = tmpDir("sketch-err")
    DistinctSketch.addBatch(orders, Seq("o_custkey", "o_orderstatus"),
      dir, batchId = 0)
    val est = DistinctSketch.estimateAll(spark, dir)
    val trueCust = orders.select("o_custkey").distinct().count()
    // lgK=12 → rse ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 5x slack
    assert(math.abs(est("o_custkey") - trueCust).toDouble / trueCust < 0.08,
      s"est ${est("o_custkey")} vs true $trueCust")
    // tiny cardinalities are exact
    assert(est("o_orderstatus") ===
      orders.select("o_orderstatus").distinct().count())
  }

  test("a new batch's keys become visible incrementally") {
    val dir = tmpDir("sketch-vis")
    DistinctSketch.addBatch(orders.filter(col("o_custkey") < 100),
      Seq("o_custkey"), dir, batchId = 0)
    val before = DistinctSketch.estimate(spark, dir, "o_custkey")
    DistinctSketch.addBatch(
      Seq(900001L, 900002L, 900003L).toDF("o_custkey"),
      Seq("o_custkey"), dir, batchId = 1)
    val after = DistinctSketch.estimate(spark, dir, "o_custkey")
    assert(after > before, s"$after should exceed $before")
  }
}
