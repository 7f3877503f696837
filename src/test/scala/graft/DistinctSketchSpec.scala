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

  test("mismatched tracked-column sets are rejected (no silent schema fork)") {
    val dir = tmpDir("sketch-mismatch")
    DistinctSketch.addBatch(orders, Seq("o_custkey"), dir, batchId = 0)
    val e = intercept[IllegalArgumentException] {
      DistinctSketch.addBatch(orders, Seq("o_orderstatus"), dir, batchId = 1)
    }
    assert(e.getMessage.contains("do not match"))
  }

  test("mismatched GROUP sets are rejected too, and reserved names up front") {
    val dir = tmpDir("sketch-grpmismatch")
    DistinctSketch.addBatchGrouped(orders, Seq("o_orderstatus"),
      Seq("o_custkey"), dir, batchId = 0)
    // ungrouped writer against a grouped store: same silent-fork hazard
    val e1 = intercept[IllegalArgumentException] {
      DistinctSketch.addBatch(orders, Seq("o_custkey"), dir, batchId = 1)
    }
    assert(e1.getMessage.contains("group columns"))
    // grouped writer with a different group set
    val e2 = intercept[IllegalArgumentException] {
      DistinctSketch.addBatchGrouped(orders, Seq("o_orderpriority"),
        Seq("o_custkey"), dir, batchId = 2)
    }
    assert(e2.getMessage.contains("group columns"))
    // reserved names can never enter a store's schema
    val dir2 = tmpDir("sketch-reserved")
    intercept[IllegalArgumentException] {
      DistinctSketch.addBatch(
        orders.withColumnRenamed("o_custkey", "batch_id"),
        Seq("batch_id"), dir2, batchId = 0)
    }
    intercept[IllegalArgumentException] {
      DistinctSketch.addBatchGrouped(
        orders.withColumnRenamed("o_orderstatus", "sk_g"),
        Seq("sk_g"), Seq("o_custkey"), dir2, batchId = 0)
    }
  }

  test("grouped sketches: per-group union equals the exact per-group distinct") {
    val dir = tmpDir("sketch-grp")
    // o_orderstatus per group is tiny → sparse-exact, so the grouped
    // fold must EQUAL the exact per-group COUNT(DISTINCT)
    Seq(0, 1, 2).foreach { b =>
      DistinctSketch.addBatchGrouped(
        orders.filter(col("o_orderkey") % 3 === b),
        Seq("o_orderstatus"), Seq("o_orderstatus"), dir, batchId = b)
    }
    // distinct statuses per status is trivially 1 — use a richer probe:
    // distinct custkey buckets per status at sparse-exact cardinality
    val dir2 = tmpDir("sketch-grp2")
    val bucketed = orders.withColumn("ck", pmod(col("o_custkey"), lit(17)))
    Seq(0, 1, 2).foreach { b =>
      DistinctSketch.addBatchGrouped(
        bucketed.filter(col("o_orderkey") % 3 === b),
        Seq("o_orderstatus"), Seq("ck"), dir2, batchId = b)
    }
    val got = DistinctSketch.estimateGrouped(spark, dir2,
      Seq("o_orderstatus"), "ck")
      .as[(String, Long)].collect().toMap
    val exact = bucketed.groupBy("o_orderstatus")
      .agg(countDistinct("ck").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === exact)
  }

  test("histogram store: batch merge is exact; quantile_disc semantics") {
    import graft.ext.HistogramSketch
    val dir = tmpDir("hist-inc")
    val vals = Seq(1, 1, 1, 1, 1, 1, 1, 2, 3).map(_.toDouble)
    Seq(0, 1, 2).foreach { b =>
      HistogramSketch.addBatch(
        vals.zipWithIndex.filter(_._2 % 3 == b).map(_._1).toDF("v"),
        Seq("v"), dir, batchId = b)
    }
    val hist = HistogramSketch.histogram(spark, dir, "v")
      .as[(Double, Long)].collect().toMap
    assert(hist === Map(1.0 -> 7L, 2.0 -> 1L, 3.0 -> 1L))
    // verified against DuckDB quantile_disc on the same multiset:
    // q=0.5 → 1, q=0.8 → 2, q=0.875 → 2 (rank = max(1, ceil(q·N)))
    val qs = HistogramSketch.quantiles(spark, dir, "v",
      Seq(0.5, 0.8, 0.875)).as[(Double, Double)].collect().toMap
    assert(qs === Map(0.5 -> 1.0, 0.8 -> 2.0, 0.875 -> 2.0))
    // NULLs are excluded like SQL aggregates exclude them
    val dir2 = tmpDir("hist-null")
    HistogramSketch.addBatch(
      Seq(Some(1.0), None, Some(2.0)).toDF("v"), Seq("v"), dir2, batchId = 0)
    assert(HistogramSketch.histogram(spark, dir2, "v")
      .agg(sum("n")).as[Long].head === 2L)
  }

  test("grouped histograms: per-group quantile fold equals the exact rank rule") {
    import graft.ext.HistogramSketch
    val dir = tmpDir("hist-grp")
    Seq(0, 1, 2).foreach { b =>
      HistogramSketch.addBatchGrouped(
        orders.filter(pmod(col("o_custkey"), lit(3)) === b)
          .select(col("o_orderstatus").as("g"),
            pmod(col("o_custkey"), lit(17)).cast("double").as("v")),
        Seq("g"), Seq("v"), dir, batchId = b)
    }
    val got = HistogramSketch.quantilesGrouped(spark, dir, Seq("g"), "v",
      Seq(0.25, 0.5, 0.75)).as[(String, Double, Double)].collect().toSet
    // exact per-group quantile_disc: value at rank max(1, ceil(q·N))
    val exact = orders
      .select(col("o_orderstatus").as("g"),
        pmod(col("o_custkey"), lit(17)).cast("double").as("v"))
      .as[(String, Double)].collect().groupBy(_._1)
      .flatMap { case (g, rows) =>
        val vs = rows.map(_._2).sorted
        Seq(0.25, 0.5, 0.75).map(q =>
          (g, q, vs(math.max(1, math.ceil(q * vs.length).toInt) - 1)))
      }.toSet
    assert(got === exact && got.nonEmpty)
  }
}
