package graft

import org.apache.spark.sql.functions._

import graft.ext.QuantileSketch

/** Mergeable quantile-summary store: exact-regime parity, compacted
  * rank-error budgets, merge across batches, replay idempotence. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Exact discrete lower quantile from raw values: smallest v with
    * rank ≥ ceil(q·n) — the store's pinned semantics. */
  private def exactQuantile(vals: Seq[Double], q: Double): Double = {
    val sorted = vals.sorted
    val target = math.ceil(q * sorted.size).toLong max 1L
    sorted((target - 1).toInt)
  }

  private def rankOf(vals: Seq[Double], v: Double): Long =
    vals.count(_ <= v).toLong

  test("exact regime: store quantiles equal the raw computation") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val d = tmpDir("qsk-exact")
    // 4 ingest batches; l_quantity has 50 distinct values — exact
    (0L to 3L).foreach { b =>
      QuantileSketch.addBatch(
        li.filter(pmod(col("l_orderkey"), lit(4)) === b),
        "l_quantity", d, batchId = b, capacity = 256)
    }
    val (exact, budget) = QuantileSketch.exactness(spark, d)
    assert(exact && budget === 0L)
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val got = QuantileSketch.quantiles(spark, d, qs)
      .as[(Double, Double)].collect().toMap
    val vals = li.select(col("l_quantity").cast("double"))
      .as[Double].collect().toSeq
    qs.foreach { q =>
      assert(got(q) === exactQuantile(vals, q), s"q=$q")
    }
  }

  test("compacted regime: values are real, rank error within the budget") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val d = tmpDir("qsk-approx")
    // events.value is near-continuous; capacity 64 forces compaction
    (0L to 3L).foreach { b =>
      QuantileSketch.addBatch(
        ev.filter(pmod(col("event_id"), lit(4)) === b),
        "value", d, batchId = b, capacity = 64)
    }
    val (exact, budget) = QuantileSketch.exactness(spark, d)
    assert(!exact && budget > 0L)
    val vals = ev.select(col("value").cast("double"))
      .filter(col("value").isNotNull).as[Double].collect().toSeq
    val n = vals.size.toLong
    val valSet = vals.toSet
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = QuantileSketch.quantiles(spark, d, qs)
      .as[(Double, Double)].collect().toMap
    qs.foreach { q =>
      val v = got(q)
      assert(valSet.contains(v), s"q=$q returned a non-data value $v")
      val target = math.ceil(q * n).toLong max 1L
      // true rank of the reported value within budget of the target:
      // rank error ≤ grid spacing per compacted batch, summed
      val lo = vals.count(_ < v).toLong + 1 // smallest rank v occupies
      val hi = rankOf(vals, v)
      assert(lo - budget <= target && target <= hi + budget,
        s"q=$q v=$v ranks=[$lo,$hi] target=$target budget=$budget")
    }
    // total weight is preserved exactly through compaction
    val w = QuantileSketch.merged(spark, d).agg(sum("w")).head.getLong(0)
    assert(w === n)
  }

  test("replaying a batch id overwrites instead of double-counting") {
    val d = tmpDir("qsk-replay")
    val df = (1 to 100).map(_.toDouble).toDF("x")
    QuantileSketch.addBatch(df, "x", d, batchId = 0L, capacity = 256)
    QuantileSketch.addBatch(df, "x", d, batchId = 0L, capacity = 256)
    val w = QuantileSketch.merged(spark, d).agg(sum("w")).head.getLong(0)
    assert(w === 100L)
    val got = QuantileSketch.quantiles(spark, d, Seq(0.5))
      .as[(Double, Double)].collect().toMap
    assert(got(0.5) === 50.0)
  }

  test("capacity mismatch and bad q refuse; nulls and NaNs are excluded") {
    val d = tmpDir("qsk-validate")
    val df = Seq(Some(1.0), Some(2.0), None, Some(Double.NaN))
      .toDF("x")
    QuantileSketch.addBatch(df, "x", d, batchId = 0L, capacity = 16)
    intercept[IllegalArgumentException] {
      QuantileSketch.addBatch(df, "x", d, batchId = 1L, capacity = 32)
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.quantiles(spark, d, Seq(1.5))
    }
    val w = QuantileSketch.merged(spark, d).agg(sum("w")).head.getLong(0)
    assert(w === 2L) // null + NaN dropped
  }

  test("grouped store: exact groups exact, oversized groups within budget") {
    val d = tmpDir("qsk-grouped")
    // group a: 10 distinct (exact at capacity 32); group b: 500
    // distinct (compacted)
    val rows =
      (1 to 200).map(i => ("a", (i % 10 + 1).toDouble)) ++
        (1 to 500).map(i => ("b", i.toDouble))
    val df = rows.toDF("g", "x")
    QuantileSketch.addBatchGrouped(df, "g", "x", d, batchId = 0L,
      capacity = 32)
    val meta = spark.read.parquet(s"$d/meta")
      .select("grp", "compacted", "budget")
      .as[(String, Boolean, Long)].collect()
      .map { case (g, c, b) => g -> ((c, b)) }.toMap
    assert(meta("a") === ((false, 0L)))
    assert(meta("b")._1 && meta("b")._2 > 0L)
    val got = QuantileSketch.quantilesGrouped(spark, d, Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    val aVals = rows.filter(_._1 == "a").map(_._2)
    assert(got(("a", 0.5)) === exactQuantile(aVals, 0.5))
    assert(got(("a", 0.9)) === exactQuantile(aVals, 0.9))
    // group b: reported value's true rank within budget of the target
    val bVals = rows.filter(_._1 == "b").map(_._2)
    val budget = meta("b")._2
    Seq(0.5, 0.9).foreach { q =>
      val v = got(("b", q))
      val target = math.ceil(q * bVals.size).toLong
      assert(math.abs(rankOf(bVals, v) - target) <= budget,
        s"q=$q v=$v budget=$budget")
    }
  }

  test("grouped replay is idempotent and batches merge per group") {
    val d = tmpDir("qsk-grouped-replay")
    val b0 = (1 to 50).map(i => ("a", i.toDouble)).toDF("g", "x")
    val b1 = (51 to 100).map(i => ("a", i.toDouble)).toDF("g", "x")
    QuantileSketch.addBatchGrouped(b0, "g", "x", d, 0L, capacity = 256)
    QuantileSketch.addBatchGrouped(b0, "g", "x", d, 0L, capacity = 256)
    QuantileSketch.addBatchGrouped(b1, "g", "x", d, 1L, capacity = 256)
    val got = QuantileSketch.quantilesGrouped(spark, d, Seq(0.5))
      .as[(String, Double, Double)].collect()
    assert(got.toSeq === Seq(("a", 0.5, 50.0)))
  }
}
