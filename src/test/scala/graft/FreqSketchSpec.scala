package graft

import org.apache.spark.sql.functions._

import graft.ext.FreqSketch

/** Persisted mergeable Misra–Gries store: exact-regime parity,
  * trim-regime lower bounds with the recorded error budget, and
  * capacity hygiene. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream split into 3 batches
  private def batch(b: Int) =
    (Seq.fill(200)("hot") ++ Seq.fill(40 + b)("warm") ++
      (0 until 30).map(i => s"cold_${b}_$i")).toDF("item")

  test("untrimmed store: folded counts equal the exact census") {
    val dir = tmpDir("freqsk-exact")
    (0 to 2).foreach(b => FreqSketch.addBatch(batch(b), "item", dir,
      batchId = b.toLong, capacity = 512))
    val (exact, pivots) = FreqSketch.exactness(spark, dir)
    assert(exact && pivots === 0L)
    val stored = FreqSketch.merged(spark, dir)
      .as[(String, Long)].collect().toMap
    val truth = (0 to 2).map(batch).reduce(_ union _)
      .groupBy("item").count().as[(String, Long)].collect().toMap
    assert(stored === truth)
    // threshold serving straight from the store (>5% of 813 items)
    val top = FreqSketch.frequentFromStore(spark, dir, 1L, 20L)
      .as[(String, Long)].collect()
    val topMap = top.toMap
    assert(top.map(_._1).toSeq === Seq("hot", "warm"))
    assert(topMap("hot") === 600L)
  }

  test("trimmed store: lower bounds within the recorded pivot budget") {
    val dir = tmpDir("freqsk-trim")
    (0 to 2).foreach(b => FreqSketch.addBatch(batch(b), "item", dir,
      batchId = b.toLong, capacity = 8))
    val (exact, pivots) = FreqSketch.exactness(spark, dir)
    assert(!exact && pivots > 0L)
    val stored = FreqSketch.merged(spark, dir)
      .as[(String, Long)].collect().toMap
    // the heavy item survives every batch's trim
    assert(stored.contains("hot"))
    // every stored count is a lower bound on the truth
    val truth = (0 to 2).map(batch).reduce(_ union _)
      .groupBy("item").count().as[(String, Long)].collect().toMap
    stored.foreach { case (i, c) => assert(c <= truth(i), i) }
    // ...and undershoots by at most the recorded budget (merge-trim
    // pivots + partition decrement events, summed across batches)
    assert(truth("hot") - stored("hot") <= pivots)
    // exact threshold serving refuses the estimate regime
    intercept[IllegalArgumentException] {
      FreqSketch.frequentFromStore(spark, dir, 1L, 20L)
    }
  }

  // grouped twin of the batches: group "a" is batch(b) relabeled,
  // group "b" a smaller stream with its own heavy item
  private def groupedBatch(b: Int) =
    batch(b).select(lit("a").as("grp"), col("item"))
      .union((Seq.fill(30)("beta") ++ (0 until 10).map(i => s"bc_${b}_$i"))
        .toDF("item").select(lit("b").as("grp"), col("item")))

  test("grouped untrimmed store: per-group folded counts equal the census") {
    val dir = tmpDir("freqsk-grp-exact")
    (0 to 2).foreach(b => FreqSketch.addBatchGrouped(groupedBatch(b),
      "grp", "item", dir, batchId = b.toLong, capacity = 512))
    val (exact, pivots) = FreqSketch.exactness(spark, dir)
    assert(exact && pivots === 0L)
    val stored = FreqSketch.mergedGrouped(spark, dir)
      .as[(String, String, Long)].collect()
      .map { case (g, i, c) => (g, i) -> c }.toMap
    val truth = (0 to 2).map(groupedBatch).reduce(_ union _)
      .groupBy("grp", "item").count().as[(String, String, Long)]
      .collect().map { case (g, i, c) => (g, i) -> c }.toMap
    assert(stored === truth)
    // per-group threshold serving: >1/20 of EACH group's stream —
    // "beta" is 30/40 of group b but would drown under group a's total
    val top = FreqSketch.frequentFromStoreGrouped(spark, dir, 1L, 20L)
      .as[(String, String, Long)].collect()
    assert(top.map(r => (r._1, r._2)).toSeq ===
      Seq(("a", "hot"), ("a", "warm"), ("b", "beta")))
    assert(top.find(r => r._1 == "b" && r._2 == "beta").get._3 === 90L)
  }

  test("grouped trimmed store: per-group budgets, refusal on exact asks") {
    val dir = tmpDir("freqsk-grp-trim")
    (0 to 2).foreach(b => FreqSketch.addBatchGrouped(groupedBatch(b),
      "grp", "item", dir, batchId = b.toLong, capacity = 8))
    val (exact, pivots) = FreqSketch.exactness(spark, dir)
    assert(!exact && pivots > 0L)
    val stored = FreqSketch.mergedGrouped(spark, dir)
      .as[(String, String, Long)].collect()
      .map { case (g, i, c) => (g, i) -> c }.toMap
    val truth = (0 to 2).map(groupedBatch).reduce(_ union _)
      .groupBy("grp", "item").count().as[(String, String, Long)]
      .collect().map { case (g, i, c) => (g, i) -> c }.toMap
    // lower bounds everywhere; both heavy items survive their trims
    stored.foreach { case (k, c) => assert(c <= truth(k), k) }
    assert(stored.contains(("a", "hot")) && stored.contains(("b", "beta")))
    intercept[IllegalArgumentException] {
      FreqSketch.frequentFromStoreGrouped(spark, dir, 1L, 20L)
    }
  }

  test("string batch keys: replay overwrites; sanitized twins never collide") {
    val dir = tmpDir("freqsk-keys")
    // "run/x" and "run:x" sanitize to the same charset form — the
    // appended raw-key hash must keep them distinct directories
    FreqSketch.addBatchKeyed(batch(0), "item", dir, "run/x", capacity = 512)
    FreqSketch.addBatchKeyed(batch(0), "item", dir, "run/x", capacity = 512)
    FreqSketch.addBatchKeyed(batch(1), "item", dir, "run:x", capacity = 512)
    val stored = FreqSketch.merged(spark, dir)
      .as[(String, Long)].collect().toMap
    val truth = (batch(0) union batch(1))
      .groupBy("item").count().as[(String, Long)].collect().toMap
    // replay of run/x didn't double-count; run:x didn't overwrite it
    assert(stored === truth)
  }

  test("a store rejects a batch summarized at a different capacity") {
    val dir = tmpDir("freqsk-cap")
    FreqSketch.addBatch(batch(0), "item", dir, 0L, capacity = 64)
    intercept[IllegalArgumentException] {
      FreqSketch.addBatch(batch(1), "item", dir, 1L, capacity = 128)
    }
  }
}
