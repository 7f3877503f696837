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

  test("a store rejects a batch summarized at a different capacity") {
    val dir = tmpDir("freqsk-cap")
    FreqSketch.addBatch(batch(0), "item", dir, 0L, capacity = 64)
    intercept[IllegalArgumentException] {
      FreqSketch.addBatch(batch(1), "item", dir, 1L, capacity = 128)
    }
  }
}
