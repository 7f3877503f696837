package graft

import org.apache.spark.sql.functions._

import graft.ext.BloomJoin

/** Bloom-filter semi-join reduction (`ext.BloomJoin`). */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes mightContain") {
    val keys = (1L to 2000L).map(_ * 7919L)
    val dim = keys.toDF("k")
    val bloom = BloomJoin.build(dim, col("k"), bits = 1L << 16, k = 5)
    val probed = dim.crossJoin(broadcast(bloom))
      .filter(BloomJoin.mightContain(col("k"), col("bloom"), 1L << 16, 5))
    assert(probed.count() === keys.size.toLong)
  }

  test("false-positive rate is bounded and absent keys mostly rejected") {
    val dim = (1L to 1000L).toDF("k")
    val bloom = BloomJoin.build(dim, col("k"), bits = 1L << 16, k = 5)
    // 10k keys disjoint from the build set
    val absent = (1000001L to 1010000L).toDF("k")
    val fp = absent.crossJoin(broadcast(bloom))
      .filter(BloomJoin.mightContain(col("k"), col("bloom"), 1L << 16, 5))
      .count()
    // theoretical rate at n=1000, m=2^16, k=5 is ~2e-5; allow slack
    assert(fp <= 50L, s"false positives: $fp / 10000")
  }

  test("bloom-reduced join equals the plain join") {
    val fact = (1L to 5000L).map(i => (i % 997L, i)).toDF("fk", "payload")
    val dim = (1L to 997L).filter(_ % 5 == 0).map(i => (i, s"d$i"))
      .toDF("dk", "name")
    val plain = fact.join(dim, $"fk" === $"dk")
      .groupBy("name").agg(count(lit(1)).as("n"))
    val viaBloom = BloomJoin
      .reduced(fact, $"fk", dim, $"dk", bits = 1L << 14, k = 4)
      .join(dim, $"fk" === $"dk")
      .groupBy("name").agg(count(lit(1)).as("n"))
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("reduction drops non-joinable fact rows before the join") {
    val fact = (1L to 10000L).toDF("fk")
    val dim = (1L to 100L).toDF("dk")   // 1% joinable
    val reduced = BloomJoin.reduced(fact, $"fk", dim, $"dk",
      bits = 1L << 16, k = 5)
    val n = reduced.count()
    assert(n >= 100L && n <= 200L, s"reduced to $n rows, expected ~100")
  }

  test("j_bloom_join plans the probe filter on the fact side before the join") {
    val p = SparkEntry.queries("j_bloom_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    // the xxhash64 membership probe must sit in a Filter BELOW the
    // fact-dim join (reduction happens pre-shuffle)
    val joinAt = p.indexOf("Join Inner")
    val probeAt = p.indexOf("xxhash64(l_orderkey")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe filter not under the join: join@$joinAt probe@$probeAt\n$p")
  }
}
