package graft

import org.apache.spark.sql.functions._

import graft.ext.SkewJoin

/** Salted skew join (`ext.SkewJoin`). */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of the big side is one hot key — the shape that funnels one
  // reducer in a plain shuffle join
  private lazy val big = ((1 to 9000).map(i => (7L, s"hot$i")) ++
    (1 to 1000).map(i => (i.toLong % 50L, s"cold$i"))).toDF("k", "payload")
  private lazy val small = (0L to 49L).map(k => (k, s"dim$k")).toDF("dk", "name")

  test("salted join equals the plain join exactly (hot key included)") {
    val plain = big.join(small, $"k" === $"dk").drop("dk")
    val salted = SkewJoin.saltedInner(big, small, Seq("k" -> "dk"), salts = 8)
      .drop("dk")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === plain.count())
  }

  test("the hot key's rows actually spread across all salt buckets") {
    // recompute the implementation's salt on the hot slice: 9000
    // distinct rows must hit every one of the 8 buckets, and no
    // bucket may hold more than a third of the hot volume
    val hot = big.filter($"k" === 7L)
    val perBucket = hot
      .withColumn("_s", pmod(xxhash64(struct(hot.columns.map(col): _*)), lit(8L)))
      .groupBy("_s").count()
      .as[(Long, Long)].collect().toMap
    assert(perBucket.keySet === (0L to 7L).toSet)
    assert(perBucket.values.max <= 3000L,
      s"one bucket still owns the hot key: $perBucket")
  }

  test("salts = 1 degenerates to the plain join; bad configs rejected") {
    val plain = big.join(small, $"k" === $"dk")
    val one = SkewJoin.saltedInner(big, small, Seq("k" -> "dk"), salts = 1)
    assert(one.count() === plain.count())
    intercept[IllegalArgumentException](
      SkewJoin.saltedInner(big, small, Seq("k" -> "dk"), salts = 0))
    intercept[IllegalArgumentException](
      SkewJoin.saltedInner(big, small, Nil, salts = 4))
  }
}
