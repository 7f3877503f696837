package graft

import org.apache.spark.sql.functions._

import graft.ext.HeavyHitters

/** Two-pass exact heavy hitters: result parity with the naive
  * GROUP BY + HAVING, under a capacity small enough that the
  * Misra–Gries summaries actually evict. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed synthetic: 2 true heavy hitters over a 102-word vocabulary
  private lazy val items =
    (Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 100).flatMap(i => Seq.fill(4)(s"cold_$i")))
      .toDF("item")

  private def naive(num: Long, den: Long): Map[String, Long] = {
    val total = items.count()
    items.groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") * den > lit(total) * num)
      .as[(String, Long)].collect().toMap
  }

  test("exact parity with naive GROUP BY + HAVING while counters evict") {
    // capacity 16 < vocabulary 102 → the decrement-all path runs; the
    // guarantee only needs capacity ≥ den/num = 10
    val got = HeavyHitters.frequentItems(items, "item", 1L, 10L, capacity = 16)
      .as[(String, Long)].collect()
    val gotMap = got.toMap
    assert(gotMap === naive(1L, 10L))
    assert(got.map(_._1).toSeq === Seq("hot", "warm")) // heaviest first
    assert(gotMap("hot") === 500L) // counts are exact, not estimates
  }

  test("threshold boundary is strict (n*den > total*num, never >=)") {
    // threshold exactly at warm's share: warm must be excluded
    val total = items.count() // 1020
    val got = HeavyHitters.frequentItems(items, "item", 120L, total,
      capacity = 64).as[(String, Long)].collect().toMap
    assert(got === Map("hot" -> 500L))
  }

  test("exact-summary fast path (no decrements) equals the two-pass verify") {
    // capacity 256 > vocabulary 102 → no state ever decrements and the
    // second corpus pass is skipped; capacity 16 forces eviction and
    // the verify fallback. Both must produce the identical exact rows.
    val fast = HeavyHitters.frequentItems(items, "item", 1L, 10L,
      capacity = 256).as[(String, Long)].collect().toSeq
    val verified = HeavyHitters.frequentItems(items, "item", 1L, 10L,
      capacity = 16).as[(String, Long)].collect().toSeq
    assert(fast === verified)
    assert(fast.toMap === naive(1L, 10L))
    // grouped twin: same parity across both regimes
    val gFast = HeavyHitters.frequentItemsByGroup(grouped, "grp", "item",
      1L, 10L, capacity = 256).as[(String, String, Long)].collect().toSeq
    val gVerified = HeavyHitters.frequentItemsByGroup(grouped, "grp",
      "item", 1L, 10L, capacity = 16)
      .as[(String, String, Long)].collect().toSeq
    assert(gFast === gVerified)
  }

  test("capacity below den/num is refused, not silently lossy") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(items, "item", 1L, 100L, capacity = 50)
    }
  }

  // two groups with deliberately DIFFERENT frequency profiles: a
  // global 1/10 threshold would miss b's heavy item (b is the small
  // group), the per-group threshold must find it
  private lazy val grouped =
    ((Seq.fill(300)("hot") ++ Seq.fill(50)("warm") ++
      (0 until 80).flatMap(i => Seq.fill(3)(s"a_cold_$i"))).map(("a", _)) ++
      (Seq.fill(40)("beta") ++
        (0 until 60).flatMap(i => Seq.fill(2)(s"b_cold_$i"))).map(("b", _)))
      .toDF("grp", "item")

  test("grouped: per-group parity with naive per-group GROUP BY + HAVING") {
    val naive = {
      val totals = grouped.groupBy("grp")
        .agg(count(lit(1)).as("total"))
      grouped.groupBy("grp", "item").agg(count(lit(1)).as("n"))
        .join(totals, "grp")
        .filter(col("n") * 10L > col("total") * 1L)
        .select("grp", "item", "n")
        .as[(String, String, Long)].collect().toSet
    }
    // capacity 16 < either group's vocabulary → counters evict per group
    val got = HeavyHitters.frequentItemsByGroup(grouped, "grp", "item",
        1L, 10L, capacity = 16)
      .as[(String, String, Long)].collect()
    assert(got.toSet === naive)
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq(("a", "hot"), ("b", "beta"))) // group-then-heaviest order
    assert(got.exists { case (g, i, n) =>
      g == "a" && i == "hot" && n == 300L }) // counts exact per group
  }

  test("grouped: null groups and null items are ignored") {
    val withNulls = Seq((Some("g"), Some("x")), (Some("g"), Some("x")),
      (None, Some("x")), (Some("g"), None))
      .toDF("grp", "item")
    val got = HeavyHitters.frequentItemsByGroup(withNulls, "grp", "item",
        1L, 3L, capacity = 8)
      .as[(String, String, Long)].collect()
    assert(got.toSeq === Seq(("g", "x", 2L))) // 2*3 > 2*1
  }

  test("null items are ignored; empty input yields empty output") {
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("item")
    val got = HeavyHitters.frequentItems(withNulls, "item", 1L, 3L,
      capacity = 8).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L)) // 2*3 > 3*1; b: 1*3 !> 3
    val empty = HeavyHitters.frequentItems(
      Seq.empty[String].toDF("item"), "item", 1L, 10L, capacity = 16)
    assert(empty.count() === 0L)
  }
}
