package graft

import org.apache.spark.sql.DataFrame

import graft.ext.PageRank

/** Fixed-point integer PageRank (`ext.PageRank`). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (String, String)*): DataFrame =
    es.toSeq.toDF("src", "dst")

  private def sym(es: (String, String)*): DataFrame =
    edges(es ++ es.map(_.swap): _*)

  test("symmetric star: the hub outranks every leaf, mass is conserved") {
    val g = sym(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"))
    val r = PageRank.fixedPointRanks(g, iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(Seq("a", "b", "c", "d").forall(l => r("h") > r(l)))
    // integer mass: conserved up to floor losses (≤ 1 unit per
    // edge-contribution per iteration, plus the base rounding per node)
    val total = r.values.sum
    assert(total > PageRank.Mass - 1000L && total <= PageRank.Mass)
  }

  test("symmetric leaves are exactly equal (integer arithmetic, no noise)") {
    val g = sym(("h", "a"), ("h", "b"), ("h", "c"))
    val r = PageRank.fixedPointRanks(g, iterations = 8)
      .as[(String, Long)].collect().toMap
    assert(r("a") === r("b") && r("b") === r("c"))
  }

  test("deterministic under repartitioning: identical units bit-for-bit") {
    val es = (for {
      a <- 1 to 30; b <- (a + 1) to 30
      if ((a * 13 + b * 7) % 5) == 0
    } yield (s"n$a", s"n$b"))
    val g1 = sym(es: _*)
    val g2 = sym(es: _*).repartition(7)
    val r1 = PageRank.fixedPointRanks(g1, 5).as[(String, Long)].collect().toMap
    val r2 = PageRank.fixedPointRanks(g2, 5).as[(String, Long)].collect().toMap
    assert(r1 === r2)
  }

  test("early exit at an exact fixed point equals the full iteration budget") {
    // a regular graph (cycle, symmetrized): every node starts at
    // Mass/n and stays there — delta hits 0 after the first step, so
    // the armed run exits early; the ranks must equal the blind run's
    val n = 12
    val g = sym((1 to n).map(i => (s"c$i", s"c${i % n + 1}")): _*)
    val blind = PageRank.fixedPointRanks(g, iterations = 9)
      .as[(String, Long)].collect().toMap
    val armed = PageRank.fixedPointRanks(g, iterations = 9,
      convergeUnits = 0L).as[(String, Long)].collect().toMap
    assert(armed === blind)
    // and on a NON-converging fixture the armed run changes nothing
    val star = sym(("h", "a"), ("h", "b"), ("h", "c"))
    val sBlind = PageRank.fixedPointRanks(star, 5)
      .as[(String, Long)].collect().toMap
    val sArmed = PageRank.fixedPointRanks(star, 5, convergeUnits = 0L)
      .as[(String, Long)].collect().toMap
    assert(sArmed === sBlind)
  }

  test("a movement threshold stops deep budgets once ranks settle") {
    val es = (for {
      a <- 1 to 24; b <- (a + 1) to 24
      if ((a * 11 + b * 3) % 4) == 0
    } yield (s"n$a", s"n$b"))
    val g = sym(es: _*)
    // generous threshold: must stop well before 50 blind iterations
    // and still land within the threshold of the settled ranks
    val settled = PageRank.fixedPointRanks(g, 50)
      .as[(String, Long)].collect().toMap
    val quick = PageRank.fixedPointRanks(g, 50,
      convergeUnits = PageRank.Mass / 1000000L)
      .as[(String, Long)].collect().toMap
    val drift = settled.map { case (v, r) => math.abs(r - quick(v)) }.sum
    assert(drift <= PageRank.Mass / 100000L,
      s"threshold exit drifted $drift units from the settled ranks")
  }

  test("bad configs rejected") {
    val g = sym(("a", "b"))
    intercept[IllegalArgumentException](PageRank.fixedPointRanks(g, 0))
    intercept[IllegalArgumentException](
      PageRank.fixedPointRanks(g, 5, dampingPct = 100))
  }
}
