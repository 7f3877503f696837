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

  test("bad configs rejected") {
    val g = sym(("a", "b"))
    intercept[IllegalArgumentException](PageRank.fixedPointRanks(g, 0))
    intercept[IllegalArgumentException](
      PageRank.fixedPointRanks(g, 5, dampingPct = 100))
  }
}
