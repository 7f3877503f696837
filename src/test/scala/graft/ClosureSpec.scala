package graft

import org.apache.spark.sql.DataFrame

import graft.ext.Closure

/** Transitive closure / seeded reachability (`ext.Closure`). */
class ClosureSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (String, String)*): DataFrame =
    es.toSeq.toDF("src", "dst")

  private def pairs(df: DataFrame): Set[(String, String)] =
    df.select("src", "anc").as[(String, String)].collect().toSet

  test("chain closure: every suffix pair, converges at depth") {
    val r = Closure.transitiveWithStats(
      edges(("a", "b"), ("b", "c"), ("c", "d")))
    assert(r.converged)
    assert(pairs(r.pairs) === Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
  }

  test("diamond DAG: the re-converging path yields no duplicate pairs") {
    val r = Closure.transitiveWithStats(
      edges(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")))
    assert(r.converged)
    val p = pairs(r.pairs)
    assert(p.count(_ == ("a", "d")) === 1)
    assert(p === Set(("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"),
      ("b", "d"), ("b", "e"), ("c", "d"), ("c", "e"), ("d", "e")))
  }

  test("cycle terminates: every node reaches every node including itself") {
    val r = Closure.transitiveWithStats(
      edges(("a", "b"), ("b", "c"), ("c", "a")))
    assert(r.converged)
    assert(pairs(r.pairs) ===
      (for (x <- Seq("a", "b", "c"); y <- Seq("a", "b", "c")) yield (x, y)).toSet)
  }

  test("maxIter under-reach is a flagged partial; transitive() throws") {
    val chain = edges(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"))
    val r = Closure.transitiveWithStats(chain, maxIter = 2)
    assert(!r.converged)
    // partial = under-reach only: every reported pair is a true pair
    assert(pairs(r.pairs).subsetOf(pairs(Closure.transitiveWithStats(chain).pairs)))
    intercept[IllegalStateException](Closure.transitive(chain, maxIter = 2))
  }

  test("reachFrom reports minimal hop distances from the seed set") {
    // two routes to d: a->b->c->d (3 hops) and a->d (1 hop)
    val e = edges(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("x", "y"))
    val r = Closure.reachFrom(e, Seq("a").toDF("id"))
    assert(r.converged)
    val got = r.pairs.as[(String, Int)].collect().toMap
    assert(got === Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 1))
  }
}
