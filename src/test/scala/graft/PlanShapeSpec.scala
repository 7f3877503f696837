package graft

/** Plan-shape regression tests: the physical-plan properties the
  * queries were tuned toward (PLANS.md) must not silently regress —
  * a correct-but-shuffling plan is a failure at 100 TB even when the
  * rows match.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("star join broadcasts every dimension (no shuffle joins)") {
    val p = planOf("j5_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("filter+sort+limit plans TakeOrderedAndProject with pushed filters") {
    val p = planOf("p1_filter_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"))
  }

  test("pricing summary does partial+final aggregation and prunes columns") {
    val p = planOf("a1_pricing_summary")
    assert(p.contains("partial_sum"))
    // column pruning: unused lineitem columns never appear in the plan
    assert(!p.contains("l_orderkey") && !p.contains("l_shipdate"))
  }

  test("dashboard stats is a single scan (one parquet read in the plan)") {
    val p = planOf("a3_dashboard_stats")
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") === 1)
  }

  test("cosine top-k broadcasts the query vector, never shuffles the corpus sort") {
    val p = planOf("x1_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("simhash pairs contains no cartesian or nested-loop join") {
    val p = planOf("x2_simhash_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("range join is an equi-join plus filter, not a nested loop") {
    val p = planOf("j_range_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
