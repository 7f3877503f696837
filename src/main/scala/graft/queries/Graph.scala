package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Qhelpers._
import graft.ext.{Graph => GraphOps}

/** Graph-analytics catalog (§2 extension; complements the
  * connected-components + canonical-dedup pipeline in `TextSim`).
  *
  * The demo graph is FK-derived: suppliers are adjacent when they supply
  * materially more parts in common than average (an entity-resolution /
  * collusion-detection shape). The edge threshold is DATA-RELATIVE
  * (mean + 2σ of the shared-part-count distribution), so the graph
  * stays sparse and meaningful at every SF without a hand-tuned
  * constant; both moments derive from exact integer sums, so the
  * threshold is deterministic across engines.
  *
  * 100 TB notes: pair generation is the one stage with a skew hazard
  * (a part supplied by s suppliers emits C(s,2) pairs), so the
  * per-part supplier lists are CAPPED: parts
  * whose supplier set exceeds [[MaxSuppliersPerPart]] are excluded
  * from pair generation and reported in a recall ledger (the LSH
  * hot-bucket discipline of `ext.Dedup.lshCandidatePairsWithStats`) —
  * bounded C(s,2) per part by contract, and the drop is visible, not
  * silent. At TPC-H fan-outs (a handful of suppliers per part) no
  * part ever trips the cap, so the census is unchanged. The triangle
  * count itself rides `ext.Graph`'s degree-oriented wedge enumeration
  * (out-degree ≤ O(√m) per vertex, no window functions anywhere).
  */
object Graph {

  /** Per-part supplier-list cap for pair generation: a part with more
    * suppliers is a degenerate hub (C(s,2) blow-up) whose pairs say
    * little about targeted co-supply anyway — it is dropped whole and
    * ledgered. 1024 bounds any single part's pair fan-out at ~524k. */
  val MaxSuppliersPerPart = 1024

  /** Edge set plus the recall ledger of capped parts. */
  final case class EdgeStats(edges: DataFrame, droppedParts: DataFrame)

  private[graft] def coSupplierEdgesWithStats(ps0: DataFrame,
      maxSuppliers: Int = MaxSuppliersPerPart): EdgeStats = {
    // ONE shuffle gathers each part's distinct supplier set (collect_set
    // dedups in its map-side partials), which sizes the cap WITHOUT a
    // window; the kept lists explode back to (p, k) rows that are
    // already hash-partitioned on p, so the pair self-join needs no
    // further exchange (AQE broadcasts the small side when it fits).
    // The collect_set buffer is O(s) per part — the same quantity the
    // cap bounds — so an over-cap part costs its list once, never its
    // C(s,2) pairs.
    val sized = ps0.groupBy("p").agg(collect_set(col("k")).as("ks"))
    val kept = sized.filter(size(col("ks")) <= maxSuppliers)
    val droppedParts = sized.filter(size(col("ks")) > maxSuppliers)
      .select(col("p"), size(col("ks")).cast(LongType).as("n_suppliers"))
    val ks = kept.select(col("p"), explode(col("ks")).as("k"))
    // materialize the pair counts ONCE (localCheckpoint): both the
    // threshold aggregate and the filter below read co, and without
    // the checkpoint each would re-run the expensive pair expansion
    val co = ks.as("x").join(ks.as("y"),
        col("x.p") === col("y.p") && col("x.k") < col("y.k"))
      .groupBy(col("x.k").as("a"), col("y.k").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .localCheckpoint(true)
    // edge iff shared count ≥ mean + 2σ of the pair distribution. Both
    // moments come from EXACT integer sums (Σn, Σn²), so the threshold
    // is a fixed small sequence of IEEE double ops on identical
    // integers in both engines — deterministic, no accumulation-order
    // dependence — and it tracks the distribution at every SF instead
    // of a hand-tuned constant (a mean-multiple goes dense as the
    // spread widens with scale: 193k edges at sf0.1 vs 17k with 2σ).
    val n = count(lit(1))
    val sum1 = sum("n_shared").cast(DoubleType)
    val sum2 = sum(col("n_shared") * col("n_shared")).cast(DoubleType)
    val thr = co.agg(
      (sum1 / n + lit(2.0) * sqrt((sum2 - sum1 * sum("n_shared") / n) / n))
        .as("thr"))
    val edges = co.crossJoin(broadcast(thr))
      .filter(col("n_shared").cast(DoubleType) >= col("thr"))
      .select(col("a"), col("b"))
    EdgeStats(edges, droppedParts)
  }

  private def coSupplierEdges(s: SparkSession, dir: String): DataFrame = {
    // no pre-distinct: collect_set dedups inside the same shuffle's
    // map-side partial aggregation
    val ps0 = t(s, dir, "lineitem")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("k"))
    coSupplierEdgesWithStats(ps0).edges
  }

  /** Persisted co-supplier edge artifact: the derivation (supplier
    * sets → capped pair expansion → mean+2σ threshold) is the
    * expensive end of the pipeline and is corpus-determined, so it
    * runs ONCE per corpus — the same persisted-index economics as the
    * text/ANN/CC artifacts — and analytic probes read the stored edge
    * list. Billed to `build_seconds("coedges")` in Bench's warm-up. */
  private[queries] def coEdgesDir(s: SparkSession, dir: String): String =
    ExtQueries.buildOnce(dir, "lineitem", "coedges") { d =>
      coSupplierEdges(s, dir).write.mode("overwrite").parquet(s"$d/data")
    }

  /** Triangle census of the co-supplier graph: nodes, edges, triangles
    * in one row, served from the persisted edge artifact. */
  def g_triangle_count(s: SparkSession, dir: String): DataFrame =
    GraphOps.summary(graft.ext.StoreRead.parquet(s, s"${coEdgesDir(s, dir)}/data"))

  /** Transitive closure of the FK lineage DAG (`ext.Closure` frontier
    * walk): orders → customer → nation → region plus supplier →
    * nation, node keys namespaced by type letter. Every (node,
    * ancestor) pair at any hop distance — the multi-hop provenance ask
    * the reference UI answers by walking the lineage graph; the oracle
    * computes the identical closure with a recursive CTE. Orders are
    * capped to a fixed key range so the output stays compare-sized at
    * every SF (the operator itself is corpus-wide). */
  def lineage_closure(s: SparkSession, dir: String): DataFrame = {
    def key(prefix: String, c: String) =
      concat(lit(prefix), col(c).cast(StringType))
    val edges = t(s, dir, "supplier")
      .select(key("S", "s_suppkey").as("src"), key("N", "s_nationkey").as("dst"))
      .unionByName(t(s, dir, "customer")
        .select(key("C", "c_custkey").as("src"), key("N", "c_nationkey").as("dst")))
      .unionByName(t(s, dir, "nation")
        .select(key("N", "n_nationkey").as("src"), key("R", "n_regionkey").as("dst")))
      .unionByName(t(s, dir, "orders").filter(col("o_orderkey") <= 500)
        .select(key("O", "o_orderkey").as("src"), key("C", "o_custkey").as("dst")))
    graft.ext.Closure.transitive(edges)
      .select(col("src").as("node"), col("anc"))
      .orderBy("node", "anc")
  }

  /** Fixed-point PageRank (`ext.PageRank`) over the SYMMETRIZED FK
    * entity graph (supplier/customer ↔ nation ↔ region): 5 synchronous
    * iterations in integer units, so the result is bit-identical
    * between engines — the oracle unrolls the same five steps with the
    * same floor divisions. Symmetrizing gives every node an out-edge
    * (no dangling-mass leak); nations surface as the hubs. */
  def g_pagerank(s: SparkSession, dir: String): DataFrame = {
    def key(prefix: String, c: String) =
      concat(lit(prefix), col(c).cast(StringType))
    val fk = t(s, dir, "supplier")
      .select(key("S", "s_suppkey").as("src"), key("N", "s_nationkey").as("dst"))
      .unionByName(t(s, dir, "customer")
        .select(key("C", "c_custkey").as("src"), key("N", "c_nationkey").as("dst")))
      .unionByName(t(s, dir, "nation")
        .select(key("N", "n_nationkey").as("src"), key("R", "n_regionkey").as("dst")))
    val sym = fk.unionByName(
      fk.select(col("dst").as("src"), col("src").as("dst")))
    graft.ext.PageRank.fixedPointRanks(sym, iterations = 5)
      .select(col("v").as("node"), col("r").as("rank_units"))
      .orderBy("node")
  }

  /** WEIGHTED PageRank (`ext.PageRank.weightedRanks` — the r10
    * stretch item's other half): rank flows proportional to integer
    * edge weights over the symmetrized user ↔ purchased-item graph
    * (weight = purchase count, so a 10-purchase relationship carries
    * 10× the mass of a 1-purchase one). Same bit-deterministic
    * integer arithmetic as [[g_pagerank]] — the oracle unrolls the
    * same five weighted steps with the same floor divisions. */
  def g_pagerank_weighted(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(
        concat(lit("U"), col("user_id").cast(StringType)).as("src"),
        concat(lit("K"),
          get_json_object(col("props"), "$.k")).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val sym = p.unionByName(
      p.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    graft.ext.PageRank.weightedRanks(sym, iterations = 5)
      .select(col("v").as("node"), col("r").as("rank_units"))
      .orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_triangle_count" -> (g_triangle_count _),
    "lineage_closure" -> (lineage_closure _),
    "g_pagerank" -> (g_pagerank _),
    "g_pagerank_weighted" -> (g_pagerank_weighted _))

  val oracle: Map[String, String] = Map(
    // same edge set, triangles counted the textbook way (a<b<c join);
    // the Spark side's degree orientation counts each triangle once at
    // its order-minimal corner — same census
    "g_triangle_count" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS k
        |            FROM lineitem),
        |co AS (SELECT x.k AS a, y.k AS b, COUNT(*) AS n_shared
        |       FROM ps x JOIN ps y ON x.p = y.p AND x.k < y.k
        |       GROUP BY 1, 2),
        |thr AS (SELECT CAST(SUM(n_shared) AS DOUBLE) / COUNT(*)
        |         + 2.0 * sqrt((CAST(SUM(n_shared*n_shared) AS DOUBLE)
        |            - CAST(SUM(n_shared) AS DOUBLE) * SUM(n_shared)
        |              / COUNT(*)) / COUNT(*)) AS thr FROM co),
        |e AS (SELECT a, b FROM co, thr
        |      WHERE CAST(n_shared AS DOUBLE) >= thr)
        |SELECT
        | (SELECT COUNT(DISTINCT v) FROM
        |   (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)) AS n_nodes,
        | (SELECT COUNT(*) FROM e) AS n_edges,
        | (SELECT COUNT(*) FROM e e1
        |   JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |   JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles""".stripMargin,
    // identical closure via a recursive CTE (UNION dedups generations,
    // so the recursion terminates at the DAG depth)
    "lineage_closure" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS src,
        |         'N' || CAST(s_nationkey AS VARCHAR) AS dst FROM supplier
        |  UNION ALL
        |  SELECT 'C' || CAST(c_custkey AS VARCHAR),
        |         'N' || CAST(c_nationkey AS VARCHAR) FROM customer
        |  UNION ALL
        |  SELECT 'N' || CAST(n_nationkey AS VARCHAR),
        |         'R' || CAST(n_regionkey AS VARCHAR) FROM nation
        |  UNION ALL
        |  SELECT 'O' || CAST(o_orderkey AS VARCHAR),
        |         'C' || CAST(o_custkey AS VARCHAR) FROM orders
        |  WHERE o_orderkey <= 500),
        |reach AS (
        |  SELECT src, dst AS anc FROM edges
        |  UNION
        |  SELECT r.src, e.dst AS anc FROM reach r
        |  JOIN edges e ON r.anc = e.src)
        |SELECT src AS node, anc FROM reach
        |ORDER BY node, anc""".stripMargin,
    // weighted twin: the same unrolled integer iterations with
    // contribution (r * w) // W_out — bit-for-bit like the uniform row
    "g_pagerank_weighted" -> {
      val step = (k: Int) =>
        s"""c$k AS (SELECT e.dst AS v,
           |         CAST(SUM((p.r * e.w) // dg.d) AS BIGINT) AS c
           |       FROM edges e JOIN pr${k - 1} p ON p.v = e.src
           |       JOIN deg dg ON dg.v = e.src GROUP BY e.dst),
           |pr$k AS (SELECT n.v,
           |        (SELECT b FROM base) + (COALESCE(c$k.c, 0) * 85) // 100 AS r
           |        FROM nodes n LEFT JOIN c$k ON c$k.v = n.v)""".stripMargin
      s"""WITH p AS (
         |  SELECT 'U' || CAST(user_id AS VARCHAR) AS src,
         |         'K' || json_extract_string(props, '$$.k') AS dst,
         |         count(*) AS wt
         |  FROM events WHERE event_type = 'purchase'
         |    AND json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2),
         |edges AS (SELECT src, dst, CAST(SUM(wt) AS BIGINT) AS w FROM
         |  (SELECT src, dst, wt FROM p
         |   UNION ALL SELECT dst, src, wt FROM p) GROUP BY 1, 2),
         |nodes AS (SELECT DISTINCT src AS v FROM edges),
         |deg AS (SELECT src AS v, CAST(SUM(w) AS BIGINT) AS d
         |        FROM edges GROUP BY 1),
         |base AS (SELECT (1000000000000 * 15 // 100) // COUNT(*) AS b FROM nodes),
         |pr0 AS (SELECT v, 1000000000000 // (SELECT COUNT(*) FROM nodes) AS r
         |        FROM nodes),
         |${(1 to 5).map(step).mkString(",\n")}
         |SELECT v AS node, r AS rank_units FROM pr5 ORDER BY node""".stripMargin
    },
    // identical five fixed-point iterations unrolled as CTEs: every
    // step is integer arithmetic (// floors like Spark's div), so the
    // rank units match bit-for-bit
    "g_pagerank" -> {
      val step = (k: Int) =>
        s"""c$k AS (SELECT e.dst AS v, CAST(SUM(p.r // dg.d) AS BIGINT) AS c
           |       FROM edges e JOIN pr${k - 1} p ON p.v = e.src
           |       JOIN deg dg ON dg.v = e.src GROUP BY e.dst),
           |pr$k AS (SELECT n.v,
           |        (SELECT b FROM base) + (COALESCE(c$k.c, 0) * 85) // 100 AS r
           |        FROM nodes n LEFT JOIN c$k ON c$k.v = n.v)""".stripMargin
      s"""WITH fk AS (
         |  SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS src,
         |         'N' || CAST(s_nationkey AS VARCHAR) AS dst FROM supplier
         |  UNION ALL
         |  SELECT 'C' || CAST(c_custkey AS VARCHAR),
         |         'N' || CAST(c_nationkey AS VARCHAR) FROM customer
         |  UNION ALL
         |  SELECT 'N' || CAST(n_nationkey AS VARCHAR),
         |         'R' || CAST(n_regionkey AS VARCHAR) FROM nation),
         |edges AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM fk UNION ALL SELECT dst, src FROM fk)),
         |nodes AS (SELECT DISTINCT src AS v FROM edges),
         |deg AS (SELECT src AS v, COUNT(*) AS d FROM edges GROUP BY 1),
         |base AS (SELECT (1000000000000 * 15 // 100) // COUNT(*) AS b FROM nodes),
         |pr0 AS (SELECT v, 1000000000000 // (SELECT COUNT(*) FROM nodes) AS r
         |        FROM nodes),
         |${(1 to 5).map(step).mkString(",\n")}
         |SELECT v AS node, r AS rank_units FROM pr5 ORDER BY node""".stripMargin
    })
}
