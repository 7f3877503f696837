package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected simple graph
  * (§2 graph-analytics extension; sibling of the connected-components /
  * canonical-dedup pipeline in `queries.TextSim`).
  *
  * The classic scale hazard of triangle counting is the wedge join: a
  * naive self-join of the edge list on a shared endpoint generates
  * deg(v)² wedge candidates per vertex, so one celebrity vertex owns the
  * job. The standard answer (node-iterator++ / the Cohen MapReduce
  * recipe) is DEGREE ORIENTATION: direct every undirected edge from its
  * (degree, id)-smaller endpoint to the larger one. The oriented
  * out-degree of ANY vertex — including hubs — is O(√m), because a
  * vertex with out-degree d has d neighbors of degree ≥ d, which needs
  * ≥ d²/2 edges. Wedges are then enumerated from out-edges only
  * (Σ outdeg² ≤ m·√m instead of Σ deg² unbounded), and each triangle
  * is found exactly once, at its order-minimal corner.
  *
  * Everything is joins + aggregates on keyed shuffles — no windows, no
  * driver-side state; AQE picks broadcast vs shuffle per stage.
  */
object Graph {

  /** Count triangles in the graph given as canonical undirected edges:
    * columns `a`, `b` with `a < b`, deduplicated, no self-loops.
    * Returns one row: `n_triangles` (BIGINT).
    *
    * Each triangle {x,y,z} with (deg,id)-order x < y < z carries
    * oriented edges x→y, x→z, y→z; it is counted exactly once, as the
    * wedge (y,z) at x closed by y→z. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

    // total order = (deg, id); orient each edge small → large
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("deg_b")), Seq("b"))
    val aFirst = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    // keep the head's (deg, id) so wedge endpoints compare in the SAME
    // total order without re-joining degrees. Materialize ONCE
    // (localCheckpoint, same m-row footprint as the edge list): three
    // branches read it (both wedge sides + the closing probe) and
    // would otherwise each re-run the degree join.
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("deg_b")).otherwise(col("deg_a")).as("deg_dst"))
      .localCheckpoint(true)

    // wedges at the order-minimal corner: two out-edges, heads ordered
    val o1 = oriented.select(col("src"), col("dst").as("v"),
      col("deg_dst").as("deg_v"))
    val o2 = oriented.select(col("src"), col("dst").as("w"),
      col("deg_dst").as("deg_w"))
    val wedges = o1.join(o2, Seq("src"))
      .filter(col("deg_v") < col("deg_w") ||
        (col("deg_v") === col("deg_w") && col("v") < col("w")))
      .select(col("v"), col("w"))

    // a wedge closes iff the oriented edge v→w exists (v is order-
    // smaller, so the closing edge can only be oriented v→w)
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    // semi join keeps left multiplicity: one row per (x, v, w) wedge
    // whose closing edge exists = one row per triangle
    wedges.join(closing, Seq("v", "w"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Node/edge/triangle summary in one row — the dashboard shape.
    * The edge list is consumed by several branches (node census, edge
    * count, degrees, wedge join, closing-edge probe); when deriving it
    * is expensive (e.g. a co-occurrence self-join), recomputing it per
    * branch dominates — so cache the thresholded edge set once. It is
    * the SMALL end of the pipeline (the whole point of the threshold),
    * so the cache is bounded WHILE IT LIVES — but a census is a
    * one-shot consumer, so the cache must not outlive it: the one-row
    * result is materialized eagerly (`localCheckpoint`) and the edge
    * cache released before returning, instead of pinning executor
    * storage for the rest of the session. */
  def summary(edges: DataFrame): DataFrame = {
    val e = edges.cache()
    try {
      val nodes = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .agg(count_distinct(col("v")).as("n_nodes"))
      val es = e.agg(count(lit(1)).as("n_edges"))
      nodes.crossJoin(es).crossJoin(triangleCount(e)).localCheckpoint(true)
    } finally e.unpersist()
  }
}
