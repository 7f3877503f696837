package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Warehouse

/** Lineage graph assembly (SURVEY §2.3 J5/J6 + §2.13 UDTF; ref
  * `src/lineage.ts:26-132`): per-type node scans with the reference's
  * limits, edges = stored links ∪ FK-derived `extracted_from` ∪
  * citation fan-out (`posexplode` over `evidence.citations`),
  * placeholder nodes for dangling endpoints via anti-join.
  */
final class Lineage(wh: Warehouse) {

  case class Graph(nodes: DataFrame, edges: DataFrame)

  /** Every node reachable FROM `(nodeType, nodeId)` following edge
    * direction, with minimal hop count (the UI's expand-descendants
    * walk, `LineageGraph.tsx:48-76` — multi-hop, not the one-hop J5
    * assembly). Columns: node_type, node_id, hops (≥ 1). */
  def descendants(g: Graph, nodeType: String, nodeId: String,
      maxHops: Int = 20): DataFrame =
    walk(g, nodeType, nodeId, forward = true, maxHops)

  /** Every node that can reach `(nodeType, nodeId)` — the provenance
    * chain (expand-ancestors). Columns: node_type, node_id, hops. */
  def ancestors(g: Graph, nodeType: String, nodeId: String,
      maxHops: Int = 20): DataFrame =
    walk(g, nodeType, nodeId, forward = false, maxHops)

  private def walk(g: Graph, nodeType: String, nodeId: String,
      forward: Boolean, maxHops: Int): DataFrame = {
    // composite node key: types are fixed literal names (never contain
    // ':'), so the first ':' always splits correctly
    def key(t: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      concat(t, lit(":"), i)
    val edges =
      if (forward) g.edges.select(
        key(col("from_type"), col("from_id")).as("src"),
        key(col("to_type"), col("to_id")).as("dst"))
      else g.edges.select(
        key(col("to_type"), col("to_id")).as("src"),
        key(col("from_type"), col("from_id")).as("dst"))
    val spark = g.edges.sparkSession
    import spark.implicits._
    val seed = Seq(s"$nodeType:$nodeId").toDF("id")
    graft.ext.Closure.reachFrom(edges, seed, maxHops).pairs
      .filter(col("hops") > 0)
      .select(
        substring_index(col("id"), ":", 1).as("node_type"),
        expr("substring(id, instr(id, ':') + 1)").as("node_id"),
        col("hops"))
      .orderBy("hops", "node_type", "node_id")
  }

  def graph(runLimit: Int = 50, docLimit: Int = 200, itemLimit: Int = 200,
      reqLimit: Int = 200): Graph = {
    val runs = wh.domainTable("runs").read
      .orderBy(desc("started_at"), asc("id")).limit(runLimit)
      .select(lit("Run").as("node_type"), col("id").as("node_id"),
        coalesce(col("run_type"), lit("run")).as("label"))
    val docs = wh.domainTable("source_documents").read
      .orderBy(desc("retrieved_at"), asc("id")).limit(docLimit)
      .select(lit("SourceDocument").as("node_type"), col("id").as("node_id"),
        coalesce(col("title"), col("url")).as("label"))
    val itemsDf = wh.domainTable("regulation_items").read
      .orderBy(desc("created_at"), asc("id")).limit(itemLimit)
    val items = itemsDf
      .select(lit("RegulationItem").as("node_type"), col("id").as("node_id"),
        col("title").as("label"))
    val reqs = wh.domainTable("requirements").read
      .orderBy(desc("created_at"), asc("id")).limit(reqLimit)
      .select(lit("Requirement").as("node_type"), col("id").as("node_id"),
        col("requirement_family").as("label"))

    // §2.13 — citation fan-out: one Evidence node + supported_by edge
    // per (item, citation ordinal), `lineage.ts:114-128`.
    val citations = itemsDf
      .select(col("id").as("item_id"),
        posexplode(coalesce(col("evidence.citations"),
          array())).as(Seq("pos", "cit")))
    val citationNodes = citations.select(
      lit("Evidence").as("node_type"),
      concat(col("item_id"), lit("-ev-"), col("pos")).as("node_id"),
      coalesce(col("cit.title"), col("cit.url"), lit("citation")).as("label"))
    val citationEdges = citations.select(
      lit("RegulationItem").as("from_type"), col("item_id").as("from_id"),
      lit("Evidence").as("to_type"),
      concat(col("item_id"), lit("-ev-"), col("pos")).as("to_id"),
      lit("supported_by").as("relation"))

    // J6 — FK-derived edges.
    val fkEdges = itemsDf.filter(col("source_document_id").isNotNull)
      .select(
        lit("SourceDocument").as("from_type"),
        col("source_document_id").as("from_id"),
        lit("RegulationItem").as("to_type"), col("id").as("to_id"),
        lit("extracted_from").as("relation"))

    val stored = wh.domainTable("links").read
      .select("from_type", "from_id", "to_type", "to_id", "relation")

    // D2 — edge-set dedup on the 5-tuple.
    val edges = stored.unionByName(fkEdges).unionByName(citationEdges)
      .dropDuplicates("from_type", "from_id", "to_type", "to_id", "relation")

    val declared = Seq(runs, docs, items, reqs, citationNodes).reduce(_ unionByName _)

    // Placeholder nodes for dangling endpoints (`lineage.ts:88-101`).
    val endpoints = edges
      .select(col("from_type").as("node_type"), col("from_id").as("node_id"))
      .unionByName(
        edges.select(col("to_type").as("node_type"), col("to_id").as("node_id")))
      .distinct()
    val dangling = endpoints
      .join(declared.select("node_type", "node_id"), Seq("node_type", "node_id"),
        "left_anti")
      .withColumn("label", concat(col("node_type"), lit(" (external)")))

    Graph(declared.unionByName(dangling).dropDuplicates("node_type", "node_id"),
      edges)
  }
}
