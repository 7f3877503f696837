package graft

import org.apache.spark.sql.functions._

import graft.api.{AnalyticsQueries, Lineage}
import graft.core.Warehouse
import graft.jobs.{RunTracker, ScanJob}
import graft.pipeline.{HashEmbedder, RuleExtractor}

/** Read-side query surface (SURVEY §3.3, M4) driven end-to-end on a
  * warehouse populated by a real ScanJob run.
  */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: Warehouse = {
    val w = new Warehouse(spark, tmpDir("api"))
    w.createAll()
    new RunTracker(w).create("run-api", "scan", "EU", 30, t0)
    val candidates = Seq(
      ("https://eur-lex.europa.eu/eli/reg/2024/1689", "AI Act",
        "urgent binding ai act cybersecurity regulation text",
        "2026-01-10", "eu_news", 0),
      ("https://commission.europa.eu/news-and-media/news_en/item-2",
        "Commission news", "guidance on software update", "2026-01-12",
        "eu_news", 0),
      ("https://unece.org/r157", "UN R157",
        "automated driving type approval", "2026-01-11", "eu_news", 0))
      .toDF("url", "title", "content", "published_date", "connector",
        "connector_rank")
    ScanJob.run(w, candidates, ScanJob.Params("run-api", "EU", 60, 10, 0.5, t0),
      RuleExtractor, new HashEmbedder(8))
    w
  }

  private lazy val api = new AnalyticsQueries(wh)

  test("dashboardStats: one pass, buckets sum to total (DashboardStats shape)") {
    val row = api.dashboardStats().collect()(0)
    val total = row.getAs[Long]("total_items")
    assert(total === wh.domainTable("regulation_items").read.count())
    val byJur = graft.domain.Terms.Jurisdictions
      .map(j => row.getAs[Long](s"jurisdiction_$j")).sum
    val byStatus = graft.domain.Terms.ItemStatuses
      .map(s0 => row.getAs[Long](s"status_$s0")).sum
    val byPriority = graft.domain.Terms.Priorities
      .map(p => row.getAs[Long](s"priority_$p")).sum
    assert(byJur === total && byStatus === total && byPriority === total)
    assert(row.getAs[Long]("pending_review") >= 0)
  }

  test("listItems / lastRun / recentItems / alerts") {
    assert(api.listItems().count() ===
      wh.domainTable("regulation_items").read.count())
    val run = api.lastRun().collect()(0)
    assert(run.getAs[String]("id") === "run-api")
    assert(run.getAs[String]("status") === "completed")
    assert(api.recentItems(1).count() === 1)
    api.alerts().collect().foreach(r =>
      assert(r.getAs[String]("priority") === "P0"))
  }

  test("searchItems: text + facet filters compose") {
    val all = api.searchItems()
    assert(all.count() === api.listItems().count())
    val hits = api.searchItems(query = "ai act")
    assert(hits.count() >= 1)
    hits.collect().foreach { r =>
      val txt = (r.getAs[String]("title") + " " +
        r.getAs[String]("summary_1line")).toLowerCase
      assert(txt.contains("ai act"))
    }
    val none = api.searchItems(query = "ai act",
      jurisdiction = Some("PL"))
    assert(none.count() === 0)
  }

  test("displayItems: main wins over review payloads by id") {
    val display = api.displayItems()
    val mainIds = wh.domainTable("regulation_items").read
      .select("id").as[String].collect().toSet
    val rows = display.select("id", "_origin").as[(String, String)].collect()
    // no id appears twice, and every main id is attributed to main
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.filter(r => mainIds.contains(r._1))
      .foreach(r => assert(r._2 === "main"))
    // pending review rows not in main appear with review origin
    assert(rows.exists(_._2 === "review"))
  }

  test("vectorStats and grouped vectorDocuments") {
    val stats = api.vectorStats().collect()(0)
    assert(stats.getAs[Long]("chunk_count") === 3)
    assert(stats.getAs[Long]("document_count") === 3)
    val docs = api.vectorDocuments().collect()
    assert(docs.length === 3)
    assert(docs.forall(_.getAs[Long]("chunk_count") === 1))
  }

  test("runLogs ordered ascending per run") {
    val logs = new AnalyticsQueries(wh).runLogs("run-api")
      .select("stage").as[String].collect()
    assert(logs.nonEmpty)
    assert(logs.head === "detect")
    assert(logs.last === "complete")
  }

  test("lineage graph: typed nodes, deduped edges, no dangling references") {
    val g = new Lineage(wh).graph()
    val nodes = g.nodes.select("node_type", "node_id")
      .as[(String, String)].collect().toSet
    val edges = g.edges.collect()
    assert(edges.nonEmpty)
    // every edge endpoint resolves to a node (placeholders included)
    edges.foreach { e =>
      assert(nodes.contains((e.getAs[String]("from_type"),
        e.getAs[String]("from_id"))))
      assert(nodes.contains((e.getAs[String]("to_type"),
        e.getAs[String]("to_id"))))
    }
    // citation fan-out produced Evidence nodes with supported_by edges
    assert(nodes.exists(_._1 == "Evidence"))
    assert(edges.exists(_.getAs[String]("relation") == "supported_by"))
    // 5-tuple dedup holds
    val keys = edges.map(e => (e.getAs[String]("from_type"),
      e.getAs[String]("from_id"), e.getAs[String]("to_type"),
      e.getAs[String]("to_id"), e.getAs[String]("relation")))
    assert(keys.distinct.length === keys.length)
  }

  test("lineage multi-hop walk: descendants/ancestors with minimal hops") {
    val lin = new Lineage(wh)
    val g = lin.graph()
    val edges = g.edges
      .select("from_type", "from_id", "to_type", "to_id")
      .as[(String, String, String, String)].collect()
    assert(edges.nonEmpty)
    // direct edge → 1-hop descendant, and the inverse 1-hop ancestor
    val (ft, fi, tt, ti) = edges.head
    val desc = lin.descendants(g, ft, fi)
      .as[(String, String, Int)].collect()
    assert(desc.contains((tt, ti, 1)))
    val anc = lin.ancestors(g, tt, ti)
      .as[(String, String, Int)].collect()
    assert(anc.contains((ft, fi, 1)))
    // a 2-edge chain must surface in the walk (hops ≤ 2: a shorter
    // parallel edge may exist, minimal distance wins)
    val chains = for {
      a <- edges; b <- edges
      if (a._3, a._4) == ((b._1, b._2)) && (a._1, a._2) != ((b._3, b._4))
    } yield (a, b)
    assert(chains.nonEmpty, "fixture has no 2-hop lineage chain")
    val (ca, cb) = chains.head
    val d2 = lin.descendants(g, ca._1, ca._2)
      .as[(String, String, Int)].collect()
    assert(d2.exists(r => r._1 == cb._3 && r._2 == cb._4 && r._3 <= 2))
  }
}
