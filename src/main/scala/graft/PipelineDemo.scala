package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.{AnalyticsQueries, Lineage}
import graft.core.Warehouse
import graft.domain.{RuntimeConfig, Seeder}
import graft.jobs.{MergeJob, ReviewService, RunTracker, ScanJob}
import graft.pipeline.{HashEmbedder, RuleExtractor, RuleMerger}

/** End-to-end pipeline demo (SURVEY §3 lifecycle on a fresh warehouse):
  * seed → configure → scan run → merge run → review approve →
  * analytics + lineage readout.
  *
  *   tools/run_main.sh graft.PipelineDemo [warehouseDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-demo")
    import spark.implicits._
    val root = args.headOption.getOrElse(
      Files.createTempDirectory("graft-demo").toString)
    val now = Timestamp.valueOf("2026-01-15 12:00:00")

    val wh = new Warehouse(spark, root)
    wh.createAll()
    Seeder.run(wh, now)
    val cfg = new RuntimeConfig(wh)
    cfg.set("confidence_min", "0.5", now)
    val conf = cfg.load()
    println(s"[demo] warehouse=$root confidence_min=${conf.confidenceMin}")

    val candidates = Seq(
      ("https://eur-lex.europa.eu/eli/reg/2024/1689", "AI Act",
        "urgent binding ai act cybersecurity regulation", "2026-01-10", "eu_news", 0),
      ("https://commission.europa.eu/news-and-media/news_en/item-2",
        "Commission news", "guidance on software update and type approval",
        "2026-01-12", "eu_news", 0),
      ("https://unece.org/r157", "UN R157 amendment",
        "automated driving type approval un r157", "2026-01-11", "eu_news", 0),
      ("https://random.blog.example/post", "Blog",
        "battery blog", "2026-01-13", "web_search", 1))
      .toDF("url", "title", "content", "published_date", "connector",
        "connector_rank")

    new RunTracker(wh).create("run-scan", "scan", "EU", 30, now)
    val scan = ScanJob.run(wh, candidates,
      ScanJob.Params("run-scan", "EU", 30, 10, conf.confidenceMin, now),
      RuleExtractor, new HashEmbedder(64))
    println(s"[demo] scan: discovered=${scan.discovered} " +
      s"accepted=${scan.accepted} review=${scan.review} vectors=${scan.vectorCount}")

    new RunTracker(wh).create("run-merge", "merge", "EU", 0, now)
    val merge = MergeJob.run(wh,
      MergeJob.Params("run-merge", "EU", conf.confidenceMin, now), RuleMerger)
    println(s"[demo] merge: merged=${merge.merged} radar=${merge.radar} " +
      s"review=${merge.review}")

    val firstPending = wh.domainTable("review_queue").read
      .filter(col("status") === "pending")
      .orderBy("created_at", "id").limit(1)
      .select("id").as[String].collect().headOption
    firstPending.foreach { id =>
      val status = new ReviewService(wh).approve(id, now)
      println(s"[demo] review approve($id) -> $status")
    }

    val api = new AnalyticsQueries(wh)
    println("[demo] dashboard:")
    api.dashboardStats().show(truncate = false)
    println("[demo] search 'ai act':")
    api.searchItems("ai act").select("id", "title", "trust_tier").show(false)
    val g = new Lineage(wh).graph()
    println(s"[demo] lineage: ${g.nodes.count()} nodes, ${g.edges.count()} edges")
    g.edges.groupBy("relation").count().orderBy("relation").show()
    spark.stop()
  }
}
