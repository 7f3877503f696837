package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-side source connectors (SURVEY §2.1 S5–S8). The
  * reference's connectors fetch live pages (`src/connectors/
  * eu_news.ts`, `globalautoregs.ts`) behind a governed fetcher
  * (robots.txt, per-domain rate limit, captcha denial —
  * `fetcher.ts:11-92`). In this engine a connector is anything that
  * yields a candidates DataFrame in the `candidateSchema` shape;
  * fetching itself stays outside the relational core. The HTML
  * harvest logic — link extraction, relative-URL normalization,
  * per-site path filters, first-wins ordering — IS in scope and is
  * implemented relationally below so it scales over a corpus of
  * fetched pages (`binaryFile`/text sources at 100 TB).
  */
object Connectors {

  /** Candidate shape consumed by `jobs.ScanJob`. */
  val candidateSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("published_date", StringType),
    StructField("connector", StringType),
    StructField("connector_rank", IntegerType)))

  trait SourceConnector {
    def name: String
    /** Priority for first-wins dedup (lower wins, D1). */
    def rank: Int
    def candidates(spark: SparkSession): DataFrame
  }

  /** Harvest `<a href>` targets from pages of raw HTML
    * (ref `eu_news.ts:11-53`): extract anchors, resolve relative URLs
    * against the page URL's origin, apply a path-prefix filter,
    * distinct-keep-first. Pure column expressions over a
    * (page_url, html) DataFrame — one scan, no UDF in the hot path. */
  def harvestLinks(pages: DataFrame, pathFilter: String): DataFrame = {
    val origin = regexp_extract(col("page_url"), "^(https?://[^/]+)", 1)
    val hrefs = expr(
      "transform(regexp_extract_all(html, 'href=\"([^\"]+)\"', 1), h -> h)")
    pages
      .withColumn("_origin", origin)
      .withColumn("href", explode(hrefs))
      .withColumn("link",
        when(col("href").startsWith("http"), col("href"))
          .when(col("href").startsWith("/"), concat(col("_origin"), col("href")))
          .otherwise(concat(col("_origin"), lit("/"), col("href"))))
      .filter(
        coalesce(parse_url(col("link"), lit("PATH")), lit(""))
          .startsWith(pathFilter))
      .select(col("page_url"), col("link"))
      .dropDuplicates("link")
  }

  /** Extract a title from raw HTML with the reference's cascade
    * (og:title → `<title>` → first `<h1>`; `scan.ts:371-418`). */
  def extractTitle(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def nonEmptyOrNull(c: org.apache.spark.sql.Column) =
      when(length(c) > 0, c)
    coalesce(
      nonEmptyOrNull(regexp_extract(html,
        "property=\"og:title\"\\s+content=\"([^\"]+)\"", 1)),
      nonEmptyOrNull(regexp_extract(html, "(?s)<title>(.*?)</title>", 1)),
      nonEmptyOrNull(regexp_extract(html, "(?s)<h1[^>]*>(.*?)</h1>", 1)),
      lit("Untitled"))
  }

  /** Paragraph harvest: all `<p>` bodies joined, tags stripped,
    * capped at 4000 chars (`eu_news.ts:55-94` content cap). */
  def extractContent(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(
      regexp_replace(
        array_join(regexp_extract_all(html, lit("(?s)<p[^>]*>(.*?)</p>"), lit(1)), "\n"),
        "<[^>]+>", ""),
      1, 4000)

  /** A connector over an in-memory/table-backed page corpus: harvest →
    * fetch-join (article pages matched by link) → title/content
    * extraction → candidate shape. */
  final class HtmlCorpusConnector(
      override val name: String,
      override val rank: Int,
      listPages: DataFrame,     // (page_url, html)
      articlePages: DataFrame,  // (url, html, published_date)
      pathFilter: String) extends SourceConnector {
    override def candidates(spark: SparkSession): DataFrame = {
      val links = harvestLinks(listPages, pathFilter)
      links.join(articlePages, links("link") === articlePages("url"))
        .select(
          col("url"),
          extractTitle(col("html")).as("title"),
          extractContent(col("html")).as("content"),
          col("published_date"),
          lit(name).as("connector"),
          lit(rank).as("connector_rank"))
    }
  }

  /** Union candidates from many connectors (D4 heterogeneous union —
    * `unionByName` with missing columns allowed). */
  def unionCandidates(spark: SparkSession, connectors: Seq[SourceConnector]): DataFrame =
    connectors.map(_.candidates(spark))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], candidateSchema))
}
