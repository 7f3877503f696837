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
/** One extracted binary document (see
  * [[Connectors.extractBinaryDocs]]). Top-level on purpose: a nested
  * private case class makes the Dataset encoder's generated code
  * unloadable by Janino (constructor not accessible), silently
  * dropping every extraction batch to the interpreted row path. */
final case class ExtractedDoc(
    path: String, title: String, text: String,
    modified: java.sql.Timestamp)

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

  // ---- S6: binary document extraction (ref globalautoregs.ts:93-121) ----

  /** Extracted text of one binary document. */
  final case class DocText(title: String, text: String)

  /** The .pdf/.docx text-extraction seam (the reference's
    * mammoth/pdf-parse step). A real deployment drops a PDFBox/POI
    * implementation behind this trait; the container ships no document
    * parser, so the default is a deterministic printable-run extractor
    * (honest stub, same pattern as
    * [[graft.ext.Multimodal.MediaDecoder]]). */
  trait DocExtractor extends Serializable {
    def extractText(path: String, content: Array[Byte]): DocText
  }

  /** Deterministic fake parser: printable-ASCII runs of ≥ 4 chars
    * become the text (works verbatim for text-bearing fixtures and
    * uncompressed PDF text operators); first run is the title. */
  final class PrintableTextExtractor(maxChars: Int = 20000) extends DocExtractor {
    override def extractText(path: String, content: Array[Byte]): DocText = {
      val raw = new String(
        if (content == null) Array.empty[Byte] else content, "ISO-8859-1")
      val runs = "[\\x20-\\x7E]{4,}".r.findAllIn(raw).toSeq
      val title = runs.headOption.getOrElse(
        path.substring(path.lastIndexOf('/') + 1))
      DocText(title.trim.take(200), runs.mkString("\n").take(maxChars))
    }
  }

  /** Run the extractor over a `binaryFile` DataFrame
    * (path/modificationTime/length/content rows): mapPartitions with
    * one extractor per partition — the bytes stream through executors,
    * never the driver, so a 100 TB document corpus partitions like any
    * other scan (`maxPartitionBytes` splits across files). */
  def extractBinaryDocs(spark: SparkSession, bin: DataFrame,
      extractor: DocExtractor): DataFrame = {
    import spark.implicits._
    bin.select(col("path"), col("modificationTime"), col("content"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .mapPartitions(_.map { case (p, m, c) =>
        val dt = extractor.extractText(p, c)
        ExtractedDoc(p, dt.title, dt.text, m)
      }).toDF()
  }

  /** S6 — connector over a directory of fetched binary documents
    * (`spark.read.format("binaryFile")`, glob-filtered to
    * `.pdf`/`.docx`/`.doc`): extract text per document, map the file
    * path to its source URL (`urlFor`), emit candidate rows. Mirrors
    * the reference's document branch that downloads attachments and
    * extracts their text before triage (`globalautoregs.ts:93-121`). */
  final class BinaryDocConnector(
      override val name: String,
      override val rank: Int,
      docsDir: String,
      urlFor: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      extractor: DocExtractor = new PrintableTextExtractor(),
      glob: String = "*.{pdf,docx,doc}") extends SourceConnector {
    override def candidates(spark: SparkSession): DataFrame = {
      val bin = spark.read.format("binaryFile")
        .option("pathGlobFilter", glob).load(docsDir)
      extractBinaryDocs(spark, bin, extractor)
        .select(
          urlFor(col("path")).as("url"),
          col("title"),
          substring(col("text"), 1, 4000).as("content"),
          date_format(col("modified"), "yyyy-MM-dd").as("published_date"),
          lit(name).as("connector"),
          lit(rank).as("connector_rank"))
    }
  }

  // ---- S8: web-search enrichment source (ref scan.ts:323-369) ----

  /** One result row from a search backend. */
  final case class SearchHit(query: String, url: String, title: String,
      snippet: String, publishedDate: String)

  /** The ONLY external boundary of S8 — the reference calls a hosted
    * `web_search` tool here (`scan.ts:331-340`, boundary #4). Bounded,
    * driver-side (a scan issues a handful of queries — control plane,
    * never data-proportional). Deterministic fixture in tests; a real
    * deployment plugs an HTTP client in. */
  trait SearchClient {
    def search(query: String, maxResults: Int): Seq[SearchHit]
  }

  final class FixtureSearchClient(hits: Map[String, Seq[SearchHit]])
      extends SearchClient {
    override def search(query: String, maxResults: Int): Seq[SearchHit] =
      hits.getOrElse(query, Nil).take(maxResults)
  }

  /** LOCAL search backend — a real, zero-egress implementation of the
    * [[SearchClient]] boundary: queries rank against the persisted
    * inverted text index ([[graft.ext.TextIndex]], the P6b layout)
    * over an ingested corpus, the enterprise-search fallback for a
    * deployment without the hosted `web_search` tool. Retrieval is
    * distinct-matched-terms ranking with doc-id tiebreak; the probe
    * partition-prunes to the query terms' buckets (driver-hashed →
    * `PartitionFilters`, texts read only for the ≤ maxResults
    * winners). Result URLs derive from the document's source
    * (`https://<source>.example/docs/<id>`) so the connector's domain
    * whitelist, canonicalization, dedup, and robots gates all apply
    * unchanged downstream. Bounded driver-side collect: maxResults
    * rows — control plane, never data-proportional. */
  final class IndexSearchClient(
      spark: SparkSession,
      idxDir: String,
      docs: DataFrame, // (doc_id, text, source)
      snippetChars: Int = 160) extends SearchClient {
    override def search(query: String, maxResults: Int): Seq[SearchHit] = {
      // [a-z]+ runs, NOT a split: query tokenization must agree with
      // the indexer's (Dedup.words) or digit-bearing terms ("error
      // 404", "spark3") produce tokens no posting can ever match
      val terms = "[a-z]+".r.findAllIn(query.toLowerCase)
        .toSeq.distinct
      if (terms.isEmpty) return Nil
      val ranked = graft.ext.TextIndex.postings(spark, idxDir, terms)
        .groupBy("doc_id")
        .agg(countDistinct("term").as("_matched"))
        .orderBy(col("_matched").desc, col("doc_id").asc)
        .limit(maxResults)
      ranked.join(docs, Seq("doc_id"))
        .orderBy(col("_matched").desc, col("doc_id").asc)
        .select(col("doc_id"), col("text"), col("source"))
        .collect()
        .map { r =>
          val (id, text, src) = (r.getLong(0), r.getString(1), r.getString(2))
          SearchHit(query, s"https://$src.example/docs/$id",
            text.split(" ").take(8).mkString(" "),
            text.take(snippetChars), "")
        }.toSeq
    }
  }

  /** S8 — everything AFTER the search API boundary, for real: the
    * reference's `allowed_domains` restriction re-expressed as a
    * domain post-filter, URL canonicalization (policy-driven UTM /
    * trailing-slash strip), per-URL first-wins dedup across queries,
    * robots admission via the governed fetcher's decision functions
    * (S7), then fetched-page decoration — pages the deployment
    * actually fetched join in their extracted title/content; hits
    * without a fetched page fall back to the search snippet (the
    * reference keeps those too, `scan.ts:352-365`). */
  final class WebSearchConnector(
      override val name: String,
      override val rank: Int,
      client: SearchClient,
      queries: Seq[String],
      allowedDomains: Seq[String],
      fetchedPages: DataFrame, // (url, html, published_date)
      policy: graft.domain.Policy.TrustPolicy =
        graft.domain.Policy.referencePolicy,
      robotsByDomain: Map[String, String] = Map.empty,
      userAgent: String = "graftbot",
      maxResultsPerQuery: Int = 10) extends SourceConnector {
    override def candidates(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val hits = queries.flatMap(q => client.search(q, maxResultsPerQuery))
      val raw = hits.toDF("query", "url", "title", "snippet", "published_date")
        .withColumn("url", graft.domain.OntoFunctions.canonicalizeUrl(col("url")))
      val allowed = raw.filter(
        graft.domain.OntoFunctions.isAllowedDomain(col("url"), allowedDomains))
      // first-wins per URL across queries (query order is precedence)
      val deduped = allowed
        .withColumn("_q", monotonically_increasing_id())
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("url").orderBy("_q")))
        .filter(col("_rn") === 1).drop("_q", "_rn")
      val admitted = graft.ingest.Fetching.robotsAdmitted(
        deduped, policy, robotsByDomain, userAgent)
      val pages = fetchedPages.select(
        col("url").as("p_url"), col("html"),
        col("published_date").as("p_published"))
      admitted.join(pages, admitted("url") === pages("p_url"), "left_outer")
        .select(
          col("url"),
          // extractTitle/-Content have their own last-resort fallbacks
          // ("Untitled"/empty), so gate on page presence, not null-ness
          when(col("html").isNotNull, extractTitle(col("html")))
            .otherwise(col("title")).as("title"),
          when(col("html").isNotNull, extractContent(col("html")))
            .otherwise(col("snippet")).as("content"),
          coalesce(col("p_published"), col("published_date"))
            .as("published_date"),
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
