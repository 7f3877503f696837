package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.core.Warehouse
import graft.domain.{OntoFunctions, Policy, Schemas, Validator}
import graft.pipeline.{Embedder, Extractor, Ids}

/** Scan-run pipeline (SURVEY §3.1 re-architecture of
  * `src/jobs/scan.ts:18-105` + `src/services/scan.ts:41-168`):
  *
  *   candidates → dedupe-by-url (first-wins, D1) → null-passes recency
  *   filter (P9) → head maxResults (O3) → evaluateSource (V4) →
  *   extract (L1, injected) → validate (V1) → tier routing (V3) →
  *   insert-if-absent documents (S9) / upsert items (S10) / append
  *   review_queue (S12) / links fan-out (J6/J8) / run_logs + meta
  *   counters (A7).
  *
  * The reference's five process boundaries (HTTP → Redis → worker →
  * crawl → Postgres) collapse into Spark stages; the candidate source
  * is a DataFrame (connector output or fixture).
  *
  * Candidate schema: url, title, content, published_date (ISO string,
  * nullable), connector, connector_rank (int — connector priority
  * order, lower wins dedup).
  */
object ScanJob {

  /** Tables the persist phase writes — the [[graft.core.JobTxn]]
    * enlistment set (runs/run_logs excluded: status and progress must
    * survive a rolled-back job, as in the reference). */
  val persistTables: Seq[String] = Seq("source_documents", "vector_chunks",
    "regulation_items", "review_queue", "links", "vector_stores")

  case class Params(
      runId: String,
      jurisdiction: String,
      days: Int,
      maxResults: Int,
      confidenceMin: Double,
      now: Timestamp)

  case class Counters(discovered: Long, accepted: Long, review: Long,
      vectorCount: Long)

  def run(
      wh: Warehouse,
      candidates: DataFrame,
      params: Params,
      extractor: Extractor,
      embedder: Embedder,
      policy: Policy.TrustPolicy = Policy.referencePolicy): Counters = {
    val spark = wh.spark
    val tracker = new RunTracker(wh)
    tracker.setStatus(params.runId, "running")
    tracker.log(params.runId, "detect",
      s"scanning ${params.jurisdiction} (last ${params.days} days)", params.now)
    try {
      // the reference wraps the persist block in one Postgres
      // transaction (jobs/scan.ts:35-94): a failed job leaves no
      // partial doc/item/review/link state. Same boundary here —
      // run status + logs stay OUTSIDE (they must survive a failure).
      val counters =
        if (wh.transactional)
          wh.jobTxn(ScanJob.persistTables)(
            execute(wh, candidates, params, extractor, embedder, policy, tracker))
        else execute(wh, candidates, params, extractor, embedder, policy, tracker)
      tracker.log(params.runId, "complete",
        s"scan done: discovered ${counters.discovered} / accepted ${counters.accepted} / review ${counters.review}",
        params.now)
      tracker.complete(params.runId, JsonUtil.obj(
        "discovered" -> counters.discovered,
        "errors" -> JsonUtil.RawJson("[]"),
        "vector_count" -> counters.vectorCount,
        "accepted" -> counters.accepted,
        "review" -> counters.review), params.now)
      counters
    } catch {
      case e: Exception =>
        tracker.fail(params.runId, String.valueOf(e.getMessage), params.now)
        throw e
    }
  }

  private def execute(
      wh: Warehouse,
      candidates: DataFrame,
      params: Params,
      extractor: Extractor,
      embedder: Embedder,
      policy: Policy.TrustPolicy,
      tracker: RunTracker): Counters = {
    val spark = wh.spark
    val now = lit(params.now)

    // D1 — first-wins dedup by canonical url: explicit precedence by
    // (connector_rank, url), never partition order (scan.ts:312-321).
    val canon = candidates.withColumn("c_url",
      OntoFunctions.canonicalizeUrl(col("url")))
    val byUrl = Window.partitionBy("c_url")
      .orderBy(asc("connector_rank"), asc("url"))
    val deduped = canon
      .withColumn("_rn", row_number().over(byUrl))
      .filter(col("_rn") === 1).drop("_rn")

    // P9 — null-passes recency window (scan.ts:420-429): null or
    // unparseable published_date is KEPT.
    val fresh = deduped.filter(
      col("published_date").isNull ||
        to_date(substring(col("published_date"), 1, 10)).isNull ||
        to_date(substring(col("published_date"), 1, 10)) >=
          date_sub(to_date(now), params.days))

    val discovered = fresh.count()
    tracker.log(params.runId, "triage", s"$discovered candidates after dedup+recency",
      params.now)

    // O3 — head maxResults in deterministic precedence order.
    val limited = fresh
      .orderBy(asc("connector_rank"), asc("c_url"))
      .limit(params.maxResults)

    // V4 — trust policy evaluation (broadcast joins, no input shuffle).
    val evaluated = Policy.evaluateSource(spark, limited.drop("c_url"), "url", policy)

    // Source documents (S9 insert-if-absent) with deterministic ids.
    val docs = evaluated.select(
      Ids.deterministicUuid(concat(lit("doc:"), col("canonical_url"))).as("id"),
      col("canonical_url").as("url"),
      col("s_domain").as("domain"),
      col("title"),
      col("content"),
      now.cast(TimestampType).as("retrieved_at"),
      OntoFunctions.contentHash(col("canonical_url"), col("title"))
        .cast(StringType).as("hash"),
      to_json(struct(
        col("published_date"),
        col("trust_tier"),
        col("monitoring_stage"),
        col("profile_id").as("source_profile_id"))).as("meta"),
      // carried for extraction only
      col("published_date").as("_published"),
      col("trust_tier").as("_tier"),
      col("monitoring_stage").as("_stage"),
      col("profile_id").as("_profile"))
      // materialized ONCE (batch-bounded): EIGHT consumers read this
      // frame (document insert, five ingest sketch batches, the embed
      // input, the extraction input, the lineage links) and each
      // would otherwise re-run the dedupe-window + recency + policy
      // pipeline over the candidate batch (r21, guide §1.2/§5). Also
      // required for durability: the review/link reads below survive
      // the source_documents directory swap insertIfAbsent performs.
      .localCheckpoint(true)

    val docTable = wh.domainTable("source_documents")
    docTable.insertIfAbsent(docs.drop("_published", "_tier", "_stage", "_profile"))

    // The five mergeable ingest sketches (HLL distincts, binned
    // histogram, Misra-Gries term frequencies, rank quantiles,
    // per-domain KMV) each summarize the SAME checkpointed batch frame
    // into its own store directory — five INDEPENDENT Spark jobs with
    // no data dependency between them or on anything later in the
    // scan. Submitted from a small thread pool so one job's straggler
    // tail back-fills the others' idle cores (guide §2.6: actions are
    // only sequential because the driver calls them sequentially);
    // each job's internal plan, partitioning, and output bytes are
    // unchanged — PipelineSpec still pins store contents. Failures
    // propagate: the pool is joined here, inside the jobTxn boundary.
    // Store semantics (one batch dir per run id, replay-idempotent
    // overwrite; the 32-bit-hash caveat on the HLL batchId) are
    // documented in each store.
    val sketchBatches: Seq[(String, () => Unit)] = Seq(
      "hll" -> (() =>
        graft.ext.DistinctSketch.addBatch(docs.select("url", "domain"),
          Seq("url", "domain"), s"${wh.root}/sketches/source_documents",
          batchId = params.runId.hashCode.toLong)),
      "histogram" -> (() =>
        graft.ext.HistogramSketch.addBatchKeyed(
          docs.select((floor(length(col("content")) / 200) * 200)
            .as("len_bucket")),
          Seq("len_bucket"), s"${wh.root}/sketches/source_documents",
          batchKey = params.runId)),
      "freq" -> (() =>
        graft.ext.FreqSketch.addBatchKeyed(
          docs.select(explode(graft.ext.Dedup.words(col("content")))
            .as("word")),
          "word", s"${wh.root}/sketches/source_documents_freq",
          batchKey = params.runId)),
      "quantile" -> (() =>
        graft.ext.QuantileSketch.addBatchKeyed(
          docs.select(length(col("content")).cast("double").as("len")),
          "len", s"${wh.root}/sketches/source_documents_quant",
          batchKey = params.runId)),
      "kmv" -> (() =>
        graft.ext.KmvSketch.addBatchGroupedKeyed(
          docs.select(col("domain"), col("url")),
          "domain", "url", s"${wh.root}/sketches/source_documents_kmvgrp",
          batchKey = params.runId)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      sketchBatches.map { case (label, job) =>
        label -> pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = job()
        })
      }.foreach { case (label, f) =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw new RuntimeException(s"ingest sketch batch '$label' failed",
              e.getCause)
        }
      }
    } finally { pool.shutdown(); () }

    // L3 — vectorize (embed title+content, 6000-char cap, single chunk
    // index 0; `vectorize.ts:6-33`).
    val localStoreId = ensureLocalStore(wh, params.now)
    val embedInput = docs.select(col("id"),
      OntoFunctions.truncate(
        concat_ws("\n\n", coalesce(col("title"), lit("")),
          coalesce(col("content"), lit(""))), 6000).as("text"))
    // the embedder preserves (id, text), so the chunk rows project
    // straight off its output — the previous shape re-joined the text
    // back on by id, a full shuffle of the 6000-char payload for
    // columns the embed input already carried (guide §8)
    val vectors = embedder.embed(embedInput, "id", "text")
      .select(
        Ids.deterministicUuid(concat(lit("chunk:"), col("id"))).as("id"),
        col("id").as("document_id"),
        lit(0).as("chunk_index"),
        col("text"),
        col("embedding"),
        lit(localStoreId).as("vector_store_id"),
        now.cast(TimestampType).as("created_at"))
      // embed runs ONCE: the insert and the counter both read the
      // materialized chunk frame instead of re-embedding (r21)
      .localCheckpoint(true)
    wh.domainTable("vector_chunks").insertIfAbsent(vectors)
    val vectorCount = vectors.count()

    tracker.log(params.runId, "extract", "structured extraction", params.now)

    // L1 — structured extraction (injected; stub is rule-based).
    val extractDocs = docs.select(col("id"), col("url"), col("title"),
      col("content"), col("_published").as("published_date"),
      col("_tier").as("trust_tier"), col("_stage").as("monitoring_stage"),
      col("_profile").as("profile_id"))
    val items = extractor.extract(extractDocs, params.jurisdiction, now)

    // V1 + V3 — validate then route. Eagerly materialized so the
    // review/counter reads below survive the regulation_items
    // directory swap performed by upsert (cache() is best-effort and
    // recomputation would re-run the whole extract pipeline).
    val routed = Validator.routeItems(
      Validator.validateItems(items, params.confidenceMin))
      .localCheckpoint(true)

    val accepted = routed.filter(col("_route") === "main")
      .drop("_valid", "_reason", "_route", "_review_reason")
    wh.domainTable("regulation_items").upsert(accepted)

    val review = routed.filter(col("_route") === "review_queue")
    val reviewRows = review.select(
      Ids.deterministicUuid(concat(lit("review:"), lit(params.runId), col("id"))).as("id"),
      lit("RegulationItem").as("entity_type"),
      to_json(struct(review.drop(
        "_valid", "_reason", "_route", "_review_reason").columns.map(col): _*))
        .as("payload"),
      col("_review_reason").as("reason"),
      lit("pending").as("status"),
      now.cast(TimestampType).as("created_at"),
      lit(null).cast(TimestampType).as("reviewed_at"),
      lit(null).cast(StringType).as("reviewer"))
    wh.domainTable("review_queue").append(reviewRows)

    // J6/J8 — lineage links fan-out (`scan.ts:107-160`).
    val runLit = lit(params.runId)
    val docLinks = docs.select(
      lit("Run").as("from_type"), runLit.as("from_id"),
      lit("SourceDocument").as("to_type"), col("id").as("to_id"),
      lit("produced").as("relation"))
    val acceptedLinks = accepted.select(
      lit("Run").as("from_type"), runLit.as("from_id"),
      lit("RegulationItem").as("to_type"), col("id").as("to_id"),
      lit("produced").as("relation"))
    val extractedLinks = routed.filter(col("source_document_id").isNotNull)
      .select(
        lit("SourceDocument").as("from_type"),
        col("source_document_id").as("from_id"),
        lit("RegulationItem").as("to_type"), col("id").as("to_id"),
        lit("extracted_from").as("relation"))
    val queuedLinks = review.select(
      lit("Run").as("from_type"), runLit.as("from_id"),
      lit("RegulationItem").as("to_type"), col("id").as("to_id"),
      lit("queued_for_review").as("relation"))
    val links = Seq(docLinks, acceptedLinks, extractedLinks, queuedLinks)
      .reduce(_ unionByName _)
      .withColumn("id", Ids.deterministicUuid(concat_ws("|",
        col("from_type"), col("from_id"), col("to_type"), col("to_id"),
        col("relation"))))
      .withColumn("created_at", now.cast(TimestampType))
    wh.domainTable("links").insertIfAbsent(links)

    val nAccepted = accepted.count()
    val nReview = review.count()
    routed.unpersist()
    Counters(discovered, nAccepted, nReview, vectorCount)
  }

  /** Exactly one provider='local' vector store
    * (`src/services/vectorize.ts:35-49`). */
  def ensureLocalStore(wh: Warehouse, now: Timestamp): String = {
    val stores = wh.domainTable("vector_stores")
    val spark = wh.spark
    val localId = "local-default-store"
    val row = org.apache.spark.sql.Row(
      localId, "Local Vector Store", "local", null, "ready", now, null)
    stores.insertIfAbsent(spark.createDataFrame(
      java.util.Arrays.asList(row), Schemas.vectorStores))
    localId
  }
}
