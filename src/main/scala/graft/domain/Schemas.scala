package graft.domain

import org.apache.spark.sql.types._

/** Spark schemas for the domain tables (ref `db/schema.sql:3-143`,
  * typed JSON shapes from `packages/ontology/src/schemas.ts:16-33`).
  *
  * Typing decisions (SURVEY §1.3): TEXT→String, NUMERIC confidence→
  * Double (coerced with `Number()` in the reference), DATE→Date,
  * TIMESTAMPTZ→Timestamp (session UTC), TEXT[]→Array[String], fixed-
  * shape JSONB→StructType, open-map JSONB (`meta`, `payload`)→JSON
  * string with `from_json` on demand, VECTOR(n)→Array[Float].
  */
object Schemas {

  val engineeringAction: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("owner_role", StringType),
    StructField("due_date", StringType),
    StructField("artifact", StringType)))

  val citation: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("snippet", StringType)))

  val evidence: StructType = StructType(Seq(
    StructField("raw_file_uri", StringType),
    StructField("text_snapshot_uri", StringType),
    StructField("citations", ArrayType(citation))))

  /** `ontology_terms` (`schema.sql:3-8`). */
  val ontologyTerms: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("term_type", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("label", StringType)))

  /** `source_documents` (`schema.sql:10-19`). */
  val sourceDocuments: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("domain", StringType),
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("retrieved_at", TimestampType),
    StructField("hash", StringType),
    StructField("meta", StringType)))

  /** `regulation_items` (`schema.sql:21-45`) — the main fact table. */
  val regulationItems: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("jurisdiction", StringType),
    StructField("source_org", StringType),
    StructField("source_type", StringType),
    StructField("title", StringType),
    StructField("summary_1line", StringType),
    StructField("url", StringType),
    StructField("published_date", DateType),
    StructField("retrieved_at", TimestampType),
    StructField("effective_date", DateType),
    StructField("status", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("impacted_areas", ArrayType(StringType)),
    StructField("engineering_actions", ArrayType(engineeringAction)),
    StructField("evidence", evidence),
    StructField("confidence", DoubleType),
    StructField("notes", StringType),
    StructField("priority", StringType),
    StructField("trust_tier", StringType),
    StructField("monitoring_stage", StringType),
    StructField("source_profile_id", StringType),
    StructField("source_document_id", StringType),
    StructField("created_at", TimestampType)))

  /** `requirements` (`schema.sql:47-58`). */
  val requirements: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("requirement_family", StringType),
    StructField("markets", ArrayType(StringType)),
    StructField("vehicle_types", ArrayType(StringType)),
    StructField("functions", ArrayType(StringType)),
    StructField("owner", StringType),
    StructField("evidence_status", StringType),
    StructField("priority", StringType),
    StructField("source_item_id", StringType),
    StructField("created_at", TimestampType)))

  /** `evidence` normalized table (`schema.sql:60-66`) — declared but
    * never read/written by the reference; schema-only. */
  val evidenceTable: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("item_id", StringType),
    StructField("kind", StringType),
    StructField("uri", StringType),
    StructField("created_at", TimestampType)))

  /** `runs` (`schema.sql:68-78`). */
  val runs: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("run_type", StringType),
    StructField("jurisdiction", StringType),
    StructField("days_window", IntegerType),
    StructField("status", StringType),
    StructField("started_at", TimestampType),
    StructField("completed_at", TimestampType),
    StructField("meta", StringType),
    StructField("job_id", StringType)))

  /** `review_queue` (`schema.sql:80-89`). */
  val reviewQueue: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("entity_type", StringType),
    StructField("payload", StringType),
    StructField("reason", StringType),
    StructField("status", StringType),
    StructField("created_at", TimestampType),
    StructField("reviewed_at", TimestampType),
    StructField("reviewer", StringType)))

  /** `links` typed edge table (`schema.sql:91-102`); uniqueness over
    * the 5-tuple is enforced by insert-if-absent writes. */
  val links: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("from_type", StringType),
    StructField("from_id", StringType),
    StructField("to_type", StringType),
    StructField("to_id", StringType),
    StructField("relation", StringType),
    StructField("created_at", TimestampType)))

  /** `vector_stores` registry (`schema.sql:104-112`). */
  val vectorStores: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("provider", StringType),
    StructField("external_id", StringType),
    StructField("status", StringType),
    StructField("created_at", TimestampType),
    StructField("meta", StringType)))

  /** `vector_chunks` (`schema.sql:114-125`). */
  val vectorChunks: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document_id", StringType),
    StructField("chunk_index", IntegerType),
    StructField("text", StringType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("vector_store_id", StringType),
    StructField("created_at", TimestampType)))

  /** `app_config` key/value (`schema.sql:127-131`). */
  val appConfig: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType),
    StructField("updated_at", TimestampType)))

  /** `run_logs` append-only progress log (`schema.sql:133-143`). */
  val runLogs: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("run_id", StringType),
    StructField("stage", StringType),
    StructField("message", StringType),
    StructField("meta", StringType),
    StructField("created_at", TimestampType)))

  /** Table name → (schema, primary key columns). */
  val tables: Map[String, (StructType, Seq[String])] = Map(
    "ontology_terms" -> (ontologyTerms, Seq("value")),
    "source_documents" -> (sourceDocuments, Seq("id")),
    "regulation_items" -> (regulationItems, Seq("id")),
    "requirements" -> (requirements, Seq("id")),
    "evidence" -> (evidenceTable, Seq("id")),
    "runs" -> (runs, Seq("id")),
    "review_queue" -> (reviewQueue, Seq("id")),
    "links" -> (links, Seq("from_type", "from_id", "to_type", "to_id", "relation")),
    "vector_stores" -> (vectorStores, Seq("id")),
    "vector_chunks" -> (vectorChunks, Seq("id")),
    "app_config" -> (appConfig, Seq("key")),
    "run_logs" -> (runLogs, Seq("id")))
}
