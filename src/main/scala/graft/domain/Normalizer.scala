package graft.domain

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Ids

/** Review-payload normalizer (SURVEY §2.9 V6/V7; ref
  * `normalizeRegulationPayload`, `src/index.ts:427-488`): takes the
  * JSON `payload` column of `review_queue` rows (possibly dirty —
  * wrong-case enums, scalar topics, missing evidence, out-of-range
  * confidence) and produces typed `Schemas.regulationItems` columns
  * with the reference's defaulting rules.
  */
object Normalizer {

  /** Lenient parse shape: arrays-that-might-be-scalars read as strings
    * first, then coerced. */
  private val lenient: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("jurisdiction", StringType),
    StructField("source_org", StringType),
    StructField("source_type", StringType),
    StructField("title", StringType),
    StructField("summary_1line", StringType),
    StructField("url", StringType),
    StructField("published_date", StringType),
    StructField("retrieved_at", StringType),
    StructField("effective_date", StringType),
    StructField("status", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("impacted_areas", ArrayType(StringType)),
    StructField("engineering_actions",
      Schemas.regulationItems("engineering_actions").dataType),
    StructField("evidence", Schemas.evidence),
    StructField("confidence", DoubleType),
    StructField("notes", StringType),
    StructField("priority", StringType),
    StructField("trust_tier", StringType),
    StructField("monitoring_stage", StringType),
    StructField("source_profile_id", StringType),
    StructField("source_document_id", StringType)))

  private def normEnum(c: Column, domain: Seq[String], fallback: String): Column =
    when(c.isin(domain: _*), c).otherwise(lit(fallback))

  private def enumArray(c: Column, domain: Seq[String]): Column =
    filter(coalesce(c, array().cast(ArrayType(StringType))),
      t => t.isin(domain: _*))

  /** payloadCol (JSON string) → typed item columns; `fallbackNow` is
    * the injected clock for missing retrieved_at. */
  def normalizePayload(df: DataFrame, payloadCol: String,
      fallbackNow: Column): DataFrame = {
    val p = from_json(col(payloadCol), lenient)
    val ev = coalesce(p.getField("evidence"),
      struct(
        lit(null).cast(StringType).as("raw_file_uri"),
        lit(null).cast(StringType).as("text_snapshot_uri"),
        array().cast(ArrayType(Schemas.citation)).as("citations")))
    val evFixed = struct(
      ev.getField("raw_file_uri").as("raw_file_uri"),
      ev.getField("text_snapshot_uri").as("text_snapshot_uri"),
      coalesce(ev.getField("citations"),
        array().cast(ArrayType(Schemas.citation))).as("citations"))
    val title = when(
      p.getField("title").isNotNull && length(trim(p.getField("title"))) > 0,
      p.getField("title"))
      .otherwise(coalesce(p.getField("summary_1line"), lit("Untitled")))
    val summary = when(
      p.getField("summary_1line").isNotNull &&
        length(trim(p.getField("summary_1line"))) > 0,
      substring(p.getField("summary_1line"), 1, 400))
      .otherwise(substring(title, 1, 400))

    df.withColumn("_p", p)
      .withColumn("item", struct(
        coalesce(p.getField("id"),
          Ids.deterministicUuid(concat(lit("norm:"), col(payloadCol)))).as("id"),
        normEnum(p.getField("jurisdiction"), Terms.Jurisdictions, "EU")
          .as("jurisdiction"),
        when(p.getField("source_org").isNotNull &&
          length(trim(p.getField("source_org"))) > 0, p.getField("source_org"))
          .otherwise("Unknown").as("source_org"),
        normEnum(p.getField("source_type"), Terms.SourceTypes, "guidance")
          .as("source_type"),
        title.as("title"),
        summary.as("summary_1line"),
        // `get` (0-based) returns null out of bounds — element_at would
        // throw under ANSI mode when citations is empty
        coalesce(p.getField("url"),
          get(evFixed.getField("citations"), lit(0)).getField("url")).as("url"),
        to_date(substring(p.getField("published_date"), 1, 10)).as("published_date"),
        coalesce(to_timestamp(p.getField("retrieved_at")), fallbackNow)
          .cast(TimestampType).as("retrieved_at"),
        to_date(substring(p.getField("effective_date"), 1, 10)).as("effective_date"),
        normEnum(p.getField("status"), Terms.ItemStatuses, "unknown").as("status"),
        enumArray(p.getField("topics"), Terms.Topics).as("topics"),
        enumArray(p.getField("impacted_areas"), Terms.ImpactedAreas)
          .as("impacted_areas"),
        coalesce(p.getField("engineering_actions"),
          array().cast(Schemas.regulationItems("engineering_actions").dataType))
          .as("engineering_actions"),
        evFixed.as("evidence"),
        OntoFunctions.clamp01(coalesce(p.getField("confidence"), lit(0.7)))
          .as("confidence"),
        coalesce(p.getField("notes"), lit("")).as("notes"),
        normEnum(p.getField("priority"), Terms.Priorities, "P2").as("priority"),
        when(p.getField("trust_tier").isin(Terms.TrustTiers: _*),
          p.getField("trust_tier")).as("trust_tier"),
        when(p.getField("monitoring_stage").isin(Terms.MonitoringStages: _*),
          p.getField("monitoring_stage")).as("monitoring_stage"),
        p.getField("source_profile_id").as("source_profile_id"),
        p.getField("source_document_id").as("source_document_id"),
        fallbackNow.cast(TimestampType).as("created_at")))
      .drop("_p")
  }
}
