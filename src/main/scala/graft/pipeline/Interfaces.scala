package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.domain.{OntoFunctions, Terms}

/** LLM-pipeline operator interfaces (SURVEY §2.10). The reference
  * calls OpenAI at these seams (`src/services/scan.ts:170-298`,
  * `merge.ts:12-131`, `vectorize.ts:6-33`); our engine defines the
  * seams as traits over DataFrames and ships deterministic local
  * implementations — the correctness target is relational, not LLM
  * fidelity. All stub logic is pure column expressions: it distributes
  * and codegens like any other operator.
  */
trait Extractor {
  /** source-document rows (id, url, title, content, + evaluation cols)
    * → regulation-item rows in the `Schemas.regulationItems` shape. */
  def extract(docs: DataFrame, jurisdiction: String, now: Column): DataFrame
}

trait Merger {
  /** Items of one jurisdiction → (mergedItems, radarTable, dataGaps,
    * summary). */
  def merge(spark: SparkSession, items: DataFrame, jurisdiction: String,
      now: Column): MergeOutput
}

case class MergeOutput(
    mergedItems: DataFrame,
    radarTable: DataFrame,
    dataGaps: DataFrame,
    summary: String)

trait Embedder {
  /** (id, text) → (id, text, embedding: Array[Float]) with `dim`
    * components. The input columns are PRESERVED in the output so a
    * caller that needs the text alongside the vector never re-joins
    * it back on — re-attaching a heavy payload by key costs a full
    * shuffle of the text (guide §8's re-attach trap). */
  def embed(docs: DataFrame, idCol: String, textCol: String): DataFrame
  def dim: Int
}

object Ids {
  /** Deterministic uuid-shaped id from a business key (replaces
    * `uuidv4()` so golden tests and oracle hashing are stable). */
  def deterministicUuid(key: Column): Column = {
    val h = md5(key.cast(StringType))
    lower(concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12)))
  }
}

/** Rule-based extraction stub: topic keywords, confidence derived
  * deterministically from the content hash, single-citation evidence
  * (mirrors the post-normalization the reference applies to LLM output,
  * `scan.ts:246-298`). */
object RuleExtractor extends Extractor {
  override def extract(docs: DataFrame, jurisdiction: String, now: Column): DataFrame = {
    val content = lower(coalesce(col("content"), lit("")))
    val topicHits = Terms.Topics.map { t =>
      when(content.contains(t.toLowerCase.replace('_', ' ')) ||
        content.contains(t.toLowerCase), t)
    }
    val topics = array_compact(array(topicHits: _*))
    val conf = (pmod(xxhash64(col("url")), lit(51)).cast(DoubleType) / 100.0) + 0.5

    docs.select(
      Ids.deterministicUuid(concat(lit("item:"), col("url"))).as("id"),
      lit(jurisdiction).as("jurisdiction"),
      OntoFunctions.determineSourceOrg(col("url")).as("source_org"),
      lit("guidance").as("source_type"),
      coalesce(col("title"), lit("Untitled")).as("title"),
      OntoFunctions.truncate(
        coalesce(nullif(col("content"), lit("")), col("title"), lit("(no content)")),
        400).as("summary_1line"),
      col("url"),
      to_date(substring(col("published_date"), 1, 10)).as("published_date"),
      now.cast(TimestampType).as("retrieved_at"),
      lit(null).cast(DateType).as("effective_date"),
      lit("unknown").as("status"),
      topics.as("topics"),
      array().cast(ArrayType(StringType)).as("impacted_areas"),
      array().cast(graft.domain.Schemas.regulationItems("engineering_actions").dataType)
        .as("engineering_actions"),
      struct(
        lit(null).cast(StringType).as("raw_file_uri"),
        lit(null).cast(StringType).as("text_snapshot_uri"),
        array(struct(
          coalesce(col("title"), lit("Untitled")).as("title"),
          col("url").as("url"),
          OntoFunctions.truncate(coalesce(col("content"), lit("")), 300)
            .as("snippet"))).as("citations")).as("evidence"),
      OntoFunctions.clamp01(conf).as("confidence"),
      lit("").as("notes"),
      OntoFunctions.normalizePriority(
        when(content.contains("urgent") || content.contains("critical"), "P0")
          .when(content.contains("high"), "P1").otherwise("P2")).as("priority"),
      col("trust_tier"),
      col("monitoring_stage"),
      col("profile_id").as("source_profile_id"),
      col("id").as("source_document_id"),
      now.cast(TimestampType).as("created_at"))
  }
}

/** Deterministic merge stub: dedups items by canonical url (highest
  * confidence wins), derives one radar requirement per topic family,
  * flags jurisdiction data gaps (mirrors the shape contract of
  * `services/merge.ts:59-123`). */
object RuleMerger extends Merger {
  override def merge(spark: SparkSession, items: DataFrame,
      jurisdiction: String, now: Column): MergeOutput = {

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url")
      .orderBy(desc("confidence"), asc("id"))
    val merged = items
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("id",
        Ids.deterministicUuid(concat(lit("merged:"), col("url"))))
      .withColumn("notes", lit("merged"))

    val radar = items
      .select(explode(col("topics")).as("topic"), col("priority"),
        col("evidence"))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n"),
        min(col("priority")).as("priority"),
        sum(when(size(col("evidence.citations")) > 0, 1).otherwise(0)).as("n_evidenced"))
      .select(
        Ids.deterministicUuid(concat(lit(s"req:$jurisdiction:"), col("topic"))).as("id"),
        col("topic").as("requirement_family"),
        array(lit(jurisdiction)).as("markets"),
        array(lit("M1")).as("vehicle_types"),
        array(col("topic")).as("functions"),
        lit("").as("owner"),
        when(col("n_evidenced") === col("n"), "complete")
          .when(col("n_evidenced") > 0, "partial")
          .otherwise("missing").as("evidence_status"),
        col("priority"),
        lit(null).cast(StringType).as("source_item_id"),
        now.cast(TimestampType).as("created_at"))

    val gaps = items
      .groupBy("status")
      .agg(count(lit(1)).as("n"))
      .filter(col("status") === "unknown" && col("n") > 0)
      .select(
        lit("status").as("area"),
        concat(lit("items with unknown status: "), col("n")).as("description"),
        lit("medium").as("severity"),
        lit("review source quality").as("recommendation"))

    MergeOutput(merged, radar, gaps,
      s"deterministic merge for $jurisdiction")
  }
}

/** Hash-projection embedding stub: dim deterministic features in
  * [-1, 1) from xxhash64(fingerprint, i), L2-normalized — pure column
  * expressions, no UDF, scales like any projection
  * (stands in for text-embedding-3-small, `vectorize.ts:18-19`). */
final class HashEmbedder(override val dim: Int = 64) extends Embedder {
  override def embed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = md5(coalesce(col(textCol), lit("")))
    // per-component expressions are UNROLLED (dim explicit columns)
    // instead of transform/aggregate higher-order lambdas over a
    // sequence array: HOFs run interpreted per element — ~3·dim lambda
    // evaluations per row in the scan hot loop — while the unrolled
    // form is one whole-stage-codegen projection. Values are
    // bit-identical: the same pmod(xxhash64(concat(fp, i)), 2000)
    // / 1000 − 1 per component, the same Σx² → sqrt norm, the same
    // float cast (cast(i as string) ≡ lit(i.toString)).
    val raws = (0 until dim).map(i =>
      (pmod(xxhash64(concat(col("_fp"), lit(i.toString))), lit(2000L))
        .cast(DoubleType) / lit(1000.0)) - lit(1.0))
    val norm = sqrt(raws.map(c => c * c).reduce(_ + _))
    val embedding = array(raws.map(c =>
      (c / greatest(col("_norm"), lit(1e-12))).cast("float")): _*)
    docs
      .withColumn("_fp", fp)
      .withColumn("_norm", norm)
      .withColumn("embedding", embedding)
      .select(col(idCol), col(textCol), col("embedding"))
  }
}
