package graft.domain

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.core.Warehouse

/** Runtime configuration over the `app_config` key/value table
  * (SURVEY §2.1 S11 / ref `src/config/runtime.ts:1-84`): typed getters
  * with the reference's defaults, key/value upsert, IN-list load (P4).
  * Model/API-key fields are carried as opaque config strings — the
  * engine's deterministic stubs ignore them.
  */
final class RuntimeConfig(wh: Warehouse) {

  val Keys: Seq[String] =
    Seq("openai_api_key", "openai_model", "reasoning_effort", "confidence_min")

  case class Values(
      openaiApiKey: String = "",
      openaiModel: String = "gpt-5.2",
      reasoningEffort: String = "medium",
      confidenceMin: Double = 0.7)

  private def table = wh.domainTable("app_config")

  /** P4 — load the known keys; missing keys fall back to defaults,
    * malformed numerics/enums are ignored like the reference. */
  def load(): Values = {
    val rows = table.read
      .filter(col("key").isin(Keys: _*))
      .select("key", "value")
      .collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val d = Values()
    Values(
      openaiApiKey = rows.getOrElse("openai_api_key", d.openaiApiKey),
      openaiModel = rows.getOrElse("openai_model", d.openaiModel),
      reasoningEffort = rows.get("reasoning_effort")
        .filter(Seq("low", "medium", "high").contains(_))
        .getOrElse(d.reasoningEffort),
      confidenceMin = rows.get("confidence_min")
        .flatMap(v => scala.util.Try(v.toDouble).toOption)
        .getOrElse(d.confidenceMin))
  }

  /** S11 — key/value upsert (`ON CONFLICT (key) DO UPDATE`). */
  def set(key: String, value: String, now: Timestamp): Unit =
    table.upsert(wh.spark.createDataFrame(
      java.util.Arrays.asList(Row(key, value, now)), Schemas.appConfig))
}

/** Ontology seeding (ref `src/scripts/seed.ts:38-51`): the 11 term
  * families into `ontology_terms` (insert-if-absent on value) plus the
  * local vector store row.
  */
object Seeder {
  def run(wh: Warehouse, now: Timestamp): Unit = {
    import wh.spark.implicits._
    val rows = Terms.Families.toSeq.sortBy(_._1).flatMap {
      case (family, values) => values.map(v => (family, v))
    }.zipWithIndex.map { case ((family, v), i) =>
      (i + 1, family, v, v)
    }.toDF("id", "term_type", "value", "label")
    wh.domainTable("ontology_terms").insertIfAbsent(rows)
    graft.jobs.ScanJob.ensureLocalStore(wh, now)
  }
}
