package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Warehouse
import graft.domain.OntoFunctions

/** Evidence verification (SURVEY §2.10 L4; ref `src/index.ts:302-357`
  * — an LLM audit whose verdict is parsed from free text). Here the
  * audit is a deterministic rule bundle producing the same
  * (passed, verdict-message) contract; the LLM seam could be swapped
  * in behind the same method without touching callers.
  */
object EvidenceVerifier {

  /** Batch verdicts for every item (vectorized — per-item invocation
    * is the reference's shape, a column bundle is ours). */
  def verdicts(items: DataFrame): DataFrame = {
    val citations = coalesce(col("evidence.citations"), array())
    val nCitations = size(citations)
    val allAllowed = forall(citations,
      c => OntoFunctions.isAllowedDomain(c.getField("url")))
    val checks = array(
      when(nCitations === 0, "no citations"),
      when(nCitations > 0 && !allAllowed, "citation from disallowed domain"),
      when(col("confidence") < 0.5, "confidence below 0.5"),
      when(length(coalesce(col("summary_1line"), lit(""))) === 0,
        "empty summary"))
    items
      .withColumn("_failures", array_compact(checks))
      .withColumn("passed", size(col("_failures")) === 0)
      .withColumn("verdict",
        when(col("passed"), "pass")
          .otherwise(concat(lit("fail: "),
            array_join(col("_failures"), "; "))))
      .drop("_failures")
  }

  /** Point verdict for one item (ref endpoint shape). */
  def verify(wh: Warehouse, itemId: String): Option[(Boolean, String)] = {
    val rows = verdicts(
      wh.domainTable("regulation_items").read.filter(col("id") === itemId))
      .select("passed", "verdict").collect()
    rows.headOption.map(r => (r.getBoolean(0), r.getString(1)))
  }
}
