package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.domain.{Schemas, Validator}

class ValidatorSpec extends SparkSpec {

  private def item(
      id: String = "i1",
      jurisdiction: String = "EU",
      url: String = "https://eur-lex.europa.eu/doc/1",
      citations: Seq[Row] = Seq(Row("c", "https://eur-lex.europa.eu/doc/1", null)),
      confidence: Double = 0.9,
      tier: String = "TIER_A_BINDING",
      summary: String = "sum"): Row =
    Row(id, jurisdiction, "Org", "guidance", "title", summary, url,
      null, t0, null, "unknown",
      Seq("GDPR"), Seq("HMI"), Seq(),
      Row(null, null, citations),
      confidence, "", "P2", tier, "Official", null, null, t0)

  private def df(rows: Row*): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      Schemas.regulationItems)

  private def reasonOf(d: DataFrame): Seq[String] =
    Validator.validateItems(d, 0.7).select("_reason")
      .collect().map(r => Option(r.getString(0)).orNull).toSeq

  test("valid TIER_A item passes all four gates") {
    assert(reasonOf(df(item())) === Seq(null))
  }

  test("gate 1: schema failures (bad enum, long summary, conf out of range)") {
    assert(reasonOf(df(item(jurisdiction = "MARS"))) ===
      Seq(Validator.SchemaFailed))
    assert(reasonOf(df(item(summary = "x" * 401))) ===
      Seq(Validator.SchemaFailed))
    assert(reasonOf(df(item(confidence = 1.5))) ===
      Seq(Validator.SchemaFailed))
  }

  test("gate 2: domain whitelist") {
    assert(reasonOf(df(item(url = "https://evil.example.com/x"))) ===
      Seq(Validator.DomainNotAllowed))
  }

  test("gate 3: missing citations") {
    assert(reasonOf(df(item(citations = Seq()))) ===
      Seq(Validator.MissingCitations))
  }

  test("gate 4: confidence threshold with reference message format") {
    assert(reasonOf(df(item(confidence = 0.5))) ===
      Seq("Confidence below threshold (0.7)"))
  }

  test("precedence: first failing gate wins") {
    // bad domain AND no citations AND low confidence → domain reason
    assert(reasonOf(df(item(url = "https://evil.example.com/x",
      citations = Seq(), confidence = 0.1))) ===
      Seq(Validator.DomainNotAllowed))
  }

  test("routing: valid TIER_A → main; others → review with composite reason") {
    val d = df(
      item(id = "a"),
      item(id = "b", tier = "TIER_B_OFFICIAL_SIGNAL"),
      item(id = "c", tier = "TIER_B_OFFICIAL_SIGNAL", confidence = 0.2))
    val routed = Validator.routeItems(Validator.validateItems(d, 0.7))
      .select("id", "_route", "_review_reason")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(routed("a") === ("main", null))
    assert(routed("b") ===
      ("review_queue", "Trust tier TIER_B_OFFICIAL_SIGNAL requires review"))
    assert(routed("c") === ("review_queue",
      "Confidence below threshold (0.7) | Trust tier TIER_B_OFFICIAL_SIGNAL requires review"))
  }

  test("null trust tier routes to review as 'unknown'") {
    val d = df(item(id = "x", tier = null))
    val routed = Validator.routeItems(Validator.validateItems(d, 0.7))
      .select("_route", "_review_reason").collect()(0)
    assert(routed.getString(0) === "review_queue")
    assert(routed.getString(1) === "Trust tier unknown requires review")
  }
}
