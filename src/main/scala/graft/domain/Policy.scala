package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trust-tier source policy (SURVEY §2.9 V4): profile match →
  * domain-tier fallback → quarantine, as broadcast-join dataflow.
  * Shapes mirror `services/api/config/trust-policy.json:1-134` and
  * `src/ontology/policy.ts:99-170`.
  */
object Policy {

  case class Profile(
      id: String,
      connector: String,
      domain: String,
      path: String,
      requiredQueryParams: Map[String, Seq[String]] = Map.empty,
      tier: String,
      stage: String,
      requiresReview: Boolean = false)

  case class TrustPolicy(
      profiles: Seq[Profile],
      tierDomains: Map[String, Seq[String]],
      stripUtmParams: Boolean = true,
      normalizeTrailingSlash: Boolean = true,
      perDomainRps: Double = 0.2,
      burst: Int = 2,
      robotsEnforced: Boolean = true,
      denyOnCaptcha: Boolean = true)

  /** The reference's shipped policy (`config/trust-policy.json`); its
    * six profiles are all TIER_B — tests add a TIER_A profile to
    * exercise the `route=main` branch. */
  val referencePolicy: TrustPolicy = TrustPolicy(
    profiles = Seq(
      Profile("ec_commission_news", "eu_news", "commission.europa.eu",
        "/news-and-media/news_en", Map.empty,
        "TIER_B_OFFICIAL_SIGNAL", "Drafting", requiresReview = true),
      Profile("futurium_ai_alliance_news", "eu_news", "futurium.ec.europa.eu",
        "/en/apply-ai-alliance/news", Map.empty,
        "TIER_B_OFFICIAL_SIGNAL", "Drafting", requiresReview = true),
      Profile("eu_digital_strategy_news", "eu_news", "digital-strategy.ec.europa.eu",
        "/en/news", Map("topic" -> Seq("119")),
        "TIER_B_OFFICIAL_SIGNAL", "Drafting", requiresReview = true),
      Profile("eu_ai_office_news", "eu_news", "digital-strategy.ec.europa.eu",
        "/en/policies/ai-office", Map.empty,
        "TIER_B_OFFICIAL_SIGNAL", "Interpreting", requiresReview = true),
      Profile("gar_wp29_weekly_docs", "globalautoregs", "globalautoregs.com",
        "/documents", Map("show" -> Seq("week")),
        "TIER_B_OFFICIAL_SIGNAL", "Drafting", requiresReview = true),
      Profile("gar_entry_into_force_2026", "globalautoregs", "globalautoregs.com",
        "/modifications", Map("year" -> Seq("2026")),
        "TIER_B_OFFICIAL_SIGNAL", "Use&Registration", requiresReview = true)),
    tierDomains = Map(
      "TIER_A_BINDING" -> Seq("eur-lex.europa.eu", "op.europa.eu",
        "unece.org", "gesetze-im-internet.de", "legifrance.gouv.fr",
        "legislation.gov.uk"),
      "TIER_B_OFFICIAL_SIGNAL" -> Seq("kba.de", "utac.com", "rdw.nl",
        "vca.gov.uk", "idiada.com", "edpb.europa.eu", "bfdi.bund.de",
        "bsi.bund.de", "cnil.fr", "enisa.europa.eu", "wiki.unece.org",
        "ec.europa.eu", "commission.europa.eu", "www.gov.uk")))

  /** V4 — evaluate every URL in `df(urlCol)` against the policy.
    * Adds: `canonical_url, s_domain, profile_id, trust_tier,
    * monitoring_stage, requires_review, route, eval_reason`.
    *
    * Plan shape: input ⟕ broadcast(profiles) on domain equality +
    * path-prefix + query-param containment (first profile in file
    * order wins, like the reference's `Array.find`,
    * `policy.ts:108`) ⟕ broadcast(tier-domains) contains-match
    * fallback (`policy.ts:163-170`), then ONE `groupBy(_row_id)`
    * aggregation picks both winners via `min_by(struct, order)` —
    * profile coalesced over tier over quarantine literals. Both
    * dimension sides are tiny → broadcast hash joins; the candidate
    * set crosses exactly one Exchange (the winner aggregation), with
    * map-side partial aggregation absorbing the join fan-out.
    */
  def evaluateSource(
      spark: SparkSession,
      df: DataFrame,
      urlCol: String,
      policy: TrustPolicy = referencePolicy): DataFrame = {
    import spark.implicits._

    val canon = df
      .withColumn("_row_id", monotonically_increasing_id())
      .withColumn("canonical_url", OntoFunctions.canonicalizeUrl(col(urlCol)))
      .withColumn("s_domain", OntoFunctions.safeDomain(col("canonical_url")))
      .withColumn("s_path",
        coalesce(parse_url(col("canonical_url"), lit("PATH")), lit("")))
      .withColumn("s_query",
        coalesce(parse_url(col("canonical_url"), lit("QUERY")), lit("")))
      .withColumn("s_params", map_from_entries(expr(
        "transform(filter(split(s_query, '&'), p -> p != ''), " +
          "p -> struct(split(p, '=')[0] AS k, split(p, '=')[1] AS v))")))

    val profiles = policy.profiles.zipWithIndex.map { case (p, i) =>
      (i, p.id, p.domain, p.path, p.tier, p.stage, p.requiresReview, p.requiredQueryParams)
    }.toDF("p_order", "p_id", "p_domain", "p_path", "p_tier", "p_stage",
      "p_requires_review", "p_params")

    // required_query_params ⊆ url params (`policy.ts:149-161`); a
    // missing param yields NULL → non-match, same as the reference.
    val paramOk = expr(
      "forall(map_entries(p_params), e -> array_contains(e.value, s_params[e.key]))")

    val tierOrder = Terms.TrustTiers.zipWithIndex.toMap
    val tierFallbacks = policy.tierDomains.toSeq
      .flatMap { case (tier, ds) => ds.map(d => (tier, d, tierOrder(tier))) }
      .toDF("t_tier", "t_domain", "t_order")

    // Fan out to every matching profile AND every matching tier-domain
    // (both broadcast, no shuffle), then pick both winners in a single
    // aggregation. `min_by` skips rows whose ordering expr is null, so
    // unmatched left-outer rows yield a null winner struct.
    val joined = canon
      .join(broadcast(profiles),
        col("s_domain") === col("p_domain") &&
          col("s_path").startsWith(col("p_path")) && paramOk,
        "left_outer")
      .join(broadcast(tierFallbacks),
        col("s_domain").contains(col("t_domain")),
        "left_outer")

    val carry = canon.columns.filterNot(
      Set("_row_id", "s_path", "s_query", "s_params"))
    val pickProfile = min_by(
      struct(col("p_id"), col("p_tier"), col("p_stage"), col("p_requires_review")),
      when(col("p_id").isNotNull, col("p_order"))).as("_p")
    val pickTier = min_by(struct(col("t_tier")),
      when(col("t_tier").isNotNull, col("t_order"))).as("_t")
    val winners = joined.groupBy("_row_id")
      .agg(pickProfile, (pickTier +: carry.map(c => first(col(c)).as(c))): _*)

    winners
      .withColumn("profile_id", col("_p.p_id"))
      .withColumn("trust_tier",
        coalesce(col("_p.p_tier"), col("_t.t_tier"), lit("TIER_D_QUARANTINE")))
      .withColumn("monitoring_stage",
        coalesce(col("_p.p_stage"),
          when(col("_t.t_tier").isNotNull, "Official"), lit("Drafting")))
      .withColumn("requires_review",
        coalesce(col("_p.p_requires_review"),
          when(col("_t.t_tier").isNotNull, col("_t.t_tier") =!= "TIER_A_BINDING"),
          lit(true)))
      .withColumn("route",
        when(col("trust_tier") === "TIER_A_BINDING" && !col("requires_review"),
          "main").otherwise("review_queue"))
      .withColumn("eval_reason",
        when(col("_p.p_id").isNotNull, lit(null).cast("string"))
          .when(col("_t.t_tier").isNotNull, "domain_tier_match")
          .otherwise("unrecognized_domain"))
      .select(carry.map(col) ++ Seq(col("profile_id"), col("trust_tier"),
        col("monitoring_stage"), col("requires_review"), col("route"),
        col("eval_reason")): _*)
  }
}
