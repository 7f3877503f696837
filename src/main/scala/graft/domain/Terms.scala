package graft.domain

/** Ontology enum domains — the "hard constraint layer".
  * Values mirror the reference ontology
  * (`packages/ontology/src/terms.ts:1-103`); they are data, not code.
  */
object Terms {
  val AllowedDomains: Seq[String] = Seq(
    "unece.org", "globalautoregs.com", "futurium.ec.europa.eu",
    "commission.europa.eu", "digital-strategy.ec.europa.eu", "ec.europa.eu",
    "eur-lex.europa.eu", "op.europa.eu", "gesetze-im-internet.de",
    "legifrance.gouv.fr", "legislation.gov.uk", "rdw.nl", "vca.gov.uk",
    "edpb.europa.eu", "bfdi.bund.de", "bsi.bund.de", "cnil.fr",
    "enisa.europa.eu", "wiki.unece.org", "www.gov.uk", "kba.de",
    "utac.com", "idiada.com", "vda.de")

  val Jurisdictions: Seq[String] =
    Seq("EU", "DE", "FR", "UK", "UN_ECE", "GLOBAL", "ES", "IT", "CZ", "PL")

  val SourceTypes: Seq[String] = Seq(
    "regulation", "draft", "guidance", "position_paper", "minutes",
    "technical_notice")

  val ItemStatuses: Seq[String] =
    Seq("proposed", "adopted", "in_force", "repealed", "unknown")

  val Topics: Seq[String] = Seq(
    "AI_ACT", "GDPR", "DATA_ACT", "DCAS_R171", "GSR", "EU_NCAP_2026",
    "CYBER_SECURITY", "SOFTWARE_UPDATE", "AUTOMATED_DRIVING",
    "TYPE_APPROVAL", "ADAS", "UNECE_WP29", "VEHICLE_DYNAMICS",
    "DRIVABILITY", "POWERTRAIN", "CHARGING", "BATTERY", "EMISSIONS",
    "RANGE", "INTERIOR", "EXTERIOR", "MATERIALS")

  val ImpactedAreas: Seq[String] = Seq(
    "ODD", "Perception", "DMS", "HMI", "Validation", "Homologation",
    "Data_Governance", "Cybersecurity", "OTA", "Vehicle_Dynamics",
    "Drivability", "Powertrain", "Charging", "Battery", "Emissions",
    "Range", "Interior", "Exterior", "Materials")

  val Priorities: Seq[String] = Seq("P0", "P1", "P2")

  val TrustTiers: Seq[String] = Seq(
    "TIER_A_BINDING", "TIER_B_OFFICIAL_SIGNAL", "TIER_C_SOFT_REQ",
    "TIER_D_QUARANTINE")

  /** Tier → rank for argmax routing (`src/jobs/merge.ts:163-182`). */
  val TierRank: Map[String, Int] = Map(
    "TIER_A_BINDING" -> 4, "TIER_B_OFFICIAL_SIGNAL" -> 3,
    "TIER_C_SOFT_REQ" -> 2, "TIER_D_QUARANTINE" -> 1)

  val MonitoringStages: Seq[String] = Seq(
    "Drafting", "Official", "Comitology", "Interpreting", "Use&Registration")

  val EvidenceStatus: Seq[String] = Seq("complete", "partial", "missing")
  val ReviewStatus: Seq[String] = Seq("pending", "approved", "rejected")
  val RunStatus: Seq[String] = Seq("queued", "running", "completed", "failed")

  /** 11 term families seeded into `ontology_terms`
    * (`src/scripts/seed.ts:38-51`). */
  val Families: Map[String, Seq[String]] = Map(
    "allowed_domain" -> AllowedDomains,
    "jurisdiction" -> Jurisdictions,
    "source_type" -> SourceTypes,
    "item_status" -> ItemStatuses,
    "topic" -> Topics,
    "impacted_area" -> ImpactedAreas,
    "priority" -> Priorities,
    "trust_tier" -> TrustTiers,
    "monitoring_stage" -> MonitoringStages,
    "evidence_status" -> EvidenceStatus,
    "review_status" -> ReviewStatus)
}
