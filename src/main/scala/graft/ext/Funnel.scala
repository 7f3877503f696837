package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parametric ordered N-step funnel (§2 behavioral analytics; the
  * reusable form of the fixed 3-step funnel that shipped in round 8 —
  * ref `apps/web/src/components/AnalyticsDashboard.tsx` renders the
  * reference's conversion funnel from per-step counts like these).
  *
  * Semantics: per user, step 1 fires at the FIRST event of its type;
  * step i>1 fires at the first event of its type STRICTLY after step
  * i-1 and within that step's conversion window. A single event can
  * never satisfy two steps in one pass (step i's predicate reads the
  * PREVIOUS accumulator, where step i-1 is still unset). The result is
  * one row of per-step converted-user counts, necessarily
  * non-increasing across steps (prefix-monotone — property-tested).
  *
  * Scale shape: ONE shuffle on the user key carries the per-user
  * event stream; the ordered fold (`aggregate` over the time-sorted
  * list) is the sequential state machine, so there are no per-step
  * self-joins over the corpus and no corpus-sized windows — per-user
  * state at merge time is the N-field timestamp struct, and the
  * per-user list is bounded by that user's funnel-typed events
  * (standard sessionization bound). Equivalent oracle: chained
  * min-after-previous-step CTEs — stepwise min over a sorted stream
  * ≡ min over the qualifying set.
  */
object Funnel {

  /** One funnel step: `label` names the output count column
    * (`<label>_users`); `withinHours` is the conversion window
    * relative to the previous step's timestamp (ignored for the first
    * step, which may fire at any time). */
  final case class Step(eventType: String, withinHours: Int, label: String)

  /** One-row funnel over `events`: counts users whose first `steps(0)`
    * event is followed by each subsequent step within its window. */
  def fold(events: DataFrame, userCol: Column, tsCol: Column,
      typeCol: Column, steps: Seq[Step]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.map(_.label).distinct.size == steps.size,
      s"step labels must be unique, got ${steps.map(_.label)}")
    // types and labels are embedded in a SQL lambda — keep them inert
    steps.foreach { st =>
      require(st.eventType.forall(c => c.isLetterOrDigit || c == '_'),
        s"event type must be alphanumeric/_: '${st.eventType}'")
      require(st.label.forall(c => c.isLetterOrDigit || c == '_'),
        s"label must be alphanumeric/_: '${st.label}'")
    }
    require(steps.drop(1).forall(_.withinHours >= 1),
      "non-first steps need a positive conversion window")

    val n = steps.size
    val init = (1 to n).map(i => s"'t$i', CAST(NULL AS TIMESTAMP)")
      .mkString(", ")
    val upd = steps.zipWithIndex.map { case (st, idx) =>
      val i = idx + 1
      if (idx == 0)
        s"""'t1', CASE WHEN acc.t1 IS NULL
           | AND e.event_type = '${st.eventType}'
           |THEN e.ts ELSE acc.t1 END""".stripMargin
      else
        s"""'t$i', CASE WHEN acc.t${i - 1} IS NOT NULL AND acc.t$i IS NULL
           | AND e.event_type = '${st.eventType}' AND e.ts > acc.t${i - 1}
           | AND e.ts <= acc.t${i - 1} + INTERVAL ${st.withinHours} HOURS
           |THEN e.ts ELSE acc.t$i END""".stripMargin
    }.mkString(",\n")

    val counts = steps.zipWithIndex.map { case (st, idx) =>
      count(col(s"steps.t${idx + 1}")).as(s"${st.label}_users")
    }
    events
      .filter(typeCol.isin(steps.map(_.eventType): _*))
      .select(userCol.as("_u"), tsCol.as("ts"), typeCol.as("event_type"))
      .groupBy("_u")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"))))
        .as("evs"))
      .withColumn("steps", expr(
        s"aggregate(evs, named_struct($init), (acc, e) -> named_struct(\n$upd))"))
      .agg(counts.head, counts.tail: _*)
  }
}
