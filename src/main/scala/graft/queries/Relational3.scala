package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Qhelpers._
import graft.core.Tables

/** Third tranche: distribution analytics (TPC-H Q13 shape), scalar
  * subqueries, and character k-gram fingerprinting (the
  * winnowing/rolling-hash family of document fingerprints).
  */
object Relational3 {

  /** TPC-H Q13 — customer order-count distribution including
    * zero-order customers (outer join + double aggregation). */
  def a_q13_distribution(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** Scalar subquery — orders above the global mean price, compared in
    * EXACT arithmetic (price × count > total) so both engines agree on
    * every boundary row; runs through spark.sql to exercise the SQL
    * scalar-subquery planner. */
  private val aboveMeanSql =
    """SELECT COUNT(*) AS n_above,
      | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE)
      |   AS sum_above
      |FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(18,2))
      |    * (SELECT COUNT(*) FROM orders)
      |  > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)"""
      .stripMargin

  def p_scalar_subquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(aboveMeanSql)
  }

  /** X4 — k-gram document fingerprinting: minimum md5 over all char
    * 8-grams (winnowing-lite) + gram diversity, per document. */
  def x4_kgram_fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 500 && col("n_chars") >= 8)
      .withColumn("_grams", expr(
        "transform(sequence(1, length(text) - 7), i -> md5(substr(text, i, 8)))"))
      .select(
        col("doc_id"),
        array_min(col("_grams")).as("fingerprint"),
        size(array_distinct(col("_grams"))).cast(LongType).as("n_distinct_grams"),
        size(col("_grams")).cast(LongType).as("n_grams"))
      .orderBy("doc_id")

  /** Data-quality expectation report over orders (single pass; the
    * declarative check list of `ext.Quality`). */
  def q_quality_report(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.Quality
    Quality.check(t(s, dir, "orders"), Seq(
      Quality.Expectation("viol_key_nonnull", col("o_orderkey").isNotNull),
      Quality.Expectation("viol_price_positive", col("o_totalprice") > 0),
      Quality.Expectation("viol_status_domain",
        col("o_orderstatus").isin("O", "F", "P")),
      Quality.Expectation("viol_date_range",
        col("o_orderdate").between("1990-01-01", "2030-01-01"))))
  }

  /** Per-group statistical outlier census (mean + σ threshold over
    * o_totalprice): the moments come from EXACT decimal sums (Σp, Σp²
    * through the STRING→DOUBLE rule), so the threshold is a fixed
    * sequence of IEEE ops on identical doubles in both engines —
    * deterministic, no accumulation-order dependence (the
    * co-supplier-graph threshold discipline). One moment pass + one
    * broadcast threshold join + one counting pass. 1σ, not 2σ: the
    * synthetic price distribution is bounded/uniform-ish (max ≈ μ +
    * 1.7σ), so a 2σ cut selects nothing at any SF. */
  def a_outliers(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_orderstatus", "o_totalprice")
    val m = o.groupBy("o_orderstatus").agg(
      count(lit(1)).as("n"),
      sum(money(col("o_totalprice")))
        .cast(StringType).cast(DoubleType).as("s1"),
      sum(money(col("o_totalprice")) * money(col("o_totalprice")))
        .cast(StringType).cast(DoubleType).as("s2"))
    val thr = m.select(col("o_orderstatus"),
      (col("s1") / col("n").cast(DoubleType) +
        lit(1.0) * sqrt((col("s2") -
          col("s1") * col("s1") / col("n").cast(DoubleType)) /
          col("n").cast(DoubleType))).as("thr"))
    o.join(broadcast(thr), Seq("o_orderstatus"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        count(when(col("o_totalprice") > col("thr"), 1)).as("n_outliers"))
      .orderBy("o_orderstatus")
  }

  /** ROBUST outlier census — median + MAD (median absolute
    * deviation), the robust twin of [[a_outliers]]'s mean + σ: one
    * corrupt billion-dollar row shifts a mean arbitrarily but moves a
    * median by at most one rank. Both medians use the house RANK
    * definition (smallest value whose cumulative count reaches
    * ⌈n/2⌉ — integer `div`, engine-identical) computed over per-group
    * VALUE-WEIGHT rows under group-KEYED windows: the window domain
    * is a group's distinct values, never corpus rows — no
    * unpartitioned window anywhere. Two passes (median, then the
    * same machinery over |v − median|), 3×MAD flag. */
  def a_robust_outliers(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
      money(col("o_totalprice")).cast(DoubleType).as("v"))
    // ONE scan of orders: everything downstream — both weighted
    // medians and the final census — runs over the per-group
    // VALUE-WEIGHT rows (distinct (st, v) + count), materialized once.
    // The previous shape re-derived the deviation frame from the raw
    // table, scanning orders FOUR times; at 100 TB the fact scan IS
    // the cost, and the distinct-value relation it reduces to is
    // domain-bounded (price cents), not row-bounded.
    val wts = o.groupBy("st", "v").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    def wmedian(wdf: DataFrame, out: String): DataFrame =
      weightedMedianByGroup(wdf, out)
    val med = wmedian(wts, "med")
    // deviation weights fold values symmetric around the median onto
    // one |v - med| row — still value-weight rows, never raw rows
    // materialized once like wts: TWO consumers (the MAD median and
    // the final census) would otherwise each re-run the med-join +
    // deviation fold over the value-weight rows (r21; domain-bounded)
    val devw = wts.join(broadcast(med), "st")
      .groupBy(col("st"), col("med"),
        abs(col("v") - col("med")).as("d"))
      .agg(sum("w").as("w"))
      .localCheckpoint()
    val mad = wmedian(devw.select(col("st"), col("d").as("v"), col("w")),
      "mad")
    devw.join(broadcast(mad), "st")
      .groupBy(col("st").as("o_orderstatus"), col("med").as("median"),
        col("mad"))
      .agg(sum("w").as("n"),
        coalesce(sum(when(col("d") > lit(3.0) * col("mad"), col("w"))),
          lit(0L)).as("n_outliers"))
      .select("o_orderstatus", "n", "median", "mad", "n_outliers")
      .orderBy("o_orderstatus")
  }

  /** TWO-PHASE exact weighted median over (st, v, w) rows — the house
    * rank rule verbatim (smallest v whose cumulative weight reaches
    * (n+1) div 2), but the full-domain sort under a groups-wide window
    * is replaced by: (1) a parallel hash census of 1024-wide value
    * buckets (v / 1024.0 only shifts the double's exponent — exact, so
    * the bucket order is the value order), (2) the running rule over
    * the tiny bucket census picks each group's MEDIAN BUCKET, (3) the
    * rank rule runs over that single bucket's rows only, offset by the
    * weight before it. The only sorted windows left are
    * bucket-census-sized and one-bucket-sized (r21; identical output
    * by construction — cum(v) = before + in-bucket cum; property test
    * pins it against the one-pass window form). */
  private[graft] def weightedMedianByGroup(wdf: DataFrame,
      out: String): DataFrame = {
    val bux = wdf.groupBy(col("st"),
        floor(col("v") / lit(1024.0)).as("b"))
      .agg(sum("w").as("bw"))
    val mb = bux
      .withColumn("bcum",
        sum("bw").over(Window.partitionBy("st").orderBy("b")))
      .withColumn("n", sum("bw").over(Window.partitionBy("st")))
      .filter(col("bcum") >= expr("(n + 1) div 2"))
      .groupBy("st")
      .agg(min(struct(col("b"), col("bcum"), col("bw"), col("n")))
        .as("mb"))
      .select(col("st"), col("mb.b").as("b"),
        (col("mb.bcum") - col("mb.bw")).as("before"),
        expr("(mb.n + 1) div 2").as("k"))
    wdf.join(broadcast(mb), Seq("st"))
      .filter(floor(col("v") / lit(1024.0)) === col("b"))
      .withColumn("cum", col("before") +
        sum("w").over(Window.partitionBy("st").orderBy("v")))
      .filter(col("cum") >= col("k"))
      .groupBy("st").agg(min("v").as(out))
  }

  /** Referential-integrity audit — the cross-table data-quality ask a
    * warehouse runs nightly: one orphan count per FK relationship
    * (child keys with no parent row) via ANTI joins. Every parent here
    * is dimension-sized, so each anti join broadcasts and each fact
    * table scans once (key column only, pruned); the 1-row counts
    * cross-join into one report row. Zero orphans on consistent data —
    * the query is the machinery that would CATCH drift. */
  def q_fk_integrity(s: SparkSession, dir: String): DataFrame = {
    def orphans(childTable: String, childKey: String, parentTable: String,
        parentKey: String, as: String): DataFrame =
      t(s, dir, childTable).select(col(childKey))
        .join(t(s, dir, parentTable).select(col(parentKey)),
          col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as(as))
    Seq(
      orphans("lineitem", "l_orderkey", "orders", "o_orderkey",
        "lineitem_orders_orphans"),
      orphans("orders", "o_custkey", "customer", "c_custkey",
        "orders_customer_orphans"),
      orphans("customer", "c_nationkey", "nation", "n_nationkey",
        "customer_nation_orphans"),
      orphans("supplier", "s_nationkey", "nation", "n_nationkey",
        "supplier_nation_orphans"),
      orphans("nation", "n_regionkey", "region", "r_regionkey",
        "nation_region_orphans")).reduce(_ crossJoin _)
  }

  /** Per-group top-k via the typed Aggregator (bounded partial
    * buffers, not a window sort): top-3 order prices per status. */
  def a_topk_aggregator(s: SparkSession, dir: String): DataFrame = {
    val topk = graft.ext.TopK.top_k(3)
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderstatus"),
        posexplode(col("top.entries")).as(Seq("rnk0", "e")))
      .select(col("o_orderstatus"),
        (col("rnk0") + 1).cast(LongType).as("rnk"),
        col("e.id").as("o_orderkey"),
        col("e.value").as("o_totalprice"))
      .orderBy("o_orderstatus", "rnk")
  }

  /** Exact interpolated percentiles (median / p90) per status — engine
    * interpolation differs in the last ulp, so outputs are rounded to
    * cents. For 100 TB the approx_percentile variant is the default;
    * both are shown. */
  def a_percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** As-of join: each purchase event picks up the value of the user's
    * most recent prior-or-equal click (union-carry pattern, verified
    * against DuckDB's native ASOF JOIN). */
  def j_asof_join(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("click_value"))
    graft.ext.AsOf.asofJoin(purchases, clicks, "user_id", "ts",
      Seq("click_value"), tieBreak = Seq("event_id"))
      .select("event_id", "user_id", "ts", "value", "asof_click_value")
      .orderBy("event_id")
  }

  /** INTERVAL-OVERLAP self-join ([[graft.ext.RangeJoin.overlapPairs]]
    * — the temporal join proper: not point-in-window but
    * window-meets-window): same-part lineitems whose [ship, receipt]
    * transit intervals overlap — "how often is a part doubly
    * in-transit, and for how long?". Pairs orient earlier-start
    * first, so overlap is ONE inequality; candidates equi-join on
    * (part, calendar month of the later start) — never a nested-loop
    * inequality join — and each pair meets in exactly one month (no
    * dedup pass). Per-part rows capped at a deterministic 32
    * (mirrored in the oracle; the co-occurrence cap discipline). */
  def j_overlap_join(s: SparkSession, dir: String): DataFrame = {
    // the fixture carries no receipt date; the transit END derives
    // deterministically from quantity (1-14 days), mirrored verbatim
    // in the oracle — the operator under test is the join, not the ETA
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"),
        date_add(col("l_shipdate"),
          (col("l_quantity").cast(IntegerType) % 14) + 1).as("l_transit_end"))
    // the deterministic first-32-per-part cut (ORDER BY shipdate,
    // orderkey, linenumber — a per-key-unique tuple) and the per-part
    // pair census are FUSED into ONE bounded typed Aggregator
    // (RangeJoin.overlap_stats, the TopK buffer discipline): one scan,
    // one shuffle of ≤32-entry buffers, the pair scan compiled JVM
    // code instead of interpreted higher-order functions + explode +
    // a second aggregation. Rows identical to aggregating the
    // capPerKey bounded path (property-tested; keys with no pair
    // emit n_pairs = 0 here and are filtered, as explode drops them)
    val ovs = graft.ext.RangeJoin.overlap_stats(32)
    li.groupBy("l_partkey")
      .agg(ovs(unix_date(to_date(col("l_shipdate"))), col("l_orderkey"),
        col("l_linenumber").cast(IntegerType),
        unix_date(to_date(col("l_transit_end")))).as("_st"))
      .filter(col("_st.n_pairs") > 0)
      .select(col("l_partkey"), col("_st.n_pairs").as("n_pairs"),
        col("_st.max_overlap_days").as("max_overlap_days"))
      .orderBy("l_partkey")
  }

  /** Bucketized range join: (purchase, error) event pairs of the same
    * user within 10 minutes — equi-join on (user, time-bucket) + exact
    * filter, never a nested-loop inequality join. */
  def j_range_join(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    graft.ext.RangeJoin.withinInterval(
      purchases, errors, "user_id", "ts", tolMicros = 10L * 60 * 1000 * 1000)
      .select(
        col("l_event_id").as("purchase_id"),
        col("r_event_id").as("error_id"),
        col("l_user_id").as("user_id"),
        (abs(unix_micros(col("l_ts")) - unix_micros(col("r_ts"))) / lit(1000000L))
          .cast(LongType).as("gap_seconds"))
      .orderBy("purchase_id", "error_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j_range_join" -> (j_range_join _),
    "j_asof_join" -> (j_asof_join _),
    "a_percentiles" -> (a_percentiles _),
    "a_topk_aggregator" -> (a_topk_aggregator _),
    "q_quality_report" -> (q_quality_report _),
    "q_fk_integrity" -> (q_fk_integrity _),
    "a_outliers" -> (a_outliers _),
    "a_robust_outliers" -> (a_robust_outliers _),
    "j_overlap_join" -> (j_overlap_join _),
    "a_q13_distribution" -> (a_q13_distribution _),
    "p_scalar_subquery" -> (p_scalar_subquery _),
    "x4_kgram_fingerprint" -> (x4_kgram_fingerprint _))

  val oracle: Map[String, String] = Map(
    "j_range_join" ->
      """SELECT p.event_id AS purchase_id, e.event_id AS error_id,
        | p.user_id,
        | CAST(abs(epoch_us(p.ts) - epoch_us(e.ts)) // 1000000 AS BIGINT)
        |   AS gap_seconds
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= 600000000
        |ORDER BY purchase_id, error_id""".stripMargin,
    "j_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts, p.value,
        | c.value AS asof_click_value
        |FROM (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "a_percentiles" ->
      """SELECT o_orderstatus,
        | ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a_topk_aggregator" ->
      """SELECT o_orderstatus, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
        | o_totalprice
        |FROM (
        | SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        | FROM orders) x
        |WHERE rnk <= 3 ORDER BY o_orderstatus, rnk""".stripMargin,
    "q_quality_report" ->
      """SELECT COUNT(*) AS n_rows,
        | COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS viol_key_nonnull,
        | COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0, FALSE)) AS viol_price_positive,
        | COUNT(*) FILTER (WHERE NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)) AS viol_status_domain,
        | COUNT(*) FILTER (WHERE NOT COALESCE(o_orderdate BETWEEN TIMESTAMP '1990-01-01 00:00:00' AND TIMESTAMP '2030-01-01 00:00:00', FALSE)) AS viol_date_range
        |FROM orders""".stripMargin,
    // interval overlap: the oracle uses the plain inequality self-join
    // (sound at oracle scale) against the engine's month-bucket plan;
    // the 32-per-part cap is mirrored exactly
    "j_overlap_join" ->
      """WITH li AS (
        | SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |  l_shipdate + INTERVAL 1 DAY *
        |    ((CAST(l_quantity AS INT) % 14) + 1) AS l_transit_end
        | FROM lineitem),
        |c AS (
        | SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_partkey
        |     ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rk
        |  FROM li) WHERE rk <= 32),
        |p AS (
        | SELECT a.l_partkey,
        |  CAST(datediff('day', b.l_shipdate,
        |    LEAST(a.l_transit_end, b.l_transit_end)) + 1 AS BIGINT)
        |   AS overlap_days
        | FROM c a JOIN c b
        |  ON a.l_partkey = b.l_partkey
        |  AND (a.l_shipdate < b.l_shipdate OR (a.l_shipdate = b.l_shipdate
        |       AND (a.l_orderkey < b.l_orderkey OR (a.l_orderkey = b.l_orderkey
        |            AND a.l_linenumber < b.l_linenumber))))
        |  AND b.l_shipdate <= a.l_transit_end)
        |SELECT l_partkey, count(*) AS n_pairs,
        | max(overlap_days) AS max_overlap_days
        |FROM p GROUP BY 1 ORDER BY l_partkey""".stripMargin,
    // robust twin: both medians via the rank definition (smallest
    // value reaching ceil(n/2), integer div) — engine-identical
    "a_robust_outliers" ->
      """WITH o AS (
        | SELECT o_orderstatus AS st,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
        | FROM orders),
        |w1 AS (SELECT st, v, count(*) AS w FROM o GROUP BY 1, 2),
        |c1 AS (
        | SELECT st, v, sum(w) OVER (PARTITION BY st ORDER BY v) AS cum,
        |  sum(w) OVER (PARTITION BY st) AS n
        | FROM w1),
        |m AS (SELECT st, min(v) AS med FROM c1
        |      WHERE cum >= (n + 1) // 2 GROUP BY st),
        |d AS (SELECT o.st, m.med, abs(o.v - m.med) AS dv
        |      FROM o JOIN m USING (st)),
        |w2 AS (SELECT st, dv, count(*) AS w FROM d GROUP BY 1, 2),
        |c2 AS (
        | SELECT st, dv, sum(w) OVER (PARTITION BY st ORDER BY dv) AS cum,
        |  sum(w) OVER (PARTITION BY st) AS n
        | FROM w2),
        |m2 AS (SELECT st, min(dv) AS mad FROM c2
        |       WHERE cum >= (n + 1) // 2 GROUP BY st)
        |SELECT d.st AS o_orderstatus, count(*) AS n, m.med AS median,
        | m2.mad AS mad,
        | count(*) FILTER (WHERE d.dv > 3 * m2.mad) AS n_outliers
        |FROM d JOIN m ON d.st = m.st JOIN m2 ON d.st = m2.st
        |GROUP BY 1, m.med, m2.mad
        |ORDER BY 1""".stripMargin,
    // exact decimal moments -> identical doubles -> identical threshold
    "a_outliers" ->
      """WITH m AS (SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
        |    AS DOUBLE) AS s1,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
        |    * CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
        |    AS DOUBLE) AS s2
        |  FROM orders GROUP BY 1),
        |t AS (SELECT o_orderstatus, s1 / CAST(n AS DOUBLE)
        |       + 1.0 * sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE))
        |         / CAST(n AS DOUBLE)) AS thr FROM m)
        |SELECT o.o_orderstatus, COUNT(*) AS n,
        | COUNT(CASE WHEN o.o_totalprice > t.thr THEN 1 END) AS n_outliers
        |FROM orders o JOIN t ON o.o_orderstatus = t.o_orderstatus
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // NOT EXISTS (never NOT IN: a NULL parent key would poison it)
    "q_fk_integrity" ->
      """SELECT
        | (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |   AS lineitem_orders_orphans,
        | (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |   AS orders_customer_orphans,
        | (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |   (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |   AS customer_nation_orphans,
        | (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
        |   (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
        |   AS supplier_nation_orphans,
        | (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
        |   (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
        |   AS nation_region_orphans""".stripMargin,
    "a_q13_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey) x
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "p_scalar_subquery" -> aboveMeanSql,
    "x4_kgram_fingerprint" ->
      """SELECT doc_id,
        | list_aggregate(grams, 'min') AS fingerprint,
        | CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
        | CAST(len(grams) AS BIGINT) AS n_grams
        |FROM (
        | SELECT doc_id, list_transform(range(1, length(text) - 6),
        |   i -> md5(substr(text, CAST(i AS INT), 8))) AS grams
        | FROM documents WHERE doc_id < 500 AND n_chars >= 8) g
        |ORDER BY doc_id""".stripMargin)
}
