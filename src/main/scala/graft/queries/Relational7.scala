package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Qhelpers._

/** Round-10 relational tranche — warehouse-lifecycle shapes over the
  * orders table:
  *
  *  - scd2_build       type-2 slowly-changing dimension from a change
  *                     stream (run-length collapse + effective ranges)
  *  - q_table_diff     anti-entropy reconciliation of two table states
  *                     ([[graft.ext.Reconcile]] — bucket fingerprints
  *                     narrow to dirty buckets before any row-level join)
  *  - x_profile_columns one-pass long-format column profiler (nulls /
  *                     distincts / extrema per column)
  *
  * Scale notes (100 TB): scd2 shuffles once on the dimension key and
  * both its windows reuse that partitioning (no second shuffle until
  * the bounded per-key run table); the diff's row-level join reads only
  * fingerprint-diverged buckets; the profiler is one independent
  * single-column aggregate PER COLUMN, unioned — parquet is columnar,
  * so six one-column scans read the same bytes as one six-column pass,
  * and each distinct stays a codegen'd two-stage partial aggregate
  * instead of the 7-way Expand + SortAggregate the single-agg
  * multi-distinct form degenerates to (measured 13× slower; plan
  * asserted in PlanShapeSpec).
  */
object Relational7 {

  /** SCD2 — build the type-2 history of each customer's order status
    * from the order stream: consecutive same-status orders collapse
    * into one version row (run-length encoding via a change-flag
    * running sum), each version carries [effective_from, effective_to)
    * with the open current version flagged. Total order inside a key
    * comes from (ts, orderkey) — orderkey breaks same-day ties, so run
    * boundaries are deterministic. */
  private def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "orders").filter(col("o_custkey") <= 200)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("seq"), col("o_orderstatus").as("status"))
    val w = Window.partitionBy("custkey").orderBy("ts", "seq")
    val prev = lag("status", 1).over(w)
    val runs = ev
      .withColumn("is_change",
        when(prev.isNull || prev =!= col("status"), 1L).otherwise(0L))
      .withColumn("ver", sum("is_change").over(w))
      .groupBy("custkey", "ver")
      .agg(min("status").as("status"), min("ts").as("effective_from"))
    val wv = Window.partitionBy("custkey").orderBy("ver")
    runs
      .withColumn("effective_to", lead("effective_from", 1).over(wv))
      .withColumn("is_current", col("effective_to").isNull)
      .select("custkey", "ver", "status", "effective_from",
        "effective_to", "is_current")
  }

  def scd2_build(s: SparkSession, dir: String): DataFrame =
    scd2Dim(s, dir).orderBy("custkey", "ver")

  /** Point-in-time enrichment — the reason SCD2 exists: every shipment
    * of the tracked customers picks up the status version in effect at
    * its ship date. Runs as a backward AS-OF join on
    * (custkey, effective_from ≤ ship ts), the union-carry shape of
    * [[graft.ext.AsOf]] (one shuffle on the key, linear state — never
    * an interval theta-join); `ver` tie-breaks same-day versions so
    * the carry lands on the newest change at that instant, exactly the
    * version whose [from, to) interval is non-empty there — identical
    * to the oracle's interval predicate (zero-length intervals match
    * nothing on both sides). The synthetic corpus ships some lines
    * BEFORE their order's own date (not TPC-H-faithful), so shipments
    * predating the customer's first version legitimately carry NULL —
    * LEFT interval-join semantics on both sides. (l_orderkey,
    * l_linenumber) is not unique here either; ts completes the total
    * output order (residual ties are full-row duplicates). */
  def scd2_pit_join(s: SparkSession, dir: String): DataFrame = {
    val dim = scd2Dim(s, dir)
      .select(col("custkey"), col("effective_from").as("ts"),
        col("status"), col("ver"))
    val facts = t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .join(t(s, dir, "orders").filter(col("o_custkey") <= 200)
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_shipdate").as("ts"))
    graft.ext.AsOf.asofJoin(facts, dim, "custkey", "ts",
        valueCols = Seq("status", "ver"), tieBreak = Seq("ver"))
      .orderBy("l_orderkey", "l_linenumber", "ts")
  }

  /** Reconciliation — diff the orders table against a deterministically
    * drifted twin (keys % 97 dropped, % 101 reprices by +1.00, % 103
    * re-keyed past the key space as inserts) through the two-stage
    * bucket-fingerprint narrowing of [[graft.ext.Reconcile]]. The
    * summary (status, count, key range) must equal what the naive full
    * outer join computes — the fingerprints change the access path,
    * never the verdict. The insert offset is max(o_orderkey), DERIVED
    * from the data (a fixed 10M offset holds only below sf≈2 — TPC-H
    * orderkeys pass 10M there and the re-keyed rows would collide with
    * real keys, violating diffSummary's unique-key precondition). */
  /** The deterministic drift recipe — shared by `q_table_diff` and the
    * repair round-trip (`tx_repair_read`), so the repaired state is
    * checked against exactly the drift the diff classified. */
  private[queries] def driftedOrders(o: DataFrame): DataFrame = {
    val maxKey = o.agg(max("o_orderkey").as("_maxk"))
    o.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 103 === 0)
        .crossJoin(broadcast(maxKey))
        .withColumn("o_orderkey", col("o_orderkey") + col("_maxk"))
        .drop("_maxk"))
  }

  def q_table_diff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    graft.ext.Reconcile.diffSummary(o, driftedOrders(o), "o_orderkey")
      .select(col("status"), col("n"), col("min_key"), col("max_key"))
      .orderBy("status")
  }

  /** Profiling — per-column null count, exact distinct count, and
    * stringified extrema over orders, in long format. One independent
    * aggregate per column, unioned: each scan prunes to its SINGLE
    * column (parquet is columnar, so six one-column passes read the
    * same bytes as one six-column pass) and each COUNT(DISTINCT) is a
    * clean codegen'd two-stage partial distinct. The tempting
    * alternative — all six distincts in ONE agg — rewrites into a
    * 7-way Expand feeding a non-codegen SortAggregate with per-function
    * set buffers, measured 13× slower at sf0.1 (3.3 s → 0.25 s).
    * Money extrema go through the house DECIMAL(18,2) view so both
    * engines render the same string. */
  def x_profile_columns(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def prof(name: String, c: org.apache.spark.sql.Column): DataFrame =
      o.agg(count(lit(1)).as("n_rows"), count(c).as("cnt"),
          countDistinct(c).as("nd"),
          min(c).cast("string").as("mn"), max(c).cast("string").as("mx"))
        .select(lit(name).as("column_name"),
          (col("n_rows") - col("cnt")).as("n_nulls"),
          col("nd").as("n_distinct"),
          col("mn").as("min_value"), col("mx").as("max_value"))
    val cols = Seq(
      ("o_orderkey", col("o_orderkey")),
      ("o_custkey", col("o_custkey")),
      ("o_orderstatus", col("o_orderstatus")),
      ("o_totalprice", money(col("o_totalprice"))),
      ("o_orderdate", col("o_orderdate")),
      ("o_orderpriority", col("o_orderpriority")))
    cols.map { case (n, c) => prof(n, c) }.reduce(_ unionByName _)
      .orderBy("column_name")
  }

  /** JOIN-KEY SKEW diagnostics — the planning input the salted-join
    * family (`ext.SkewJoin`) and AQE skew handling act on: for each
    * candidate join key, total rows, distinct keys, the heaviest key's
    * row count, and the skew factor max/(n/keys) (1.0 = perfectly
    * uniform). Each key is one two-stage aggregate (partial
    * per-key counts, then a 3-counter roll-up — nothing wider than a
    * key crosses the shuffle, nothing is collected); at 100 TB this
    * is the cheap pre-flight that decides salting BEFORE a 4-hour
    * join discovers the hot key the hard way. The skew factor is a
    * single long-product ÷ double — one IEEE op, engine-identical. */
  def q_skew_profile(s: SparkSession, dir: String): DataFrame = {
    def skewOf(label: String, df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          max("c").as("max_key_rows"))
        .select(lit(label).as("join_key"), col("n_rows"), col("n_keys"),
          col("max_key_rows"),
          round((col("max_key_rows") * col("n_keys"))
            .cast("double") / col("n_rows").cast("double"), 6)
            .as("skew_factor"))
    Seq(
      skewOf("lineitem.l_partkey", t(s, dir, "lineitem"), "l_partkey"),
      skewOf("lineitem.l_suppkey", t(s, dir, "lineitem"), "l_suppkey"),
      skewOf("orders.o_custkey", t(s, dir, "orders"), "o_custkey"))
      .reduce(_ unionByName _)
      .orderBy("join_key")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_pit_join" -> (scd2_pit_join _),
    "scd2_build" -> (scd2_build _),
    "q_table_diff" -> (q_table_diff _),
    "q_skew_profile" -> (q_skew_profile _),
    "x_profile_columns" -> (x_profile_columns _))

  val oracle: Map[String, String] = Map(
    "q_skew_profile" ->
      """WITH lp AS (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey),
        |ls AS (SELECT count(*) AS c FROM lineitem GROUP BY l_suppkey),
        |oc AS (SELECT count(*) AS c FROM orders GROUP BY o_custkey),
        |u AS (
        | SELECT 'lineitem.l_partkey' AS join_key,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  count(*) AS n_keys, max(c) AS max_key_rows FROM lp
        | UNION ALL
        | SELECT 'lineitem.l_suppkey', CAST(sum(c) AS BIGINT), count(*),
        |  max(c) FROM ls
        | UNION ALL
        | SELECT 'orders.o_custkey', CAST(sum(c) AS BIGINT), count(*),
        |  max(c) FROM oc)
        |SELECT join_key, n_rows, n_keys, max_key_rows,
        | ROUND(CAST(max_key_rows * n_keys AS DOUBLE)
        |   / CAST(n_rows AS DOUBLE), 6) AS skew_factor
        |FROM u ORDER BY join_key""".stripMargin,
    "scd2_build" ->
      """WITH ev AS (
        | SELECT o_custkey AS custkey, o_orderdate AS ts,
        |        o_orderkey AS seq, o_orderstatus AS status
        | FROM orders WHERE o_custkey <= 200),
        |chg AS (
        | SELECT *, CASE WHEN lag(status) OVER w IS NULL
        |                  OR lag(status) OVER w <> status
        |           THEN 1 ELSE 0 END AS is_change
        | FROM ev WINDOW w AS (PARTITION BY custkey ORDER BY ts, seq)),
        |ver AS (
        | SELECT *, CAST(SUM(is_change) OVER (PARTITION BY custkey
        |   ORDER BY ts, seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS ver
        | FROM chg),
        |runs AS (
        | SELECT custkey, ver, MIN(status) AS status,
        |        MIN(ts) AS effective_from
        | FROM ver GROUP BY 1, 2)
        |SELECT custkey, ver, status, effective_from,
        | lead(effective_from) OVER w2 AS effective_to,
        | lead(effective_from) OVER w2 IS NULL AS is_current
        |FROM runs WINDOW w2 AS (PARTITION BY custkey ORDER BY ver)
        |ORDER BY custkey, ver""".stripMargin,
    // point-in-time semantics: the as-of carry must equal the interval
    // join against the SCD2 CTE (non-empty [from, to) containing ts)
    "scd2_pit_join" ->
      """WITH ev AS (
        | SELECT o_custkey AS custkey, o_orderdate AS ts,
        |        o_orderkey AS seq, o_orderstatus AS status
        | FROM orders WHERE o_custkey <= 200),
        |chg AS (
        | SELECT *, CASE WHEN lag(status) OVER w IS NULL
        |                  OR lag(status) OVER w <> status
        |           THEN 1 ELSE 0 END AS is_change
        | FROM ev WINDOW w AS (PARTITION BY custkey ORDER BY ts, seq)),
        |ver AS (
        | SELECT *, CAST(SUM(is_change) OVER (PARTITION BY custkey
        |   ORDER BY ts, seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS ver
        | FROM chg),
        |runs AS (
        | SELECT custkey, ver, MIN(status) AS status,
        |        MIN(ts) AS effective_from
        | FROM ver GROUP BY 1, 2),
        |scd2 AS (
        | SELECT custkey, ver, status, effective_from,
        |  lead(effective_from) OVER (PARTITION BY custkey ORDER BY ver)
        |    AS effective_to
        | FROM runs),
        |f AS (
        | SELECT o_custkey AS custkey, l_orderkey, l_linenumber,
        |        l_shipdate AS ts
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_custkey <= 200)
        |SELECT f.custkey, f.l_orderkey, f.l_linenumber, f.ts,
        |       d.status AS asof_status, d.ver AS asof_ver
        |FROM f LEFT JOIN scd2 d ON d.custkey = f.custkey
        |  AND d.effective_from <= f.ts
        |  AND (d.effective_to IS NULL OR f.ts < d.effective_to)
        |ORDER BY l_orderkey, l_linenumber, ts""".stripMargin,
    // the naive diff: full outer join + per-status summary — the
    // engine's fingerprint narrowing must land on the same verdict
    "q_table_diff" ->
      """WITH l AS (
        | SELECT o_orderkey AS k, o_custkey, o_totalprice, o_orderstatus
        | FROM orders),
        |r AS (
        | SELECT o_orderkey AS k, o_custkey,
        |  CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus
        | FROM orders WHERE o_orderkey % 97 <> 0
        | UNION ALL
        | SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders),
        |  o_custkey, o_totalprice, o_orderstatus
        | FROM orders WHERE o_orderkey % 103 = 0),
        |d AS (
        | SELECT CASE WHEN r.k IS NULL THEN 'only_left'
        |             WHEN l.k IS NULL THEN 'only_right'
        |             WHEN l.o_custkey IS DISTINCT FROM r.o_custkey
        |               OR l.o_totalprice IS DISTINCT FROM r.o_totalprice
        |               OR l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
        |               THEN 'changed'
        |        END AS status,
        |        COALESCE(l.k, r.k) AS k
        | FROM l FULL OUTER JOIN r ON l.k = r.k)
        |SELECT status, COUNT(*) AS n, MIN(k) AS min_key, MAX(k) AS max_key
        |FROM d WHERE status IS NOT NULL
        |GROUP BY status ORDER BY status""".stripMargin,
    "x_profile_columns" ->
      """SELECT * FROM (
        | SELECT 'o_orderkey' AS column_name,
        |  COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |  COUNT(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
        |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_value FROM orders
        | UNION ALL
        | SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
        |  COUNT(DISTINCT o_custkey),
        |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        | FROM orders
        | UNION ALL
        | SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
        |  COUNT(DISTINCT o_orderstatus),
        |  CAST(MIN(o_orderstatus) AS VARCHAR),
        |  CAST(MAX(o_orderstatus) AS VARCHAR) FROM orders
        | UNION ALL
        | SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
        |  COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))),
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
        | FROM orders
        | UNION ALL
        | SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
        |  COUNT(DISTINCT o_orderdate),
        |  CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
        | FROM orders
        | UNION ALL
        | SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
        |  COUNT(DISTINCT o_orderpriority),
        |  CAST(MIN(o_orderpriority) AS VARCHAR),
        |  CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders)
        |ORDER BY column_name""".stripMargin)
}
