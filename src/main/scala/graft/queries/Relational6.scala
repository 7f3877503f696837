package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** SQL-surface tranche 2 — window/grouping/set-operation shapes the
  * catalog didn't yet exercise, all through the shared-text mechanism
  * (identical ANSI SQL on Spark and the DuckDB oracle):
  *
  *  - w5   TIME-RANGE window frame (RANGE BETWEEN INTERVAL ... PRECEDING):
  *         the sliding-aggregate shape time-series analytics live on —
  *         the frame is defined by the ORDER-BY value, not row counts
  *  - a_grouping_sets  explicit GROUPING SETS with GROUPING()
  *         null-vs-grouped disambiguation (rollup/cube's general form)
  *  - d_setops_all     EXCEPT ALL / INTERSECT ALL (bag semantics —
  *         D3's set-op family kept duplicates-aware); surfaced as
  *         per-key multiplicity counts so the output has a total order
  *
  * Determinism: w5 orders by (user_id, ts, event_id) — event_id makes
  * the sort total; RANGE frames include ts-peers by definition, so
  * peer order inside a frame cannot affect the aggregate. GROUPING()
  * is cast to BIGINT in the text (Spark returns TINYINT, DuckDB
  * doesn't). Money folds use the house DECIMAL→STRING→DOUBLE rule.
  *
  * Scale notes (100 TB): w5 shuffles once on user_id and sorts within
  * partitions — frame state is O(events inside one interval), never
  * the partition; grouping sets expand to one aggregate with an
  * internal grouping-id (one shuffle, not one per set); EXCEPT/
  * INTERSECT ALL hash on the value with per-side counts (no sort).
  */
object Relational6 {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  private val w5Sql: String =
    """SELECT user_id, event_id, ts,
      | COUNT(*) OVER w AS n_1h,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS STRING)
      |   AS DOUBLE) AS sum_1h
      |FROM events
      |WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts, event_id""".stripMargin

  private val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      | CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      | COUNT(*) AS n,
      | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
      |   AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |  (o_orderstatus, o_orderpriority), ())
      |ORDER BY g_status, g_prio,
      | o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  private val setopsAllSql: String =
    """SELECT 'except_all' AS op, k, COUNT(*) AS n FROM (
      | SELECT n_nationkey AS k FROM nation
      | UNION ALL SELECT n_nationkey FROM nation WHERE n_nationkey < 10
      | EXCEPT ALL SELECT n_nationkey FROM nation WHERE n_nationkey < 5) x
      |GROUP BY k
      |UNION ALL
      |SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (
      | SELECT c_custkey % 7 AS k FROM customer
      | INTERSECT ALL SELECT c_custkey % 7 FROM customer
      |   WHERE c_custkey % 2 = 0) y
      |GROUP BY k
      |ORDER BY op, k""".stripMargin

  private val texts: Map[String, String] = Map(
    "w5_time_range_sum" -> w5Sql,
    "a_grouping_sets" -> groupingSetsSql,
    "d_setops_all" -> setopsAllSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => sql(s, dir, text))
    }

  val oracle: Map[String, String] = texts
}
