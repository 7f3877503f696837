package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import Qhelpers._
import graft.core.Tables

/** Second relational tranche: typed Dataset API, extended window
  * functions, CUBE, set operations, PIVOT, hash sampling, string/date
  * function suites, outer joins, the spark.sql SQL surface, and
  * order-stable array aggregation (SURVEY §2 P12/§2.5/§2.4/§2.7/§2.8).
  */
object Relational2 {

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  /** P12-family — typed `Dataset[Order]` path (case-class Encoder,
    * compile-time field checks; ref `rowToItem` typed decode
    * `src/repository.ts:147-172`). */
  def t_typed_dataset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders").as[Order]
      .filter(_.o_totalprice > 100000.0)
      .groupByKey(_.o_orderstatus)
      .count()
      .toDF("status", "n_big_orders")
      .orderBy("status")
  }

  /** W4 (§2.5 extension) — ranking-function suite: dense_rank,
    * percent_rank, ntile over account balances per segment. */
  def w4_rank_suite(s: SparkSession, dir: String): DataFrame = {
    val byBal = Window.partitionBy("c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    t(s, dir, "customer")
      .withColumn("rn", row_number().over(byBal).cast(LongType))
      .withColumn("drank", dense_rank().over(byBal).cast(LongType))
      .withColumn("prank", percent_rank().over(byBal))
      .withColumn("quartile", ntile(4).over(byBal).cast(LongType))
      .filter(col("rn") <= 5)
      .select("c_mktsegment", "rn", "c_custkey", "c_acctbal",
        "drank", "prank", "quartile")
      .orderBy("c_mktsegment", "rn")
  }

  /** A-family extension — CUBE over (status, priority): all grouping
    * combinations in one pass. */
  def a_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** D3 (§2.7 note) — INTERSECT / EXCEPT: nations that have customers
    * vs suppliers. */
  def d3_intersect_except(s: SparkSession, dir: String): DataFrame = {
    val custNations = t(s, dir, "customer")
      .select(col("c_nationkey").as("nationkey"))
    val suppNations = t(s, dir, "supplier")
      .select(col("s_nationkey").as("nationkey"))
    val both = custNations.intersect(suppNations)
      .withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations)
      .withColumn("tag", lit("customer_only"))
    both.unionByName(custOnly)
      .select("tag", "nationkey")
      .orderBy("tag", "nationkey")
  }

  private val priorityValues =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** A3-family — PIVOT: order counts status × priority as a matrix. */
  def a_pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", priorityValues)
      .agg(count(lit(1)))
      .orderBy("o_orderstatus")

  /** PIVOT's inverse — UNPIVOT/melt: per-flag wide measures back to
    * long (flag, metric, value) form via Spark's `unpivot` (the melt
    * API) vs DuckDB's UNPIVOT clause. All measures cast to one
    * comparable DOUBLE up front (unpivot needs a common value type;
    * the money sum goes through the DECIMAL→STRING→DOUBLE house
    * rule, quantities/counts are integer-valued → exact). Map-only
    * row expansion over a 3-row aggregate — the melt itself never
    * shuffles. */
  def a_unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(msum(col("l_extendedprice")).as("sum_price"),
        sum(col("l_quantity")).cast(DoubleType).as("sum_qty"),
        count(lit(1)).cast(DoubleType).as("n_items"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_price"), col("sum_qty"), col("n_items")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")

  /** Aggregate FILTER clause (SQL:2003; IDENTICAL text runs on both
    * engines): per-aggregate predicates without CASE contortions —
    * Catalyst folds the filter into the aggregate's update, so it
    * stays one partial+final hash aggregate, no extra pass. Integer
    * quantity and stored-double discount comparisons are exact in
    * both engines. */
  private val filterAggSql =
    """SELECT l_returnflag,
      | COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
      | COUNT(*) AS n,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |   FILTER (WHERE l_discount > 0.05) AS STRING) AS DOUBLE)
      |   AS hi_disc_price
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  def a_filter_agg(s: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.registerAll(s, dir)
    s.sql(filterAggSql)
  }

  /** Edit-distance fuzzy matching (`levenshtein` — entity-resolution
    * primitive, both engines implement the same DP edit distance):
    * map-only scalar work over a pruned scan. */
  def f_fuzzy_match(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        levenshtein(col("p_name"), col("p_brand")).cast(LongType)
          .as("lev_brand"),
        levenshtein(lower(col("p_name")), reverse(lower(col("p_name"))))
          .cast(LongType).as("lev_pal"))
      .orderBy("p_partkey")

  /** Deterministic hash sampling (portable alternative to RNG
    * `sample()` — the idiom for reproducible sampling at 100 TB):
    * keep keys whose md5 starts with '0' (≈ 1/16). */
  def p_sample_hash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(substring(md5(col("o_orderkey").cast(StringType)), 1, 1) === "0")
      .agg(count(lit(1)).as("n_sampled"),
        msum(col("o_totalprice")).as("sampled_total"),
        min(col("o_orderkey")).as("first_key"))

  /** F-family — string function suite (regexp_replace, pads, reverse,
    * translate, levenshtein, trim, split). */
  def f_string_suite(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") < 500)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
        lpad(col("p_brand"), 10, ".").as("brand_padded"),
        reverse(col("p_name")).as("name_rev"),
        translate(col("p_type"), "AEO", "aeo").as("type_translated"),
        levenshtein(col("p_name"), col("p_type")).cast(LongType).as("edit_dist"),
        trim(lit("  x  ")).as("trimmed"),
        size(split(col("p_name"), " ")).cast(LongType).as("n_name_parts"))
      .orderBy("p_partkey")

  /** F9/F10-family — date/time function suite. */
  def f_date_suite(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .withColumn("od", col("o_orderdate").cast(DateType))
      .select(
        col("o_orderkey"),
        col("od").cast(TimestampType).as("od"),
        year(col("od")).cast(LongType).as("y"),
        month(col("od")).cast(LongType).as("m"),
        dayofmonth(col("od")).cast(LongType).as("d"),
        quarter(col("od")).cast(LongType).as("q"),
        (weekday(col("od")) + 1).cast(LongType).as("isodow"),
        last_day(col("od")).cast(TimestampType).as("month_end"),
        date_add(col("od"), 30).cast(TimestampType).as("plus_30d"),
        datediff(lit("2026-01-01").cast(DateType), col("od"))
          .cast(LongType).as("days_to_2026"))
      .orderBy("o_orderkey")

  /** J-family — outer join keeping empty groups: BUILDING-segment
    * customer counts per nation, zeros included. */
  def j_outer_join(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
      .groupBy("n_nationkey", "n_name")
      .agg(count(col("c_custkey")).as("n_building_customers"))
      .orderBy("n_nationkey")
  }

  /** TPC-H Q3 via the spark.sql surface over registered views — the
    * identical SQL text runs on both engines (ANSI subset). */
  private val q3Sql: String =
    """SELECT l_orderkey,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS STRING) AS DOUBLE)
      |   AS revenue,
      | o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 20""".stripMargin

  def sql_tpch_q3(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q3Sql)
  }

  /** TPC-H Q5 shape (local-supplier volume): the 6-table star —
    * region→nation→supplier prune the fact via broadcast dims, then
    * orders/customer join. The classic `c_nationkey = s_nationkey`
    * correlation is dropped: the synthetic keys are uncorrelated and
    * it selects zero rows (verified), which would make the query
    * vacuous. Decimal-exact revenue via the house STRING-cast rule. */
  private val q5Sql: String =
    """SELECT n_name,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS STRING) AS DOUBLE)
      |   AS revenue,
      | COUNT(*) AS n_lineitems
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  def sql_tpch_q5(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q5Sql)
  }

  /** TPC-H Q18 (large-volume customers). The textbook `IN (… HAVING)`
    * form scans lineitem TWICE — once for the qualifying-order
    * aggregate and again in the outer join, whose GROUP BY then
    * recomputes the very sum the subquery already produced (measured
    * 2.2–2.5 s at sf0.1, the heaviest query in the catalog). Since
    * o_orderkey is unique in orders and the customer join is N:1, the
    * derived-table form is row-identical: aggregate lineitem ONCE
    * (HAVING keeps the big orders and RETAINS the sum), then decorate
    * with orders + customer. One fact scan, one shuffle, and the
    * post-HAVING row count is tiny so AQE broadcasts it into the
    * decoration joins. Quantity sums go through DECIMAL so engine
    * summation order can't flip a HAVING boundary. */
  private val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      | CAST(CAST(q.qty AS STRING) AS DOUBLE) AS sum_qty
      |FROM (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) q,
      | customer, orders
      |WHERE c_custkey = o_custkey
      |  AND o_orderkey = q.l_orderkey
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin

  def sql_tpch_q18(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q18Sql)
  }

  /** TPC-H Q10 shape (returned-item reporting): quarter-filtered
    * orders ⋈ returned lineitems, customer + nation decoration, top 20
    * by lost revenue. Same ANSI text runs on both engines; revenue
    * decimal-exact via the house STRING-cast rule; LIMIT tie-broken by
    * key so the cut is deterministic. */
  private val q10Sql: String =
    """SELECT c_custkey, c_name,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS STRING) AS DOUBLE)
      |   AS revenue,
      | c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |  AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  def sql_tpch_q10(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q10Sql)
  }

  /** Order-stable array aggregation: sorted distinct segment list per
    * nation rendered as a string (collect_set order is never relied
    * on). */
  def a_array_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
          .as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy("c_nationkey")

  /** Skew-resistant two-phase (salted) aggregation: revenue per return
    * flag — 3 hot keys over 600k rows spread across 16 salt buckets in
    * the partial phase; result identical to a direct GROUP BY (which
    * is exactly what the oracle runs). */
  def a_salted_agg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    graft.ext.Skew.saltedAgg(
      li,
      key = col("l_returnflag"),
      saltSource = col("l_orderkey"),
      buckets = 16,
      aggs = Seq(
        (count(lit(1)), (c: String) => sum(col(c)), "n"),
        (sum(money(col("l_extendedprice"))),
          (c: String) => sum(col(c)).cast(DoubleType), "revenue")))
      .withColumnRenamed("key", "l_returnflag")
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_salted_agg" -> (a_salted_agg _),
    "t_typed_dataset" -> (t_typed_dataset _),
    "w4_rank_suite" -> (w4_rank_suite _),
    "a_cube" -> (a_cube _),
    "d3_intersect_except" -> (d3_intersect_except _),
    "a_pivot" -> (a_pivot _),
    "a_unpivot" -> (a_unpivot _),
    "a_filter_agg" -> (a_filter_agg _),
    "f_fuzzy_match" -> (f_fuzzy_match _),
    "p_sample_hash" -> (p_sample_hash _),
    "f_string_suite" -> (f_string_suite _),
    "f_date_suite" -> (f_date_suite _),
    "j_outer_join" -> (j_outer_join _),
    "sql_tpch_q3" -> (sql_tpch_q3 _),
    "sql_tpch_q5" -> (sql_tpch_q5 _),
    "sql_tpch_q10" -> (sql_tpch_q10 _),
    "sql_tpch_q18" -> (sql_tpch_q18 _),
    "a_array_agg" -> (a_array_agg _))

  val oracle: Map[String, String] = Map(
    "a_salted_agg" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         | ${sqlMsum("l_extendedprice")} AS revenue
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "t_typed_dataset" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_big_orders
        |FROM orders WHERE o_totalprice > 100000.0
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    "w4_rank_suite" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal, drank, prank, quartile
        |FROM (
        | SELECT c_mktsegment, c_custkey, c_acctbal,
        |  ROW_NUMBER() OVER w AS rn,
        |  DENSE_RANK() OVER w AS drank,
        |  PERCENT_RANK() OVER w AS prank,
        |  NTILE(4) OVER w AS quartile
        | FROM customer
        | WINDOW w AS (PARTITION BY c_mktsegment
        |   ORDER BY c_acctbal DESC, c_custkey ASC)) x
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,
    "a_cube" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         | COALESCE(o_orderpriority, 'ALL') AS priority,
         | COUNT(*) AS n, ${sqlMsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
    "d3_intersect_except" ->
      """SELECT 'both' AS tag, nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'customer_only' AS tag, nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT SELECT s_nationkey FROM supplier)
        |ORDER BY tag, nationkey""".stripMargin,
    "a_pivot" ->
      """SELECT o_orderstatus,
        | COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
        | COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        | COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        | COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        | COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a_filter_agg" -> filterAggSql,
    "f_fuzzy_match" ->
      """SELECT p_partkey, levenshtein(p_name, p_brand) AS lev_brand,
        | levenshtein(lower(p_name), reverse(lower(p_name))) AS lev_pal
        |FROM part WHERE p_partkey <= 200
        |ORDER BY p_partkey""".stripMargin,
    "a_unpivot" ->
      s"""WITH wide AS (
         |  SELECT l_returnflag,
         |    ${sqlMsum("l_extendedprice")} AS sum_price,
         |    SUM(l_quantity) AS sum_qty,
         |    CAST(COUNT(*) AS DOUBLE) AS n_items
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, metric, value
         |FROM wide UNPIVOT (value FOR metric IN (sum_price, sum_qty, n_items))
         |ORDER BY l_returnflag, metric""".stripMargin,
    "p_sample_hash" ->
      s"""SELECT COUNT(*) AS n_sampled,
         | ${sqlMsum("o_totalprice")} AS sampled_total,
         | MIN(o_orderkey) AS first_key
         |FROM orders
         |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'""".stripMargin,
    "f_string_suite" ->
      """SELECT p_partkey,
        | regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
        | lpad(p_brand, 10, '.') AS brand_padded,
        | reverse(p_name) AS name_rev,
        | translate(p_type, 'AEO', 'aeo') AS type_translated,
        | CAST(levenshtein(p_name, p_type) AS BIGINT) AS edit_dist,
        | trim('  x  ') AS trimmed,
        | CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_name_parts
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,
    "f_date_suite" ->
      """SELECT o_orderkey, CAST(od AS TIMESTAMP) AS od,
        | CAST(year(od) AS BIGINT) AS y,
        | CAST(month(od) AS BIGINT) AS m,
        | CAST(day(od) AS BIGINT) AS d,
        | CAST(quarter(od) AS BIGINT) AS q,
        | CAST(isodow(od) AS BIGINT) AS isodow,
        | CAST(last_day(od) AS TIMESTAMP) AS month_end,
        | CAST(od + 30 AS TIMESTAMP) AS plus_30d,
        | CAST(date_diff('day', od, DATE '2026-01-01') AS BIGINT) AS days_to_2026
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
        |      WHERE o_orderkey < 500) x
        |ORDER BY o_orderkey""".stripMargin,
    "j_outer_join" ->
      """SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_building_customers
        |FROM nation LEFT OUTER JOIN
        | (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        | ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "sql_tpch_q3" -> q3Sql,
    "sql_tpch_q5" -> q5Sql,
    "sql_tpch_q10" -> q10Sql,
    "sql_tpch_q18" -> q18Sql,
    "a_array_agg" ->
      """SELECT c_nationkey,
        | array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        | COUNT(DISTINCT c_mktsegment) AS n_segments
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
