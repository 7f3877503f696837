package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

import graft.core.Tables

/** Fourth relational tranche: the remaining TPC-H query SHAPES the
  * catalog didn't yet exercise, adapted to the synthetic schema (no
  * partsupp / shipmode / container / phone columns — equivalent
  * predicates substitute, the operator shape is what's under test):
  *
  *  - q4   correlated EXISTS semi-join driving an aggregate
  *  - q7   two-role dimension join (nation × nation) with a
  *         disjunctive pair predicate
  *  - q8   nested-subquery market-share ratio (conditional agg / agg)
  *  - q14  CASE-inside-SUM conditional aggregate ratio
  *  - q17  correlated scalar AVG subquery against the outer row
  *  - q19  OR-of-ANDs join predicate (pushdown + join strategy test)
  *  - q21  EXISTS + NOT EXISTS self-joins on the fact table
  *  - q22  anti-join (NOT EXISTS) with an uncorrelated scalar subquery
  *
  * All run through the spark.sql surface over registered views; the
  * IDENTICAL text runs on DuckDB as the oracle (ANSI subset, house
  * decimal→STRING→DOUBLE rule for money sums — see [[Qhelpers]]).
  *
  * Scale notes (100 TB): every query here aggregates or semi-joins the
  * fact table; Catalyst plans the EXISTS/NOT EXISTS as semi/anti hash
  * joins shuffled on l_orderkey (no per-row subquery execution), the
  * q17 correlated AVG becomes an aggregate + equi-join on l_partkey,
  * and the dimension sides (part, nation, supplier, customer at TPC-H
  * proportions) broadcast. Plans audited in PLANS.md.
  */
object Relational4 {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  /** TPC-H Q4 shape (order-priority checking): a date-windowed scan of
    * orders semi-joined (EXISTS) to returned lineitems. */
  private val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7 shape (volume shipping): nation joined TWICE under
    * different roles (supplier's vs customer's), cross-pair predicate,
    * per-year revenue. The classic two-literal OR is widened to an
    * IN × IN ≠ pair so all six directed pairs populate at sf0.001. */
  private val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | CAST(year(l_shipdate) AS BIGINT) AS l_year,
      | COUNT(*) AS n_items,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS STRING) AS DOUBLE)
      |   AS revenue
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |WHERE s_suppkey = l_suppkey
      |  AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey
      |  AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND n1.n_name IN ('NATION_1','NATION_2','NATION_3')
      |  AND n2.n_name IN ('NATION_1','NATION_2','NATION_3')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape (national market share): one nation's share of a
    * region's yearly volume for one part type. The ratio divides two
    * STRING-normalized decimal sums, so both engines divide identical
    * doubles (IEEE division is then bit-deterministic). */
  private val q8Sql: String =
    """SELECT o_year,
      | CAST(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
      |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE)
      |   AS nation_volume,
      | CAST(CAST(SUM(volume) AS STRING) AS DOUBLE) AS total_volume,
      | CAST(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
      |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE)
      |   / CAST(CAST(SUM(volume) AS STRING) AS DOUBLE) AS mkt_share
      |FROM (
      | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(12,6))) AS volume,
      |  n1.n_name AS nation
      | FROM part, supplier, lineitem, orders, customer, nation n1,
      |      nation n2, region
      | WHERE p_partkey = l_partkey
      |  AND s_suppkey = l_suppkey
      |  AND l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND n2.n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND s_nationkey = n1.n_nationkey
      |  AND p_type = 'STANDARD') x
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q14 shape (promotion effect): CASE-guarded revenue over
    * total revenue in one month. */
  private val q14Sql: String =
    """SELECT COUNT(*) AS n_items,
      | CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
      |   THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |     * (1 - CAST(l_discount AS DECIMAL(12,6)))
      |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE)
      |   AS promo_revenue,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS STRING) AS DOUBLE)
      |   AS total_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** TPC-H Q17 shape (small-quantity orders): each lineitem compared
    * to a correlated per-part average — de-correlated to an aggregate
    * + equi-join on l_partkey; no per-row subquery. The AVG is over
    * integer-valued doubles, so its value is summation-order
    * independent and the threshold can't flip between engines.
    *
    * This text is the ORACLE; the Spark side runs [[q17Spark]], which
    * adds the aggregate-input reduction DuckDB's optimizer performs
    * implicitly (see there). */
  private val q17Sql: String =
    """SELECT COUNT(*) AS n_small,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING)
      |   AS DOUBLE) AS total_price
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
      |                    FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q19 shape (discounted revenue): a disjunction of
    * brand/size/quantity conjunctions spanning BOTH join sides — the
    * whole OR cannot push below the join, but its single-side residues
    * can, and the common p_partkey = l_partkey stays a hash join
    * (container/shipmode predicates of the original map to p_size and
    * quantity bands here). */
  private val q19Sql: String =
    """SELECT COUNT(*) AS n_matched,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS STRING) AS DOUBLE)
      |   AS revenue
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      | AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
      |        AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
      |        AND l_quantity BETWEEN 20 AND 40))""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the fact
    * table joined to itself twice — EXISTS (another supplier
    * contributed to the order) AND NOT EXISTS (another supplier also
    * flagged) — adapted to return flags (the original's receipt >
    * commit dates don't exist in this schema). Semi + anti hash joins
    * on l_orderkey. A fold-into-one-aggregation rewrite (per
    * (order, supplier) counts + per-order windows) was MEASURED
    * SLOWER (1.5 → 2.5 s warm at sf0.1): the sort-based window over
    * the pair aggregate costs more than two extra columnar scans
    * whose projections are two ints — the q18/q11 single-scan
    * treatment does not generalize to this shape. */
  private val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |              WHERE l3.l_orderkey = l1.l_orderkey
      |                AND l3.l_suppkey <> l1.l_suppkey
      |                AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** TPC-H Q22 shape (global sales opportunity): above-average-balance
    * customers with no recent orders, grouped by a name-derived code
    * (the original's phone country code). Uncorrelated scalar
    * subqueries + NOT EXISTS anti-join. The above-average test is
    * DECIMAL-EXACT (`bal × count > total`, both sides integral cents —
    * the house boundary discipline): a raw double AVG threshold could
    * flip a boundary row on engine summation order. */
  private val q22Sql: String =
    """SELECT cntrycode, COUNT(*) AS numcust,
      | CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS STRING)
      |   AS DOUBLE) AS totacctbal
      |FROM (
      | SELECT substr(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      | FROM customer
      | WHERE CAST(c_acctbal AS DECIMAL(18,2))
      |       * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
      |     > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
      |        FROM customer WHERE c_acctbal > 0.0)) c
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  private val texts: Map[String, String] = Map(
    "sql_tpch_q4" -> q4Sql,
    "sql_tpch_q7" -> q7Sql,
    "sql_tpch_q8" -> q8Sql,
    "sql_tpch_q14" -> q14Sql,
    "sql_tpch_q17" -> q17Sql,
    "sql_tpch_q19" -> q19Sql,
    "sql_tpch_q21" -> q21Sql,
    "sql_tpch_q22" -> q22Sql)

  /** Spark plan for the q17 shape, with the reduction Catalyst does
    * not derive on its own: only `p_brand = 'Brand#1'` part keys (~4%
    * of parts) can survive the final equi-join, so the decorrelated
    * per-part AVG's input is first reduced by a broadcast SEMI-join on
    * the brand-filtered key set — the per-part aggregate then reads
    * ~4% of lineitem instead of all of it, and both lineitem scans
    * carry the same pre-shuffle reduction. DuckDB performs this
    * join-predicate transfer inside its optimizer, which is why the
    * unreduced oracle text is fair; semantically the reduction is
    * invisible because a per-part AVG is unchanged for every key that
    * can still join. At 100 TB the semi-join filter is the difference
    * between aggregating the whole fact table and aggregating one
    * brand's slice; were `part` itself too big to broadcast, the same
    * reduction rides `ext.BloomJoin.reduced`. */
  private def q17Spark(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    val brandKeys = s.table("part")
      .filter(col("p_brand") === "Brand#1").select("p_partkey")
    val li = s.table("lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(brandKeys),
        col("l_partkey") === col("p_partkey"), "left_semi")
    // per-part threshold over the reduced slice: exact integer-valued
    // sum, one division, one halving — bit-deterministic vs the oracle
    val thr = li.groupBy("l_partkey")
      .agg((lit(0.5) * avg(col("l_quantity"))).as("_thr"))
    li.join(thr, Seq("l_partkey"))
      .filter(col("l_quantity") < col("_thr"))
      .agg(count(lit(1)).as("n_small"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(StringType).cast(DoubleType).as("total_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => sql(s, dir, text))
    } + ("sql_tpch_q17" -> (q17Spark _))

  val oracle: Map[String, String] = texts
}
