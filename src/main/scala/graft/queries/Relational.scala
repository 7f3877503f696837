package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import Qhelpers._

/** Relational operator catalog, first tranche. Each query mirrors an
  * operator family from SURVEY.md §2 (IDs in the name), is expressed
  * Spark-first (declarative DataFrame API → Catalyst plans it), and has
  * a DuckDB oracle in [[Relational.oracle]].
  *
  * Determinism rules (driver hash-compares): every output carries a
  * total ORDER BY (unique key suffix breaks ties) and money aggregates
  * use exact decimal arithmetic (see [[Qhelpers]]).
  */
object Relational {

  /** A1/A3-family — grouped pricing summary (TPC-H Q1 analog).
    * Ref: multi-expression aggregation, `services/api/src/index.ts:176-178`
    * and dashboard multi-dim counts `apps/web/src/App.tsx:122-154`. */
  def a1_pricing_summary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** S1-family — full-table scan + sort desc (ref `src/index.ts:212-214`). */
  def s1_scan_sort(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(desc("o_orderdate"), asc("o_orderkey"))

  /** P1/P2-family — equality filter + sort + limit
    * (ref `src/jobs/merge.ts:22-25`, `src/repository.ts:94-100`).
    * Catalyst plans TakeOrderedAndProject (no global sort shuffle). */
  def p1_filter_sort_limit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
      .orderBy(asc("l_shipdate"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(1000)

  /** P3-family — point lookup by key (ref `src/index.ts:411`). */
  def p3_point_lookup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") === 1L)

  /** P4-family — IN-list predicate (ref `src/config/runtime.ts:34-37`). */
  def p4_in_list(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_3", "NATION_7", "NATION_12"))
      .orderBy("n_nationkey")

  /** P6-family — case-insensitive multi-field contains search
    * (ref `apps/web/src/components/ItemBrowser.tsx:78-85`). */
  def p6_text_search(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(lower(col("p_name")).contains("red") ||
        lower(col("p_type")).contains("promo"))
      .select("p_partkey", "p_name", "p_type")
      .orderBy("p_partkey")

  /** P9-family — null-passes recency predicate
    * (ref `src/services/scan.ts:420-429`: null dates are KEPT). */
  def p9_null_tolerant_recency(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate").isNull ||
        col("o_orderdate") >= lit("1997-06-01").cast(TimestampType))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")

  /** J1/A2-family — inner equi-join + group agg + sort by aggregate
    * (ref `src/index.ts:183-194`). */
  def j1_join_group_agg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("line_count"),
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** J5-family — multi-entity join assembly (5-way star join; ref
    * lineage graph `src/lineage.ts:26-132`). region/nation are tiny →
    * Catalyst broadcasts them; orders⋈lineitem shuffles on the key. */
  def j5_star_join(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("line_count"),
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** S9-family — anti-join (insert-if-absent semantics; ref
    * `src/repository.ts:14-23`): customers with no 2001 orders. */
  def s9_anti_join(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast(TimestampType))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Semi-join (EXISTS; implicit in ref J3/S9 patterns): nations having
    * at least one BUILDING-segment customer. */
  def j_semi_join(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_semi")
      .select("n_nationkey", "n_name")
      .orderBy("n_nationkey")
  }

  /** D1-family — distinct-by-key, first-wins (ref `dedupeByUrl`,
    * `src/services/scan.ts:312-321`): first order per customer by
    * (o_orderdate, o_orderkey) — explicit precedence rank, never
    * partition order. */
  def d1_dedup_first_wins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy("o_custkey")
  }

  /** Bloom-reduced fact⋈dim join (`ext.BloomJoin`, §2.3 scale path):
    * the filtered-orders key set becomes a 128 KiB bitmap, the
    * lineitem scan pre-filters on it BEFORE the join shuffle, the join
    * itself removes the bloom's false positives — so the result is the
    * plain join's, which is exactly what the oracle runs. At 100 TB
    * the dim here is the too-big-to-broadcast case: bloom build cost
    * is one dim pass + partitions × 128 KiB of shuffle, vs moving the
    * full unreduced fact. BloomJoinSpec pins the plan (pre-shuffle
    * probe filter present) and the reduction ratio. */
  def j_bloom_join(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderpriority")
    val fact = graft.ext.BloomJoin.reduced(
      t(s, dir, "lineitem"), col("l_orderkey"), dim, col("o_orderkey"))
    fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Salted skew join (`ext.SkewJoin`): the lineitem⋈part join run
    * through explicit (key, salt) salting — the result must equal the
    * plain join (replication × salting partition the match set), so
    * the oracle is the UNSALTED SQL. The spreading property itself is
    * pinned on constructed 90 %-hot data in SkewJoinSpec; here the
    * technique is proven semantically invisible on real tables. */
  def j_salted_join(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_partkey", "l_quantity")
    val part = t(s, dir, "part").select("p_partkey", "p_brand")
    graft.ext.SkewJoin.saltedInner(li, part,
        Seq("l_partkey" -> "p_partkey"), salts = 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast(DoubleType).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** J7-family — cross join (cartesian; ref `src/jobs/merge.ts:147-158`). */
  def j7_cross_join(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").select("r_name")
    val st = t(s, dir, "orders").select("o_orderstatus").distinct()
    r.crossJoin(st).orderBy("r_name", "o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_pricing_summary" -> (a1_pricing_summary _),
    "s1_scan_sort" -> (s1_scan_sort _),
    "p1_filter_sort_limit" -> (p1_filter_sort_limit _),
    "p3_point_lookup" -> (p3_point_lookup _),
    "p4_in_list" -> (p4_in_list _),
    "p6_text_search" -> (p6_text_search _),
    "p9_null_tolerant_recency" -> (p9_null_tolerant_recency _),
    "j1_join_group_agg" -> (j1_join_group_agg _),
    "j5_star_join" -> (j5_star_join _),
    "s9_anti_join" -> (s9_anti_join _),
    "j_semi_join" -> (j_semi_join _),
    "d1_dedup_first_wins" -> (d1_dedup_first_wins _),
    "j_bloom_join" -> (j_bloom_join _),
    "j_salted_join" -> (j_salted_join _),
    "j7_cross_join" -> (j7_cross_join _))

  val oracle: Map[String, String] = Map(
    // the bloom reduction is semantically invisible — oracle = plain join
    "j_bloom_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_lines,
         | ${sqlDiscountedSum("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // salting is semantically invisible — oracle = plain join
    "j_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "a1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sqlMsum("l_quantity")} AS sum_qty,
         | ${sqlMsum("l_extendedprice")} AS sum_base_price,
         | ${sqlDiscountedSum("l_extendedprice", "l_discount")} AS sum_disc_price,
         | COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s1_scan_sort" ->
      "SELECT * FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC",
    "p1_filter_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 1000""".stripMargin,
    "p3_point_lookup" ->
      "SELECT * FROM orders WHERE o_orderkey = 1",
    "p4_in_list" ->
      """SELECT * FROM nation
        |WHERE n_name IN ('NATION_1','NATION_3','NATION_7','NATION_12')
        |ORDER BY n_nationkey""".stripMargin,
    "p6_text_search" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%promo%'
        |ORDER BY p_partkey""".stripMargin,
    "p9_null_tolerant_recency" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         | ${sqlMsum("o_totalprice")} AS total
         |FROM orders
         |WHERE o_orderdate IS NULL OR o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "j1_join_group_agg" ->
      s"""SELECT o_orderpriority, COUNT(*) AS line_count,
         | ${sqlDiscountedSum("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "j5_star_join" ->
      s"""SELECT r_name, n_name, COUNT(*) AS line_count,
         | ${sqlDiscountedSum("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "s9_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "j_semi_join" ->
      """SELECT n_nationkey, n_name FROM nation n
        |WHERE EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY n_nationkey""".stripMargin,
    "d1_dedup_first_wins" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders) x
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "j7_cross_join" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        |ORDER BY r_name, o_orderstatus""".stripMargin)
}
