package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Shared helpers for the oracle-checked query catalog.
  *
  * Floating-point discipline: the driver hash-compares our parquet output
  * against DuckDB executing the same SQL. Double summation order differs
  * between engines, so money aggregates are computed in exact decimal
  * arithmetic (cast each input to a fixed-scale decimal, aggregate, cast
  * the final value back to double — bit-identical in both engines).
  */
object Qhelpers {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val dec18_2: DecimalType = DecimalType(18, 2)
  val dec12_6: DecimalType = DecimalType(12, 6)

  /** Exact decimal view of a money/measure double column. */
  def money(c: Column): Column = c.cast(dec18_2)

  /** Exact decimal view of a small ratio column (discount, tax). */
  def ratio(c: Column): Column = c.cast(dec12_6)

  /** SUM over exact decimals, surfaced as double (deterministic). */
  def msum(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** l_extendedprice * (1 - l_discount) in exact decimal. */
  def discounted(price: Column, discount: Column): Column =
    money(price) * (lit(1) - ratio(discount))

  /** Oracle-side SQL fragment equivalents (DuckDB dialect = ANSI).
    * The final decimal→double conversion goes through VARCHAR: DuckDB's
    * direct decimal cast is not correctly rounded (off by one ulp at
    * ~5e9 magnitudes, observed at sf0.1), while its string→double is;
    * Spark's Decimal→double is correctly rounded — so this makes both
    * engines agree bit-for-bit at every scale factor. */
  def sqlMsum(col: String): String =
    s"CAST(CAST(SUM(CAST($col AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
  def sqlDiscountedSum(price: String, discount: String): String =
    s"CAST(CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($discount AS DECIMAL(12,6)))) AS VARCHAR) AS DOUBLE)"
}
