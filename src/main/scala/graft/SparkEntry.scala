package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Analytics, ExtQueries, Graph, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, Relational7, TextSim, TxQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator catalog (one entry per
  * implemented operator family from SURVEY.md §2); `oracleSql` holds the
  * equivalent DuckDB SQL for the driver's differential check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.a1_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Relational4.queries ++ Relational5.queries ++ Relational6.queries ++
      Relational7.queries ++
      Analytics.queries ++ TextSim.queries ++ ExtQueries.queries ++
      TxQueries.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Relational2.oracle ++ Relational3.oracle ++
      Relational4.oracle ++ Relational5.oracle ++ Relational6.oracle ++
      Relational7.oracle ++
      Analytics.oracle ++ TextSim.oracle ++ ExtQueries.oracle ++
      TxQueries.oracle ++ Graph.oracle
}
