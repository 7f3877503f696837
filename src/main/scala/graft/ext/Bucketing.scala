package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers (SURVEY §4 / builder scale mandate):
  * pre-shuffle a table ONCE into `nBuckets` hash buckets on the join
  * key so every subsequent equi-join or aggregation on that key is
  * co-located — no Exchange at query time. The big-fact-table idiom
  * at 100 TB: pay the shuffle at ingest, never again.
  *
  * Bucketed layout needs the session catalog (`saveAsTable`); the
  * warehouse dir is whatever `spark.sql.warehouse.dir` points at.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when the executed plan of `df` contains no shuffle. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
