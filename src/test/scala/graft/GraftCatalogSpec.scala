package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** DSv2 table catalog: SQL addresses TxTables by identifier
  * (catalog.namespace.table → warehouse subdirectories), read-only
  * DDL refusal, honest NoSuchTable errors. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("SQL by identifier across namespaces; DDL refused; errors honest") {
    val root = tmpDir("graft-cat")
    val sales = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val tSales = new TxTable(spark, s"$root/sales", sales.schema,
      Seq("k"), numBuckets = 2)
    tSales.append(sales)
    val ev = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val tEv = new TxTable(spark, s"$root/raw/events", ev.schema,
      Seq("k"), numBuckets = 2)
    tEv.append(ev)

    spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lake.root", root)

    assert(spark.sql("SELECT sum(v) AS s FROM lake.sales")
      .head().getDouble(0) === 60.0)
    assert(spark.sql("SELECT count(*) FROM lake.raw.events")
      .head().getLong(0) === 2L)
    // catalog tables still snapshot-pin + prune like format("graft")
    val df = spark.sql("SELECT k FROM lake.sales WHERE k = 2")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(spark.sql("SHOW TABLES IN lake").collect()
      .map(_.getString(1)).contains("sales"))

    val missing = intercept[Exception] {
      spark.sql("SELECT * FROM lake.nope").collect()
    }
    assert(missing.getMessage.toLowerCase.contains("nope"))

    val ddl = intercept[Exception] {
      spark.sql("DROP TABLE lake.sales")
    }
    assert(ddl.getMessage.contains("read-only"))
  }
}
