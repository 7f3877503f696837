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
    assert(allMessages(ddl).contains("destructive DDL"))
  }

  private def allMessages(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("CREATE TABLE + INSERT route through the guarded commit protocol") {
    val root = tmpDir("graft-cat-ddl")
    spark.conf.set("spark.sql.catalog.ddl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ddl.root", root)
    spark.sql("""CREATE TABLE ddl.users (k BIGINT, name STRING, bal DOUBLE)
                 TBLPROPERTIES('keys'='k', 'buckets'='4')""")
    spark.sql("INSERT INTO ddl.users VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    spark.sql("INSERT INTO ddl.users VALUES (3, 'c', 30.0)")
    assert(spark.sql("SELECT sum(bal) AS s FROM ddl.users")
      .head().getDouble(0) === 60.0)

    // the descriptor drove REAL bucketing: a Scala-API open of the
    // same directory bucket-prunes point lookups correctly
    val schema = spark.sql("SELECT * FROM ddl.users").schema
    val tx = new TxTable(spark, s"$root/users", schema, Seq("k"),
      numBuckets = 4)
    assert(tx.lookup(Seq(2L)).collect().map(_.getString(1)).toSeq ===
      Seq("b"))

    spark.sql("INSERT OVERWRITE ddl.users VALUES (CAST(9 AS BIGINT), 'z', 1.0)")
    assert(spark.sql("SELECT count(*) FROM ddl.users").head().getLong(0) === 1L)

    // CHECK constraints gate SQL inserts exactly like Scala appends
    tx.addCheckConstraint("pos_bal", "bal >= 0")
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO ddl.users VALUES (CAST(10 AS BIGINT), 'neg', -5.0)")
    }
    assert(allMessages(bad).contains("pos_bal"))
    assert(spark.sql("SELECT count(*) FROM ddl.users").head().getLong(0) === 1L)

    // keys property is required — physical identity can't be guessed
    val noKeys = intercept[Exception] {
      spark.sql("CREATE TABLE ddl.bad (x INT)")
    }
    assert(allMessages(noKeys).contains("keys"))
  }

  test("DELETE FROM and TRUNCATE TABLE through SQL") {
    val root = tmpDir("graft-cat-del")
    spark.conf.set("spark.sql.catalog.del", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.del.root", root)
    spark.sql("""CREATE TABLE del.t (k BIGINT, g BIGINT)
                 TBLPROPERTIES('keys'='k', 'buckets'='2')""")
    spark.sql("INSERT INTO del.t SELECT id AS k, id % 4 AS g FROM range(40)")
    assert(spark.sql("SELECT count(*) FROM del.t").head().getLong(0) === 40L)
    // merge-on-read delete: rows gone through SQL, no rewrite needed
    spark.sql("DELETE FROM del.t WHERE g = 0")
    assert(spark.sql("SELECT count(*) FROM del.t").head().getLong(0) === 30L)
    assert(spark.sql("SELECT count(*) FROM del.t WHERE g = 0")
      .head().getLong(0) === 0L)
    spark.sql("TRUNCATE TABLE del.t")
    assert(spark.sql("SELECT count(*) FROM del.t").head().getLong(0) === 0L)
  }
}
