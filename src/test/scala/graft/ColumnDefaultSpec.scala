package graft

import org.apache.spark.sql.functions._

/** Column DEFAULT values, Delta's exact semantics: CREATE-time
  * defaults and ALTER COLUMN SET/DROP DEFAULT apply to FUTURE
  * inserts that omit the column (CURRENT_DEFAULT metadata the
  * analyzer resolves); existing rows are untouched; ADD COLUMN
  * cannot carry a default (existing files don't hold the value). */
class ColumnDefaultSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE TABLE with DEFAULT fills omitted insert columns") {
    val root = tmpDir("coldef")
    spark.conf.set("spark.sql.catalog.cdf1", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf1.root", root)
    spark.sql(
      """CREATE TABLE cdf1.t (
        |  k BIGINT, status STRING DEFAULT 'pending', score INT DEFAULT 0)
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin)
    spark.sql("INSERT INTO cdf1.t (k) VALUES (1)")
    spark.sql("INSERT INTO cdf1.t (k, status) VALUES (2, 'done')")
    spark.sql("INSERT INTO cdf1.t VALUES (3, 'x', 9)")
    val got = spark.sql("SELECT * FROM cdf1.t ORDER BY k")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === Seq((1L, "pending", 0), (2L, "done", 0), (3L, "x", 9)))
    // the default survives a catalog reload (schema header round-trip)
    spark.conf.set("spark.sql.catalog.cdf1b", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf1b.root", root)
    spark.sql("INSERT INTO cdf1b.t (k) VALUES (4)")
    assert(spark.sql("SELECT status FROM cdf1b.t WHERE k = 4")
      .head().getString(0) === "pending")
  }

  test("ALTER COLUMN SET/DROP DEFAULT affects future inserts only") {
    val root = tmpDir("coldef2")
    spark.conf.set("spark.sql.catalog.cdf2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf2.root", root)
    spark.sql("""CREATE TABLE cdf2.t (k BIGINT, v INT)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO cdf2.t VALUES (1, NULL)")
    spark.sql("ALTER TABLE cdf2.t ALTER COLUMN v SET DEFAULT 42")
    spark.sql("INSERT INTO cdf2.t (k) VALUES (2)")
    // pre-default row keeps its stored NULL; new omitted insert gets 42
    val got = spark.sql("SELECT k, v FROM cdf2.t ORDER BY k").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(got.toSeq === Seq(1L -> None, 2L -> Some(42)))
    spark.sql("ALTER TABLE cdf2.t ALTER COLUMN v DROP DEFAULT")
    spark.sql("INSERT INTO cdf2.t (k) VALUES (3)")
    assert(spark.sql("SELECT v FROM cdf2.t WHERE k = 3").head().isNullAt(0))
  }

  test("Delta export scrubs defaults; re-sync of a defaulted table is a no-op") {
    val root = tmpDir("coldef-delta")
    spark.conf.set("spark.sql.catalog.cdfd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdfd.root", root)
    spark.sql("""CREATE TABLE cdfd.t (k BIGINT, v INT DEFAULT 7)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO cdfd.t (k) VALUES (1)")
    val tx = graft.core.TxTable.openReadOnly(spark, s"$root/t",
      requireDescriptor = true)
    assert(graft.core.DeltaExport.syncDeltaLog(spark, tx).isDefined)
    // the exported schemaString carries no write-side directives
    val log = scala.io.Source.fromFile(new java.io.File(
      s"$root/t/_delta_log/00000000000000000000.json")).mkString
    assert(!log.contains("CURRENT_DEFAULT") && !log.contains("EXISTS_DEFAULT"))
    // no drift: an unchanged defaulted table must sync to NOTHING
    assert(graft.core.DeltaExport.syncDeltaLog(spark, tx).isEmpty,
      "re-sync of an unchanged defaulted table must be a no-op")
    assert(graft.core.DeltaImport.read(spark, s"$root/t")
      .head().getInt(1) === 7)
  }

  test("ADD COLUMN with DEFAULT refuses; bad default expressions refuse") {
    val root = tmpDir("coldef3")
    spark.conf.set("spark.sql.catalog.cdf3", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf3.root", root)
    spark.sql("""CREATE TABLE cdf3.t (k BIGINT, v INT)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO cdf3.t VALUES (1, 1)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE cdf3.t ADD COLUMN w INT DEFAULT 5")
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    assert(msgs(e).contains("SET DEFAULT"))
    // add-then-set-default is the documented path, and works
    spark.sql("ALTER TABLE cdf3.t ADD COLUMN w INT")
    spark.sql("ALTER TABLE cdf3.t ALTER COLUMN w SET DEFAULT 5")
    spark.sql("INSERT INTO cdf3.t (k, v) VALUES (2, 2)")
    assert(spark.sql("SELECT w FROM cdf3.t ORDER BY k").collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq === Seq(-1, 5))
  }
}
