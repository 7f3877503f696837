package graft

import org.apache.spark.sql.functions._

/** `MERGE … WITH SCHEMA EVOLUTION`: the table declares
  * AUTOMATIC_SCHEMA_EVOLUTION, so the analyzer widens the target
  * through the catalog's AddColumn path (nullable appends, the
  * appendEvolving contract) before the row-level rewrite plans —
  * one statement upserts AND evolves. */
class MergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  test("MERGE WITH SCHEMA EVOLUTION widens the target and applies rows") {
    val root = tmpDir("mrgevo")
    spark.conf.set("spark.sql.catalog.mev", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mev.root", root)
    spark.sql("""CREATE TABLE mev.t (k BIGINT, v INT)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO mev.t VALUES (1, 10), (9, 90)")
    Seq((1L, 11, "x"), (2L, 20, "y")).toDF("k", "v", "tag")
      .createOrReplaceTempView("mev_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mev.t AS t
        |USING mev_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("mev.t").columns.toSeq === Seq("k", "v", "tag"))
    val got = spark.sql("SELECT k, v, tag FROM mev.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got === Seq((1L, 11, "x"), (2L, 20, "y"), (9L, 90, null)))
    // WITHOUT the clause, a new source column does NOT evolve the
    // schema (Spark assigns INSERT * by target columns; extras are
    // ignored) — evolution happens only when asked for
    Seq((3L, 30, "z", 1.5)).toDF("k", "v", "tag", "extra")
      .createOrReplaceTempView("mev_src2")
    spark.sql(
      """MERGE INTO mev.t AS t
        |USING mev_src2 AS s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("mev.t").columns.toSeq === Seq("k", "v", "tag"),
      "plain MERGE must not widen the schema")
    assert(spark.sql("SELECT tag FROM mev.t WHERE k = 3")
      .head().getString(0) === "z")
  }

  test("MERGE WITH SCHEMA EVOLUTION on a RENAMED-column table") {
    val root = tmpDir("mrgevo2")
    spark.conf.set("spark.sql.catalog.mev2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mev2.root", root)
    spark.sql("""CREATE TABLE mev2.t (k BIGINT, v INT)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO mev2.t VALUES (1, 10)")
    spark.sql("ALTER TABLE mev2.t RENAME COLUMN v TO value")
    Seq((1L, 100, "a"), (2L, 200, "b")).toDF("k", "value", "note")
      .createOrReplaceTempView("mev2_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mev2.t AS t
        |USING mev2_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT k, value, note FROM mev2.t ORDER BY k")
      .as[(Long, Int, String)].collect().toSeq
    assert(got === Seq((1L, 100, "a"), (2L, 200, "b")))
  }
}
