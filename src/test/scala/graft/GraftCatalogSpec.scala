package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** DSv2 table catalog: SQL addresses TxTables by identifier
  * (catalog.namespace.table → warehouse subdirectories), read-only
  * DDL refusal, honest NoSuchTable errors. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("SQL by identifier across namespaces; RENAME TO relocates; errors honest") {
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

    // RENAME TO: one atomic directory rename — data, history, tags
    // and time travel all relocate (manifests are table-relative)
    tSales.createTag("pre-rename")
    spark.sql("ALTER TABLE lake.sales RENAME TO sales2")
    assert(spark.sql("SELECT sum(v) AS s FROM lake.sales2")
      .head().getDouble(0) === 60.0)
    assert(spark.sql("SELECT count(*) FROM lake.sales2 " +
      "VERSION AS OF 'pre-rename'").head().getLong(0) === 3L)
    val gone = intercept[Exception] {
      spark.sql("SELECT * FROM lake.sales").collect()
    }
    assert(gone.getMessage.toLowerCase.contains("sales"))
    // across namespaces too, and the old identifier stays free
    spark.sql("ALTER TABLE lake.sales2 RENAME TO raw.sales3")
    assert(spark.sql("SELECT count(*) FROM lake.raw.sales3")
      .head().getLong(0) === 3L)
    // a live branch pins the path: rename refuses with the remedy
    val t3 = graft.core.TxTable.openReadOnly(spark, s"$root/raw/sales3",
      requireDescriptor = true)
    t3.createBranch("wip")
    val pinned = intercept[Exception] {
      spark.sql("ALTER TABLE lake.raw.sales3 RENAME TO sales4")
    }
    assert(allMessages(pinned).contains("branch"))
    t3.dropBranch("wip")
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

  test("DROP TABLE is a retained tombstone; ALTER TABLE ADD COLUMNS evolves") {
    val root = tmpDir("graft-cat-drop")
    spark.conf.set("spark.sql.catalog.ddl2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ddl2.root", root)
    spark.sql("""CREATE TABLE ddl2.t (k BIGINT, v DOUBLE)
                 TBLPROPERTIES('keys'='k', 'buckets'='2')""")
    spark.sql("INSERT INTO ddl2.t SELECT id, id * 1.5 FROM range(10)")

    // ADD COLUMNS: metadata-only evolution; old rows null-fill
    spark.sql("ALTER TABLE ddl2.t ADD COLUMNS (tag STRING)")
    assert(spark.sql("SELECT * FROM ddl2.t").columns.toSeq ===
      Seq("k", "v", "tag"))
    assert(spark.sql("SELECT count(*) FROM ddl2.t WHERE tag IS NULL")
      .head().getLong(0) === 10L)
    spark.sql("INSERT INTO ddl2.t VALUES (100, 0.5, 'new')")
    assert(spark.sql("SELECT tag FROM ddl2.t WHERE k = 100")
      .head().getString(0) === "new")

    // non-add alterations stay refused
    val bad = intercept[Exception] {
      spark.sql("ALTER TABLE ddl2.t ALTER COLUMN v TYPE STRING")
    }
    assert(allMessages(bad).contains("destructive DDL") ||
      allMessages(bad).toLowerCase.contains("unsupported"))

    // DROP: table vanishes from the catalog...
    spark.sql("DROP TABLE ddl2.t")
    assert(!spark.sql("SHOW TABLES IN ddl2").collect()
      .map(_.getString(1)).contains("t"))
    val gone = intercept[Exception] {
      spark.sql("SELECT * FROM ddl2.t").collect()
    }
    assert(allMessages(gone).toLowerCase.contains("t"))

    // ...but data + history are retained: the Scala API undrops and
    // every row is still there
    val t = new graft.core.TxTable(spark,
      s"$root/t", new org.apache.spark.sql.types.StructType(), Seq("k"),
      numBuckets = 2)
    assert(t.isDropped)
    t.undropTable()
    assert(spark.sql("SELECT count(*) FROM ddl2.t").head().getLong(0) === 11L)

    // re-creating over a dropped (not undropped) table names the remedy
    spark.sql("DROP TABLE ddl2.t")
    val recreate = intercept[Exception] {
      spark.sql("""CREATE TABLE ddl2.t (k BIGINT)
                   TBLPROPERTIES('keys'='k')""")
    }
    assert(allMessages(recreate).contains("undropTable"))
  }

  test("CREATE TABLE AS SELECT lands create + populate through the protocol") {
    val root = tmpDir("graft-cat-ctas")
    spark.conf.set("spark.sql.catalog.ctas", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ctas.root", root)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")

    spark.sql("""CREATE TABLE ctas.agg TBLPROPERTIES('keys'='k','buckets'='2')
                 AS SELECT k, v * 2 AS v2 FROM ctas_src WHERE k <= 2""")
    assert(spark.sql("SELECT k, v2 FROM ctas.agg ORDER BY k")
      .as[(Long, Double)].collect().toSeq === Seq((1L, 20.0), (2L, 40.0)))
    // the created table is a REAL TxTable: descriptor recorded, the
    // CTAS population is a guarded commit (v0 create + v1 insert)
    val t = TxTable.openReadOnly(spark, s"$root/agg")
    assert(t.keys === Seq("k"))
    assert(t.currentVersion === 1L)
    // key column must exist in the SELECT's schema, like plain CREATE
    val bad = intercept[Exception] {
      spark.sql("""CREATE TABLE ctas.bad TBLPROPERTIES('keys'='nope')
                   AS SELECT k FROM ctas_src""")
    }
    assert(allMessages(bad).contains("nope"))
  }

  test("REPLACE TABLE AS SELECT: one commit, history retained, layout pinned") {
    val root = tmpDir("graft-cat-rtas")
    spark.conf.set("spark.sql.catalog.rt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rt.root", root)
    spark.sql("""CREATE TABLE rt.t (k BIGINT, v DOUBLE)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO rt.t VALUES (1, 1.5), (2, 2.5)")
    val tx = TxTable.openReadOnly(spark, s"$root/t")
    val preVersion = tx.currentVersion

    // redefinition: new column set, new rows — ONE commit, not
    // drop-and-recreate; the physical layout carries over
    spark.sql("""REPLACE TABLE rt.t TBLPROPERTIES('keys'='k')
                 AS SELECT CAST(10 AS BIGINT) AS k, 'ten' AS label""")
    assert(spark.table("rt.t").columns.toSeq === Seq("k", "label"))
    assert(spark.sql("SELECT label FROM rt.t").as[String].collect().toSeq
      === Seq("ten"))
    assert(tx.currentVersion === preVersion + 1)
    // history retained: time travel below the replace reads the OLD
    // definition (schema AND rows)
    val old = spark.sql(s"SELECT * FROM rt.t VERSION AS OF $preVersion")
    assert(old.columns.toSeq === Seq("k", "v"))
    assert(old.count() === 2L)

    // CREATE OR REPLACE on a missing table creates it
    spark.sql("""CREATE OR REPLACE TABLE rt.t2 TBLPROPERTIES('keys'='k')
                 AS SELECT CAST(1 AS BIGINT) AS k""")
    assert(spark.sql("SELECT count(*) FROM rt.t2").head().getLong(0) === 1L)

    // the layout is the table's identity: REPLACE cannot change keys
    val badKeys = intercept[Exception] {
      spark.sql("""REPLACE TABLE rt.t TBLPROPERTIES('keys'='label')
                   AS SELECT CAST(1 AS BIGINT) AS k, 'x' AS label""")
    }
    assert(allMessages(badKeys).contains("rebucketTo"))
    // ...and a failed REPLACE rolls back to the pre-statement version
    assert(spark.table("rt.t").columns.toSeq === Seq("k", "label"))
  }

  test("SHOW TBLPROPERTIES / DESCRIBE surface the layout identity") {
    val root = tmpDir("graft-cat-props")
    spark.conf.set("spark.sql.catalog.pr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pr.root", root)
    spark.sql("""CREATE TABLE pr.t (k BIGINT, v DOUBLE)
                 TBLPROPERTIES('keys'='k','buckets'='4','blooms'='k')""")
    val props = spark.sql("SHOW TBLPROPERTIES pr.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("keys") === Some("k"))
    assert(props.get("buckets") === Some("4"))
    assert(props.get("blooms") === Some("k"))
    assert(props.contains("version"))
  }

  test("staging guards: invisibility marker, non-empty target, CHECK-vs-REPLACE") {
    val root = tmpDir("graft-cat-stage")
    spark.conf.set("spark.sql.catalog.sg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sg.root", root)

    // an orphaned CTAS staging dir (crashed driver) is INVISIBLE to
    // the catalog, and re-creating the name states the remedy
    spark.sql("""CREATE TABLE sg.orphan (k BIGINT)
                 TBLPROPERTIES('keys'='k')""")
    val marker = new java.io.File(s"$root/orphan", "_staging")
    assert(marker.createNewFile())
    assert(!spark.catalog.tableExists("sg.orphan"))
    val gone = intercept[Exception] {
      spark.sql("SELECT * FROM sg.orphan").collect()
    }
    assert(allMessages(gone).contains("orphan"))
    val recreate = intercept[Exception] {
      spark.sql("CREATE TABLE sg.orphan (k BIGINT) TBLPROPERTIES('keys'='k')")
    }
    assert(allMessages(recreate).contains("CTAS"))
    assert(marker.delete()) // back to live
    assert(spark.catalog.tableExists("sg.orphan"))

    // CTAS refuses ANY pre-existing target directory (it could be, or
    // gain, namespace content; abort's recursive delete must only
    // ever remove what the statement itself created)
    spark.sql("""CREATE TABLE sg.ns.inner (k BIGINT)
                 TBLPROPERTIES('keys'='k')""")
    val clash = intercept[Exception] {
      spark.sql("""CREATE TABLE sg.ns TBLPROPERTIES('keys'='k')
                   AS SELECT CAST(1 AS BIGINT) AS k""")
    }
    assert(allMessages(clash).contains("creates its own directory"))
    assert(spark.sql("SELECT count(*) FROM sg.ns.inner").head()
      .getLong(0) === 0L) // the nested table survived untouched
    // even an EMPTY pre-existing dir is refused for CTAS (plain
    // CREATE TABLE may still adopt it)
    assert(new java.io.File(root, "premade").mkdir())
    val empty = intercept[Exception] {
      spark.sql("""CREATE TABLE sg.premade TBLPROPERTIES('keys'='k')
                   AS SELECT CAST(1 AS BIGINT) AS k""")
    }
    assert(allMessages(empty).contains("creates its own directory"))
    spark.sql("CREATE TABLE sg.premade (k BIGINT) TBLPROPERTIES('keys'='k')")
    assert(spark.catalog.tableExists("sg.premade"))

    // guarded restore: rolls back only while the head is the expected
    // commit - a racing writer's commit makes it a no-op
    val rt = TxTable.openReadOnly(spark, s"$root/premade")
    spark.sql("INSERT INTO sg.premade VALUES (1)") // v1
    spark.sql("INSERT INTO sg.premade VALUES (2)") // v2 (the "racer")
    assert(!rt.restoreIfHead(expectedHead = 1L, v = 0L)) // stale head
    assert(spark.sql("SELECT count(*) FROM sg.premade").head()
      .getLong(0) === 2L) // nothing unwound
    assert(rt.restoreIfHead(expectedHead = 2L, v = 1L))
    assert(spark.sql("SELECT count(*) FROM sg.premade").head()
      .getLong(0) === 1L)

    // a CHECK referencing a column the REPLACE narrows away is
    // refused with the remedy, not a raw unresolved-column error
    spark.sql("""CREATE TABLE sg.chk (k BIGINT, v DOUBLE)
                 TBLPROPERTIES('keys'='k')""")
    TxTable.openReadOnly(spark, s"$root/chk")
      .addCheckConstraint("v_pos", "v >= 0")
    val chk = intercept[Exception] {
      spark.sql("""REPLACE TABLE sg.chk TBLPROPERTIES('keys'='k')
                   AS SELECT CAST(1 AS BIGINT) AS k, 'x' AS label""")
    }
    assert(allMessages(chk).contains("dropCheckConstraint"))

    // a runtime-failing RTAS aborts to exactly the pre-statement
    // state (committedVersion=None -> nothing restored, nothing lost)
    spark.sql("INSERT INTO sg.chk VALUES (1, 2.5)")
    val tx = TxTable.openReadOnly(spark, s"$root/chk")
    val pre = tx.currentVersion
    intercept[Exception] {
      spark.sql("""REPLACE TABLE sg.chk TBLPROPERTIES('keys'='k')
                   AS SELECT CAST(1 AS BIGINT) AS k,
                      CAST(raise_error('boom') AS DOUBLE) AS v""")
    }
    assert(tx.currentVersion === pre)
    assert(spark.sql("SELECT count(*) FROM sg.chk").head().getLong(0) === 1L)
  }

  test("ALTER TABLE DROP COLUMN: metadata-only narrowing through SQL") {
    val root = tmpDir("graft-cat-dropcol")
    spark.conf.set("spark.sql.catalog.dc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dc.root", root)
    spark.sql("""CREATE TABLE dc.t (k BIGINT, v DOUBLE, note STRING)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO dc.t VALUES (1, 1.5, 'x'), (2, 2.5, 'y')")

    spark.sql("ALTER TABLE dc.t DROP COLUMN note")
    assert(spark.table("dc.t").columns.toSeq === Seq("k", "v"))
    assert(spark.sql("SELECT count(*) FROM dc.t").head().getLong(0) === 2L)
    // resurrection guard fires through SQL too
    val res = intercept[Exception] {
      spark.sql("ALTER TABLE dc.t ADD COLUMNS (note STRING)")
    }
    assert(allMessages(res).contains("resurrect"))
    // key columns refuse with the physical-identity rationale
    val key = intercept[Exception] {
      spark.sql("ALTER TABLE dc.t DROP COLUMN k")
    }
    assert(allMessages(key).contains("key column"))
  }

  test("ALTER COLUMN TYPE widens metadata-only; unsafe changes refuse") {
    val root = tmpDir("graft-cat-widen")
    spark.conf.set("spark.sql.catalog.wd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wd.root", root)
    spark.sql("""CREATE TABLE wd.t (k BIGINT, n INT, f FLOAT)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO wd.t VALUES (1, 10, 1.5), (2, 20, 2.5)")
    val filesBefore = new java.io.File(s"$root/t/data").listFiles()
      .count(_.getName.endsWith(".parquet"))

    spark.sql("ALTER TABLE wd.t ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE wd.t ALTER COLUMN f TYPE DOUBLE")
    // metadata-only: no file was rewritten
    val filesAfter = new java.io.File(s"$root/t/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter === filesBefore)
    // old (narrow) files decode under the wider type, new writes mix in
    spark.sql("INSERT INTO wd.t VALUES (3, 3000000000, 3.25)")
    val rows = spark.sql("SELECT k, n, f FROM wd.t ORDER BY k").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(10L, 20L, 3000000000L))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(1.5, 2.5, 3.25))
    assert(spark.table("wd.t").schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    // metadata-only aggregate pushdown stays type-consistent across
    // the widen: old (int-written) files' extrema and new (long)
    // files' extrema fold under the widened schema
    val agg = spark.sql("SELECT count(*) AS c, min(n) AS mn, max(n) AS mx " +
      "FROM wd.t").head()
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) ===
      ((3L, 10L, 3000000000L)))

    // narrowing refuses (Spark's own analyzer catches the downcast
    // before the catalog; either refusal is honest)
    val nar = intercept[Exception] {
      spark.sql("ALTER TABLE wd.t ALTER COLUMN n TYPE INT")
    }
    assert(allMessages(nar).contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      allMessages(nar).contains("widen"))
    val keyw = intercept[Exception] {
      spark.sql("ALTER TABLE wd.t ALTER COLUMN k TYPE DECIMAL(20,0)")
    }
    assert(allMessages(keyw).toLowerCase.contains("widen"))
  }

  test("RENAME COLUMN is metadata-only; SET/UNSET TBLPROPERTIES round-trip") {
    val root = tmpDir("graft-cat-rename")
    spark.conf.set("spark.sql.catalog.rn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rn.root", root)
    spark.sql("""CREATE TABLE rn.t (k BIGINT, old_name DOUBLE)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO rn.t VALUES (1, 1.5), (2, 2.5)")
    val tx = graft.core.TxTable.openReadOnly(spark, s"$root/t",
      requireDescriptor = true)
    val vBefore = tx.currentVersion
    def dataFiles(): Set[String] =
      Option(new java.io.File(s"$root/t/data").listFiles())
        .map(_.map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .getOrElse(Set.empty)
    val filesBefore = dataFiles()

    spark.sql("ALTER TABLE rn.t RENAME COLUMN old_name TO v")
    assert(dataFiles() === filesBefore,
      "rename is a metadata commit - no data file may be rewritten")
    assert(spark.table("rn.t").columns.toSeq === Seq("k", "v"))
    assert(spark.sql("SELECT sum(v) FROM rn.t").head().getDouble(0) === 4.0)
    // time travel below the rename reads the OLD name (per-version
    // schema headers)
    val old = spark.read.format("graft")
      .option("versionAsOf", vBefore.toString).load(s"$root/t")
    assert(old.columns.toSeq === Seq("k", "old_name"))
    assert(old.count() === 2L)
    // KEY columns rename freely now (physical identity never moves):
    // DML keeps binding the new declared name
    spark.sql("ALTER TABLE rn.t RENAME COLUMN k TO kk")
    assert(spark.table("rn.t").columns.toSeq === Seq("kk", "v"))
    spark.sql("UPDATE rn.t SET v = 9.5 WHERE kk = 2")
    assert(spark.sql("SELECT sum(v) FROM rn.t").head().getDouble(0) === 11.0)
    spark.sql("ALTER TABLE rn.t RENAME COLUMN kk TO k") // restore

    // TBLPROPERTIES lifecycle
    spark.sql("ALTER TABLE rn.t SET TBLPROPERTIES ('team'='ops', 'tier'='gold')")
    val props = spark.sql("SHOW TBLPROPERTIES rn.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("team") === "ops" && props("tier") === "gold")
    spark.sql("ALTER TABLE rn.t UNSET TBLPROPERTIES ('tier')")
    val props2 = spark.sql("SHOW TBLPROPERTIES rn.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2.contains("team") && !props2.contains("tier"))
    // a user pair can never shadow the physical identity keys
    spark.sql("ALTER TABLE rn.t SET TBLPROPERTIES ('buckets'='999')")
    val props3 = spark.sql("SHOW TBLPROPERTIES rn.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props3("buckets") === "2")
  }
}
