package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** GENERATED ALWAYS AS (expr) columns, Delta's semantics on the graft
  * commit protocol: the expression MATERIALIZES at write time inside
  * `stageFiles` (the single choke point every write path stages
  * through), so reads / zone maps / exports see plain stored values.
  * An omitted-or-null incoming column computes; a provided value must
  * agree with the recomputed expression per-row (null-safe equality,
  * codegen'd raise_error on mismatch). DDL guards keep the expression
  * resolvable forever: CREATE validates it, and renaming/dropping a
  * referenced column is refused. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def genMd(sql: String) = new MetadataBuilder()
    .putString(TxTable.GeneratedExprKey, sql).build()

  test("SQL: omitted generated column materializes the expression") {
    val root = tmpDir("gencol1")
    spark.conf.set("spark.sql.catalog.gen1", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gen1.root", root)
    spark.sql(
      """CREATE TABLE gen1.t (
        |  k BIGINT, ts TIMESTAMP,
        |  yr INT GENERATED ALWAYS AS (year(ts)))
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin)
    spark.sql(
      """INSERT INTO gen1.t (k, ts) VALUES
        |  (1, TIMESTAMP '1995-03-04 00:00:00'),
        |  (2, TIMESTAMP '1996-07-01 12:30:00'),
        |  (3, TIMESTAMP '1995-12-31 23:59:59')""".stripMargin)
    val got = spark.sql(
      "SELECT k, yr FROM gen1.t ORDER BY k").as[(Long, Int)].collect()
    assert(got.toSeq === Seq((1L, 1995), (2L, 1996), (3L, 1995)))
  }

  test("provided value must match the expression; mismatch lands nothing") {
    val root = tmpDir("gencol2")
    spark.conf.set("spark.sql.catalog.gen2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gen2.root", root)
    spark.sql(
      """CREATE TABLE gen2.t (
        |  k BIGINT, v BIGINT,
        |  dbl BIGINT GENERATED ALWAYS AS (v * 2))
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin)
    // matching explicit value: accepted (the Delta contract)
    spark.sql("INSERT INTO gen2.t (k, v, dbl) VALUES (1, 10, 20)")
    // NULL is the omission signal: computed
    spark.sql("INSERT INTO gen2.t (k, v, dbl) VALUES (2, 7, NULL)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gen2.t (k, v, dbl) VALUES (3, 5, 99)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("generated column")),
      s"mismatch must fail with the honest error, got: $e")
    val got = spark.sql("SELECT k, dbl FROM gen2.t ORDER BY k")
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 20L), (2L, 14L)),
      "the failed insert must not land rows")
  }

  test("Scala API: append and upsert both materialize (one choke point)") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", LongType),
      StructField("neg", LongType, nullable = true, genMd("0 - v"))))
    val t = new TxTable(spark, tmpDir("gencol3") + "/t", schema,
      Seq("k"), numBuckets = 2)
    // append may omit the column entirely
    t.append(Seq((1L, 5L), (2L, 6L)).toDF("k", "v"))
    // upsert passes whole rows; null means "compute"
    t.upsert(Seq((2L, 60L, Option.empty[Long]), (3L, 7L, Option.empty[Long]))
      .toDF("k", "v", "neg"))
    val got = t.read.select("k", "neg").as[(Long, Long)].collect().sorted
    assert(got.toSeq === Seq((1L, -5L), (2L, -60L), (3L, -7L)),
      "upsert post-images must recompute from the updated base value")
  }

  test("SQL UPDATE / MERGE recompute the generated column (Delta UPDATE semantics)") {
    val root = tmpDir("gencol8")
    spark.conf.set("spark.sql.catalog.gen8", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gen8.root", root)
    spark.sql(
      """CREATE TABLE gen8.t (
        |  k BIGINT, v BIGINT,
        |  dbl BIGINT GENERATED ALWAYS AS (v * 2))
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin)
    spark.sql("INSERT INTO gen8.t (k, v) VALUES (1, 10), (2, 20), (3, 30)")
    // the UPDATE post-image carries the PRE-update dbl; the rewrite
    // path must recompute it, not reject or keep it stale
    spark.sql("UPDATE gen8.t SET v = 100 WHERE k = 2")
    spark.sql(
      """MERGE INTO gen8.t USING (SELECT 3 AS k, 333 AS v) s ON gen8.t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val got = spark.sql("SELECT k, v, dbl FROM gen8.t ORDER BY k")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 10L, 20L), (2L, 100L, 200L),
      (3L, 333L, 666L)))
  }

  test("CREATE validation: nondeterminism, aggregates, bad refs refused") {
    val root = tmpDir("gencol4")
    spark.conf.set("spark.sql.catalog.gen4", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gen4.root", root)
    // Spark's own CREATE-time verifier front-runs some cases (with
    // UNRESOLVED_COLUMN / "generation expression" phrasing); the
    // catalog's validator catches the rest with "generated column" —
    // either way the DDL must fail with a reference to the problem
    def refuse(ddl: String, why: String): Unit = {
      val e = intercept[Exception] { spark.sql(ddl) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("generated column") ||
          m.contains("generation expression") ||
          m.contains("cannot be resolved")),
        s"$why must refuse with the honest error, got: $e")
    }
    refuse(
      """CREATE TABLE gen4.bad1 (k BIGINT,
        |  r DOUBLE GENERATED ALWAYS AS (rand()))
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin,
      "nondeterministic expression")
    // aggregates: Spark's own CREATE-time verifier trips first (with
    // an unhelpful None.get, a Spark quirk) before the catalog's
    // validator can phrase it better — the DDL still fails, which is
    // the contract under test
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE gen4.bad2 (k BIGINT,
          |  s BIGINT GENERATED ALWAYS AS (sum(k)))
          |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin)
    }
    intercept[Exception] { spark.sql("SELECT * FROM gen4.bad2") }
    refuse(
      """CREATE TABLE gen4.bad3 (k BIGINT,
        |  x BIGINT GENERATED ALWAYS AS (no_such_col + 1))
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin,
      "unresolvable reference")
    refuse(
      """CREATE TABLE gen4.bad4 (k BIGINT,
        |  a BIGINT GENERATED ALWAYS AS (k + 1),
        |  b BIGINT GENERATED ALWAYS AS (a + 1))
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin,
      "generated-from-generated")
    refuse(
      """CREATE TABLE gen4.bad5 (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT,
        |  x BIGINT GENERATED ALWAYS AS (id * 2))
        |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin,
      "generated-from-identity")
  }

  test("upsertLight recomputes like upsert (byte-identical contract)") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", LongType),
      StructField("dbl", LongType, nullable = true, genMd("v * 2"))))
    val t = new TxTable(spark, tmpDir("gencol10") + "/t", schema,
      Seq("k"), numBuckets = 2)
    t.append(Seq((1L, 5L), (2L, 6L)).toDF("k", "v"))
    // a light update row naturally carries the STALE dbl it read —
    // the DV path must recompute, exactly like the copy-on-write path
    t.upsertLight(Seq((2L, 60L, 12L)).toDF("k", "v", "dbl"))
    val got = t.read.select("k", "dbl").as[(Long, Long)].collect().sorted
    assert(got.toSeq === Seq((1L, 10L), (2L, 120L)),
      "upsertLight must recompute the generated column, not keep/reject " +
        "the stale value")
  }

  test("window functions are refused at CREATE (both API doors)") {
    // the analyzer hides a window expression under a top-level
    // Project, so a root-node check alone would let it through
    val root = tmpDir("gencol11")
    spark.conf.set("spark.sql.catalog.gen11", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gen11.root", root)
    // SQL door: Spark's own verifier front-runs with a bare None.get
    // (same quirk as aggregates) — the DDL fails either way
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE gen11.t (k BIGINT,
          |  rn BIGINT GENERATED ALWAYS AS (row_number() OVER (ORDER BY k)))
          |TBLPROPERTIES('keys'='k','buckets'='2')""".stripMargin)
    }
    intercept[Exception] { spark.sql("SELECT * FROM gen11.t") }
    // the shared validator itself must name the problem (it guards
    // the Scala door, where Spark's verifier never runs): a window
    // expression analyzes as Project-over-Window, so a root-node-only
    // check would silently admit it
    val winSchema = StructType(Seq(
      StructField("k", LongType),
      StructField("rn", LongType, nullable = true,
        genMd("row_number() OVER (ORDER BY k)"))))
    val ew = intercept[Exception] {
      TxTable.validateGeneratedExprs(spark, winSchema)
    }
    assert(ew.getMessage.contains("window"),
      s"the validator must refuse window functions by name, got: $ew")
    // the Scala API door validates at createIfAbsent, same contract
    val bad = StructType(Seq(
      StructField("k", LongType),
      StructField("r", DoubleType, nullable = true, genMd("rand()"))))
    val t = new TxTable(spark, tmpDir("gencol12") + "/t", bad,
      Seq("k"), numBuckets = 2)
    val e2 = intercept[Exception] { t.append(Seq(1L).toDF("k")) }
    assert(e2.getMessage.contains("deterministic"),
      s"Scala-API CREATE must validate, got: $e2")
  }

  test("dropColumns drops a generated column WITH its base in one call") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", LongType),
      StructField("dbl", LongType, nullable = true, genMd("v * 2"))))
    val t = new TxTable(spark, tmpDir("gencol13") + "/t", schema,
      Seq("k"), numBuckets = 2)
    t.append(Seq((1L, 5L)).toDF("k", "v"))
    t.dropColumns(Seq("dbl", "v")) // atomic pair drop
    assert(t.read.columns.toSeq === Seq("k"))
  }

  test("maintenance never rewrites or re-judges stored generated values") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", LongType),
      StructField("dbl", LongType, nullable = true, genMd("v * 2"))))
    val t = new TxTable(spark, tmpDir("gencol14") + "/t", schema,
      Seq("k"), numBuckets = 2)
    (0 until 4).foreach(i =>
      t.append((1L to 40L).filter(_ % 4 == i).map(x => (x, x)).toDF("k", "v")))
    t.deleteWhereLight(col("k") % 5 === 0)
    val before = t.read.collect().map(_.toSeq).toSet
    t.compactBuckets(2)         // folds DVs, re-stages stored rows
    t.compactClustered(Seq("v"), filesPerBucket = 2)
    assert(t.read.collect().map(_.toSeq).toSet === before,
      "layout-only maintenance must pass stored values through verbatim")
  }

  test("a generated column cannot be a key (bucket identity arrives concrete)") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("gk", LongType, nullable = true, genMd("k * 2")),
      StructField("v", LongType)))
    // bucket targeting hashes incoming keys BEFORE staging recomputes
    // the expression - a null-carrying update would mis-bucket
    val e = intercept[Exception] {
      new TxTable(spark, tmpDir("gencol9") + "/t", schema,
        Seq("gk"), numBuckets = 2)
    }
    assert(e.getMessage.contains("cannot be a key"))
  }

  test("rename/drop of a referenced column refused; generated col drops") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", LongType),
      StructField("dbl", LongType, nullable = true, genMd("v * 2"))))
    val t = new TxTable(spark, tmpDir("gencol5") + "/t", schema,
      Seq("k"), numBuckets = 2)
    t.append(Seq((1L, 5L)).toDF("k", "v"))
    val er = intercept[Exception] { t.renameColumn("v", "w") }
    assert(er.getMessage.contains("generated column"))
    val ed = intercept[Exception] { t.dropColumns(Seq("v")) }
    assert(ed.getMessage.contains("generated column"))
    // the generated column itself can go; afterwards v is renameable
    t.dropColumns(Seq("dbl"))
    t.renameColumn("v", "w")
    assert(t.read.columns.toSeq === Seq("k", "w"))
  }

  test("Delta export scrubs the generation expression; values round-trip") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", LongType),
      StructField("dbl", LongType, nullable = true, genMd("v * 2"))))
    val t = new TxTable(spark, tmpDir("gencol6") + "/t", schema,
      Seq("k"), numBuckets = 2)
    t.append(Seq((1L, 5L), (2L, 8L)).toDF("k", "v"))
    graft.core.DeltaExport.syncDeltaLog(spark, t)
    val log = java.nio.file.Files.readString(java.nio.file.Path.of(
      t.dir, "_delta_log", "00000000000000000000.json"))
    assert(!log.contains(TxTable.GeneratedExprKey),
      "the engine-internal generation key must not leak into the log " +
        "(the generatedColumns writer feature is not declared; values " +
        "are materialized, so stock readers read them)")
    val back = graft.core.DeltaImport.read(spark, t.dir)
    assert(back.select("dbl").as[Long].collect().sorted.toSeq ===
      Seq(10L, 16L))
  }

  test("zone maps skip on the materialized generated column") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("ts", TimestampType),
      StructField("yr", IntegerType, nullable = true, genMd("year(ts)"))))
    val t = new TxTable(spark, tmpDir("gencol7") + "/t", schema,
      Seq("k"), numBuckets = 2)
    val rows = (1L to 400L).map(i =>
      (i, java.sql.Timestamp.valueOf(s"${1993 + (i % 4)}-06-01 00:00:00")))
    t.append(rows.toDF("k", "ts"))
    t.compactClustered(Seq("yr"), filesPerBucket = 4)
    val rep = t.skipReport(col("yr") === 1995)
    assert(rep.scanned < rep.total,
      s"generated-column stats must prune files (scanned ${rep.scanned} " +
        s"of ${rep.total}) - materialization is what buys the skipping")
    assert(t.scanWhere(col("yr") === 1995).count() === 100L)
  }
}
