package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable

/** CHECK constraints on the transactional table's write path:
  * declaration gates on existing rows, every write path validates its
  * incoming batch, NULL predicates pass (SQL standard), drops lift
  * enforcement, and the set survives process restarts. */
class CheckConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): TxTable =
    new TxTable(spark, tmpDir("txchk") + "/t", StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))),
      Seq("k"), numBuckets = 4)

  test("writes violating an active CHECK are refused on every path") {
    val t = fresh()
    t.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    t.addCheckConstraint("v_nonneg", "v >= 0")
    assert(t.checkConstraints === Map("v_nonneg" -> "v >= 0"))
    // conforming writes pass
    t.append(Seq(("c", 3)).toDF("k", "v"))
    t.upsert(Seq(("a", 10)).toDF("k", "v"))
    // violating writes refuse — append, upsert, insertIfAbsent,
    // upsertLight — and the table state is untouched
    val vBefore = t.currentVersion
    val bad = Seq(("z", -5)).toDF("k", "v")
    Seq[(org.apache.spark.sql.DataFrame => Unit)](
      df => t.append(df), df => t.upsert(df),
      df => t.insertIfAbsent(df), df => t.upsertLight(df)
    ).foreach { write =>
      val e = intercept[Exception](write(bad))
      assert(e.getMessage.contains("v_nonneg"), e.getMessage)
    }
    assert(t.currentVersion === vBefore)
    assert(t.read.filter(col("v") < 0).count() === 0L)
  }

  test("declaration refuses when existing rows already violate") {
    val t = fresh()
    t.append(Seq(("a", -1)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](
      t.addCheckConstraint("v_nonneg", "v >= 0"))
    assert(e.getMessage.contains("existing rows"))
    assert(t.checkConstraints.isEmpty)
  }

  test("NULL predicate passes (SQL CHECK semantics); FALSE refuses") {
    val t = fresh()
    t.createIfAbsent()
    t.addCheckConstraint("v_big", "v > 0")
    // v NULL → predicate NULL → admitted
    t.append(Seq(("a", Some(1)), ("b", None))
      .toDF("k", "v").select(col("k"), col("v").cast(IntegerType)))
    assert(t.read.count() === 2L)
    intercept[Exception](t.append(Seq(("c", 0)).toDF("k", "v")))
  }

  test("drop lifts enforcement; duplicate add and missing drop refuse") {
    val t = fresh()
    t.createIfAbsent()
    t.addCheckConstraint("v_nonneg", "v >= 0")
    intercept[IllegalArgumentException](
      t.addCheckConstraint("v_nonneg", "v >= 1"))
    t.dropCheckConstraint("v_nonneg")
    assert(t.checkConstraints.isEmpty)
    t.append(Seq(("neg", -1)).toDF("k", "v")) // no longer gated
    assert(t.read.filter(col("v") < 0).count() === 1L)
    intercept[IllegalArgumentException](t.dropCheckConstraint("v_nonneg"))
    intercept[IllegalArgumentException](
      t.addCheckConstraint("bad name!", "v >= 0"))
  }

  test("constraints survive a fresh instance and multiple constraints compose") {
    val dir = tmpDir("txchk-persist") + "/t"
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType)))
    val t = new TxTable(spark, dir, schema, Seq("k"), numBuckets = 4)
    t.append(Seq(("a", 5)).toDF("k", "v"))
    t.addCheckConstraint("v_nonneg", "v >= 0")
    t.addCheckConstraint("v_small", "v < 1000")
    // a new instance (fresh cache) reads the same active set
    val t2 = new TxTable(spark, dir, schema, Seq("k"), numBuckets = 4)
    assert(t2.checkConstraints.keySet === Set("v_nonneg", "v_small"))
    val e = intercept[Exception](t2.append(Seq(("z", 1000)).toDF("k", "v")))
    assert(e.getMessage.contains("v_small"))
    intercept[Exception](t2.append(Seq(("z", -1)).toDF("k", "v")))
    t2.append(Seq(("z", 999)).toDF("k", "v"))
    assert(t2.read.count() === 2L)
    // compaction re-stages existing (passing) rows without tripping
    t2.compact()
    assert(t2.read.count() === 2L)
  }

  test("SQL ALTER TABLE ADD/DROP CONSTRAINT ... CHECK end-to-end") {
    val root = tmpDir("chk-sql")
    spark.conf.set("spark.sql.catalog.chkc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.chkc.root", root)
    spark.sql("""CREATE TABLE chkc.t (k BIGINT, v INT)
                 TBLPROPERTIES('keys'='k','buckets'='2')""")
    spark.sql("INSERT INTO chkc.t VALUES (1, 5)")
    spark.sql(
      "ALTER TABLE chkc.t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val tx = graft.core.TxTable.openReadOnly(spark, s"$root/t",
      requireDescriptor = true)
    assert(tx.checkConstraints.keySet === Set("v_pos"))
    // enforcement gates every later write (our staging choke point)
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO chkc.t VALUES (2, -1)")
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(String.valueOf(_)).mkString(" | ")
    assert(msgs(bad).contains("v_pos"))
    // declaration refuses when existing rows already violate (Spark's
    // own pre-validation scan fires first with its error class; our
    // addCheckConstraint guard is the belt behind that suspender)
    val vio = intercept[Exception] {
      spark.sql("ALTER TABLE chkc.t ADD CONSTRAINT v_big CHECK (v > 100)")
    }
    assert(msgs(vio).contains("existing rows violate") ||
      msgs(vio).contains("NEW_CHECK_CONSTRAINT_VIOLATION"))
    spark.sql("ALTER TABLE chkc.t DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO chkc.t VALUES (2, -1)") // enforcement lifted
    assert(spark.sql("SELECT count(*) FROM chkc.t").head().getLong(0) === 2L)
    // DROP CONSTRAINT IF EXISTS on an absent name succeeds silently
    spark.sql("ALTER TABLE chkc.t DROP CONSTRAINT IF EXISTS nope")
  }

  test("history reports per-commit file deltas and meta keys") {
    val t = fresh()
    t.append(Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)).toDF("k", "v")) // v1
    t.addCheckConstraint("v_nonneg", "v >= 0")                           // v2
    t.upsert(Seq(("a", 10)).toDF("k", "v"))                              // v3
    t.compact()                                                          // v4
    val h = t.history.orderBy("version")
      .select("version", "n_files", "n_added", "n_removed", "meta_keys")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(h.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    val byV = h.map(r => r._1 -> r).toMap
    assert(byV(0L)._2 === 0L)                       // create: empty
    assert(byV(1L)._3 > 0L && byV(1L)._4 === 0L)    // append adds only
    assert(byV(2L)._3 === 0L && byV(2L)._4 === 0L)  // meta-only commit
    assert(byV(2L)._5.contains("checks"))
    assert(byV(3L)._3 > 0L && byV(3L)._4 > 0L)      // upsert rewrites
    assert(byV(4L)._2 <= byV(3L)._2)                // compact shrinks
  }
}
