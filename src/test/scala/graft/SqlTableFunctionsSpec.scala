package graft

import org.apache.spark.sql.functions._

/** SQL table functions ([[graft.functions.GraftTableFunctions]]):
  * pure `spark.sql` text must reach the extension operators and
  * return exactly what the Scala entry points return — same plans,
  * same results. */
class SqlTableFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_bm25: SQL text serves the persisted postings index") {
    val docs = Seq(
      (1L, "spark table scan with vector search"),
      (2L, "a table of tables"),
      (3L, "vector vector vector"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val dir = tmpDir("tvf-bm25") + "/idx"
    // BM25 serves from the positional index (postings + docstats)
    graft.ext.TextIndex.buildPositional(docs, "doc_id", "text", dir)

    val viaSql = spark.sql(
      s"SELECT * FROM graft_bm25('$dir', 'table vector', 3)")
    val viaScala = graft.ext.TextIndex.bm25Search(spark, dir, "doc_id",
      Seq("table", "vector"), k = 3)
    assert(viaSql.collect().toSeq.map(_.toSeq) ===
      viaScala.collect().toSeq.map(_.toSeq))
    assert(viaSql.count() === 3)
  }

  test("graft_knn: exact cosine top-k as SQL text") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.0f, 1.0f), 2),
      (3L, Array(0.7f, 0.7f), 1)).toDF("vec_id", "embedding", "label")
    val path = tmpDir("tvf-knn") + "/emb.parquet"
    emb.write.parquet(path)

    val got = spark.sql(
      s"SELECT * FROM graft_knn('$path', 'vec_id', 'embedding', 0, 2)")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // nearest to (1,0): vec 1, then vec 3
    assert(got.toSeq === Seq((1L, 1), (3L, 1)))
    val cols = spark.sql(
      s"SELECT * FROM graft_knn('$path', 'vec_id', 'embedding', 0, 2)")
      .columns.toSeq
    assert(cols === Seq("vec_id", "label", "score"))
  }

  test("graft_funnel: the one-shuffle fold from SQL text") {
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), "view"),
      (1L, ts("2026-01-01 11:00:00"), "purchase"),
      (2L, ts("2026-01-02 09:00:00"), "view"),
      (3L, ts("2026-01-03 08:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val path = tmpDir("tvf-funnel") + "/ev.parquet"
    ev.write.parquet(path)

    val row = spark.sql(
      s"SELECT * FROM graft_funnel('$path', 'view:0,purchase:24')").head()
    assert(row.getLong(0) === 2L) // users 1 and 2 entered
    assert(row.getLong(1) === 1L) // only user 1 converted
  }

  test("non-literal arguments are refused honestly") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_bm25(rand()::string, 'x', 1)").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("literal"))
  }

  test("graft_history: DESCRIBE HISTORY as SQL text") {
    val dir = tmpDir("tvf-hist") + "/t"
    val d1 = Seq((1L, "a")).toDF("k", "s")
    val t = new graft.core.TxTable(spark, dir, d1.schema, Seq("k"),
      numBuckets = 2)
    t.append(d1)
    t.append(Seq((2L, "b")).toDF("k", "s"))
    val hist = spark.sql(s"SELECT * FROM graft_history('$dir')")
    assert(hist.count() === t.history.count())
    assert(hist.columns.toSeq === t.history.columns.toSeq)
  }

  test("graft_files: live file inventory as SQL text") {
    val dir = tmpDir("tvf-files") + "/t"
    val d = (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v")
    val t = new graft.core.TxTable(spark, dir, d.schema, Seq("k"),
      numBuckets = 2)
    t.append(d)
    t.deleteWhereLight(col("k") <= 5L)
    val files = spark.sql(s"SELECT * FROM graft_files('$dir')")
    assert(files.columns.toSeq === Seq("file", "bucket", "live_rows", "dv_rows"))
    assert(files.agg(sum("live_rows")).head().getLong(0) === 45L)
    assert(files.agg(sum("dv_rows")).head().getLong(0) === 5L)
    assert(files.count() === t.dataFileCount)
  }

  test("graft_changes: row-level CDC diff as SQL text") {
    val dir = tmpDir("tvf-cdc") + "/t"
    val d = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val t = new graft.core.TxTable(spark, dir, d.schema, Seq("k"),
      numBuckets = 2)
    t.append(d)                                      // v1
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("k", "s")) // v2
    val sqlDiff = spark.sql(s"SELECT * FROM graft_changes('$dir', 1, 2)")
    val apiDiff = t.changes(1L, 2L)
    assert(sqlDiff.collect().map(_.toSeq).toSet ===
      apiDiff.collect().map(_.toSeq).toSet)
    assert(sqlDiff.count() >= 3) // insert + update pre/post images
  }

  test("data TVFs accept graft table dirs (snapshot + DV-masked)") {
    val dir = tmpDir("tvf-table") + "/ev"
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), "view"),
      (1L, ts("2026-01-01 11:00:00"), "purchase"),
      (2L, ts("2026-01-02 09:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val t = new graft.core.TxTable(spark, dir, ev.schema, Seq("user_id"),
      numBuckets = 2)
    t.append(ev)
    // tombstone user 2's view: the funnel must see the LIVE rows only
    t.deleteWhereLight(col("user_id") === 2L)
    val row = spark.sql(
      s"SELECT * FROM graft_funnel('$dir', 'view:0,purchase:24')").head()
    assert(row.getLong(0) === 1L) // only user 1 remains in the funnel
    assert(row.getLong(1) === 1L)
  }
}
